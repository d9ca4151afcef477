"""Network-level golden parity: the JAX PointNet must match a torch
reconstruction of the reference architecture (Conv1d per-point MLP with
channel-first LayerNorm, eps 1e-6, first layer unnormalized, max-pool,
Linear+LayerNorm projection — reference pointnet.py:77-153 with the pn
config's ignore_first_ln=True) when weights are mapped across."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _build_torch_pointnet(params, mlp_spec, feat_dim, out_channels):
    """Assemble the reference-architecture torch model from jax params."""
    import torch.nn as tnn

    p = params["params"]
    conv_layers = p["conv"]  # MLP submodule: Dense_i / LayerNorm_i
    layers = []
    dims = [feat_dim] + list(mlp_spec)

    class ChannelFirstLN(tnn.Module):
        """Reference LN1d: LayerNorm over the channel axis of [B, C, N]."""

        def __init__(self, c, eps):
            super().__init__()
            self.ln = tnn.LayerNorm(c, eps=eps)

        def forward(self, x):
            return self.ln(x.transpose(1, 2)).transpose(1, 2)

    model_parts = []
    ln_idx = 0
    for i in range(len(mlp_spec)):
        conv = tnn.Conv1d(dims[i], dims[i + 1], 1)
        kernel = np.asarray(p["conv"][f"Dense_{i}"]["kernel"])  # [in, out]
        bias = np.asarray(p["conv"][f"Dense_{i}"]["bias"])
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(kernel.T[..., None]))
            conv.bias.copy_(torch.tensor(bias))
        model_parts.append(conv)
        if i > 0:  # ignore_first_ln=True: no LN on layer 0
            ln = ChannelFirstLN(dims[i + 1], eps=1e-6)
            lnp = p["conv"][f"LayerNorm_{ln_idx}"]
            with torch.no_grad():
                ln.ln.weight.copy_(torch.tensor(np.asarray(lnp["scale"])))
                ln.ln.bias.copy_(torch.tensor(np.asarray(lnp["bias"])))
            ln_idx += 1
            model_parts.append(ln)
        model_parts.append(tnn.ReLU())

    final = tnn.Linear(mlp_spec[-1], out_channels)
    final_ln = tnn.LayerNorm(out_channels)
    with torch.no_grad():
        final.weight.copy_(torch.tensor(np.asarray(p["final_dense"]["kernel"]).T))
        final.bias.copy_(torch.tensor(np.asarray(p["final_dense"]["bias"])))
        final_ln.weight.copy_(torch.tensor(np.asarray(p["final_ln"]["scale"])))
        final_ln.bias.copy_(torch.tensor(np.asarray(p["final_ln"]["bias"])))
    return tnn.Sequential(*model_parts), final, final_ln


def test_pointnet_matches_torch_reference_architecture():
    from pointcloud_rl_tpu.models import build_all

    feat_dim, mlp_spec, out = 9, [32, 64, 128], 50
    pn = build_all(dict(type="PointNet", feat_dim=feat_dim, mlp_spec=mlp_spec, out_channels=out,
                        feature_transform=[], ignore_first_ln=True))
    rs = np.random.RandomState(0)
    obs = {
        "xyz": rs.randn(4, 3, 200).astype(np.float32),
        "rgb": rs.randint(0, 255, (4, 3, 200)).astype(np.uint8),
        "pos_encoding": rs.randint(0, 2, (4, 3, 200)).astype(np.uint8),
    }
    params = pn.init({"params": jax.random.PRNGKey(0)}, obs)
    jax_out = np.asarray(pn.apply(params, obs))

    body, final, final_ln = _build_torch_pointnet(params, mlp_spec, feat_dim, out)
    # reference preprocess: cat(xyz, rgb/255, pos_encoding) channel-first
    feat = np.concatenate([
        obs["xyz"], obs["rgb"].astype(np.float32) / 255.0, obs["pos_encoding"].astype(np.float32)
    ], axis=1)
    with torch.no_grad():
        h = body(torch.tensor(feat))
        pooled = h.max(dim=-1).values
        ref_out = final_ln(final(pooled)).numpy()

    np.testing.assert_allclose(jax_out, ref_out, rtol=1e-4, atol=1e-4)
