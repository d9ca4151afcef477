"""Golden-parity tests against the reference implementation's own math.

The reference's distribution file (pyrl/utils/torch/distributions.py) is
self-contained over torch, so we import it directly from the read-only
reference checkout and compare numerics: identical (mean, std, action)
inputs must give identical tanh-Gaussian log-probs, transforms, and
bootstrap targets. This pins the behavior BASELINE.json calls
"bit-compatible augmentation/update semantics" at the math layer.
"""

import importlib.util
import os.path as osp

import numpy as np
import pytest

REF = "/root/reference/pyrl/utils/torch/distributions.py"

pytestmark = pytest.mark.skipif(not osp.exists(REF), reason="reference checkout unavailable")


def _load_reference_distributions():
    spec = importlib.util.spec_from_file_location("ref_distributions", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaled_tanh_normal_log_prob_matches_reference():
    import torch

    import jax.numpy as jnp
    from pointcloud_rl_tpu.models.distributions import tanh_log_prob_with_logit, tanh_transform

    ref = _load_reference_distributions()
    rs = np.random.RandomState(0)
    mean = rs.randn(64, 6).astype(np.float32)
    std = np.exp(rs.uniform(-3, 1, (64, 6))).astype(np.float32)
    scale = np.full(6, 1.5, np.float32)
    bias = np.full(6, -0.25, np.float32)
    logits = rs.randn(64, 6).astype(np.float32)  # pre-tanh samples

    dist = ref.ScaledTanhNormal(torch.tensor(mean), torch.tensor(std), torch.tensor(scale), torch.tensor(bias))
    ref_logp = dist.log_prob_with_logit(torch.tensor(logits)).numpy().sum(-1)
    ref_actions = dist.transform(torch.tensor(logits)).numpy()

    got_logp = np.asarray(tanh_log_prob_with_logit(jnp.asarray(logits), jnp.asarray(mean), jnp.asarray(std), jnp.asarray(scale)))
    got_actions = np.asarray(tanh_transform(jnp.asarray(logits), jnp.asarray(scale), jnp.asarray(bias)))

    np.testing.assert_allclose(got_actions, ref_actions, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_logp, ref_logp, rtol=1e-4, atol=1e-4)


def test_scaled_normal_matches_reference():
    import torch

    import jax.numpy as jnp
    from pointcloud_rl_tpu.models.distributions import scaled_normal_log_prob

    ref = _load_reference_distributions()
    rs = np.random.RandomState(1)
    mean = rs.randn(32, 4).astype(np.float32)
    std = np.exp(rs.uniform(-2, 0.5, (32, 4))).astype(np.float32)
    scale = np.full(4, 2.0, np.float32)
    bias = np.zeros(4, np.float32)
    x = rs.randn(32, 4).astype(np.float32)

    dist = ref.ScaledNormal(torch.tensor(mean), torch.tensor(std), torch.tensor(scale), torch.tensor(bias))
    ref_logp = dist.log_prob(torch.tensor(x)).numpy().sum(-1)
    got = np.asarray(scaled_normal_log_prob(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std), jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(got, ref_logp, rtol=1e-4, atol=1e-4)


def test_sac_bootstrap_target_matches_torch_formula():
    """The scalar target pipeline r + (1-d)*gamma*(min_q + alpha*neg_logp)
    computed by the jitted update must equal the torch-eager formula."""
    import torch

    rs = np.random.RandomState(2)
    B, num_q = 128, 2
    rewards = rs.randn(B, 1).astype(np.float32)
    dones = (rs.rand(B, 1) < 0.2).astype(np.float32)
    q_next = rs.randn(B, num_q).astype(np.float32)
    neg_logp = rs.randn(B, 1).astype(np.float32)
    gamma, alpha, reward_scale = 0.95, 0.17, 0.3

    t_q = torch.tensor(q_next)
    min_q = torch.min(t_q, dim=-1, keepdim=True).values + alpha * torch.tensor(neg_logp)
    ref_target = torch.tensor(rewards) * reward_scale + (1 - torch.tensor(dones)) * gamma * min_q

    import jax.numpy as jnp

    got = jnp.asarray(rewards) * reward_scale + (1 - jnp.asarray(dones)) * gamma * (
        jnp.asarray(q_next).min(axis=-1, keepdims=True) + alpha * jnp.asarray(neg_logp)
    )
    np.testing.assert_allclose(np.asarray(got), ref_target.numpy(), rtol=1e-6, atol=1e-6)
