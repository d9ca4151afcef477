"""Network stack tests: blocks, heads, PointNet/CNN/Voxel encoders,
actor-critic composition with shared backbones, placeholder resolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_rl_tpu.models import (
    build_actor_critic,
    build_all,
    get_kwargs_from_shape,
    init_actor_critic_params,
    replace_placeholder_with_args,
)
from pointcloud_rl_tpu.models.blocks import MLP
from pointcloud_rl_tpu.models.distributions import (
    tanh_normal_log_prob,
    tanh_normal_rsample_with_log_prob,
)


class _Box:
    def __init__(self, low, high, shape):
        self.low = np.full(shape, low, np.float32)
        self.high = np.full(shape, high, np.float32)
        self.shape = shape

    def is_bounded(self):
        return True


def _pcd_obs(B=4, N=32, stack=3):
    return {
        "xyz": jnp.asarray(np.random.RandomState(0).randn(B, 3, N * stack), jnp.float32),
        "rgb": jnp.asarray(np.random.RandomState(1).randint(0, 255, (B, 3, N * stack)), jnp.uint8),
        "pos_encoding": jnp.asarray(np.repeat(np.eye(stack, dtype=np.uint8), N, axis=-1)[None].repeat(B, 0)),
    }


def test_mlp_shapes_and_zero_out():
    key = jax.random.PRNGKey(0)
    mlp = MLP([8, 16, 6], norm_cfg=None, zero_out_indices=slice(3, None))
    params = mlp.init({"params": key}, jnp.zeros((2, 8)))
    out = mlp.apply(params, jnp.ones((2, 8)))
    assert out.shape == (2, 6)
    kernel = params["params"]["Dense_1"]["kernel"]
    assert float(jnp.abs(kernel[:, 3:]).max()) < 1e-3
    assert float(jnp.abs(kernel[:, :3]).max()) > 1e-3


def test_tanh_normal_log_prob_consistency():
    key = jax.random.PRNGKey(1)
    mean = jnp.array([[0.3, -0.2]])
    std = jnp.array([[0.5, 1.0]])
    scale, bias = jnp.ones(2), jnp.zeros(2)
    a, logp = tanh_normal_rsample_with_log_prob(key, mean, std, scale, bias)
    assert a.shape == (1, 2) and logp.shape == (1,)
    assert bool(jnp.all(jnp.abs(a) <= 1.0))
    logp2 = tanh_normal_log_prob(a, mean, std, scale, bias)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2), rtol=1e-4, atol=1e-4)


def test_pointnet_forward():
    obs = _pcd_obs()
    pn = build_all(dict(type="PointNet", feat_dim=9, mlp_spec=[32, 64], out_channels=50,
                        feature_transform=[], ignore_first_ln=True))
    params = pn.init({"params": jax.random.PRNGKey(0)}, obs)
    feat = pn.apply(params, obs)
    assert feat.shape == (4, 50)
    # Permutation invariance of the max-pool
    perm = np.random.RandomState(2).permutation(96)
    obs_p = {k: v[..., perm] for k, v in obs.items()}
    feat_p = pn.apply(params, obs_p)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_p), atol=1e-5)


def test_pointnet_with_stn():
    obs = _pcd_obs(B=2, N=16, stack=1)
    pn = build_all(dict(type="PointNet", feat_dim=7, mlp_spec=[16, 32], out_channels=20, feature_transform=[1]))
    params = pn.init({"params": jax.random.PRNGKey(0)}, obs)
    assert pn.apply(params, obs).shape == (2, 20)


def test_dmc_encoder_and_nature_cnn():
    obs = {"rgb": jnp.zeros((2, 9, 84, 84), jnp.uint8)}
    enc = build_all(dict(type="DMCEncoder", in_channels=9, image_size=(84, 84), out_channels=50))
    params = enc.init({"params": jax.random.PRNGKey(0)}, obs)
    assert enc.apply(params, obs).shape == (2, 50)

    nat = build_all(dict(type="NatureCNN", in_channels=9, image_size=(84, 84), out_channels=256))
    params = nat.init({"params": jax.random.PRNGKey(0)}, obs)
    assert nat.apply(params, obs).shape == (2, 256)


def test_impala():
    obs = {"rgb": jnp.zeros((2, 3, 64, 64), jnp.uint8)}
    net = build_all(dict(type="IMPALA", in_channel=3, num_pixels=64 * 64, out_feature_size=128))
    params = net.init({"params": jax.random.PRNGKey(0)}, obs)
    assert net.apply(params, obs).shape == (2, 128)


def test_voxel_cnn():
    obs = {
        "xyz": jnp.asarray(np.random.RandomState(0).rand(2, 3, 64) * 1.0, jnp.float32),
        "rgb": jnp.zeros((2, 3, 64), jnp.uint8),
        "seg": jnp.zeros((2, 2, 64), jnp.float32),
    }
    net = build_all(dict(type="SparseCNN", in_channels=8, out_channels=32, voxel_size=0.1, mlp_spec=[16, 32, 64], grid_size=(16, 16, 16)))
    params = net.init({"params": jax.random.PRNGKey(0)}, obs)
    assert net.apply(params, obs).shape == (2, 32)


def _build_pn_sac_model(num_points=96, action_dim=4, agent_dim=0):
    feat_dim = 9
    actor_cfg = dict(
        type="ContinuousActor",
        head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2], dim_output=action_dim),
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=dict(type="PointNet", feat_dim=feat_dim, mlp_spec=[32, 64], out_channels=50,
                               feature_transform=[], ignore_first_ln=True),
            mlp_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[50 + agent_dim, 64, action_dim * 2],
                         inactivated_output=True),
        ),
    )
    critic_cfg = dict(
        type="ContinuousCritic",
        num_heads=2,
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=None,
            mlp_cfg=dict(type="LinearMLP", norm_cfg=None,
                         mlp_spec=[50 + agent_dim + action_dim, 64, 1], inactivated_output=True),
        ),
    )
    env_params = dict(
        is_discrete=False,
        action_shape=action_dim,
        action_space=_Box(-1, 1, (action_dim,)),
    )
    return build_actor_critic(actor_cfg, critic_cfg, env_params, shared_backbone=True)


def test_actor_critic_shared_backbone():
    model = _build_pn_sac_model()
    obs = _pcd_obs()
    action = jnp.zeros((4, 4))
    params, target = init_actor_critic_params(model, jax.random.PRNGKey(0), obs, action)
    assert set(params) == {"visual", "actor", "critic"}
    assert set(target) == {"critic"}  # shared target backbone -> no visual copy

    # actor max-entropy: (action, neg_logp)
    (a, neg_logp), feat = model.actor_apply(params, obs, mode="max-entropy", rng=jax.random.PRNGKey(1))
    assert a.shape == (4, 4) and neg_logp.shape == (4, 1)
    assert bool(jnp.all(jnp.abs(a) <= 1.0))
    assert feat.shape == (4, 50)

    q = model.critic_apply(params, obs, actions=a)
    assert q.shape == (4, 2)
    qt = model.target_critic_apply(params, target, obs, actions=a)
    assert qt.shape == (4, 2)
    # freshly hard-copied target must agree with live critic
    np.testing.assert_allclose(np.asarray(q), np.asarray(qt), atol=1e-5)

    # two critic heads must differ (independent init)
    assert float(jnp.abs(q[:, 0] - q[:, 1]).max()) > 1e-4

    # eval mode is deterministic
    m1, _ = model.actor_apply(params, obs, mode="eval")
    m2, _ = model.actor_apply(params, obs, mode="eval")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))

    # visual_feature reuse path matches recompute
    q2 = model.critic_apply(params, obs, actions=a, visual_feature=feat)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)


def test_actor_critic_gradient_routing():
    """detach_visual must block actor-loss gradients into the visual subtree."""
    model = _build_pn_sac_model()
    obs = _pcd_obs()
    action = jnp.zeros((4, 4))
    params, _ = init_actor_critic_params(model, jax.random.PRNGKey(0), obs, action)

    def actor_loss(p, detach):
        (a, neg_logp), _ = model.actor_apply(p, obs, mode="max-entropy",
                                             rng=jax.random.PRNGKey(1), detach_visual=detach)
        q = model.critic_apply(p, obs, actions=a)
        return -(q.min(-1).mean() + 0.1 * neg_logp.mean())

    g_detached = jax.grad(lambda p: actor_loss(p, True))(params)
    leaves = jax.tree_util.tree_leaves(g_detached["visual"])
    # With detach, visual grads come only through the critic's Q(s, pi(s)) path.
    # The critic still reads the visual subtree, so grads are nonzero there;
    # but the ACTOR mlp path is cut: compare against actor-only loss.
    def actor_only_loss(p, detach):
        (a, neg_logp), _ = model.actor_apply(p, obs, mode="max-entropy",
                                             rng=jax.random.PRNGKey(1), detach_visual=detach)
        return (a**2).mean() + neg_logp.mean()

    g = jax.grad(lambda p: actor_only_loss(p, True))(params)
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree_util.tree_leaves(g["visual"]))
    g = jax.grad(lambda p: actor_only_loss(p, False))(params)
    assert any(float(jnp.abs(x).max()) > 0.0 for x in jax.tree_util.tree_leaves(g["visual"]))


def test_placeholder_resolution():
    obs_shape = {"xyz": (3, 96), "rgb": (3, 96), "pos_encoding": (3, 96)}
    kwargs = get_kwargs_from_shape(obs_shape, 6)
    assert kwargs["pcd_all_channel"] == 9
    assert kwargs["pcd_xyz_rgb_channel"] == 6
    cfg = dict(feat_dim="pcd_all_channel", mlp_spec=[64, 128, "action_shape * 2"],
               zoi=slice("action_shape", None, None))
    out = replace_placeholder_with_args(cfg, **kwargs)
    assert out["feat_dim"] == 9
    assert out["mlp_spec"] == [64, 128, 12]
    assert out["zoi"] == slice(6, None, None)


def test_discrete_actor_critic():
    actor_cfg = dict(
        type="DiscreteActor",
        head_cfg=dict(type="DiscreteBaseHead"),
        nn_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[10, 32, 5], inactivated_output=True),
    )
    critic_cfg = dict(
        type="DiscreteCritic",
        num_heads=2,
        nn_cfg=dict(type="LinearMLP", norm_cfg=None, mlp_spec=[10, 32, 5], inactivated_output=True),
    )
    env_params = dict(is_discrete=True, action_shape=5, action_space=None)
    model = build_actor_critic(actor_cfg, critic_cfg, env_params, shared_backbone=False)
    obs = jnp.zeros((3, 10))
    params, target = init_actor_critic_params(model, jax.random.PRNGKey(0), obs, jnp.zeros((3, 1)))
    (probs, ent), _ = model.actor_apply(params, obs, mode="max-entropy", rng=jax.random.PRNGKey(1))
    assert probs.shape == (3, 5) and ent.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), np.ones(3), atol=1e-5)
    v = model.critic_apply(params, obs, actions_prob=probs)
    assert v.shape == (3, 2)
    q_table = model.critic_apply(params, obs)
    assert q_table.shape == (3, 2, 5)
    q_a = model.critic_apply(params, obs, actions=jnp.array([[1], [0], [4]]))
    assert q_a.shape == (3, 2)
