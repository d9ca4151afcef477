"""Measure the REFERENCE torch SAC+PointNet update on this host's CPU.

Bounds the bench.py baseline denominator with a measurement (VERDICT round-2
weak #5): the reference stack (pyrl, torch-CPU, deps stubbed exactly as the
golden-parity tests do) runs its own ``update_parameters`` at the paper
config's shapes — batch 256, 1536-point clouds (512/frame x 3 stacked
frames, 9 channels), PointNet [64,128,256]->50, 1024x1024 heads, twin-Q,
shared backbone (configs/mfrl/sac/dm_control/pn.py).

Usage:  python tools/measure_reference_cpu.py [n_updates]

Prints one JSON line {"ref_cpu_updates_per_sec": ...}.  The CUDA scaling
argument lives in BASELINE.md next to the recorded result.
"""

import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))

N_POINTS, ACTION_DIM, BATCH = 1536, 6, 256


def build_reference_agent():
    import torch

    from golden.ref_stubs import load_reference_sac

    load_reference_sac()
    from gym.spaces import Box
    from pyrl.methods.mfrl.sac import SAC as RefSAC

    actor_cfg = dict(
        type="ContinuousActor",
        head_cfg=dict(type="TanhGaussianHead", log_std_bound=[-10, 2]),
        nn_cfg=dict(
            type="Visuomotor",
            visual_nn_cfg=dict(type="PointNet", feat_dim=9, mlp_spec=[64, 128, 256],
                               out_channels=50, feature_transform=[], ignore_first_ln=True),
            mlp_cfg=dict(type="LinearMLP", norm_cfg=None,
                         mlp_spec=[50, 1024, 1024, ACTION_DIM * 2], inactivated_output=True),
        ),
        optim_cfg=dict(type="Adam", lr=1e-3, param_cfg={"(.*?)visual_nn(.*?)": None}),
    )
    critic_cfg = dict(
        type="ContinuousCritic", num_heads=2,
        nn_cfg=dict(
            type="Visuomotor", visual_nn_cfg=None,
            mlp_cfg=dict(type="LinearMLP", norm_cfg=None,
                         mlp_spec=[50 + ACTION_DIM, 1024, 1024, 1], inactivated_output=True),
        ),
        optim_cfg=dict(type="Adam", lr=1e-3),
    )
    env_params = dict(
        obs_shape=dict(xyz=(3, N_POINTS), rgb=(3, N_POINTS), pos_encoding=(3, N_POINTS)),
        action_shape=ACTION_DIM, is_discrete=False,
        action_space=Box(-np.ones(ACTION_DIM, np.float32), np.ones(ACTION_DIM, np.float32)),
    )
    torch.manual_seed(0)
    from golden.ref_stubs import AddictDict

    actor_cfg, critic_cfg = AddictDict(actor_cfg), AddictDict(critic_cfg)
    return RefSAC(actor_cfg=actor_cfg, critic_cfg=critic_cfg, env_params=env_params,
                  batch_size=BATCH, gamma=0.99, alpha=0.1,
                  update_coeff={"default": 0.01, "(.*?)visual_nn(.*?)": 0.05},
                  alpha_optim_cfg=dict(type="Adam", lr=1e-3, betas=(0.5, 0.999)),
                  target_update_interval=2, actor_update_interval=2,
                  shared_backbone=True, detach_actor_feature=True)


class _Memory:
    """Fixed-batch sampler (the update's own H2D/copy costs stay in)."""

    def __init__(self):
        rng = np.random.RandomState(0)
        obs = {
            "xyz": rng.randn(BATCH, 3, N_POINTS).astype(np.float32),
            "rgb": rng.randint(0, 255, (BATCH, 3, N_POINTS), dtype=np.uint8),
            "pos_encoding": np.repeat(np.eye(3, dtype=np.uint8), N_POINTS // 3, axis=-1)[None]
            .repeat(BATCH, 0),
        }
        self.batch = dict(
            obs=obs, next_obs={k: v.copy() for k, v in obs.items()},
            actions=np.clip(rng.randn(BATCH, ACTION_DIM), -1, 1).astype(np.float32),
            rewards=rng.randn(BATCH, 1).astype(np.float32),
            dones=np.zeros((BATCH, 1), bool),
            episode_dones=np.zeros((BATCH, 1), bool),
        )

    def __len__(self):
        return BATCH

    def sample(self, batch_size):
        from pyrl.utils.data import DictArray, GDict

        return DictArray(GDict(self.batch).copy(wrapper=False))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import torch

    torch.set_num_threads(max(1, len(os.sched_getaffinity(0))) if hasattr(os, "sched_getaffinity") else 1)
    agent = build_reference_agent()
    mem = _Memory()
    agent.update_parameters(mem, updates=1)  # warm
    t0 = time.monotonic()
    for i in range(n):
        agent.update_parameters(mem, updates=2 + i)
    dt = time.monotonic() - t0
    print(json.dumps({
        "ref_cpu_updates_per_sec": round(n / dt, 3),
        "ms_per_update": round(dt / n * 1e3, 1),
        "n": n,
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    import os

    main()
