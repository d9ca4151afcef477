_base_ = ["./pn.py"]

# The 500k x {1000,2000,3000} walker_walk reference protocol
# (reference README.md:51 seeds, configs/mfrl/sac/dm_control/pn.py:62-79
# budget: 500k env steps, batch 256, replay 100k, gamma 0.99), shaped for
# TPU wall-clock: 16 pipelined env workers on the host core, 16 env steps :
# 16 gradient steps per cycle (the same 1:1 ratio as the reference's
# n_steps=1/n_updates=1), the Pallas fused PointNet body, and no
# in-training evals (eval checkpoints separately via --evaluation, exactly
# like the round-2 runs).

env_cfg = dict(env_name="dmc_walker_walk-v0")

agent_cfg = dict(
    actor_cfg=dict(nn_cfg=dict(visual_nn_cfg=dict(fused=True))),
    # f16 act uploads: round-3 fetch sweep winner (tools/exp_fetch.py)
    obs_transfer_cfg=dict(pos_encoding_on_device=True, pack_dtype="float16"),
)

# pack_features: store the glued channel-last bf16 model-input tensor in
# HBM so the update's obs prep collapses to the sampling gather — the
# round-4 profile-driven winner (tools/exp_update_profile.py; grad-only
# 199 -> 305 updates/s on v5e).  SAC-only: DrQ's in-update point aug needs
# the raw xyz layout and keeps the default storage.
replay_cfg = dict(transfer_cfg=dict(_delete_=True, pack_features=True))

# pipeline_groups=1: ONE act program per 16-env step — the round-3 overlap
# sweep (tools/exp_overlap.py) measured fewer action fetches beating
# cross-group sim/fetch overlap on the relay (122 vs 103-111 steps/s).
rollout_cfg = dict(num_procs=16, pipeline_groups=1)

train_cfg = dict(
    n_steps=16,
    n_updates=16,
    n_eval=-1,
    n_checkpoint=50000,
    save_replay=50000,
    total_steps=500000,
)
