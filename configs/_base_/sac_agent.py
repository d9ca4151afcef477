_base_ = ["./off_policy.py"]

# Shared SAC hyper-parameters used by every visual config in the suite:
# twin-Q critics, automatic entropy tuning, per-module EMA rates (the visual
# encoder tracks faster at 0.05), interval-2 actor/target updates, shared
# visual backbone trained by the critic with detached actor features.

agent_cfg = dict(
    type="SAC",
    batch_size=256,
    gamma=0.99,
    alpha=0.1,
    automatic_alpha_tuning=True,
    ignore_dones=False,
    update_coeff={
        "default": 0.01,
        "(.*?)visual_nn(.*?)": 0.05,
    },
    target_update_interval=2,
    actor_update_interval=2,
    alpha_optim_cfg=dict(type="Adam", lr=1e-3, betas=(0.5, 0.999)),
    shared_backbone=True,
    detach_actor_feature=True,
    # TPU throughput opt-in (VISIBLE deviation from reference ordering):
    # the actor step reuses the critic step's visual features, one Adam
    # step stale, saving a full visual encode per actor update.  Algorithm
    # default is False (exact reference ordering, golden-parity tested);
    # walker_walk trained to eval 809 @100k with True.
    stale_actor_feature=True,
)
