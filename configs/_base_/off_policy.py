# Shared off-policy plumbing: replay buffer, rollout, evaluation, training
# schedule defaults. Individual experiment configs override what differs.

replay_cfg = dict(
    type="ReplayMemory",
    capacity=100000,
    sampling_cfg=dict(type="OneStepTransition"),
)

rollout_cfg = dict(type="Rollout", num_procs=1)

eval_cfg = dict(
    type="Evaluation",
    num_procs=1,
    num=1,
    use_hidden_state=False,
    save_traj=False,
    save_video=True,
    log_every_step=False,
)

train_cfg = dict(
    on_policy=False,
    total_steps=500000,
    warm_steps=1000,
    # wedged-relay watchdog: no loop progress for 30 min -> mark work dir,
    # exit nonzero, let --auto-resume restart warm (utils/watchdog.py)
    stall_timeout=1800,
    n_steps=1,
    n_updates=1,
    n_log=1000,
    n_eval=-1,
    n_checkpoint=100000,
    exp_logger_cfg=dict(type="tensorboard"),
)
