# The reference DrQ point-cloud protocol run (reference
# configs/mfrl/drq/dm_control/pn_shift.py: dmc_cheetah_run-v0, 500k steps,
# GlobalRotScaleTrans shift aug), shaped for TPU wall-clock exactly like
# the walker SAC protocol config (pn_walker_tpu.py): 16 pipelined env
# workers, 16:16 step:update cycles (the reference's 1:1 ratio), fused
# Pallas PointNet body, no in-training evals (checkpoints eval separately
# via --evaluation).
#
# NOTE: no replay pack_features here — DrQ's in-update point aug needs the
# raw xyz channel layout (see env/device_replay.py), so storage stays the
# base config's drop_subkeys form.
_base_ = ["./pn_shift.py"]

agent_cfg = dict(
    actor_cfg=dict(nn_cfg=dict(visual_nn_cfg=dict(fused=True))),
    obs_transfer_cfg=dict(pos_encoding_on_device=True, pack_dtype="float16"),
)

rollout_cfg = dict(num_procs=16, pipeline_groups=1)

train_cfg = dict(
    n_steps=16,
    n_updates=16,
    n_eval=-1,
    n_checkpoint=50000,
    save_replay=50000,
    total_steps=500000,
)
