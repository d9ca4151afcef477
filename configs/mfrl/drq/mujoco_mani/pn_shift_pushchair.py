# DrQ + PointNet on PushChair (MuJoCo, procedural swivel chairs; reference
# task mani_skill/env/push_chair.py, reference config
# configs/mfrl/drq/maniskill/pn_shift.py): dual-arm A2, per-level chair +
# physics sampling, back/seat/target segmentation, staged dense rewards.
_base_ = ["./pn_shift_movebucket.py"]

env_cfg = dict(env_name="PushChairMJC_train-v0")

eval_cfg = dict(env_cfg=dict(env_name="PushChairMJC_val-v0"))
