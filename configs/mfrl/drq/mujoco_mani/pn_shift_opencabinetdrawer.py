# DrQ + PointNet on OpenCabinetDrawer (MuJoCo, procedural cabinets;
# reference task mani_skill/env/open_cabinet_door_drawer.py:730-738,
# reference config configs/mfrl/drq/maniskill/pn_shift.py).
_base_ = ["./pn_shift_movebucket.py"]

env_cfg = dict(env_name="OpenCabinetDrawerMJC_train-v0")

eval_cfg = dict(env_cfg=dict(env_name="OpenCabinetDrawerMJC_val-v0"))
