# DrQ + PointNet on OpenCabinetDoor (MuJoCo, procedural cabinets; reference
# task mani_skill/env/open_cabinet_door_drawer.py:718-727, reference config
# configs/mfrl/drq/maniskill/pn_shift.py): per-level cabinet + target-link
# sampling, handle/link/robot segmentation, staged dense rewards, eval-flag
# hysteresis.  Swap env_name to OpenCabinetDrawerMJC_* for the drawer task.
_base_ = ["./pn_shift_movebucket.py"]

env_cfg = dict(env_name="OpenCabinetDoorMJC_train-v0")

eval_cfg = dict(env_cfg=dict(env_name="OpenCabinetDoorMJC_val-v0"))
