# ManiSkill-style training WITHOUT the SAPIEN simulator: the synthetic
# reach task emits the same segmented-pointcloud + robot-state observations.
_base_ = ["../../../_base_/net_pn_maniskill.py"]

env_cfg = dict(
    env_name="FakeManipulation-v0",
    ego_mode=False,
    reward_scale=1.0,
)

train_cfg = dict(total_steps=100000, n_steps=4)
