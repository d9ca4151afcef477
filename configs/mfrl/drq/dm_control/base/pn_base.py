# DrQ over the PointNet SAC networks: K=2 augmented copies, gamma follows
# the DrQ point-cloud paper setting.
_base_ = ["../../../../_base_/net_pn_dmc.py"]

agent_cfg = dict(
    type="DrQ",
    gamma=0.95,
    num_aug=2,
    svea=False,
)
