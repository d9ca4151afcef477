_base_ = ["../../../../_base_/net_pn_maniskill.py"]

agent_cfg = dict(
    type="DrQ",
    num_aug=2,
    svea=False,
)
