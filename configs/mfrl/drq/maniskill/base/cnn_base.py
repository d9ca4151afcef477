_base_ = ["../../../../_base_/net_cnn_maniskill.py"]

agent_cfg = dict(
    type="DrQ",
    num_aug=2,
    svea=False,
)
