_base_ = ["../../../../_base_/net_cnn_dmc.py"]

agent_cfg = dict(
    type="DrQ",
    gamma=0.95,
    batch_size=512,
    num_aug=2,
    svea=False,
)
