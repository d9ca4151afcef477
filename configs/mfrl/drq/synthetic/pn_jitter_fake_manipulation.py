_base_ = ["../maniskill/base/pn_base.py"]

agent_cfg = dict(
    obs_aug=dict(
        type="RandomJitterPoints",
        main_key="xyz",
        req_keys=["xyz"],
        jitter_range=[-0.01, 0.01],
    ),
)

env_cfg = dict(
    env_name="FakeManipulation-v0",
    ego_mode=False,
    reward_scale=1.0,
)

train_cfg = dict(total_steps=100000, n_steps=4)
