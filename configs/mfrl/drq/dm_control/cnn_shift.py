# DrQ's original image shift: pad 4 with edge values, random crop back.
_base_ = ["./base/cnn_base.py"]

agent_cfg = dict(
    obs_aug=[
        dict(type="RandomCrop", size=[84, 84], padding=4, padding_mode="edge"),
    ],
)

env_cfg = dict(env_name="dmc_cheetah_run-v0")
