# DrQ with a segmentation-aware random-downsample augmentation: the env
# emits a DENSE 2500-point cloud per frame (no ground/body budget split,
# ``num_ground=-1``) plus a ``filter_seg`` foreground mask, and the update
# subsamples each stacked frame to 512 points with a 292-point foreground
# budget INSIDE the jitted step — so every gradient step sees a fresh
# subsample of the same stored cloud.
#
# Parity target: reference configs/mfrl/drq/dm_control/pn_sample.py
# (n_points=2500/num_ground=-1 env, RandomDownSampleAndFilter 512/292
# over 3 stacked frames).  The reference never shipped the aug's
# implementation (config-referenced but absent, SURVEY.md §2.3); ours is
# ops/augment.py:RandomDownSampleAndFilter.
_base_ = ["./base/pn_base.py"]

agent_cfg = dict(
    obs_aug=dict(
        type="RandomDownSampleAndFilter",
        main_key="xyz",
        req_keys=["xyz", "rgb", "pos_encoding"],
        func_keys=["xyz", "filter_seg"],
        func_key_map='lambda _: _.split("_")[-1]',
        n_points=512,
        n_fg=292,
        stack_frame=3,
    ),
)

env_cfg = dict(
    env_name="dmc_cheetah_run-v0",
    num_ground=-1,
    n_points=2500,
)
