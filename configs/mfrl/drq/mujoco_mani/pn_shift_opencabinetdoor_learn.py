# OpenCabinetDoorMJC (single-arm A2) learning-evidence run: 100k steps of
# DrQ+PointNet with per-stage reward decomposition in the train logs
# (stage_index and the staged-gate quantities from
# env/cabinet_tasks.py:_dense_reward, reference
# mani_skill/env/open_cabinet_door_drawer.py:432-560).  Budgeted for the
# single tunneled chip: checkpoints every 10k + replay snapshots so a
# relay death costs at most one chunk.
_base_ = ["./pn_shift_opencabinetdoor.py"]

train_cfg = dict(
    total_steps=100000,
    n_checkpoint=10000,
    save_replay=25000,
    stall_timeout=1800,
    ep_stats_cfg=dict(
        info_keys_mode=dict(
            success=[True, "max", "all"],
            stage_index=[True, "max", "all"],
            open_extent_frac=[True, "max", "all"],
            ee_close_to_handle=[True, "max", "mean"],
            grasp_happen=[True, "max", "mean"],
            dist_ee_to_handle=[True, "min", "mean"],
        )
    ),
)
