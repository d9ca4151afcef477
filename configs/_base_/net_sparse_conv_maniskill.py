_base_ = ["./net_pn_maniskill.py"]

# Voxelized sparse-conv encoder variant (torchsparse equivalent).

agent_cfg = dict(
    actor_cfg=dict(
        nn_cfg=dict(
            visual_nn_cfg=dict(
                _delete_=True,
                type="SparseCNN",
                in_channels="pcd_all_channel",
                mlp_spec=[64, 64, 128],
                voxel_size=0.05,
                out_channels=128,
            ),
        ),
    ),
)
