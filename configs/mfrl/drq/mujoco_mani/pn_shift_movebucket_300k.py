# MoveBucketMJC extended learning run: 300k steps toward the reference's
# 1M budget (reference README.md:73; round-3 100k run ended with the
# staged reward still climbing and success 0 — expected at that budget).
# Same TPU wall-clock recipe as pn_shift_opencabinetdoor_learn.py
# (HBM-resident f16 replay, packed f16 act uploads, bf16 matmuls, 8
# workers, reference 1:4 update:env-step ratio).
_base_ = ["./pn_shift_movebucket_learn.py"]

agent_cfg = dict(
    bf16=True,
    obs_transfer_cfg=dict(pack_dtype="float16"),
)

replay_cfg = dict(
    type="DeviceReplayMemory",
    transfer_cfg=dict(dtype_map=dict(xyz="float16", rgb="float16", seg="float16")),
)

rollout_cfg = dict(num_procs=8)

train_cfg = dict(
    n_steps=8,
    n_updates=2,
    total_steps=300000,
    n_checkpoint=25000,
    save_replay=25000,
)
