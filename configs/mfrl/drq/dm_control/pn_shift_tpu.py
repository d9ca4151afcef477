# The reference DrQ point-cloud protocol run (reference
# configs/mfrl/drq/dm_control/pn_shift.py: dmc_cheetah_run-v0, 500k steps,
# GlobalRotScaleTrans shift aug), shaped for TPU wall-clock exactly like
# the walker SAC protocol config (pn_walker_tpu.py): 16 pipelined env
# workers, 16:16 step:update cycles (the reference's 1:1 ratio), fused
# Pallas PointNet body, no in-training evals (checkpoints eval separately
# via --evaluation).
#
# Replay stores the glued bf16 model-input tensor (pack_features): the
# shift aug is xyz-only, so DrQ applies it directly to the packed tensor's
# xyz channel block in-jit (ops/augment.py:apply_augs_to_packed — measured
# 81 -> ~200 updates/s on v5e at walker shapes vs raw-dict storage).
_base_ = ["./pn_shift.py"]

agent_cfg = dict(
    actor_cfg=dict(nn_cfg=dict(visual_nn_cfg=dict(fused=True))),
    obs_transfer_cfg=dict(pos_encoding_on_device=True, pack_dtype="float16"),
)

replay_cfg = dict(transfer_cfg=dict(_delete_=True, pack_features=True))

# action_lag=1 (SEED-RL-style pipelined acting, rollout.py): the blocked
# device->host action fetch — the relay audit's binding term, ~25-48 ms of
# pure round-trip latency per group-step — overlaps env simulation instead
# of serializing before it.  The behavior policy is pi∘(one-step delay);
# the replay stores the actions actually applied, so the off-policy update
# is unchanged (validated: DrQ motivating drive learns identically, and
# walker seed 1000 continued past 220k under it with no return regression).
rollout_cfg = dict(num_procs=16, pipeline_groups=1, action_lag=1)

train_cfg = dict(
    n_steps=16,
    n_updates=16,
    n_eval=-1,
    # 25k: a relay wedge costs at most ~4 min of recollection; the protocol
    # eval grid (100k/250k/500k) is a superset of both cadences.
    n_checkpoint=25000,
    # Replay snapshots disabled on the tunneled relay: the 50k-row tail()
    # is a ~1.4 GB blocking device->host fetch, and big fetches are exactly
    # what wedges the relay session (observed twice, round 5: 33 min wedge
    # at 10:10, stall at the 200k checkpoint 11:03).  Cold chain-resumes
    # restore from the last snapshot on disk if one exists, else do an
    # off-budget policy refill.  Re-enable (save_replay=50000) on locally
    # attached chips where the fetch is a memcpy.
    save_replay=-1,
    total_steps=500000,
    # Stall watchdog (utils/watchdog.py): the tunneled relay can wedge a
    # device fetch forever (observed round 5: warm-up froze 19 min in a
    # futex wait, zero CPU, relay unreachable until the client was killed).
    # 900 s of no loop progress -> exit 3; chain_run.sh resumes warm.
    stall_timeout=900,
)
