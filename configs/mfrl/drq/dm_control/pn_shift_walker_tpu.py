# DrQ pn_shift on walker_walk, 500k steps: the reference DrQ point-cloud
# protocol (reference configs/mfrl/drq/dm_control/pn_shift.py — its shipped
# env is cheetah_run) pointed at walker_walk so the flagship DrQ path has
# reference-protocol return evidence on the SAME task as the SAC walker
# 500k baseline (work_dirs/walker_500k) — a like-for-like SAC-vs-DrQ curve.
# TPU wall-clock recipe identical to pn_shift_tpu.py.
_base_ = ["./pn_shift_tpu.py"]

env_cfg = dict(env_name="dmc_walker_walk-v0")
