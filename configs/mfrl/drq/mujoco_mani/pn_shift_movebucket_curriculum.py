# MoveBucketMJC carry-curriculum run: identical recipe to
# pn_shift_movebucket_300k.py except the target platform spawns 0.6-0.75 m
# from the bucket instead of the reference's 0.8-1.2 m
# (move_bucket.py:77-113).
#
# Why: the 100k seed-1000 run (work_dirs/movebucket_learn) learned the
# reach (0.39 -> 0.08 m) and lift (+0.06 m) stages but the carry stalled
# at bucket-to-platform 0.68 m with success 0 — expected at 1/10th of the
# reference's 1M budget.  Shortening the carry isolates the
# place-and-release tail of the staged ladder; the SUCCESS SEMANTICS are
# the full reference flags (ball_in_bucket AND bucket_above_platform AND
# bucket_standing AND bucket_static, with keep_good_steps hysteresis,
# move_bucket.py:335-356) — only the spawn geometry is eased.  0.6 is the
# closest collision-free platform spawn: the platform is a 0.25-half-extent
# box and the bucket spawns within +-0.15 m of the origin, so nearer
# ranges can overlap the bucket's settle footprint at reset.
_base_ = ["./pn_shift_movebucket_300k.py"]

env_cfg = dict(bucket_dist_range=[0.6, 0.75])
