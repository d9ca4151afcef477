# PushChairMJC reach-curriculum run: identical recipe to
# pn_shift_pushchair_learn.py except the robot spawns 0.3-0.6 m beyond the
# chair instead of the reference's 0.8-1.2 m (push_chair.py:120-142).
#
# Why: the 100k seed-1000 run (work_dirs/pushchair_learn) showed the tilt
# gate passing but the stage-1 reach gate (mean EE-to-chair distance < 0.1,
# push_chair.py:265) never opening — the approach is ~2x MoveBucket's and
# the chair rolls away on its casters when bumped, so within 100k steps the
# policy plateaus at dist_ee ~0.25-0.5 m (see
# work_dirs/pushchair_learn/1000/stage_curve.txt).  Shortening the approach
# isolates the contact/hug skill; the staged ladder past stage 1 is
# unchanged, and eval still runs the reference placement (eval env_cfg
# does not override robot_init_range).
_base_ = ["./pn_shift_pushchair_learn.py"]

# 0.55 is the closest collision-free spawn (nearer ranges intersect the
# chair's caster star at reset and launch it during settling); this matches
# MoveBucket's 0.6-0.8 m approach, the reach distance the same robot DID
# learn within 100k (work_dirs/movebucket_learn).
env_cfg = dict(robot_init_range=[0.55, 0.7])
