_base_ = ["../../../_base_/net_pn_maniskill.py"]

env_cfg = dict(env_name="PushChair_3001-v0")
