_base_ = ["../../../_base_/net_pn_dmc.py"]

env_cfg = dict(env_name="dmc_cheetah_run-v0")
