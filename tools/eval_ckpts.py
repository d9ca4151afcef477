"""Multi-checkpoint policy evaluation in ONE process (one act compile).

`tools/eval_walker_ckpts.sh` spawns a fresh `run_rl --evaluation` per
checkpoint, paying the act-program compile (~1-10 min on the tunneled
relay) three times.  This runner builds the env/evaluator/agent once and
loops `load_state_dict -> evaluator.run` over the checkpoints.

Usage:
  python tools/eval_ckpts.py <config.py> <run_dir> [--steps 100000 250000 500000]
      [--num 10] [--seed 1000] [--cfg-options k=v ...]

Writes work_dirs-style CSVs under <run_dir>/eval/statistics_<k>k.csv and
prints mean±std per checkpoint.
"""

from __future__ import annotations

import argparse
import csv
import os
import os.path as osp
import shutil
import statistics
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("run_dir")
    p.add_argument("--steps", type=int, nargs="+", default=[100000, 250000, 500000])
    p.add_argument("--num", type=int, default=None, help="episodes per checkpoint (default: eval_cfg.num or 10)")
    p.add_argument("--seed", type=int, default=0)
    from pointcloud_rl_tpu.config import Config, DictAction

    p.add_argument("--cfg-options", nargs="+", action=DictAction, default=None)
    args = p.parse_args()

    from pointcloud_rl_tpu.algorithms import build_agent
    from pointcloud_rl_tpu.apis.run_rl import _resolve_agent_placeholders
    from pointcloud_rl_tpu.env import build_evaluation, get_env_info
    from pointcloud_rl_tpu.utils.checkpoint import load_checkpoint
    from pointcloud_rl_tpu.utils.seeding import enable_compilation_cache, set_host_seed

    enable_compilation_cache()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    set_host_seed(args.seed)

    env_cfg = dict(cfg["env_cfg"])
    env_info = get_env_info(env_cfg)
    _resolve_agent_placeholders(cfg, env_info)

    eval_cfg = dict(cfg.get("eval_cfg", {}))
    merged_env = dict(env_cfg)
    merged_env.update(dict(eval_cfg.pop("env_cfg", {})))
    eval_cfg["env_cfg"] = merged_env
    eval_cfg.setdefault("seed", args.seed + 2**16)
    num = args.num if args.num is not None else int(eval_cfg.get("num", 10))
    eval_cfg["num"] = num
    eval_cfg["save_video"] = False
    evaluator = build_evaluation(eval_cfg)

    agent_cfg = dict(cfg["agent_cfg"])
    agent_cfg["env_params"] = env_info
    agent_cfg.setdefault("seed", args.seed)
    agent = build_agent(agent_cfg)
    agent.eval()

    out_dir = osp.join(args.run_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    try:
        for step in args.steps:
            ckpt = osp.join(args.run_dir, "models", f"model_{step}")
            if not osp.exists(ckpt):
                print(f"skip: {ckpt} missing", file=sys.stderr)
                continue
            agent.load_state_dict(load_checkpoint(ckpt, agent.state_dict()))
            scratch = osp.join(out_dir, f"_scratch_{step}")
            lens, rewards, finishes = evaluator.run(agent, num=num, work_dir=scratch)
            k = f"{step // 1000}k"
            dst = osp.join(out_dir, f"statistics_{k}.csv")
            src = osp.join(scratch, "statistics.csv")
            if osp.exists(src):
                shutil.copy(src, dst)
            else:  # assemble from returns if the evaluator didn't write one
                with open(dst, "w", newline="") as f:
                    w = csv.writer(f)
                    w.writerow(["length", "reward", "finish"])
                    for row in zip(lens, rewards, finishes):
                        w.writerow(row)
            shutil.rmtree(scratch, ignore_errors=True)
            mean = statistics.mean(rewards)
            std = statistics.stdev(rewards) if len(rewards) > 1 else 0.0
            print(f"== @{k}: eval {mean:.1f} +/- {std:.1f} over {len(rewards)} episodes", flush=True)
    finally:
        evaluator.close()


if __name__ == "__main__":
    main()
