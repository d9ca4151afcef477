"""CLI driver: config -> work dir -> env/agent construction -> training.

Parity target: reference ``pyrl/apis/run_rl.py`` — the user-facing entry
point and flags are preserved::

    python -m pointcloud_rl_tpu.apis.run_rl configs/mfrl/sac/dm_control/pn.py \
        --work-dir ./work_dirs --seed 1000 --cfg-options "env_cfg.env_name=..."

TPU design difference: instead of one OS process per GPU with NCCL DDP
(reference run_rl.py:495-502 mp.spawn), data parallelism is a
``jax.sharding.Mesh`` over local devices inside ONE process — the jitted
update runs SPMD with XLA-inserted gradient all-reduces (see parallel/).
``--num-gpus/--num-devices`` selects the data-parallel device count.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time
from copy import deepcopy
from typing import Optional

import numpy as np

from ..config import Config, DictAction
from ..utils import add_env_vars, enable_compilation_cache, get_logger, set_host_seed
from ..utils.checkpoint import find_checkpoint, load_checkpoint
from .train_rl import train_rl


def parse_args(args=None):
    parser = argparse.ArgumentParser(description="Train an RL agent (TPU-native)")
    parser.add_argument("config", help="config file path (.py with _base_ support)")
    parser.add_argument("--work-dir", default=None, help="directory to save logs and models")
    parser.add_argument("--seed", type=int, default=None, help="random seed")
    parser.add_argument("--cfg-options", nargs="+", action=DictAction, help="override config entries a.b=v")
    parser.add_argument("--evaluation", "--eval", dest="evaluation", action="store_true", help="eval only")
    parser.add_argument("--resume-from", default=None, help="checkpoint to resume from")
    parser.add_argument("--resume-keys-map", nargs="+", action=DictAction, default=None,
                        help="regex=replacement key rewrites applied to the restored checkpoint")
    parser.add_argument("--auto-resume", action="store_true", help="resume from latest checkpoint in work dir")
    parser.add_argument("--num-gpus", "--num-devices", dest="num_devices", type=int, default=None,
                        help="data-parallel device count (mesh axis size)")
    parser.add_argument("--gpu-ids", nargs="+", type=int, default=None, help="device indices (parity alias)")
    parser.add_argument("--debug", action="store_true", help="verbose numerics (jax_debug_nans)")
    parser.add_argument("--deterministic", action="store_true",
                        help="disable nondeterministic XLA optimizations (slower, bitwise-reproducible)")
    parser.add_argument("--reproducible", action="store_true",
                        help="require a clean git tree and record the commit (reference collect_env.py:139)")
    parser.add_argument("--clean-up", action="store_true", help="remove the work dir after finishing")
    parser.add_argument("--profile", type=int, default=0, metavar="N",
                        help="capture a jax.profiler trace of the first N training steps into <work_dir>/profile")
    return parser.parse_args(args)


def build_work_dir(cfg: Config, config_path: str, work_dir: Optional[str], seed: Optional[int]) -> str:
    """work_dirs/<config_name>[/seed] layout (reference run_rl.py:140-175)."""
    name = osp.splitext(osp.basename(config_path))[0]
    root = work_dir or osp.join("./work_dirs", name)
    if seed is not None:
        root = osp.join(root, str(seed))
    os.makedirs(root, exist_ok=True)
    return osp.abspath(root)


def _resolve_agent_placeholders(cfg: Config, env_info: dict) -> None:
    from ..models import get_kwargs_from_shape, replace_placeholder_with_args

    kwargs = get_kwargs_from_shape(env_info["obs_shape"], env_info["action_shape"])
    cfg["agent_cfg"] = replace_placeholder_with_args(cfg["agent_cfg"].to_dict() if hasattr(cfg["agent_cfg"], "to_dict") else dict(cfg["agent_cfg"]), **kwargs)


def main(args=None) -> None:
    add_env_vars()
    args = parse_args(args)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    # Honor JAX_PLATFORMS even when a sitecustomize pre-registered a device
    # plugin at interpreter start (observed: the axon TPU plugin forces
    # itself regardless of the env var, so `JAX_PLATFORMS=cpu python -m
    # ...run_rl` silently ran on the tunneled TPU).  jax.config wins over
    # the plugin's default as long as no backend has been initialized yet.
    _plat = os.environ.get("JAX_PLATFORMS", "")
    if _plat and "axon" not in _plat and "tpu" not in _plat:
        import jax

        jax.config.update("jax_platforms", _plat)

    enable_compilation_cache()
    seed = set_host_seed(args.seed)
    work_dir = build_work_dir(cfg, args.config, args.work_dir, args.seed)
    logger = get_logger("pcrl", work_dir=work_dir)
    logger.info(f"Work dir: {work_dir}; seed: {seed}")
    cfg.dump(osp.join(work_dir, time.strftime("%Y%m%d_%H%M%S") + "-config.py"))

    if args.debug:
        import jax

        jax.config.update("jax_debug_nans", True)
    if args.deterministic:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " --xla_gpu_deterministic_ops=true").strip()
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    if args.reproducible:
        from ..utils.collect_env import check_reproducibility, collect_env_info

        check_reproducibility(strict=True)
        logger.info(f"Env report: {collect_env_info()}")

    run(cfg, work_dir, seed, args)
    if args.clean_up:
        import shutil

        shutil.rmtree(work_dir, ignore_errors=True)


def run(cfg: Config, work_dir: str, seed: int, args) -> None:
    from ..algorithms import build_agent
    from ..env import build_evaluation, build_replay, build_rollout, get_env_info
    from ..loggers import build_exp_logger
    from ..parallel import init_distributed, is_lead_process, setup_data_parallel

    # multi-host: join the pod runtime when a coordinator is configured
    # (single-host runs are unaffected)
    if init_distributed():
        get_logger("pcrl").info("Joined multi-host jax runtime")

    logger = get_logger("pcrl")
    env_cfg = cfg["env_cfg"].to_dict() if hasattr(cfg["env_cfg"], "to_dict") else dict(cfg["env_cfg"])
    train_cfg = dict(cfg.get("train_cfg", {}))

    # env probe & placeholder resolution (reference run_rl.py:443-472)
    env_info = get_env_info(env_cfg)
    logger.info(f"Env info: obs={env_info['obs_shape']}, action={env_info['action_shape']}, discrete={env_info['is_discrete']}")
    _resolve_agent_placeholders(cfg, env_info)

    # replay / rollout / evaluator (reference run_rl.py:397-441)
    replay = build_replay(dict(cfg["replay_cfg"]), dict(seed=seed)) if "replay_cfg" in cfg else None
    # auxiliary buffers (reference run_rl.py:402-407): a demo/expert dataset
    # replay (HDF5-backed, possibly dynamically loaded) and a recent-
    # trajectory buffer for imitation-style objectives
    expert_replay = None
    if cfg.get("expert_replay_cfg"):
        ecfg = dict(cfg["expert_replay_cfg"])
        assert ecfg.get("buffer_filenames"), "expert_replay_cfg needs buffer_filenames"
        expert_replay = build_replay(ecfg, dict(seed=seed))
    recent_traj_replay = build_replay(dict(cfg["recent_traj_replay_cfg"]), dict(seed=seed)) \
        if cfg.get("recent_traj_replay_cfg") else None
    rollout = None
    if not args.evaluation and "rollout_cfg" in cfg:
        rollout_cfg = dict(cfg["rollout_cfg"])
        rollout_cfg.setdefault("env_cfg", env_cfg)
        rollout_cfg.setdefault("base_seed", seed)
        rollout = build_rollout(rollout_cfg)
    evaluator = None
    eval_num = None
    if "eval_cfg" in cfg:
        eval_cfg = dict(cfg["eval_cfg"])
        merged_env = deepcopy(env_cfg)
        merged_env.update(dict(eval_cfg.pop("env_cfg", {})))
        eval_cfg["env_cfg"] = merged_env
        eval_cfg.setdefault("seed", (seed or 0) + 2**16)
        eval_num = eval_cfg.get("num", 1)
        evaluator = build_evaluation(eval_cfg)

    # agent
    agent_cfg = dict(cfg["agent_cfg"])
    agent_cfg["env_params"] = env_info
    agent_cfg.setdefault("seed", seed)
    agent = build_agent(agent_cfg)
    logger.info(f"Agent: {agent_cfg['type']}, params: {agent.num_params:,}")

    # data-parallel mesh over (global) devices
    num_devices = args.num_devices or (len(args.gpu_ids) if args.gpu_ids else 1)
    if num_devices > 1:
        setup_data_parallel(agent, num_devices, replay=replay)
        logger.info(f"Data-parallel mesh over {num_devices} devices")

    # resume (reference run_rl.py:177-214)
    resume_steps = 0
    resume_path = args.resume_from
    if resume_path is None and args.auto_resume:
        resume_path, resume_steps = find_checkpoint(work_dir)
    if resume_path:
        logger.info(f"Resuming from {resume_path} (step {resume_steps})")
        agent.load_state_dict(load_checkpoint(resume_path, agent.state_dict(), keys_map=getattr(args, "resume_keys_map", None)))
        resume_steps = int(train_cfg.get("resume_steps", resume_steps))
        # warm-restore the replay if a snapshot sits next to the checkpoints
        snap = osp.join(work_dir, "models", "replay_latest.h5")
        if replay is not None and osp.exists(snap):
            replay.load_hdf5(snap)
            logger.info(f"Restored replay snapshot: {len(replay)} transitions")

    exp_logger_cfg = train_cfg.pop("exp_logger_cfg", dict(type="tensorboard"))
    if isinstance(exp_logger_cfg, dict):
        exp_logger_cfg = dict(exp_logger_cfg)
        exp_logger_cfg["log_dir"] = osp.join(work_dir, "logs")
    exp_logger = build_exp_logger(exp_logger_cfg)

    if args.evaluation:
        assert evaluator is not None, "--evaluation requires eval_cfg"
        agent.eval()
        evaluator.run(agent, num=eval_num, work_dir=osp.join(work_dir, "eval"))
        return

    try:
        train_rl(
            agent=agent,
            rollout=rollout,
            evaluator=evaluator,
            replay=replay,
            expert_replay=expert_replay,
            recent_traj_replay=recent_traj_replay,
            work_dir=work_dir,
            exp_logger=exp_logger,
            resume_steps=resume_steps,
            eval_num=eval_num,
            is_lead=is_lead_process(),
            profile_steps=getattr(args, "profile", 0),
            **{k: v for k, v in train_cfg.items() if k in (
                "total_steps", "warm_steps", "n_steps", "n_updates", "n_log",
                "n_eval", "n_checkpoint", "on_policy", "save_replay", "ep_stats_cfg",
                "stall_timeout",
            )},
        )
    finally:
        if rollout is not None:
            rollout.close()
        if evaluator is not None:
            evaluator.close()
        if exp_logger is not None:
            exp_logger.close()


if __name__ == "__main__":
    main()
