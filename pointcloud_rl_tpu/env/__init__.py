from .api import Env, ExtendedEnv, FrameStackWrapper, TimeLimit, Wrapper, true_done
from .builder import (
    ENVS,
    EVALUATIONS,
    REPLAYS,
    ROLLOUTS,
    SAMPLING,
    WRAPPERS,
    build_env,
    build_evaluation,
    build_replay,
    build_rollout,
    build_vec_env,
    get_env_info,
)
from .device_replay import DeviceReplayMemory
from .dist_env import DistEnv
from .evaluation import Evaluation, save_eval_statistics
from .replay import ReplayMemory
from .rollout import Rollout
from .sampling_strategy import OneStepTransition, TStepTransition
from .spaces import Box, Discrete
from .vec_env import SingleEnv2VecEnv, UnifiedVectorEnvAPI, VectorEnv

__all__ = [
    "Env", "Wrapper", "ExtendedEnv", "TimeLimit", "FrameStackWrapper", "true_done",
    "ENVS", "ROLLOUTS", "EVALUATIONS", "REPLAYS", "SAMPLING", "WRAPPERS",
    "build_env", "build_vec_env", "build_rollout", "build_evaluation", "build_replay", "get_env_info",
    "DistEnv", "DeviceReplayMemory", "Evaluation", "save_eval_statistics", "ReplayMemory", "Rollout",
    "OneStepTransition", "TStepTransition", "Box", "Discrete",
    "SingleEnv2VecEnv", "UnifiedVectorEnvAPI", "VectorEnv",
]
