"""Hyper-parameter schedulers (reference pyrl/schedulers/custom_scheduler.py).

Config-driven step->value schedules usable for any scalar hyper-parameter,
plus optax learning-rate schedule construction for optimizers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .registry import Registry, build_from_cfg

SCHEDULERS = Registry("scheduler")


@SCHEDULERS.register_module(name="FixedScheduler")
@SCHEDULERS.register_module()
class Fixed:
    def __init__(self, value: float):
        self.value = value

    def get(self, step: int) -> float:
        return self.value

    __call__ = get


@SCHEDULERS.register_module(name="StepScheduler")
@SCHEDULERS.register_module()
class Step:
    """Multiply by gamma at each milestone step."""

    def __init__(self, value: float, milestones: Sequence[int], gamma: float = 0.1):
        self.value = value
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def get(self, step: int) -> float:
        v = self.value
        for m in self.milestones:
            if step >= m:
                v *= self.gamma
        return v

    __call__ = get


@SCHEDULERS.register_module(name="KeyStepScheduler")
@SCHEDULERS.register_module()
class KeyStep:
    """Piecewise-constant: explicit (step, value) pairs."""

    def __init__(self, keys: Sequence[int], values: Sequence[float]):
        assert len(keys) == len(values) and list(keys) == sorted(keys)
        self.keys, self.values = list(keys), list(values)

    def get(self, step: int) -> float:
        v = self.values[0]
        for k, val in zip(self.keys, self.values):
            if step >= k:
                v = val
        return v

    __call__ = get


@SCHEDULERS.register_module(name="LmbdaScheduler")
@SCHEDULERS.register_module()
class Lmbda:
    """value * fn(step) for a user-supplied callable or eval'able string."""

    def __init__(self, value: float, fn):
        self.value = value
        self.fn = eval(fn) if isinstance(fn, str) else fn  # noqa: S307 config-authored

    def get(self, step: int) -> float:
        return self.value * self.fn(step)

    __call__ = get


def build_scheduler(cfg, default_args=None):
    if cfg is None:
        return None
    if isinstance(cfg, (int, float)):
        return Fixed(float(cfg))
    return build_from_cfg(dict(cfg), SCHEDULERS, default_args)


def build_lr_schedule(cfg):
    """optax schedule from a scheduler config (for optimizer lr)."""
    import optax

    if cfg is None or isinstance(cfg, (int, float)):
        return cfg
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind in ("cosine", "CosineAnnealing"):
        return optax.cosine_decay_schedule(cfg["value"], cfg["decay_steps"], alpha=cfg.get("alpha", 0.0))
    if kind in ("linear", "LinearDecay"):
        return optax.linear_schedule(cfg["value"], cfg.get("end_value", 0.0), cfg["decay_steps"])
    if kind in ("exponential", "ExponentialDecay"):
        return optax.exponential_decay(cfg["value"], cfg["decay_steps"], cfg.get("gamma", 0.99))
    sched = build_scheduler(dict(type=kind, **cfg))
    return lambda step: sched.get(int(step))
