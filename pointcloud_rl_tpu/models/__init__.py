"""Network zoo: flax modules built from registry configs.

Three registries mirror the reference's layer split (reference
``pyrl/networks/builder.py:6-8``): NETWORK for backbones/blocks, REGRESSION
for output heads, APPLICATION for actor/critic applications.  ``build_all``
dispatches over all three.
"""

from ..registry import Registry, build_from_cfg

NETWORK = Registry("network")
REGRESSION = Registry("regression")
APPLICATION = Registry("application")


def build_all(cfg, default_args=None):
    """Build a module (or list of modules) from whichever registry owns its type."""
    if cfg is None:
        return None
    if isinstance(cfg, (list, tuple)):
        return [build_all(c, default_args) for c in cfg]
    for reg in (NETWORK, REGRESSION, APPLICATION):
        if cfg.get("type") in reg.module_dict:
            return build_from_cfg(dict(cfg), reg, default_args)
    raise KeyError(f"Unknown model type: {cfg.get('type')}")


from . import blocks, cnn, heads, pointnet, rnn, vn, voxel  # noqa: E402,F401  (registration side effects)
from .actor_critic import ActorCriticModel, ContinuousActorDef, ContinuousCriticDef  # noqa: E402,F401
from .builder import build_actor_critic, init_actor_critic_params  # noqa: E402,F401
from .utils import get_kwargs_from_shape, replace_placeholder_with_args  # noqa: E402,F401

__all__ = [
    "NETWORK",
    "REGRESSION",
    "APPLICATION",
    "build_all",
    "ActorCriticModel",
    "ContinuousActorDef",
    "ContinuousCriticDef",
    "build_actor_critic",
    "init_actor_critic_params",
    "get_kwargs_from_shape",
    "replace_placeholder_with_args",
]
