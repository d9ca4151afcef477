"""Model cost analysis via the XLA compiler (reference flops_counter role).

Instead of an mmcv-style per-module FLOPs registry, ask the compiler: lower
and compile the jitted function and read XLA's own cost analysis — exact for
the program that actually runs, covering fusion and padding effects.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile ``fn(*args)`` and return XLA's cost analysis dict
    (keys include 'flops', 'bytes accessed', 'transcendentals'...)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return dict(analysis or {})


def estimate_flops(fn: Callable, *args, **kwargs) -> float:
    return float(cost_analysis(fn, *args, **kwargs).get("flops", float("nan")))


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def model_report(module, obs, rngs: Optional[dict] = None) -> Dict[str, Any]:
    """Params + forward FLOPs/bytes for a flax module on an example input."""
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    variables = module.init(rngs, obs)
    analysis = cost_analysis(lambda v, o: module.apply(v, o), variables, obs)
    return {
        "params": count_params(variables),
        "flops": analysis.get("flops"),
        "bytes_accessed": analysis.get("bytes accessed"),
    }
