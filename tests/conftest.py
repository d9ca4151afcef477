"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere, so this sits at the top of
conftest (pytest imports conftest before test modules).
"""

import os

os.environ.setdefault("MUJOCO_GL", "egl")

# This machine's sitecustomize imports jax at interpreter startup and forces
# JAX_PLATFORMS=axon (tunneled TPU), so env vars are too late — switch the
# (lazily initialized) backend through jax.config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
