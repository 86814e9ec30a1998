"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding path is exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

# Make the repo root importable regardless of how pytest was invoked.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np
import pytest

# The TPU-relay sitecustomize (when present) imports jax at interpreter start
# and pins jax_platforms via config, which overrides the env var — so force
# both knobs through jax.config before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Unit tests compare against a float64 oracle; explicit f32 dtypes elsewhere
# keep the production-precision paths exercised too.
jax.config.update("jax_enable_x64", True)

from lbm_tpu.models.d2q9 import LBMParams


@pytest.fixture
def params128():
    from lbm_tpu.io import read_params

    return read_params("/root/reference/input_128x128.params")


@pytest.fixture
def obstacles128(params128):
    from lbm_tpu.io import read_obstacles

    return read_obstacles("/root/reference/obstacles_128x128.dat", params128)


@pytest.fixture
def small_params():
    """A small non-square grid with a few obstacles for fast unit tests."""
    return LBMParams(
        nx=24, ny=16, max_iters=20, reynolds_dim=10, density=0.1, accel=0.005, omega=1.85
    )


@pytest.fixture
def small_obstacles(small_params):
    rng = np.random.RandomState(42)
    mask = np.zeros((small_params.ny, small_params.nx), dtype=np.int32)
    mask[0, :] = 1
    mask[-1, :] = 1
    mask[rng.randint(1, small_params.ny - 1, 10), rng.randint(0, small_params.nx, 10)] = 1
    return mask
