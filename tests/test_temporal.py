"""Temporally-blocked (2-steps-per-pass) kernel vs the oracle (interpret)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops.pallas_temporal import run_temporal

PARAMS = LBMParams(
    nx=128, ny=32, max_iters=6, reynolds_dim=10, density=0.1, accel=0.005, omega=1.85
)


def make_setup(params, seed=5):
    rng = np.random.RandomState(seed)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    obstacles[rng.randint(1, params.ny - 1, 10), rng.randint(0, params.nx, 10)] = 1
    state = oracle.initial_state(params) * (1 + 0.05 * rng.rand(9, params.ny, params.nx))
    return state.astype(np.float32), obstacles


@pytest.mark.parametrize("steps", [2, 6, 7])
@pytest.mark.parametrize("block", [8, 16, 32])
def test_temporal_matches_oracle(steps, block):
    params = dataclasses.replace(PARAMS, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_temporal(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, interpret=True,
    )
    want = state.astype(np.float64)
    want_tot = []
    for _ in range(steps):
        want, tu = oracle.step(want, obstacles, params.density, params.accel, params.omega)
        want_tot.append(tu)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_temporal_backend_in_driver():
    """run_simulation(backend='temporal') off-TPU interprets and matches the
    reference backend, including the odd-step tail."""
    from lbm_tpu.runtime.driver import run_simulation

    params = dataclasses.replace(PARAMS, max_iters=5)
    _, obstacles = make_setup(params)
    ref = run_simulation(params, obstacles, backend="reference")
    tmp = run_simulation(params, obstacles, backend="temporal")
    np.testing.assert_allclose(tmp.cells, ref.cells, atol=3e-7)
    np.testing.assert_allclose(tmp.av_vels, ref.av_vels, rtol=1e-5)


def test_temporal_rejects_unsupported():
    from lbm_tpu.runtime.driver import run_simulation

    params = dataclasses.replace(PARAMS, nx=100)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    with pytest.raises(ValueError):
        run_simulation(params, obstacles, backend="temporal")
