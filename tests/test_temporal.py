"""Temporally-blocked (T-steps-per-pass) kernel vs the oracle (interpret)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops.pallas_temporal import pick_block, run_temporal, temporal_supported

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


def oracle_run(state, obstacles, params, steps):
    want = state.astype(np.float64)
    want_tot = []
    for _ in range(steps):
        want, tu = oracle.step(want, obstacles, params.density, params.accel, params.omega)
        want_tot.append(tu)
    return want, want_tot


@pytest.mark.parametrize("steps", [2, 6, 7])
@pytest.mark.parametrize("block", [8, 16, 32])
def test_temporal_t2_matches_oracle(steps, block):
    params = dataclasses.replace(PARAMS, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_temporal(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, 2, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


# Smoke row (3, 4) stays default; the rest of the depth-3/4 matrix is
# kernelmatrix-tiered (VERDICT r3 item 10) — depth-4 driver coverage stays
# via test_temporal_backend_depth_env / test_temporal_backend_in_driver.
@pytest.mark.parametrize(
    "depth,steps",
    [
        (3, 4),
        pytest.param(3, 9, marks=pytest.mark.kernelmatrix),
        pytest.param(3, 11, marks=pytest.mark.kernelmatrix),
        pytest.param(4, 4, marks=pytest.mark.kernelmatrix),
        pytest.param(4, 9, marks=pytest.mark.kernelmatrix),
        pytest.param(4, 11, marks=pytest.mark.kernelmatrix),
    ],
)
def test_temporal_deep_matches_oracle(depth, steps):
    """Depth-3/4 fused passes, including remainder tails (VERDICT r1 #2)."""
    params = dataclasses.replace(PARAMS, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_temporal(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, 8, depth, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_temporal_single_block_wrap():
    """nblk == 1: both forcing sites (interior + wrap halo copy) live in the
    same block; depth up to 4 on a ny == block grid."""
    params = dataclasses.replace(PARAMS, ny=16, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_temporal(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        8, 16, 4, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 8)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_temporal_bf16_storage():
    """bf16 storage with f32 in-kernel arithmetic: agrees with a bf16-rounded
    oracle walk to bf16-resolution tolerances."""
    params = dataclasses.replace(PARAMS, max_iters=6)
    state, obstacles = make_setup(params)
    state16 = jnp.asarray(state, dtype=jnp.bfloat16)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.bfloat16)
    cells, tot_u = run_temporal(
        state16, nobst, params.density, params.accel, params.omega,
        6, 16, 2, interpret=True,
    )
    assert cells.dtype == jnp.bfloat16
    # bf16 storage rounds each step's output; compare against f64 at the
    # accumulated-rounding tolerance (~2^-8 per step).
    want, want_tot = oracle_run(state, obstacles, params, 6)
    rel = np.abs(np.asarray(cells, np.float64) - want).max() / np.abs(want).max()
    assert rel < 0.05
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=0.05)


def test_temporal_backend_in_driver():
    """run_simulation(backend='temporal') off-TPU interprets and matches the
    reference backend, including the odd-step tail."""
    from lbm_tpu.runtime.driver import run_simulation

    params = dataclasses.replace(PARAMS, max_iters=5)
    _, obstacles = make_setup(params)
    ref = run_simulation(params, obstacles, backend="reference")
    tmp = run_simulation(params, obstacles, backend="temporal")
    np.testing.assert_allclose(tmp.cells, ref.cells, atol=3e-7)
    np.testing.assert_allclose(tmp.av_vels, ref.av_vels, rtol=1e-5, atol=3e-8)


def test_temporal_backend_depth_env(monkeypatch):
    """LBM_TEMPORAL_DEPTH routes the driver through deeper fused passes."""
    from lbm_tpu.runtime.driver import run_simulation

    params = dataclasses.replace(PARAMS, max_iters=7)
    _, obstacles = make_setup(params)
    ref = run_simulation(params, obstacles, backend="reference")
    monkeypatch.setenv("LBM_TEMPORAL_DEPTH", "3")
    tmp = run_simulation(params, obstacles, backend="temporal")
    np.testing.assert_allclose(tmp.cells, ref.cells, atol=3e-7)
    np.testing.assert_allclose(tmp.av_vels, ref.av_vels, rtol=1e-5, atol=3e-8)


def test_temporal_rejects_unsupported():
    from lbm_tpu.runtime.driver import run_simulation

    params = dataclasses.replace(PARAMS, nx=100)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    with pytest.raises(ValueError):
        run_simulation(params, obstacles, backend="temporal")


def test_temporal_supported_predicate():
    assert temporal_supported(32, 128, 8, 2)
    assert temporal_supported(32, 128, 8, 4)
    assert not temporal_supported(32, 100, 8, 2)  # nx not lane-aligned
    assert not temporal_supported(30, 128, 8, 2)  # block does not divide ny
    assert not temporal_supported(32, 128, 8, 16)  # depth > block
    assert not temporal_supported(32, 128, 8, 2, jnp.bfloat16)  # bf16 tile 16
    assert temporal_supported(32, 128, 16, 2, jnp.bfloat16)
    assert pick_block(32, 128, 2) == 16
    assert pick_block(24, 128, 2) == 8
    assert pick_block(32, 128, 2, jnp.bfloat16) == 16
    assert pick_block(24, 128, 2, jnp.bfloat16) is None
