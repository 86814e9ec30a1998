"""Deep state-view temporal kernel (ops/pallas_deep.py) vs the oracle.

The physics per fused step is shared with the halo-carry temporal kernel;
what these pin is the state-VIEW halo sourcing (two extra (9, T, nx)
BlockSpecs over the input with modular strip index maps), the wrap strips,
the T-aligned constraints, and the c16 composition.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops.pallas_deep import deep_supported, pick_config, run_deep
from test_temporal import PARAMS, make_setup, oracle_run


# Smoke row (16, 19) stays default (remainder tail + small block); the rest
# of the matrix is kernelmatrix-tiered (VERDICT r3 item 10).
@pytest.mark.parametrize(
    "block,steps",
    [
        pytest.param(16, 8, marks=pytest.mark.kernelmatrix),
        pytest.param(16, 16, marks=pytest.mark.kernelmatrix),
        (16, 19),
        pytest.param(32, 8, marks=pytest.mark.kernelmatrix),
        pytest.param(32, 16, marks=pytest.mark.kernelmatrix),
        pytest.param(32, 19, marks=pytest.mark.kernelmatrix),
    ],
)
def test_deep_t8_matches_oracle(block, steps):
    params = dataclasses.replace(PARAMS, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_deep(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, 8, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_deep_forcing_row_near_wrap():
    """Row ny-2 forcing through the wrap strips: uniform init (forcing is
    the only signal source) over a full depth-8 pass."""
    params = dataclasses.replace(PARAMS, max_iters=8)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    state = np.asarray(oracle.initial_state(params), np.float32)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_deep(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        8, 16, 8, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 8)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_deep_supported_constraints():
    f32, c16 = jnp.float32, jnp.int16
    assert deep_supported(32, 128, 16, 8, f32)
    assert not deep_supported(32, 128, 16, 4, f32)   # T below sublane tile
    assert not deep_supported(32, 128, 12, 8, f32)   # T must divide B
    assert not deep_supported(32, 120, 16, 8, f32)   # nx % 128
    assert deep_supported(64, 128, 32, 16, c16)
    assert deep_supported(64, 128, 32, 8, c16)   # sublane rule is mod-8


def test_pick_config(monkeypatch):
    b, t = pick_config(4096, 4096, jnp.float32)
    assert t == 8 and b % t == 0 and 4096 % b == 0
    b16, t16 = pick_config(4096, 4096, jnp.int16)
    assert t16 == 8 and b16 % 8 == 0
    monkeypatch.setenv("LBM_DEEP_BLOCK", "32")
    monkeypatch.setenv("LBM_DEEP_DEPTH", "8")
    assert pick_config(4096, 4096, jnp.float32) == (32, 8)
    monkeypatch.setenv("LBM_DEEP_BLOCK", "13")  # misaligned -> None
    assert pick_config(4096, 4096, jnp.float32) is None


@pytest.mark.kernelmatrix  # 12+ min in interpret mode; the c16 composition
# is default-covered by the temporal/band2/band3 c16 tests
def test_deep_c16_close_to_f32():
    """c16 composition: same pass structure, companded storage between
    passes (T=16 — the 16-bit strip minimum)."""
    from lbm_tpu.ops.devspace import DevSpec, decode_state, encode_state

    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    state, obstacles = make_setup(params)
    nobst_f = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    f32_cells, f32_tot = run_deep(
        jnp.asarray(state), nobst_f, params.density, params.accel,
        params.omega, 16, 32, 16, interpret=True,
    )
    spec = DevSpec.for_params(params.density, params.accel)
    dev = (*spec.bg, spec.h)
    q = encode_state(jnp.asarray(state), spec)
    nobst_i = (jnp.asarray(obstacles) == 0).astype(jnp.int16)
    c16_cells, c16_tot = run_deep(
        q, nobst_i, params.density, params.accel, params.omega,
        16, 32, 16, interpret=True, dev=dev,
    )
    full = np.asarray(decode_state(c16_cells, spec))
    np.testing.assert_allclose(full, np.asarray(f32_cells), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c16_tot), np.asarray(f32_tot),
                               rtol=3e-3)
