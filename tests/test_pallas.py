"""Fused Pallas kernel vs the jnp reference step (interpret mode on CPU).

The default storage/arithmetic is f32; agreement with the f32 jnp step is
required at ulp-level (same arithmetic, different schedule), per SURVEY.md
§7.4. The opt-in bf16 storage mode is checked for coarse agreement.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops.pallas_step import (
    _pick_block,
    _prepare_obstacles,
    lbm_step_pallas_interpret,
    pallas_supported,
)
from lbm_tpu.ops.reference import lbm_step_reference

PARAMS = LBMParams(
    nx=128, ny=64, max_iters=5, reynolds_dim=10, density=0.1, accel=0.005, omega=1.85
)


def make_state(params, seed=0):
    rng = np.random.RandomState(seed)
    base = oracle.initial_state(params)
    return jnp.asarray(
        (base * (1.0 + 0.05 * rng.rand(*base.shape))).astype(np.float32)
    )


def make_obstacles(params, seed=1):
    rng = np.random.RandomState(seed)
    mask = np.zeros((params.ny, params.nx), dtype=np.int32)
    mask[0, :] = mask[-1, :] = 1
    mask[rng.randint(1, params.ny - 1, 30), rng.randint(0, params.nx, 30)] = 1
    return jnp.asarray(mask)


def test_supported_shapes():
    assert pallas_supported(128, 128)
    assert pallas_supported(1024, 1024)
    assert pallas_supported(64, 128)
    assert not pallas_supported(128, 100)  # nx not lane-aligned
    assert not pallas_supported(100, 128)  # ny not sublane-aligned
    b = _pick_block(1024, 1024)
    assert b is not None and 1024 % b == 0 and b % 8 == 0


@pytest.mark.parametrize("steps", [1, 5])
@pytest.mark.parametrize("block", [None, 8, 16])
def test_pallas_matches_reference_f32(steps, block, monkeypatch):
    """Both the single-block fast path (block=None → heuristic) and the
    multi-block path (modular halo-slot index maps) must match the oracle."""
    if block is not None:
        monkeypatch.setenv("LBM_PALLAS_BLOCK", str(block))
    params = PARAMS
    obstacles = make_obstacles(params)
    nobst = _prepare_obstacles(obstacles, jnp.float32)
    c_ref = c_pal = make_state(params)
    for _ in range(steps):
        c_ref, t_ref = lbm_step_reference(
            c_ref, obstacles, params.density, params.accel, params.omega
        )
        c_pal, t_pal = lbm_step_pallas_interpret(
            c_pal, nobst, params.density, params.accel, params.omega
        )
    scale = float(jnp.max(jnp.abs(c_ref)))
    assert float(jnp.max(jnp.abs(c_ref - c_pal))) < 1e-5 * scale
    assert abs(float(t_ref) - float(t_pal)) < 1e-5 * float(t_ref)


def test_pallas_accelerate_row_only_owner_block(monkeypatch):
    """Acceleration must touch only global row ny-2 even when the lattice has
    several row blocks."""
    monkeypatch.setenv("LBM_PALLAS_BLOCK", "16")  # force the multi-block path
    params = dataclasses.replace(PARAMS, ny=128)
    obstacles = jnp.zeros((params.ny, params.nx), dtype=jnp.int32)
    nobst = _prepare_obstacles(obstacles, jnp.float32)
    cells = jnp.asarray(oracle.initial_state(params).astype(np.float32))
    ref, _ = lbm_step_reference(
        cells, obstacles, params.density, params.accel, params.omega
    )
    pal, _ = lbm_step_pallas_interpret(
        cells, nobst, params.density, params.accel, params.omega
    )
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-7)


def test_pallas_wrap_rows(monkeypatch):
    """Cross-block and wrap-around y-streaming: put markers on block-boundary
    rows and the global edges, compare against the reference step."""
    monkeypatch.setenv("LBM_PALLAS_BLOCK", "16")  # force the multi-block path
    params = dataclasses.replace(PARAMS, ny=64)
    obstacles = jnp.zeros((params.ny, params.nx), dtype=jnp.int32)
    nobst = _prepare_obstacles(obstacles, jnp.float32)
    state = oracle.initial_state(params).astype(np.float32)
    block = _pick_block(params.ny, params.nx)
    for row in (0, params.ny - 1, block - 1, block, 2 * block - 1):
        state[2, row % params.ny, 17] *= 1.5
        state[7, row % params.ny, 3] *= 0.7
    cells = jnp.asarray(state)
    ref, _ = lbm_step_reference(
        cells, obstacles, params.density, params.accel, params.omega
    )
    pal, _ = lbm_step_pallas_interpret(
        cells, nobst, params.density, params.accel, params.omega
    )
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-7)


def test_graft_entry_single_chip():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    out, tot = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
    assert np.isfinite(float(tot))


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_pallas_bf16_storage_mode():
    """Opt-in bf16 storage: f32 arithmetic in-kernel, halved HBM traffic.
    Coarse agreement with the f32 path (bf16 has an 8-bit mantissa)."""
    params = dataclasses.replace(PARAMS, ny=64)
    obstacles = make_obstacles(params)
    state32 = make_state(params)
    state16 = state32.astype(jnp.bfloat16)
    nob32 = _prepare_obstacles(obstacles, jnp.float32)
    nob16 = _prepare_obstacles(obstacles, jnp.bfloat16)
    c32, c16 = state32, state16
    for _ in range(3):
        c32, t32 = lbm_step_pallas_interpret(c32, nob32, PARAMS.density, PARAMS.accel, PARAMS.omega)
        c16, t16 = lbm_step_pallas_interpret(c16, nob16, PARAMS.density, PARAMS.accel, PARAMS.omega)
    assert c16.dtype == jnp.bfloat16
    rel = float(jnp.max(jnp.abs(c32 - c16.astype(jnp.float32)))) / float(jnp.max(jnp.abs(c32)))
    assert rel < 0.03
    assert abs(float(t32) - float(t16)) / float(t32) < 0.05
