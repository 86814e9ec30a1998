"""In-place AA-pattern resident kernel vs the oracle (TPU interpret mode).

The AA kernel advances the state in place in a single VMEM scratch buffer
(pallas_aa.py); these tests pin its numerics — both step parities, chunk
boundaries (even chunks keep the state resident-arranged; the final odd
chunk exits via the plane permutation), forcing, obstacles, and the
per-step reductions — against the float64 jnp oracle.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops import pallas_aa
from lbm_tpu.ops.pallas_aa import aa_supported, run_aa
from lbm_tpu.runtime.driver import run_simulation

PARAMS = LBMParams(
    nx=128, ny=16, max_iters=5, reynolds_dim=10, density=0.1, accel=0.005, omega=1.85
)


def make_setup(params, seed=3):
    rng = np.random.RandomState(seed)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    obstacles[rng.randint(1, params.ny - 1, 8), rng.randint(0, params.nx, 8)] = 1
    state = oracle.initial_state(params) * (1 + 0.05 * rng.rand(9, params.ny, params.nx))
    return state.astype(np.float32), obstacles


def oracle_run(state, obstacles, params, iters):
    want = state.astype(np.float64)
    tots = []
    for _ in range(iters):
        want, tu = oracle.step(want, obstacles, params.density, params.accel, params.omega)
        tots.append(tu)
    return want, tots


def test_aa_supported():
    assert aa_supported(512, 512)
    assert aa_supported(1536, 1536)  # 85 MB: beyond the ping-pong kernel
    assert not aa_supported(2048, 2048)  # 151 MB f32 > single-copy budget
    assert aa_supported(2048, 2048, jnp.bfloat16)  # 75.5 MB bf16 fits
    assert aa_supported(2048, 2048, jnp.int16)  # c16: same footprint as bf16
    assert not aa_supported(2944, 2944, jnp.int16)  # 156 MB > budget
    assert not aa_supported(100, 128)  # misaligned ny
    assert not aa_supported(16, 100)  # misaligned nx
    assert not aa_supported(512, 512, jnp.float64)


def test_aa_tile_picker_budgets():
    """Tile heights: plain ~24 MB temporaries when VMEM is plentiful,
    budgeted down near the relay compile ceiling, and falling BACK to the
    perf tile (not tile=8 / huge unrolls) beyond the ceiling where only a
    forced --backend aa on a standard toolchain can go."""
    assert pallas_aa._pick_tile(1024, 1024) == 272  # plentiful
    assert pallas_aa._pick_tile(1408, 1408) == 120  # budgeted under ceiling
    assert pallas_aa._pick_tile(1536, 1536) == 184  # beyond ceiling: perf tile
    # Fused collision form: near-cliff shapes clamp to the validated tile
    # (bench_r4_fusededge.json); smaller states keep the budgeted tile.
    assert pallas_aa._pick_tile(1408, 1408, fused=True) == 56
    assert pallas_aa._pick_tile(1280, 1280, fused=True) == \
        pallas_aa._pick_tile(1280, 1280)
    assert pallas_aa._pick_tile(1024, 1024, fused=True) == 272


@pytest.mark.parametrize("iters", [1, 2, 5])
def test_aa_matches_oracle(iters):
    """Odd totals exit via the C-arrangement plane permutation, even totals
    via unstream — both parities must match the oracle exactly."""
    params = PARAMS
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        iters, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, iters)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * scale
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_aa_fused_collision_matches_oracle():
    """The fused collision form through the AA kernel (both step parities):
    same oracle gate as the default form."""
    params = PARAMS
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        5, interpret=True, paired="fused",
    )
    want, want_tot = oracle_run(state, obstacles, params, 5)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * scale
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_aa_chunk_param(monkeypatch):
    """The ``chunk`` override (LBM_AA_CHUNK path, VERDICT r3 item 6): an
    explicit even chunk matches the oracle; odd chunks are rejected."""
    params = PARAMS
    state, obstacles = make_setup(params, seed=3)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        10, interpret=True, chunk=4,
    )
    want, want_tot = oracle_run(state, obstacles, params, 10)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)
    with pytest.raises(ValueError, match="even"):
        run_aa(jnp.asarray(state), nobst, params.density, params.accel,
               params.omega, 10, interpret=True, chunk=5)


@pytest.mark.parametrize("iters", [8, 11])
def test_aa_chunked(iters, monkeypatch):
    """Multi-chunk runs: the state stays streamed-arranged across even-length
    chunks; remainders of either parity convert back correctly."""
    monkeypatch.setattr(pallas_aa, "_CHUNK_STEPS", 4)
    params = PARAMS
    state, obstacles = make_setup(params, seed=11)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        iters, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, iters)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * scale
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


@pytest.mark.parametrize("iters,tile", [(2, 8), (3, 8), (3, 16)])
def test_aa_multi_tile(iters, tile, monkeypatch):
    """Force multiple row tiles (ny=24: 3x8, or ragged 16+8) so the odd
    step's cross-tile in-place reads/writes — including the periodic wrap
    rows and the short last tile — are exercised; per-(row, slot) ownership
    must make any tile order safe."""
    monkeypatch.setattr(
        pallas_aa, "_pick_tile", lambda ny, nx, itemsize=4, fused=False: tile
    )
    params = dataclasses.replace(PARAMS, ny=24)
    state, obstacles = make_setup(params, seed=7)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        iters, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, iters)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * scale
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_aa_backend_in_driver():
    """run_simulation(backend='aa') off-TPU runs the interpreter and matches
    the reference backend, av_vels included."""
    params = dataclasses.replace(PARAMS, max_iters=4)
    _, obstacles = make_setup(params)
    ref = run_simulation(params, obstacles, backend="reference")
    res = run_simulation(params, obstacles, backend="aa")
    scale = np.abs(ref.cells).max()
    assert np.abs(res.cells - ref.cells).max() < 1e-5 * scale
    np.testing.assert_allclose(res.av_vels, ref.av_vels, rtol=1e-4)


def test_aa_resume_reproduces_uninterrupted_run():
    """Chunk-boundary invariance: the R-arranged interface makes
    stop-at-k + resume bit-identical to an uninterrupted run (the entry/
    exit stream/permute conversions move data without arithmetic), for an
    odd split (C-exit) as well."""
    params = dataclasses.replace(PARAMS, max_iters=12)
    _, obstacles = make_setup(params, seed=5)
    full = run_simulation(params, obstacles, backend="aa")
    first5 = run_simulation(
        dataclasses.replace(params, max_iters=5), obstacles, backend="aa"
    )
    resumed = run_simulation(
        params, obstacles, backend="aa",
        initial_cells=first5.cells, start_step=5,
        av_vels_prefix=first5.av_vels,
    )
    np.testing.assert_allclose(resumed.cells, full.cells, rtol=0, atol=0)
    np.testing.assert_allclose(resumed.av_vels, full.av_vels, rtol=0, atol=0)


def test_aa_c16_resume_reproduces_uninterrupted_run():
    """c16 checkpoints store decoded f32 and resume re-encodes; since
    encode(decode(q)) == q exactly, stop-at-k + resume stays bit-identical
    to an uninterrupted c16 run."""
    params = dataclasses.replace(PARAMS, max_iters=12)
    _, obstacles = make_setup(params, seed=5)
    full = run_simulation(params, obstacles, backend="aa", dtype="c16")
    first5 = run_simulation(
        dataclasses.replace(params, max_iters=5), obstacles, backend="aa",
        dtype="c16",
    )
    resumed = run_simulation(
        params, obstacles, backend="aa", dtype="c16",
        initial_cells=first5.cells, start_step=5,
        av_vels_prefix=first5.av_vels,
    )
    np.testing.assert_allclose(resumed.cells, full.cells, rtol=0, atol=0)
    np.testing.assert_allclose(resumed.av_vels, full.av_vels, rtol=0, atol=0)


def test_aa_rejects_unsupported():
    params = dataclasses.replace(PARAMS, nx=100)
    with pytest.raises(ValueError, match="unsupported"):
        run_simulation(params, np.zeros((16, 100), np.int32), backend="aa")


def test_aa_bf16_smoke():
    """bf16 storage: rounds between steps (like the block kernel's bf16
    mode) — agreement is at bf16 resolution, not f32."""
    params = dataclasses.replace(PARAMS, max_iters=3)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        jnp.asarray(state, dtype=jnp.bfloat16), nobst,
        params.density, params.accel, params.omega, 3, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 3)
    scale = np.abs(want).max()
    assert cells.dtype == jnp.bfloat16
    assert np.abs(np.asarray(cells, np.float64) - want).max() < 0.03 * scale
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=0.03)


@pytest.mark.parametrize("iters", [2, 3])
def test_aa_c16_matches_oracle(iters):
    """c16 storage (int16 companded deviations): decode-after-load /
    encode-before-store around f32 physics. Agreement with the f64 oracle
    is at the companding resolution (~1e-5 of scale per step here), far
    inside the golden gate's 1%; both step parities exit correctly."""
    from lbm_tpu.ops.devspace import DevSpec, decode_state, encode_state

    params = PARAMS
    state, obstacles = make_setup(params)
    spec = DevSpec.for_params(params.density, params.accel)
    dev = (*spec.bg, spec.h)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        encode_state(jnp.asarray(state), spec), nobst,
        params.density, params.accel, params.omega, iters,
        interpret=True, dev=dev,
    )
    assert cells.dtype == jnp.int16
    decoded = np.asarray(decode_state(cells, spec))
    want, want_tot = oracle_run(state, obstacles, params, iters)
    scale = np.abs(want).max()
    assert np.abs(decoded - want).max() < 1e-3 * scale
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-3)


def test_aa_c16_requires_dev():
    state, obstacles = make_setup(PARAMS)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    with pytest.raises(ValueError, match="dev spec"):
        run_aa(
            jnp.zeros((9, PARAMS.ny, PARAMS.nx), jnp.int16), nobst,
            PARAMS.density, PARAMS.accel, PARAMS.omega, 2, interpret=True,
        )


def test_aa_c16_driver_matches_reference_c16():
    """--precision c16 --backend aa through the driver: agrees with the
    reference c16 path (same storage resolution, different rounding points:
    AA re-encodes its forcing rows) and returns decoded f32 state."""
    params = dataclasses.replace(PARAMS, max_iters=4)
    _, obstacles = make_setup(params)
    ref = run_simulation(params, obstacles, backend="reference", dtype="c16")
    res = run_simulation(params, obstacles, backend="aa", dtype="c16")
    scale = np.abs(ref.cells).max()
    assert np.abs(res.cells - ref.cells).max() < 1e-3 * scale
    np.testing.assert_allclose(res.av_vels, ref.av_vels, rtol=1e-3)


def test_aa_tile_override_validated(monkeypatch):
    """LBM_AA_TILE must be sublane-aligned (>= 8, multiple of 8): a bad value
    raises a clear error instead of a Mosaic failure (ADVICE r2)."""
    from lbm_tpu.ops.pallas_aa import _pick_tile

    monkeypatch.setenv("LBM_AA_TILE", "12")
    with pytest.raises(ValueError, match="multiple of 8"):
        _pick_tile(64, 128, 4)
    monkeypatch.setenv("LBM_AA_TILE", "4")
    with pytest.raises(ValueError, match="multiple of 8"):
        _pick_tile(64, 128, 4)
    monkeypatch.setenv("LBM_AA_TILE", "16")
    assert _pick_tile(64, 128, 4) == 16
