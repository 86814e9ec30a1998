"""VMEM-resident multi-step kernel vs the oracle (interpret mode on CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops.pallas_resident import resident_supported, run_resident
from lbm_tpu.runtime.driver import run_simulation

PARAMS = LBMParams(
    nx=128, ny=32, max_iters=7, reynolds_dim=10, density=0.1, accel=0.005, omega=1.85
)


def make_setup(params, seed=3):
    rng = np.random.RandomState(seed)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    obstacles[rng.randint(1, params.ny - 1, 8), rng.randint(0, params.nx, 8)] = 1
    state = oracle.initial_state(params) * (1 + 0.05 * rng.rand(9, params.ny, params.nx))
    return state.astype(np.float32), obstacles


def test_resident_supported():
    assert resident_supported(512, 512)
    assert not resident_supported(2048, 2048)  # > VMEM budget
    assert not resident_supported(100, 128)  # misaligned
    assert not resident_supported(512, 512, jnp.bfloat16)
    assert resident_supported(1024, 1024)  # 36 MB state fits via row tiling


def test_resident_matches_oracle():
    params = PARAMS
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_resident(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        params.max_iters, interpret=True,
    )
    want = state.astype(np.float64)
    want_tot = []
    for _ in range(params.max_iters):
        want, tu = oracle.step(want, obstacles, params.density, params.accel, params.omega)
        want_tot.append(tu)
    scale = np.abs(want).max()
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * scale
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_resident_backend_in_driver():
    """run_simulation(backend='resident') off-TPU uses the interpreter and
    matches the reference backend, including av_vels and chunk remainders."""
    params = dataclasses.replace(PARAMS, max_iters=5)
    _, obstacles = make_setup(params)
    ref = run_simulation(params, obstacles, backend="reference")
    res = run_simulation(params, obstacles, backend="resident")
    np.testing.assert_allclose(res.cells, ref.cells, atol=3e-7)
    # atol: the kernels run the fused collision form by default (round 4)
    # while the jnp reference backend keeps the literal grouping — the tiny
    # re-rounding shows up as ~2e-9 absolute on the near-zero early av_vels.
    np.testing.assert_allclose(res.av_vels, ref.av_vels, rtol=1e-5, atol=1e-8)


def test_resident_rejects_unsupported():
    params = dataclasses.replace(PARAMS, nx=100)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    with pytest.raises(ValueError):
        run_simulation(params, obstacles, backend="resident")


@pytest.mark.parametrize("steps", [4, 7])
def test_resident_tiled_path_matches_oracle(steps, monkeypatch):
    """Force the ref-ping-pong tiled path (used for large states) and the
    multi-tile split, for both even (final copy) and odd step counts."""
    import lbm_tpu.ops.pallas_resident as PR

    monkeypatch.setattr(PR, "_VALUE_CARRY_BYTES", 0)
    monkeypatch.setattr(PR, "_CHUNK_STEPS", 6)
    PR._make_mega_call.cache_clear()
    params = dataclasses.replace(PARAMS, ny=32, max_iters=steps)
    state, obstacles = make_setup(params)
    # Tile smaller than ny to exercise cross-tile rows.
    monkeypatch.setattr(PR, "_pick_tile", lambda ny, nx: 8)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = PR.run_resident(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, interpret=True,
    )
    PR._make_mega_call.cache_clear()
    want = state.astype(np.float64)
    want_tot = []
    for _ in range(steps):
        want, tu = oracle.step(want, obstacles, params.density, params.accel, params.omega)
        want_tot.append(tu)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_resident_checkpoint_chunks_match_unchunked(tmp_path):
    """Resident backend under checkpoint chunking (chunk size not aligned to
    the kernel's internal 255-step chunks) reproduces the unchunked run."""
    params = dataclasses.replace(PARAMS, max_iters=11)
    _, obstacles = make_setup(params)
    full = run_simulation(params, obstacles, backend="resident")
    chunked = run_simulation(
        params, obstacles, backend="resident",
        checkpoint_every=4, checkpoint_path=str(tmp_path / "ck.npz"),
    )
    np.testing.assert_allclose(chunked.cells, full.cells, atol=1e-7)
    np.testing.assert_allclose(chunked.av_vels, full.av_vels, rtol=1e-6)
