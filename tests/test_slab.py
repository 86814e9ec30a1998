"""Hierarchical slab kernel (ops/pallas_slab.py) vs the oracle.

The slab schedule replays the band kernel's garbage-creep argument at the
slab level (K passes per slab visit before moving on), with the sharded
variant's global-row forcing and an ownership mask for the per-step sums.
These tests pin: oracle agreement across slab boundaries and the y-wrap
(both edge slabs concatenate wrap rows), the forcing row landing in a
slab interior AND in neighbor slabs' halo copies, per-step sum uniqueness
(each global cell counted once across slabs), and the remainder tail.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.ops.pallas_slab import run_band_slab, slab_supported
from test_temporal import PARAMS, make_setup, oracle_run


@pytest.mark.parametrize("kpasses,sblock", [(1, 32), (2, 32), (2, 48)])
def test_slab_matches_oracle(kpasses, sblock):
    block, depth = 16, 8
    steps = kpasses * depth * 2  # two full generations
    params = dataclasses.replace(PARAMS, ny=96, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band_slab(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, depth, kpasses, sblock, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_slab_forcing_from_rest():
    """Forcing-only signal: row ny-2 sits in the LAST slab's owned rows and
    in the first slab's wrap halo — both copies must be forced (the
    global-row selector, not static offsets)."""
    import oracle

    params = dataclasses.replace(PARAMS, ny=64, max_iters=32)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    state = np.asarray(oracle.initial_state(params), np.float32)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band_slab(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        32, 16, 8, 2, 32, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 32)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_slab_remainder_tail():
    """n_iters not a multiple of K*T: the tail runs through the plain band
    kernel contract (full-row passes + single-step tail)."""
    params = dataclasses.replace(PARAMS, ny=96, max_iters=43)  # 32 + 8 + 3
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band_slab(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        43, 16, 8, 2, 32, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 43)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_slab_supported():
    assert slab_supported(96, 128, 16, 8, 2, 32)
    assert not slab_supported(96, 128, 16, 8, 2, 96)   # one slab = plain band
    assert not slab_supported(96, 128, 16, 8, 2, 40)   # ny % sblock
    assert not slab_supported(96, 128, 32, 8, 3, 32)   # 2KT % block
    assert not slab_supported(96, 128, 16, 8, 6, 32)   # KT > sblock
    # the production shape: 4096^2 f32, (64, 16), K=4, S=2048
    assert slab_supported(4096, 4096, 64, 16, 4, 2048)


def test_slab_backend_in_driver(monkeypatch):
    """run_simulation(backend='slab') resolves the config from the band
    picker + LBM_SLAB_* knobs and matches the reference backend."""
    from lbm_tpu.runtime.driver import run_simulation, slab_config

    params = dataclasses.replace(PARAMS, ny=96, max_iters=32)
    _, obstacles = make_setup(params)
    monkeypatch.setenv("LBM_ENABLE_SLAB", "1")  # quarantined backend
    monkeypatch.setenv("LBM_BAND_BLOCK", "16")
    monkeypatch.setenv("LBM_BAND_DEPTH", "8")
    monkeypatch.setenv("LBM_SLAB_K", "2")
    monkeypatch.setenv("LBM_SLAB_S", "32")
    assert slab_config(params, jnp.float32) == (16, 8, 2, 32)
    ref = run_simulation(params, obstacles, backend="reference")
    slab = run_simulation(params, obstacles, backend="slab")
    np.testing.assert_allclose(slab.cells, ref.cells, atol=3e-7)
    np.testing.assert_allclose(slab.av_vels, ref.av_vels, rtol=5e-5, atol=3e-8)


def test_slab_rejects_unsupported(monkeypatch):
    from lbm_tpu.runtime.driver import run_simulation

    monkeypatch.setenv("LBM_ENABLE_SLAB", "1")
    params = dataclasses.replace(PARAMS, ny=32)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    with pytest.raises(ValueError, match="slab"):
        run_simulation(params, obstacles, backend="slab")


def test_slab_quarantined_by_default(monkeypatch):
    """VERDICT r3 item 5: the slab kernel is a documented negative result;
    without LBM_ENABLE_SLAB=1 the backend errors loudly and the CLI does
    not list it."""
    from lbm_tpu.cli import build_parser
    from lbm_tpu.runtime.driver import run_simulation

    monkeypatch.delenv("LBM_ENABLE_SLAB", raising=False)
    params = dataclasses.replace(PARAMS, ny=96, max_iters=8)
    _, obstacles = make_setup(params)
    with pytest.raises(ValueError, match="quarantined"):
        run_simulation(params, obstacles, backend="slab")
    with pytest.raises(SystemExit):
        build_parser().parse_args(["a", "b", "--backend", "slab"])
    monkeypatch.setenv("LBM_ENABLE_SLAB", "1")
    args = build_parser().parse_args(["a", "b", "--backend", "slab"])
    assert args.backend == "slab"
