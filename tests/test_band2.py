"""Ref-resident band kernel (ops/pallas_band2.py) vs the oracle.

band2 replays the band garbage-creep schedule with the resident kernel's
step body (ping-pong VMEM scratch refs, tile-slice pulls, 1-row in-place
forcing). These tests pin: oracle agreement across fused passes and the
y-wrap, the forcing row's two gated static positions (owner mid row,
block-0 top margin), the remainder tail, bf16 storage, and the supported
predicate (even depth, block >= 2T).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.ops.pallas_band2 import band2_supported, run_band2
from test_temporal import PARAMS, make_setup, oracle_run


@pytest.mark.parametrize("block,depth", [(16, 8), (32, 8), (32, 16)])
def test_band2_matches_oracle(block, depth):
    steps = depth * 2 + 3  # two fused passes + a block-kernel tail
    params = dataclasses.replace(PARAMS, ny=64, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band2(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, depth, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band2_forcing_from_rest():
    """Forcing-only signal through full fused passes incl. the wrap copy
    (both gated forcing positions exercised)."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    state = np.asarray(oracle.initial_state(params), np.float32)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band2(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        16, 32, 16, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 16)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band2_bf16_storage_runs():
    params = dataclasses.replace(PARAMS, ny=64, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.bfloat16)
    cells, tot_u = run_band2(
        jnp.asarray(state, jnp.bfloat16), nobst,
        params.density, params.accel, params.omega,
        8, 16, 8, interpret=True,
    )
    assert cells.dtype == jnp.bfloat16
    want, want_tot = oracle_run(state, obstacles, params, 8)
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=5e-2)


def test_band2_tilew_override(monkeypatch):
    """LBM_BAND2_TILEW pins the step-tile height for scheduling sweeps:
    the state is bit-identical to the default pick (only the av-reduction
    tile boundaries move — summation-order low bits), and a height that
    does not divide the buffer W raises loudly."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    args = (jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, 8, 32, 8)
    cells0, tot0 = run_band2(*args, interpret=True)
    monkeypatch.setenv("LBM_BAND2_TILEW", "24")  # divides W = 32 + 16
    cells1, tot1 = run_band2(*args, interpret=True)
    assert np.array_equal(np.asarray(cells0), np.asarray(cells1))
    np.testing.assert_allclose(np.asarray(tot0), np.asarray(tot1), rtol=1e-5)
    monkeypatch.setenv("LBM_BAND2_TILEW", "20")  # 20 % 8 != 0
    with pytest.raises(ValueError, match="LBM_BAND2_TILEW"):
        run_band2(*args, interpret=True)


def test_band2_pipe2_bit_identical():
    """The pipe2 lever (two step-tiles' collide chains interleaved at
    trace time, collision.bgk_relax_interleaved) must be BIT-IDENTICAL
    to the base kernel: per-lane expression trees are unchanged, only
    the op emission order differs."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    args = (jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, 16, 32, 16)
    cells0, tot0 = run_band2(*args, interpret=True)
    cells1, tot1 = run_band2(*args, interpret=True, probe="pipe2")
    assert np.array_equal(np.asarray(cells0), np.asarray(cells1))
    np.testing.assert_allclose(np.asarray(tot0), np.asarray(tot1), rtol=0,
                               atol=0)


def test_band2_mxumom_matches_oracle():
    """The MXU moment-offload lever (collision.bgk_relax_mxumom): real
    physics, moments through a dot_general instead of the hand-grouped
    sums — oracle agreement at the usual band tolerance."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band2(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        16, 32, 16, interpret=True, probe="mxumom",
    )
    want, want_tot = oracle_run(state, obstacles, params, 16)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band2_attribution_probes_run():
    """The physics-wrong attribution tokens build and run (their results
    are meaningless by design — this pins only that each variant's
    kernel is well-formed, so a TPU probe session can't be stranded by a
    trace error)."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    for probe in ("noforce", "noav", "noshift", "nowhere", "nocollide",
                  "noforce,noav"):
        cells, tot_u = run_band2(
            jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, 8, 32, 8, interpret=True, probe=probe,
        )
        assert cells.shape == (9, params.ny, params.nx)
        assert np.isfinite(np.asarray(tot_u)).all() or "noav" in probe


def test_band2_probe_panel_rejected():
    params = dataclasses.replace(PARAMS, nx=256, ny=64, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    with pytest.raises(ValueError, match="full-row only"):
        run_band2(
            jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, 8, 16, 8, panel=128, interpret=True, probe="noav",
        )


def test_band2_supported():
    assert band2_supported(64, 128, 16, 8)
    assert not band2_supported(64, 128, 8, 8)     # block < 2T
    assert not band2_supported(64, 128, 16, 9)    # depth % 8
    assert not band2_supported(60, 128, 16, 8)    # ny % block
    # production shapes
    assert band2_supported(2048, 2048, 128, 16)
    assert band2_supported(4096, 4096, 64, 16)


def test_band2_panel_matches_oracle():
    """x-split panel variant: creep in both axes, panel-0 west wrap."""
    params = dataclasses.replace(PARAMS, nx=256, ny=64, max_iters=16)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    from lbm_tpu.ops.pallas_band2 import run_band2 as rb2

    cells, tot_u = rb2(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        16, 32, 8, panel=128, halo=128, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 16)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


# --- Clean-tile specialization (dirty_tiles + the dirty= kernel path) --------
# bench_r5_b2body.json attributes ~6.4% of the band2 step to the 9-plane
# obstacle select; tiles the HOST mask proves obstacle-free compile a
# select-free store and an unmasked |u| fold. Layout below: ny=96,
# block=24, depth=8, tile_w=8 (5 tiles x 4 blocks). Tile j of block i
# covers 8-row strip (3i + j - 1) mod 12, so obstacle rows
# {0, 24, 48, 72} (strips 0/3/6/9) make tiles 1 and 4 statically DIRTY
# for every block, row 9 (strip 1) makes tile 2 MIXED (block 0 only),
# and tiles 0 and 3 are statically CLEAN.


def _three_class_setup():
    params = dataclasses.replace(PARAMS, ny=96, max_iters=16)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[[0, 9, 24, 48, 72], :] = 1
    state = np.asarray(oracle.initial_state(params), np.float32)
    return params, state, obstacles


_THREE_CLASS_MAP = ((), (0, 1, 2, 3), (0,), (), (0, 1, 2, 3))


def test_band2_dirty_tiles_map(monkeypatch):
    from lbm_tpu.ops.pallas_band2 import dirty_tiles

    monkeypatch.setenv("LBM_BAND2_TILEW", "8")
    _, _, obstacles = _three_class_setup()
    assert dirty_tiles(obstacles, 24, 8) == _THREE_CLASS_MAP
    # tilew argument overrides the env the same way step_band2 resolves it
    assert dirty_tiles(obstacles, 24, 8, tilew="40") == ((0, 1, 2, 3),)
    # empty mask: every tile statically clean
    assert dirty_tiles(np.zeros_like(obstacles), 24, 8) == ((),) * 5


def test_band2_clean_tiles_bit_identical(monkeypatch):
    """dirty= vs the base kernel on a layout exercising all three tile
    classes: the state is BIT-identical (a clean tile's select collapses
    over an all-true mask; dirty/mixed tiles store the same expression)
    and the av-sums agree to summation-order low bits (per-tile SMEM
    partials vs the value-chain fold)."""
    from lbm_tpu.ops.pallas_band2 import dirty_tiles

    monkeypatch.setenv("LBM_BAND2_TILEW", "8")
    params, state, obstacles = _three_class_setup()
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    args = (jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, 16, 24, 8)
    cells0, tot0 = run_band2(*args, interpret=True)
    dirty = dirty_tiles(obstacles, 24, 8)
    assert dirty == _THREE_CLASS_MAP
    cells1, tot1 = run_band2(*args, interpret=True, dirty=dirty)
    assert np.array_equal(np.asarray(cells0), np.asarray(cells1))
    np.testing.assert_allclose(np.asarray(tot0), np.asarray(tot1), rtol=1e-5)


def test_band2_clean_tiles_match_oracle(monkeypatch):
    from lbm_tpu.ops.pallas_band2 import dirty_tiles

    monkeypatch.setenv("LBM_BAND2_TILEW", "8")
    params, state, obstacles = _three_class_setup()
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band2(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        16, 24, 8, interpret=True, dirty=dirty_tiles(obstacles, 24, 8),
    )
    want, want_tot = oracle_run(state, obstacles, params, 16)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band2_clean_tiles_empty_mask():
    """All-clean map (no obstacles anywhere): every tile compiles the
    select-free store; forcing still applies through nob=1 rows."""
    from lbm_tpu.ops.pallas_band2 import dirty_tiles

    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    state = np.asarray(oracle.initial_state(params), np.float32)
    nobst = jnp.ones((params.ny, params.nx), jnp.float32)
    dirty = dirty_tiles(obstacles, 32, 8)
    assert all(d == () for d in dirty)
    args = (jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, 16, 32, 8)
    cells0, tot0 = run_band2(*args, interpret=True)
    cells1, tot1 = run_band2(*args, interpret=True, dirty=dirty)
    assert np.array_equal(np.asarray(cells0), np.asarray(cells1))
    np.testing.assert_allclose(np.asarray(tot0), np.asarray(tot1), rtol=1e-5)


def test_band2_clean_panel_rejected():
    from lbm_tpu.ops.pallas_band2 import dirty_tiles

    params = dataclasses.replace(PARAMS, nx=256, ny=64, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    with pytest.raises(ValueError, match="full-row only"):
        run_band2(
            jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, 8, 16, 8, panel=128, interpret=True,
            dirty=dirty_tiles(obstacles, 16, 8),
        )
