"""Band kernel (fixed-buffer in-kernel-loop deep blocking) vs the oracle."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops.pallas_band import (
    band_panel_supported,
    band_supported,
    pick_config,
    pick_config_panel,
    run_band,
)
from test_temporal import PARAMS, make_setup, oracle_run


@pytest.mark.parametrize("block,depth", [(16, 8), (32, 8), (32, 16)])
def test_band_matches_oracle(block, depth):
    steps = depth * 2 + 3  # two fused passes + a block-kernel tail
    params = dataclasses.replace(PARAMS, ny=64, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, depth, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band_forcing_from_rest():
    """Forcing-only signal through a full fused pass incl. the wrap copy."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    state = np.asarray(oracle.initial_state(params), np.float32)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        16, 32, 16, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 16)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band_rowforce_matches_broadcast_force():
    """LBM_BAND_ROWFORCE=1 (row-targeted dynamic_update_slice forcing) is
    numerically identical to the default full-buffer masked-FMA form: the
    broadcast form adds exactly 0.0 off the forcing row, so both paths
    produce the same bits on all-positive densities."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=19)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    run = lambda rf: run_band(  # noqa: E731
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        19, 32, 8, interpret=True, rowforce=rf,
    )
    cells_b, tot_b = run(False)
    cells_r, tot_r = run(True)
    np.testing.assert_array_equal(np.asarray(cells_b), np.asarray(cells_r))
    np.testing.assert_array_equal(np.asarray(tot_b), np.asarray(tot_r))


def test_band_unroll_matches_default():
    """LBM_BAND_UNROLL=2 only changes loop scheduling; the unrolled body
    licenses different FMA fusions, so agreement is ulp-level, not
    bitwise (measured max diff ~4e-8 on values ~0.045)."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    run = lambda u: run_band(  # noqa: E731
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        16, 32, 8, interpret=True, unroll=u,
    )
    cells_1, tot_1 = run(1)
    cells_2, tot_2 = run(2)
    np.testing.assert_allclose(
        np.asarray(cells_1), np.asarray(cells_2), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(tot_1), np.asarray(tot_2), rtol=1e-5
    )


def test_band_panel_rowforce_matches_oracle():
    """Panel variant with row-targeted forcing vs the oracle."""
    steps = 8 * 2 + 1
    params = dataclasses.replace(PARAMS, ny=64, nx=256, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, 16, 8, panel=128, halo=128, interpret=True, rowforce=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band_supported_and_pick():
    assert band_supported(64, 128, 32, 16)
    assert not band_supported(64, 128, 20, 10)   # depth % 8
    assert not band_supported(64, 128, 36, 12)
    # Min-redundancy policy (bench_r3_latency.json): 1536^2/2048^2 f32 both
    # resolve to (128, 16), red 1.25 — not the old deepest-T (192/128, 32).
    b, t = pick_config(1536, 1536, jnp.float32)
    assert (b, t) == (128, 16) and b % t == 0 and 1536 % b == 0
    assert pick_config(2048, 2048, jnp.float32) == (128, 16)
    assert pick_config(8, 120) is None


def test_band_backend_in_driver():
    """run_simulation(backend='band') off-TPU interprets and matches the
    reference backend, including the sub-depth tail."""
    from lbm_tpu.runtime.driver import run_simulation

    params = dataclasses.replace(PARAMS, ny=64, max_iters=20)
    _, obstacles = make_setup(params)
    ref = run_simulation(params, obstacles, backend="reference")
    band = run_simulation(params, obstacles, backend="band")
    np.testing.assert_allclose(band.cells, ref.cells, atol=3e-7)
    # f32 per-step sums are accumulated in a different order inside the
    # band pass; allow the extra reassociation slack.
    np.testing.assert_allclose(band.av_vels, ref.av_vels, rtol=5e-5)


@pytest.mark.parametrize("block,depth", [(16, 8), (32, 8)])
def test_band_panel_matches_oracle(block, depth):
    """x-split panel variant: 256-wide grid in two 128-column panels with
    128-column halos; two fused passes + a block-kernel tail."""
    steps = depth * 2 + 3
    params = dataclasses.replace(PARAMS, ny=64, nx=256, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, depth, panel=128, halo=128, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band_panel_supported_and_pick():
    assert band_panel_supported(64, 256, 32, 8, 128)
    assert not band_panel_supported(64, 256, 32, 8, 192)   # panel % 128
    assert not band_panel_supported(64, 256, 32, 8, 128, halo=64)
    assert not band_panel_supported(64, 384, 32, 8, 256)   # nx % panel
    # depth creep must stay inside the halo
    assert not band_panel_supported(1024, 8192, 512, 256, 2048)
    cfg = pick_config_panel(8192, 8192, jnp.float32)
    assert cfg is not None
    b, t, p = cfg
    assert band_panel_supported(8192, 8192, b, t, p)
    # full-width configs are pick_config's job, never the panel picker's
    assert all(pp < 8192 for pp in (p,))
    # The 8192^2 T16 shortcut applies to the full-grid kernel only; the
    # sharded pickers pass t16_special=False because their panel compile
    # probes covered T8 only (ADVICE r3).
    assert cfg[1] == 16
    no_special = pick_config_panel(8192, 8192, jnp.float32, t16_special=False)
    assert no_special is not None and no_special[1] == 8


def test_band_panel_backend_in_driver(monkeypatch):
    """Panel route through run_simulation(backend='band') matches the
    reference backend. Setting LBM_BAND_PANEL alone must make the
    full-row picker defer so band_config reaches pick_config_panel —
    the override-routing bug (full-row claimed the BLOCK/DEPTH pair and
    silently ignored the panel knob) burned the bench_r3_panelwidths
    probe session; no monkeypatching of pick_config may be needed."""
    from lbm_tpu.runtime.driver import band_config, run_simulation

    params = dataclasses.replace(PARAMS, ny=64, nx=256, max_iters=20)
    _, obstacles = make_setup(params)
    monkeypatch.setenv("LBM_BAND_BLOCK", "32")
    monkeypatch.setenv("LBM_BAND_DEPTH", "8")
    monkeypatch.setenv("LBM_BAND_PANEL", "128")
    assert band_config(params, jnp.float32) == (32, 8, 128)
    ref = run_simulation(params, obstacles, backend="reference")
    band = run_simulation(params, obstacles, backend="band")
    np.testing.assert_allclose(band.cells, ref.cells, atol=3e-7)
    np.testing.assert_allclose(band.av_vels, ref.av_vels, rtol=5e-5)


def test_band_rejects_unsupported():
    from lbm_tpu.runtime.driver import run_simulation

    # ny=32: no (block, depth) config satisfies ny % B == 0 with T >= 8
    # and T <= ny - 2 from pick_config's candidate set.
    params = dataclasses.replace(PARAMS, ny=32)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    with pytest.raises(ValueError, match="band"):
        run_simulation(params, obstacles, backend="band")


def test_band_config_override_routing(monkeypatch):
    """The env-override resolution rules (pinned after the
    bench_r3_panelwidths session compiled full-row configs while
    claiming to probe panel shapes):

    - LBM_BAND_PANEL set (alone or with BLOCK/DEPTH): full-row defers,
      band_config resolves a PANEL config honoring every set knob;
    - BLOCK/DEPTH without PANEL: full-row override, panel untouched.
    """
    from lbm_tpu.runtime.driver import band_config

    big = dataclasses.replace(PARAMS, ny=8192, nx=8192)
    monkeypatch.setenv("LBM_BAND_BLOCK", "128")
    monkeypatch.setenv("LBM_BAND_DEPTH", "8")
    monkeypatch.setenv("LBM_BAND_PANEL", "2048")
    assert band_config(big, jnp.float32) == (128, 8, 2048)

    monkeypatch.setenv("LBM_BAND_DEPTH", "16")  # deeper-T probe reachable
    assert band_config(big, jnp.float32) == (128, 16, 2048)

    monkeypatch.delenv("LBM_BAND_BLOCK")
    monkeypatch.delenv("LBM_BAND_DEPTH")
    odd = dataclasses.replace(PARAMS, ny=5120, nx=5120)
    monkeypatch.setenv("LBM_BAND_PANEL", "1280")  # panel-only override
    assert band_config(odd, jnp.float32) == (128, 8, 1280)

    monkeypatch.delenv("LBM_BAND_PANEL")
    small = dataclasses.replace(PARAMS, ny=1536, nx=1536)
    monkeypatch.setenv("LBM_BAND_BLOCK", "128")
    monkeypatch.setenv("LBM_BAND_DEPTH", "16")
    assert band_config(small, jnp.float32) == (128, 16, None)
