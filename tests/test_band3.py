"""In-place AA-pattern band kernel (ops/pallas_band3.py) vs the oracle.

band3 runs the band garbage-creep schedule on ONE scratch buffer with the
AA even/odd arrangement alternation and odd-scatter-fused forcing. These
tests pin: oracle agreement across fused passes (incl. the multi-pass
fusion boundary and the unfused final pass), the forcing row's two gated
positions through the S/C-space forms, the remainder tail, c16/bf16
storage, the panel variant, and the config pickers.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.ops.pallas_band3 import (
    band3_panel_supported,
    band3_supported,
    pick_config3,
    pick_config3_panel,
    run_band3,
)
from test_temporal import PARAMS, make_setup, oracle_run


@pytest.mark.parametrize("block,depth", [(16, 8), (32, 8), (32, 16)])
def test_band3_matches_oracle(block, depth):
    steps = depth * 3 + 3  # three fused passes (two fusion boundaries) + tail
    params = dataclasses.replace(PARAMS, ny=64, max_iters=steps)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band3(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        steps, block, depth, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, steps)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band3_single_pass():
    """npasses == 1: only the unfused (fuse_last=False) kernel runs."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band3(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        8, 16, 8, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 8)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band3_forcing_from_rest():
    """Forcing-only signal through full fused passes incl. the wrap copy:
    the block-0 top-margin (T-2) and owner (B+T-2) positions, the jnp
    pre-force, the fused odd-scatter forcing, and the unfused handoff all
    carry the signal — from-rest runs expose any forcing drift directly."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=32)
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    state = np.asarray(oracle.initial_state(params), np.float32)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band3(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        32, 32, 16, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 32)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band3_remainder_tail():
    """n_iters % T != 0: band passes then the single-step block kernel."""
    params = dataclasses.replace(PARAMS, ny=64, max_iters=19)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band3(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        19, 16, 8, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 19)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band3_c16_storage():
    from lbm_tpu.ops.devspace import DevSpec, decode_state, encode_state

    params = dataclasses.replace(PARAMS, ny=64, max_iters=16)
    state, obstacles = make_setup(params)
    spec = DevSpec.for_params(params.density, params.accel)
    dev = (*spec.bg, spec.h)
    q = encode_state(jnp.asarray(state), spec)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.int16)
    q2, tot_u = run_band3(
        q, nobst, params.density, params.accel, params.omega,
        16, 16, 8, interpret=True, dev=dev,
    )
    assert q2.dtype == jnp.int16
    cells = decode_state(q2, spec)
    want, want_tot = oracle_run(state, obstacles, params, 16)
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=2e-3)
    assert np.abs(np.asarray(cells) - want).max() < 2e-4 * np.abs(want).max()


def test_band3_bf16_storage_runs():
    params = dataclasses.replace(PARAMS, ny=64, max_iters=8)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.bfloat16)
    cells, tot_u = run_band3(
        jnp.asarray(state, jnp.bfloat16), nobst,
        params.density, params.accel, params.omega,
        8, 16, 8, interpret=True,
    )
    assert cells.dtype == jnp.bfloat16
    want, want_tot = oracle_run(state, obstacles, params, 8)
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=5e-2)


def test_band3_panel_matches_oracle():
    """x-split panel variant: creep in both axes, panel-0 west wrap, the
    fused forcing's source-row form (no extra x dependence)."""
    params = dataclasses.replace(PARAMS, nx=256, ny=64, max_iters=24)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    cells, tot_u = run_band3(
        jnp.asarray(state), nobst, params.density, params.accel, params.omega,
        24, 32, 8, panel=128, halo=128, interpret=True,
    )
    want, want_tot = oracle_run(state, obstacles, params, 24)
    assert np.abs(np.asarray(cells) - want).max() < 1e-5 * np.abs(want).max()
    np.testing.assert_allclose(np.asarray(tot_u), want_tot, rtol=1e-4)


def test_band3_supported():
    assert band3_supported(64, 128, 16, 8)
    assert not band3_supported(64, 128, 8, 8)     # block < 2T
    assert not band3_supported(64, 128, 16, 9)    # depth % 8
    assert not band3_supported(60, 128, 16, 8)    # ny % block
    assert band3_panel_supported(64, 256, 32, 8, 128)
    # production shapes
    assert band3_supported(2048, 2048, 256, 8)
    assert band3_supported(4096, 4096, 64, 8)


def test_pick_config3():
    # The picker minimizes redundancy within the ~90 MB compile budget:
    # the single scratch buys B=256 at 1536 wide (red 1.0625) where band2's
    # two-buffer schedule capped at B=128.
    assert pick_config3(1536, 1536) == (256, 8)
    b, t = pick_config3(2048, 2048)
    assert (b + 2 * t) / b <= 1.125
    assert pick_config3(4096, 4096) is not None
    assert pick_config3(128, 100) is None          # nx % 128
    cfg = pick_config3_panel(8192, 8192)
    assert cfg is not None and band3_panel_supported(8192, 8192, *cfg)


def test_pick_config3_env_override(monkeypatch):
    monkeypatch.setenv("LBM_BAND3_BLOCK", "64")
    monkeypatch.setenv("LBM_BAND3_DEPTH", "16")
    assert pick_config3(2048, 2048) == (64, 16)
    monkeypatch.setenv("LBM_BAND3_BLOCK", "7")     # unsupported
    assert pick_config3(2048, 2048) is None
