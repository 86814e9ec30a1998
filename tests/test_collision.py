"""The shared BGK collision (ops/collision.py): paired vs literal forms.

The paired form is an algebraic regrouping of the reference equilibrium
(kernels.cl:148-177) — it must agree with the literal form to f32
round-off, and the ``LBM_COLLIDE`` env knob must reach the kernel builds
(the oracle-agreement matrices in test_pallas/test_resident/test_temporal
run under the default and already gate the physics; this file pins the
equivalence and the dispatch plumbing).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.ops.collision import bgk_relax, moments, paired_default
from lbm_tpu.ops.pallas_step import _prepare_obstacles, lbm_step_pallas_interpret
from lbm_tpu.runtime.driver import run_simulation

PARAMS = LBMParams(
    nx=128, ny=32, max_iters=5, reynolds_dim=10, density=0.1, accel=0.005,
    omega=1.85,
)


def _random_planes(seed=0):
    rng = np.random.RandomState(seed)
    base = oracle.initial_state(PARAMS)
    t = (base * (1.0 + 0.05 * rng.rand(*base.shape))).astype(np.float32)
    return tuple(jnp.asarray(t[k]) for k in range(9))


def test_paired_matches_literal_to_roundoff():
    t = _random_planes()
    lit, usq_lit = bgk_relax(t, 1.85, paired=False)
    par, usq_par = bgk_relax(t, 1.85, paired=True)
    np.testing.assert_array_equal(np.asarray(usq_lit), np.asarray(usq_par))
    for k in range(9):
        np.testing.assert_allclose(
            np.asarray(par[k]), np.asarray(lit[k]), rtol=0, atol=5e-8
        )


def test_fused_matches_literal_to_roundoff():
    """The omega-folded fused form is a trace-time regrouping of the same
    arithmetic; it must agree with the literal form to f32 round-off and
    produce the identical u_sq reduction input up to round-off."""
    t = _random_planes()
    lit, usq_lit = bgk_relax(t, 1.85, paired=False)
    fus, usq_fus = bgk_relax(t, 1.85, paired="fused")
    np.testing.assert_allclose(
        np.asarray(usq_fus), np.asarray(usq_lit), rtol=0, atol=5e-9
    )
    for k in range(9):
        np.testing.assert_allclose(
            np.asarray(fus[k]), np.asarray(lit[k]), rtol=0, atol=1e-7
        )


def test_fused_moments_at_rest_velocity_exactly_zero():
    """The sum/difference CSE grouping must keep the at-rest exact-zero
    cancellation (opposite-pair planes are equal, so every difference is
    literal 0.0)."""
    from lbm_tpu.ops.collision import _moments_fused

    base = jnp.asarray(oracle.initial_state(PARAMS).astype(np.float32))
    t = tuple(base[k] for k in range(9))
    _, u_x, u_y, _ = _moments_fused(t)
    assert float(jnp.abs(u_x).max()) == 0.0
    assert float(jnp.abs(u_y).max()) == 0.0


def test_paired_matches_f64_literal_tightly():
    """All f32 forms must sit within f32 round-off of the f64 literal truth
    (the regroupings must not amplify error, only re-round)."""
    t32 = _random_planes()
    t64 = tuple(p.astype(jnp.float64) for p in t32)
    truth, _ = bgk_relax(t64, 1.85, paired=False)
    for paired in (False, True, "fused"):
        got, _ = bgk_relax(t32, 1.85, paired=paired)
        for k in range(9):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(truth[k]), rtol=0, atol=1.5e-7
            )


def test_moments_at_rest_velocity_exactly_zero():
    """The summation grouping cancels an at-rest state's velocity numerators
    to exactly 0.0 (d2q9-bgk.c:877-892 — final_state.dat prints literal
    0.000000000000E+00 fields from it)."""
    base = jnp.asarray(oracle.initial_state(PARAMS).astype(np.float32))
    t = tuple(base[k] for k in range(9))
    _, _, u_x, u_y, _ = moments(t)
    assert float(jnp.abs(u_x).max()) == 0.0
    assert float(jnp.abs(u_y).max()) == 0.0


def test_env_knob(monkeypatch):
    monkeypatch.delenv("LBM_COLLIDE", raising=False)
    assert paired_default() == "fused"  # round-4 default (bench_r4_fused)
    monkeypatch.setenv("LBM_COLLIDE", "literal")
    assert paired_default() is False
    monkeypatch.setenv("LBM_COLLIDE", "paired")
    assert paired_default() is True
    monkeypatch.setenv("LBM_COLLIDE", "fused")
    assert paired_default() == "fused"


def test_knob_reaches_kernel_build(monkeypatch):
    """One interpret-mode step per mode: results differ bitwise (different
    rounding proves the toggle reached the build) but agree to round-off."""
    rng = np.random.RandomState(3)
    base = oracle.initial_state(PARAMS)
    cells = jnp.asarray(
        (base * (1.0 + 0.05 * rng.rand(*base.shape))).astype(np.float32)
    )
    mask = np.zeros((PARAMS.ny, PARAMS.nx), dtype=np.int32)
    mask[0, :] = mask[-1, :] = 1
    nobst = _prepare_obstacles(jnp.asarray(mask), jnp.float32)

    out = {}
    for mode in ("literal", "paired", "fused"):
        monkeypatch.setenv("LBM_COLLIDE", mode)
        new_cells, _ = lbm_step_pallas_interpret(
            cells, nobst, PARAMS.density, PARAMS.accel, PARAMS.omega
        )
        out[mode] = np.asarray(new_cells)
    assert not np.array_equal(out["literal"], out["paired"])
    assert not np.array_equal(out["literal"], out["fused"])
    np.testing.assert_allclose(out["paired"], out["literal"], rtol=0, atol=5e-8)
    np.testing.assert_allclose(out["fused"], out["literal"], rtol=0, atol=2e-7)


def test_pallas_block_knob_rekeys_driver_jit_cache(monkeypatch):
    """Toggling LBM_PALLAS_BLOCK between two otherwise-identical
    run_simulation calls must build different kernels (same env-under-jit
    hazard as LBM_COLLIDE: the block height now travels as a static arg).
    Observable: the kernel-builder cache grows by one entry per block."""
    from lbm_tpu.ops import pallas_step

    params = LBMParams(
        nx=128, ny=48, max_iters=2, reynolds_dim=10, density=0.1,
        accel=0.005, omega=1.85,
    )
    obstacles = np.zeros((48, 128), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    sizes = []
    for blk in ("8", "16"):
        monkeypatch.setenv("LBM_PALLAS_BLOCK", blk)
        run_simulation(params, obstacles, backend="pallas")
        sizes.append(pallas_step._make_pallas_call.cache_info().currsize)
    assert sizes[1] == sizes[0] + 1, (
        "second block size reused the first trace's frozen kernel"
    )


@pytest.mark.parametrize("backend", ["pallas", "resident", "temporal"])
def test_knob_rekeys_driver_jit_cache(backend, monkeypatch):
    """Toggling LBM_COLLIDE between two otherwise-identical run_simulation
    calls must produce different programs. Regression: jit.lower() serves
    cached traces for repeated identical signatures, so the collide form has
    to travel as a static jit arg — an env read under the trace is frozen by
    whichever call runs first (found live: a whole TPU A/B session ran one
    program for both 'modes')."""
    params = LBMParams(
        nx=128, ny=16, max_iters=3, reynolds_dim=10, density=0.1,
        accel=0.005, omega=1.85,
    )
    obstacles = np.zeros((16, 128), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    out = {}
    for mode in ("literal", "paired", "fused"):
        monkeypatch.setenv("LBM_COLLIDE", mode)
        r = run_simulation(params, obstacles, backend=backend)
        out[mode] = np.asarray(r.cells)
    assert not np.array_equal(out["literal"], out["paired"])
    assert not np.array_equal(out["literal"], out["fused"])
    np.testing.assert_allclose(out["paired"], out["literal"], rtol=0, atol=5e-7)
    np.testing.assert_allclose(out["fused"], out["literal"], rtol=0, atol=1e-6)


@pytest.mark.parametrize("backend", ["aa", "temporal"])
def test_av_reduction_structures_agree(backend, monkeypatch):
    """The av-reduction structures (collision.av_fold: tree default,
    vec row-group partials, mxu idle-systolic-array row-sums at all three
    matmul precisions) must leave the STATE bit-identical (the reduction
    only reads u_sq) and keep the av_vels series within the f32
    reorder/round envelope — far inside the checker's 1% gate."""
    params = LBMParams(
        nx=128, ny=64, max_iters=4, reynolds_dim=10, density=0.1,
        accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(3)
    obstacles = (rng.rand(64, 128) < 0.05).astype(np.int32)
    out = {}
    for mode in ("fused", "fused-vecav", "fused-mxuav", "fused-mxuavdef"):
        monkeypatch.setenv("LBM_COLLIDE", mode)
        r = run_simulation(params, obstacles, backend=backend)
        out[mode] = (np.asarray(r.cells), np.asarray(r.av_vels))
    base_cells, base_av = out["fused"]
    for mode, (cells, av) in out.items():
        np.testing.assert_allclose(cells, base_cells, rtol=0, atol=0)
        np.testing.assert_allclose(av, base_av, rtol=2e-5)


def test_av_reduction_structures_agree_band2():
    """Same agreement through the band kernel family (direct run_band2 —
    the driver's band2_config rejects test-sized grids): the band fold
    slices non-sublane-aligned depth offsets, exercising av_fold's vec
    spill path and the mxu fold under the trapezoid schedule."""
    import dataclasses

    import jax.numpy as jnp

    from test_temporal import PARAMS, make_setup
    from lbm_tpu.ops.pallas_band2 import run_band2

    params = dataclasses.replace(PARAMS, ny=64, max_iters=19)
    state, obstacles = make_setup(params)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    out = {}
    for mode in ("fused", "fused-vecav", "fused-mxuav", "fused-mxuavdef"):
        cells, tot_u = run_band2(
            jnp.asarray(state), nobst, params.density, params.accel,
            params.omega, params.max_iters, 32, 8, interpret=True,
            paired=mode,
        )
        out[mode] = (np.asarray(cells), np.asarray(tot_u))
    base_cells, base_av = out["fused"]
    for mode, (cells, av) in out.items():
        np.testing.assert_allclose(cells, base_cells, rtol=0, atol=0)
        np.testing.assert_allclose(av, base_av, rtol=2e-5)


def test_av_route_shapes():
    """MXU av-reduction routing: only the measured-win AA shapes upgrade,
    and an explicitly pinned suffix always survives untouched."""
    from lbm_tpu.ops.collision import av_route

    assert av_route("fused", 1024, 1024) == "fused-mxuav"
    assert av_route("fused", 512, 512) == "fused"
    assert av_route("fused", 128, 128) == "fused"
    assert av_route("fused-treeav", 1024, 1024) == "fused-treeav"
    assert av_route(True, 1024, 1024) is True


def test_av_fold_vec_spill_path_ragged_rows():
    """av_fold's vec form spills sub-8-row tails to the scalar slot (band
    slices whose depth offset is not sublane-aligned). Pin the spill
    arithmetic against a plain masked sum on ragged tile heights."""
    from lbm_tpu.ops.collision import av_fold, av_total

    rng = np.random.RandomState(11)
    want = 0.0
    acc_vec = None
    acc_tree = None
    for h in (8, 13, 3, 24, 7):
        u_sq = jnp.asarray(rng.rand(h, 128).astype(np.float32))
        nob = jnp.asarray((rng.rand(h, 128) < 0.9).astype(np.float32))
        want += float(np.sum(np.asarray(nob) * np.sqrt(np.asarray(u_sq))))
        acc_vec = av_fold(acc_vec, nob, u_sq, "fused-vecav")
        acc_tree = av_fold(acc_tree, nob, u_sq, "fused")
    got_vec = float(av_total(acc_vec))
    got_tree = float(av_total(acc_tree))
    assert abs(got_vec - want) / want < 1e-5
    assert abs(got_tree - want) / want < 1e-5


def test_av_route_storage_gates():
    """bf16 AA builds were never probed with the embedded dot — the MXU
    upgrade must not reach them. c16 (int16) was probed round 5 at its
    one relay-compilable shape and won +4.8% (bench_r5_c16probe.json):
    routed at 1024² only."""
    from lbm_tpu.ops.collision import av_route

    assert av_route("fused", 1024, 1024, "bfloat16") == "fused"
    assert av_route("fused", 1024, 1024, "int16") == "fused-mxuav"
    assert av_route("fused", 1280, 1280, "int16") == "fused"
    assert av_route("fused", 1024, 1024, "float32") == "fused-mxuav"
