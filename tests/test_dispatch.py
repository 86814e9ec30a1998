"""Auto-dispatch policy (driver.select_*): which kernel serves which regime.

The policy constants come from the round-2 measured A/Bs (BENCHMARKS.md,
bench_r2_tpu8/9/11/15.json): AA takes ALL f32 states <= 72 MB (it won the
value-carry regime 1.4x, 512^2-1024^2 by 3-17%, and the 40-72 MB
single-copy gap 1.75x over temporal) and bf16 states <= 20 MB (the
validated bf16 compile ceiling); the ping-pong resident kernel is
explicit-only (``--backend resident``); temporal covers f32 beyond AA's
auto ceiling and bf16 >= 1 GB (block wins the bf16 middle). These tests
pin the policy on a fake TPU platform so a dispatch change must be
deliberate."""

import dataclasses

import jax.numpy as jnp
import pytest

from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.runtime import driver


@pytest.fixture
def on_tpu(monkeypatch):
    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(driver.jax, "devices", lambda: [_Dev()])


def p(ny, nx):
    return LBMParams(
        nx=nx, ny=ny, max_iters=10, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )


def test_auto_f32_resident_range_picks_aa(on_tpu):
    # AA is the flagship for every f32 state <= 60 MB: it won every
    # same-session A/B (256^2 +40%, 512^2 +12-17%, 1024^2 +3% on the full
    # official config, 1280^2 +75% over temporal).
    for ny, nx in ((128, 128), (256, 128), (256, 256), (512, 512),
                   (1024, 1024), (1280, 1280)):
        assert driver.select_aa(p(ny, nx), "auto", jnp.float32) is False


def test_forced_resident_still_selectable(on_tpu):
    # The ping-pong kernel remains reachable as an explicit backend.
    assert driver.select_resident(p(1024, 1024), "resident", jnp.float32) is False


def test_auto_gap_picks_aa(on_tpu):
    # 1280^2 f32 = 59 MB: fits neither ping-pong nor the relay compile
    # ceiling excludes it; AA wins 1.75x over temporal.
    assert driver.select_aa(p(1280, 1280), "auto", jnp.float32) is False


def test_auto_beyond_aa_ceiling_uses_temporal(on_tpu):
    # 1536^2 f32 = 85 MB: above the relay-validated AA ceiling.
    assert driver.select_aa(p(1536, 1536), "auto", jnp.float32) is None
    assert driver.select_temporal(p(1536, 1536), "auto", jnp.float32) is False


def test_c16_aa_explicit_only(on_tpu):
    # c16 (int16) AA probed on TPU (bench_r3_aac16.json): 1024-wide works
    # but nx >= 1280 fails the relay helper like bf16-AA, so auto never
    # picks it; --backend aa accepts it at any supported size (2048^2 c16 =
    # 75.5 MB fits the single-copy budget).
    assert driver.select_aa(p(1024, 1024), "auto", jnp.int16) is None
    assert driver.select_aa(p(2048, 2048), "auto", jnp.int16) is None
    assert driver.select_aa(p(2048, 2048), "aa", jnp.int16) is False


def test_auto_bf16_aa_small_only(on_tpu):
    # bf16 AA wins +53-64% at validated sizes (<= 20 MB states); larger
    # bf16 states crash this toolchain's compile helper -> block kernel.
    assert driver.select_aa(p(256, 256), "auto", jnp.bfloat16) is False
    assert driver.select_aa(p(1024, 1024), "auto", jnp.bfloat16) is False
    assert driver.select_aa(p(1280, 1280), "auto", jnp.bfloat16) is None
    assert driver.select_temporal(p(1280, 1280), "auto", jnp.bfloat16) is None


def test_auto_bf16_temporal_above_1gb(on_tpu):
    # bf16 crossover (bench_r2_tpu14.json): block wins at 2048^2, the
    # temporal kernel wins at 8192^2 -> temporal only for >= 1 GB states.
    assert driver.select_temporal(p(2048, 2048), "auto", jnp.bfloat16) is None
    assert driver.select_temporal(p(8192, 8192), "auto", jnp.bfloat16) is False


def test_forced_aa_off_tpu_interprets():
    assert driver.select_aa(p(256, 256), "aa", jnp.float32) is True


def test_forced_aa_rejects_f64():
    with pytest.raises(ValueError, match="f32/bf16"):
        driver.select_aa(p(256, 256), "aa", jnp.float64)


def test_auto_bf16_temporal_capped_at_probed_width(on_tpu):
    # Only 8192-wide temporal compiles are validated on this toolchain
    # (T4/T6; other depths fail or hang) — wider bf16 grids stay on the
    # block kernel (ADVICE r2: auto caps stay at validated sizes).
    assert driver.select_temporal(p(8192, 16384), "auto", jnp.bfloat16) is None
    assert driver.select_temporal(p(16384, 8192), "auto", jnp.bfloat16) is False


def test_auto_deep_claims_validated_hbm_widths(on_tpu):
    # Round-3 policy (bench_r3_deep/validation.json): the deep state-view
    # kernel wins +26-40% over halo-carry temporal at every validated
    # width (2048/4096/8192) for f32 and c16; bf16 and unvalidated widths
    # keep their prior routes.
    assert driver.select_deep(p(2048, 2048), "auto", jnp.float32) is False
    assert driver.select_deep(p(4096, 4096), "auto", jnp.float32) is False
    assert driver.select_deep(p(8192, 8192), "auto", jnp.float32) is False
    assert driver.select_deep(p(4096, 4096), "auto", jnp.int16) is False
    assert driver.select_deep(p(2048, 2048), "auto", jnp.bfloat16) is None
    # 1536 joined the deep range as the fallback behind the band kernel
    # (run_simulation consults select_band first; deep serves the width
    # only if band's pick_config has no fitting config there).
    assert driver.select_deep(p(1536, 1536), "auto", jnp.float32) is False
    assert driver.select_deep(p(8192, 16384), "auto", jnp.float32) is None
    assert driver.select_deep(p(1024, 1024), "auto", jnp.float32) is None


def test_forced_deep():
    assert driver.select_deep(p(2048, 2048), "deep", jnp.float32) is True
    with pytest.raises(ValueError, match="f32/bf16/c16"):
        driver.select_deep(p(2048, 2048), "deep", jnp.float64)


def test_auto_band_claims_hbm_widths(on_tpu):
    # Round-3 policy (bench_r3_band.json): the band kernel (fixed-buffer
    # deep blocking, in-kernel T=16-32 step loop) beats the deep kernel at
    # every width where a config fits VMEM — 1536^2 7,423 vs 6,701 (+70%
    # over the old temporal route), 2048^2 6,825 vs 6,019, 4096^2 10,333
    # vs 9,943. At 8192-wide no FULL-ROW config fits but the x-split panel
    # variant is compile-probed and wins in-session (bench_r3_panel8192b:
    # f32 9,018 / c16 10,534 vs deep 2,871), so auto claims it there too.
    assert driver.select_band(p(1536, 1536), "auto", jnp.float32) is False
    assert driver.select_band(p(2048, 2048), "auto", jnp.float32) is False
    assert driver.select_band(p(4096, 4096), "auto", jnp.float32) is False
    assert driver.select_band(p(1536, 1536), "auto", jnp.int16) is False
    assert driver.select_band(p(8192, 8192), "auto", jnp.float32) is False
    assert driver.select_band(p(8192, 8192), "auto", jnp.int16) is False
    # Panel widths re-probed clean (bench_r3_panelwidths2.json): 5120/
    # 6144/7168 compile and run >= deep same-session — auto claims them.
    assert driver.select_band(p(5120, 5120), "auto", jnp.float32) is False
    assert driver.select_band(p(6144, 6144), "auto", jnp.float32) is False
    assert driver.select_band(p(7168, 7168), "auto", jnp.float32) is False
    # ... but unprobed panel widths stay with deep/temporal in auto.
    assert driver.select_band(p(9216, 9216), "auto", jnp.float32) is None
    assert driver.select_band(p(2048, 2048), "auto", jnp.bfloat16) is None
    assert driver.select_band(p(1024, 1024), "auto", jnp.float32) is None


def test_forced_band():
    assert driver.select_band(p(2048, 2048), "band", jnp.float32) is True
    with pytest.raises(ValueError, match="f32/bf16/c16"):
        driver.select_band(p(2048, 2048), "band", jnp.float64)


def test_auto_band2_claims_validated_matrix(on_tpu):
    # Round-3 policy: band2 (ref-resident step body on the band schedule)
    # outran band/panel at EVERY TPU-validated shape (bench_r3_band2*.json,
    # bench_r3_c16wides.json), so auto routes it wherever the resolved
    # config matches a validated compile. f32: full-row 1536-4096, panels
    # 5120-8192. c16: full-row 1536-6144 (half-size buffers fit full-row
    # where f32 needs panels), panels 7168/8192.
    for n in (1536, 2048, 3072, 4096, 6144, 7168, 8192):
        assert driver.select_band2(p(n, n), "auto", jnp.float32) is False, n
        assert driver.select_band2(p(n, n), "auto", jnp.int16) is False, n
    # 5120^2 f32 went band3 mid-round-4 (bench_r4_wide_chunk2.json) and
    # came BACK to band2-panel with the fused collision default: the
    # band3 full-row kernel no longer survives the relay compile and
    # panel-band2-fused beats band3-paired in-session
    # (bench_r4_fusededge.json 13,252 vs 10,808). c16 keeps band2.
    assert driver.select_band2(p(5120, 5120), "auto", jnp.float32) is False
    assert driver.select_band2(p(5120, 5120), "auto", jnp.int16) is False
    # f32 within AA's auto ceiling defers to AA; c16 does NOT (c16 AA is
    # explicit-only, so band2 takes 1536^2 c16 at 42.5 MB).
    assert driver.select_band2(p(1024, 1024), "auto", jnp.float32) is None
    # bf16 and unprobed widths keep their prior routes.
    assert driver.select_band2(p(2048, 2048), "auto", jnp.bfloat16) is None
    assert driver.select_band2(p(9216, 9216), "auto", jnp.float32) is None


def test_forced_band2():
    assert driver.select_band2(p(2048, 2048), "band2", jnp.float32) is True
    with pytest.raises(ValueError, match="f32/bf16/c16"):
        driver.select_band2(p(2048, 2048), "band2", jnp.float64)


def test_auto_band3_claims_fullrow_where_band2_panels(on_tpu):
    # Round-4 history: band3's full-row config claimed 5120^2 f32 under
    # the paired form (+6.5%, bench_r4_wide_chunk2.json), then lost the
    # claim when the fused default landed — its B64 full-row kernel fails
    # the relay compile and band2-panel-fused wins in-session
    # (bench_r4_ladder.json / bench_r4_fusededge.json). On the relay
    # profile band3 is explicit-only everywhere now.
    assert driver.select_band3(p(5120, 5120), "auto", jnp.float32) is None
    # band2 full-row widths stay band2 (parity-or-better, r4 A/B)...
    for n in (1536, 2048, 3072, 4096):
        assert driver.select_band3(p(n, n), "auto", jnp.float32) is None, n
    # ...and so do panel-vs-panel widths (band2's T16 panel won 8192^2)
    # and the relay-unprobed band3 full-row c16 shapes.
    assert driver.select_band3(p(8192, 8192), "auto", jnp.float32) is None
    assert driver.select_band3(p(6144, 6144), "auto", jnp.float32) is None
    assert driver.select_band3(p(7168, 7168), "auto", jnp.int16) is None
    assert driver.select_band3(p(5120, 5120), "auto", jnp.bfloat16) is None


def test_auto_band3_requires_tpu_platform():
    # On CPU/interpret platforms auto never picks band3 (same contract as
    # every other auto kernel route).
    assert driver.select_band3(p(5120, 5120), "auto", jnp.float32) is None


def test_standard_band3_claims_structural_rule(on_tpu, std):
    # LBM_TOOLCHAIN=standard claims the rule itself: any f32/c16 grid
    # where band3 resolves full-row and band2 would panel.
    assert driver.select_band3(p(5120, 5120), "auto", jnp.float32) is False
    assert driver.select_band3(p(7168, 7168), "auto", jnp.int16) is False
    assert driver.select_band3(p(9216, 9216), "auto", jnp.int16) is False
    assert driver.select_band2(p(7168, 7168), "auto", jnp.int16) is None
    # panel-vs-panel stays band2 even on standard (measured at 8192^2).
    assert driver.select_band3(p(9216, 9216), "auto", jnp.float32) is None
    assert driver.select_band2(p(9216, 9216), "auto", jnp.float32) is False


# --- LBM_TOOLCHAIN=standard: relay caps lifted to the design limits ------
# (VERDICT r3 item 3: the relay tables encode THIS mount's broken compile
# helper; a stock libtpu toolchain routes by each kernel's own capability
# check instead.)


@pytest.fixture
def std(monkeypatch):
    monkeypatch.setenv("LBM_TOOLCHAIN", "standard")


def test_toolchain_validates(monkeypatch):
    assert driver.toolchain() == "relay"  # default
    monkeypatch.setenv("LBM_TOOLCHAIN", "standard")
    assert driver.toolchain() == "standard"
    monkeypatch.setenv("LBM_TOOLCHAIN", "cuda")
    with pytest.raises(ValueError, match="LBM_TOOLCHAIN"):
        driver.toolchain()


def test_standard_aa_claims_design_regime(on_tpu, std):
    # f32 AA extends to the full aa_supported budget (100 MB state):
    # 1536^2 = 85 MB claims; 2048^2 = 144 MB exceeds the single-copy VMEM
    # budget on any toolchain.
    assert driver.select_aa(p(1536, 1536), "auto", jnp.float32) is False
    assert driver.select_aa(p(2048, 2048), "auto", jnp.float32) is None
    # 16-bit AA has no width cap off the relay: c16 residency doubles the
    # resident grid area (2048^2 c16 = 75.5 MB).
    assert driver.select_aa(p(2048, 2048), "auto", jnp.int16) is False
    assert driver.select_aa(p(1280, 1280), "auto", jnp.bfloat16) is False


def test_standard_band2_claims_any_resolved_config(on_tpu, std):
    # No per-shape compile tables: any resolved f32/c16 schedule routes
    # band2 (beyond the AA-resident regime), including widths this mount
    # never probed.
    assert driver.select_band2(p(9216, 9216), "auto", jnp.float32) is False
    assert driver.select_band2(p(2048, 2048), "auto", jnp.float32) is False
    # ... but where AA's standard policy claims the run, band2 defers:
    # 2048^2 c16 is VMEM-resident on a standard toolchain.
    assert driver.select_band2(p(2048, 2048), "auto", jnp.int16) is None
    assert driver.select_band2(p(8192, 8192), "auto", jnp.int16) is False
    # bf16 stays explicit-only under every profile (golden-gate hazard).
    assert driver.select_band2(p(2048, 2048), "auto", jnp.bfloat16) is None


def test_standard_band_and_deep_lift_width_caps(on_tpu, std):
    assert driver.select_band(p(9216, 9216), "auto", jnp.float32) is False
    assert driver.select_deep(p(8192, 16384), "auto", jnp.float32) is False


def test_standard_temporal_bf16_lifts_width_cap(on_tpu, std):
    assert driver.select_temporal(p(8192, 16384), "auto", jnp.bfloat16) is False


def test_standard_relay_default_unchanged(on_tpu):
    # Without the env knob the relay tables still govern (the validated-
    # sizes invariant).
    assert driver.select_aa(p(1536, 1536), "auto", jnp.float32) is None
    assert driver.select_band2(p(9216, 9216), "auto", jnp.float32) is None


def test_band3_config_prefers_lower_total_redundancy():
    # band3_config compares full-row (B+2T)/B against the panel's
    # (B+2T)/B * (P+2H)/P and takes the smaller (ties -> full-row):
    # at 5120^2 the full-row (64,8) = 1.25 beats the best panel; at
    # 6144-8192 the full-row budget forces B<=64 while a wide-block
    # panel wins (driver.band3_config, DESIGN.md band3 section).
    for n, expect_panel in ((2048, False), (5120, False), (6144, True),
                            (7168, True), (8192, True)):
        cfg = driver.band3_config(p(n, n), jnp.float32)
        assert cfg is not None, n
        b, t, panel = cfg
        assert (panel is not None) == expect_panel, (n, cfg)
        red_full = (b + 2 * t) / b
        if panel is not None:
            assert red_full * (panel + 256) / panel < 1.5, (n, cfg)


# --- LBM_TOOLCHAIN=probe: standard routing + compile-or-fall-back --------
# (VERDICT r3 item 3, full form: on an unknown toolchain, try the
# standard-profile route once per (device, grid, dtype, backend); a
# compile failure falls back to the relay tables for that run and is
# remembered on disk so later runs skip the doomed attempt.)


@pytest.fixture
def probe_env(monkeypatch, tmp_path):
    """Legacy IN-PROCESS probe protocol (LBM_PROBE_ISOLATE=0): the
    monkeypatched ``_compile_lowered`` seam only exists in-process."""
    monkeypatch.setenv("LBM_TOOLCHAIN", "probe")
    monkeypatch.setenv("LBM_PROBE_CACHE", str(tmp_path / "probe.json"))
    monkeypatch.setenv("LBM_PROBE_ISOLATE", "0")
    return tmp_path / "probe.json"


@pytest.fixture
def probe_iso_env(monkeypatch, tmp_path):
    """Default subprocess-isolated probe protocol (VERDICT r4 item 3)."""
    monkeypatch.setenv("LBM_TOOLCHAIN", "probe")
    monkeypatch.setenv("LBM_PROBE_CACHE", str(tmp_path / "probe.json"))
    monkeypatch.delenv("LBM_PROBE_ISOLATE", raising=False)
    return tmp_path / "probe.json"


def test_probe_routes_like_standard(on_tpu, monkeypatch):
    monkeypatch.setenv("LBM_TOOLCHAIN", "probe")
    assert driver.toolchain() == "probe"
    # same design-limit claims as the standard profile
    assert driver.select_aa(p(1536, 1536), "auto", jnp.float32) is False
    assert driver.select_band2(p(9216, 9216), "auto", jnp.float32) is False


def _tiny_setup():
    import numpy as np

    params = p(64, 128)
    params = dataclasses.replace(params, max_iters=3)
    obstacles = np.zeros((64, 128), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    return params, obstacles


def test_probe_compile_failure_falls_back_and_caches(probe_env, monkeypatch):
    """First run: the (simulated) standard-route compile fails ->
    transparent relay fallback, failure cached. Second run: the cache
    short-circuits — no compile attempt under the probe profile at all."""
    import json

    import numpy as np

    params, obstacles = _tiny_setup()
    calls = {"probe_compiles": 0}

    def failing_compile(lowered):
        if driver.toolchain() == "probe":
            calls["probe_compiles"] += 1
            raise driver.ProbeCompileError("simulated Mosaic failure")
        return lowered.compile()

    monkeypatch.setattr(driver, "_compile_lowered", failing_compile)
    r1 = driver.run_simulation(params, obstacles, backend="reference")
    assert r1.av_vels.shape == (3,)
    assert calls["probe_compiles"] == 1
    cache = json.loads(probe_env.read_text())
    (key, entry), = cache.items()
    assert entry["status"] == "fail"
    assert "64x128" in key and ":reference" in key
    # run 2: known-bad -> straight to relay, zero probe attempts
    r2 = driver.run_simulation(params, obstacles, backend="reference")
    assert calls["probe_compiles"] == 1
    np.testing.assert_allclose(r2.av_vels, r1.av_vels, rtol=0, atol=0)


def test_probe_compile_success_records_ok(probe_env):
    import json

    params, obstacles = _tiny_setup()
    r = driver.run_simulation(params, obstacles, backend="reference")
    assert r.av_vels.shape == (3,)
    cache = json.loads(probe_env.read_text())
    (key, entry), = cache.items()
    assert entry["status"] == "ok"


def test_probe_isolated_hang_cached_distinctly(probe_iso_env, monkeypatch):
    """A HUNG probe compile (child killed on wall timeout) is cached as
    its own ``"hang"`` verdict — after a CANARY child confirms the
    environment itself still compiles (hang = toolchain, not a dead
    backend) — the run falls back to the relay route in the SAME
    process cleanly, and later runs skip the probe entirely — the
    scenario the in-process SIGALRM guard could not survive (an alarm
    mid-compile poisons the session the fallback then runs on)."""
    import json

    import numpy as np

    params, obstacles = _tiny_setup()
    calls = {"probes": 0, "canaries": 0}

    def fake_probe(pp, backend, dtype, **kw):
        if pp.max_iters == 2:  # the canary's tiny surface
            calls["canaries"] += 1
            return "ok", ""
        calls["probes"] += 1
        return "hang", "probe compile exceeded 900s (child killed)"

    monkeypatch.setattr(driver, "_probe_compile_subprocess", fake_probe)
    r1 = driver.run_simulation(params, obstacles, backend="reference")
    assert r1.av_vels.shape == (3,)
    assert calls == {"probes": 1, "canaries": 1}
    cache = json.loads(probe_iso_env.read_text())
    (key, entry), = cache.items()
    assert entry["status"] == "hang"
    assert "child killed" in entry["error"]
    # run 2: known-hang -> straight to relay, no second probe subprocess
    r2 = driver.run_simulation(params, obstacles, backend="reference")
    assert calls == {"probes": 1, "canaries": 1}
    np.testing.assert_allclose(r2.av_vels, r1.av_vels, rtol=0, atol=0)


def test_probe_isolated_hang_with_dead_environment_not_cached(
        probe_iso_env, monkeypatch):
    """A hang whose CANARY also fails is environment trouble (relay
    down, lease queueing), not a toolchain verdict — fall back for this
    run only and leave nothing cached, so the shape is re-probed once
    the environment recovers."""
    params, obstacles = _tiny_setup()

    def fake_probe(pp, backend, dtype, **kw):
        if pp.max_iters == 2:
            return "hang", "probe compile exceeded 900s (child killed)"
        return "hang", "probe compile exceeded 900s (child killed)"

    monkeypatch.setattr(driver, "_probe_compile_subprocess", fake_probe)
    r = driver.run_simulation(params, obstacles, backend="reference")
    assert r.av_vels.shape == (3,)
    assert not probe_iso_env.exists()


def test_probe_isolated_fail_falls_back_and_caches(probe_iso_env, monkeypatch):
    import json

    params, obstacles = _tiny_setup()
    monkeypatch.setattr(
        driver, "_probe_compile_subprocess",
        lambda *a, **k: ("fail", "Mosaic: simulated failure"),
    )
    r = driver.run_simulation(params, obstacles, backend="reference")
    assert r.av_vels.shape == (3,)
    cache = json.loads(probe_iso_env.read_text())
    (_, entry), = cache.items()
    assert entry["status"] == "fail"


def test_probe_isolated_transient_not_cached(probe_iso_env, monkeypatch):
    """Backend-down failures are per-run: nothing is cached, the next
    run re-probes."""
    params, obstacles = _tiny_setup()
    monkeypatch.setattr(
        driver, "_probe_compile_subprocess",
        lambda *a, **k: ("fail", "UNAVAILABLE: TPU backend setup error"),
    )
    r = driver.run_simulation(params, obstacles, backend="reference")
    assert r.av_vels.shape == (3,)
    assert not probe_iso_env.exists()


def test_probe_isolated_child_init_failure_not_cached(probe_iso_env,
                                                      monkeypatch):
    """A probe child that cannot initialize a backend at all reports an
    ENVIRONMENT failure, not a toolchain verdict — it must fall back for
    this run only, never be cached (the round-5 regression cached these
    as permanent "fail" verdicts)."""
    params, obstacles = _tiny_setup()
    monkeypatch.setattr(
        driver, "_probe_compile_subprocess",
        lambda *a, **k: (
            "fail",
            "RuntimeError: Unable to initialize backend 'tpu': UNKNOWN: "
            "TPU initialization failed: No jellyfish device found.",
        ),
    )
    r = driver.run_simulation(params, obstacles, backend="reference")
    assert r.av_vels.shape == (3,)
    assert not probe_iso_env.exists()


def test_probe_isolated_ok_skips_reprobe(probe_iso_env, monkeypatch):
    """After an ``"ok"`` verdict, later runs compile the standard route
    directly — no probe subprocess, no probe seam."""
    import json

    params, obstacles = _tiny_setup()
    calls = {"probes": 0}

    def fake_probe(params, backend, dtype, **kw):
        calls["probes"] += 1
        return "ok", ""

    monkeypatch.setattr(driver, "_probe_compile_subprocess", fake_probe)
    r1 = driver.run_simulation(params, obstacles, backend="reference")
    assert r1.av_vels.shape == (3,)
    assert calls["probes"] == 1
    cache = json.loads(probe_iso_env.read_text())
    (_, entry), = cache.items()
    assert entry["status"] == "ok"
    driver.run_simulation(params, obstacles, backend="reference")
    assert calls["probes"] == 1  # cached ok -> no re-probe


def test_probe_spec_platform_is_config_not_device(monkeypatch):
    """The probe child must reproduce the parent's ``jax_platforms``
    CONFIG pin, never the device's ``.platform`` attribute: plugin
    backends can register under a different platform name than their
    devices report (the axon relay registers "axon"; its devices say
    "tpu"), and pinning the device name selects the wrong plugin in the
    child — every verdict then records a backend-init error, not a
    compile verdict (round-5 c16probe cache regression)."""
    import json as _json

    import jax

    captured = {}

    class _Proc:
        returncode = 0
        stdout = "PROBE_COMPILE_OK"
        stderr = ""

    def fake_run(cmd, **kw):
        captured["spec"] = _json.loads(cmd[-1])
        return _Proc()

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    # If the implementation regresses to jax.devices()[0].platform this
    # trips loudly instead of silently passing on CPU (where the device
    # attribute and the config value coincide).
    monkeypatch.setattr(
        jax, "devices",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("probe spec must not consult jax.devices()")
        ),
    )
    verdict, err = driver._probe_compile_subprocess(
        p(64, 128), "reference", jnp.float32
    )
    assert verdict == "ok"
    assert captured["spec"]["platform"] == jax.config.jax_platforms


def test_probe_worker_real_subprocess(probe_iso_env):
    """Full round-trip through the REAL child process: the worker
    re-lowers the tiny run's compile surface on the parent's (cpu)
    platform, compiles it, and reports ok; the parent records the
    verdict and runs. One subprocess jax import (~seconds) — the price
    of certifying the actual protocol, not a monkeypatched stand-in."""
    import json

    params, obstacles = _tiny_setup()
    r = driver.run_simulation(params, obstacles, backend="reference")
    assert r.av_vels.shape == (3,)
    cache = json.loads(probe_iso_env.read_text())
    (key, entry), = cache.items()
    assert entry["status"] == "ok"
    assert "64x128" in key


def test_probe_cache_key_separates_shapes_and_dtypes():
    k1 = driver._probe_key(p(1024, 1024), "auto", jnp.float32)
    k2 = driver._probe_key(p(1024, 1024), "auto", jnp.int16)
    k3 = driver._probe_key(p(2048, 1024), "auto", jnp.float32)
    assert len({k1, k2, k3}) == 3
