#!/usr/bin/env python
"""Round-2 TPU session 9: golden revalidation through the NEW auto dispatch.

The auto policy now routes value-carry-regime grids (state <= 4 MB:
128x128, 128x256, 256x256) and the 40-60 MB gap to the AA kernel
(bench_r2_tpu8.json: 1.4x / 1.75x). Gate configs must be re-validated on
the exact dispatch that serves them:

Part A: all four official configs through auto, full iters, golden gate
  evaluated in-process (same logic as tpu_r2_session.py).
Part B: bf16-AA compile probes (1024^2 bf16 = 19 MB, 1280^2 bf16 =
  29.5 MB — no on-TPU bf16 AA compile evidence exists yet) + block-bf16
  vs aa-bf16 A/B at 1024^2 if the compile lands.

Writes JSON to argv[1] (default bench_r2_tpu9.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
RESULTS = {"part_a": [], "part_b": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2i {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def check_av(av_vels, tag):
    ref = np.loadtxt(f"{REF}/check/{tag}.av_vels.dat", usecols=[1])
    diff = ref - np.asarray(av_vels, np.float64)
    pct = 100.0 * diff / (ref - diff)
    return float(np.abs(pct).max())


def check_fs(params, cells, obstacles, tag):
    from lbm_tpu.models.d2q9 import C_SQ

    cells = np.asarray(cells, np.float64)
    rho = cells.sum(axis=0)
    pressure = np.where(
        np.asarray(obstacles) != 0, params.density * C_SQ, rho * C_SQ
    )
    upstream = f"{REF}/check/{tag}.final_state.dat"
    if os.path.exists(upstream):
        ref = np.loadtxt(upstream, usecols=[5]).reshape(pressure.shape)
    else:
        standin = os.path.join(GOLDEN_DIR, f"{tag}.golden.npz")
        if not os.path.exists(standin):
            return None
        ref = np.load(standin)["pressure"]
    diff = ref - pressure
    pct = 100.0 * diff / (ref - diff)
    return float(np.abs(pct).max())


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu9.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import (
        run_simulation, select_aa, select_resident, select_step_fn,
        select_temporal,
    )

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    # ---- Part A: official configs, NEW auto dispatch, golden gates ---------
    for tag in ("128x128", "128x256", "256x256", "1024x1024"):
        params = read_params(f"{REF}/input_{tag}.params")
        obstacles = read_obstacles(f"{REF}/obstacles_{tag}.dat", params)
        if select_aa(params, "auto", jnp.float32) is not None:
            kernel = "aa"
        elif select_resident(params, "auto", jnp.float32) is not None:
            kernel = "resident"
        elif select_temporal(params, "auto", jnp.float32) is not None:
            kernel = "temporal"
        else:
            kernel = select_step_fn(params, "auto", jnp.float32)[1]
        log(f"{tag}: auto -> {kernel}; running {params.max_iters} iters ...")
        r = run_simulation(params, obstacles, backend="auto")
        av_pct = check_av(r.av_vels, tag)
        fs_pct = check_fs(params, r.cells, obstacles, tag)
        rec = {
            "config": tag, "kernel": kernel, "iters": params.max_iters,
            "loop_s": round(r.elapsed, 4), "mlups": round(r.mlups(params), 1),
            "av_max_pct": av_pct, "fs_max_pct": fs_pct,
            "golden_pass": av_pct < 1.0 and (fs_pct is None or fs_pct < 1.0),
            "reynolds": r.reynolds(params, obstacles),
        }
        RESULTS["part_a"].append(rec)
        log(f"{tag} [{kernel}]: {rec['loop_s']}s = {rec['mlups']} MLUPS, "
            f"av {av_pct:.3g}% fs {fs_pct if fs_pct is None else round(fs_pct, 4)} "
            f"pass={rec['golden_pass']}")

    # ---- Part B: bf16-AA compile probes + A/B ------------------------------
    from lbm_tpu.ops.pallas_aa import run_aa
    from lbm_tpu.runtime.driver import sync
    from lbm_tpu.models.d2q9 import D2Q9

    def probe_bf16(tag, ny, nx, iters):
        params = LBMParams(
            nx=nx, ny=ny, max_iters=0, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((ny, nx), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        cells = D2Q9.initial_state(params, dtype=jnp.bfloat16)
        nobst = jnp.asarray((obstacles == 0), jnp.float32)
        try:
            t0 = time.perf_counter()
            out, _ = run_aa(cells, nobst, 0.1, 0.005, 1.85, iters)
            sync(out)
            first = time.perf_counter() - t0
            rec = {"variant": tag, "ok": True, "first_s": round(first, 2)}
            log(f"{tag}: compile+run OK ({first:.1f}s eager)")
        except Exception as e:
            rec = {"variant": tag, "ok": False, "error": str(e)[:300]}
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
        RESULTS["part_b"].append(rec)
        return rec["ok"]

    ok_1024 = probe_bf16("1024:bf16:aa-probe", 1024, 1024, 100)
    ok_1280 = probe_bf16("1280:bf16:aa-probe", 1280, 1280, 100)

    def timed(tag, n, ny, nx, iters, backend, dtype=None):
        params = LBMParams(
            nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((ny, nx), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        kw = {} if dtype is None else {"dtype": dtype}
        try:
            run_simulation(params, obstacles, backend=backend, **kw)
            passes = [
                run_simulation(params, obstacles, backend=backend, **kw)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["part_b"].append({"variant": tag, "error": str(e)[:300]})
            return
        best = min(p.elapsed for p in passes)
        mlups = ny * nx * iters / best / 1e6
        rec = {"variant": tag, "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["part_b"].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    if ok_1024:
        bf16 = jnp.bfloat16
        for tag, backend in (
            ("1024:block:bf16#0", "pallas"), ("1024:aa:bf16#1", "aa"),
            ("1024:block:bf16#2", "pallas"), ("1024:aa:bf16#3", "aa"),
        ):
            timed(tag, 2, 1024, 1024, 3000, backend, bf16)
    if ok_1280:
        for tag, backend in (
            ("1280:block:bf16#0", "pallas"), ("1280:aa:bf16#1", "aa"),
        ):
            timed(tag, 2, 1280, 1280, 2000, backend, jnp.bfloat16)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
