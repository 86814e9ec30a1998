#!/usr/bin/env python
"""Round-2 TPU measurement session (one process; the relay serializes TPU
users and hides a multi-minute warmup in the first value fetch).

Part A: all four official configs through the CURRENT auto dispatch, full
iteration counts, with the golden gate evaluated in-process (upstream
full pairs for 128x128/128x256; upstream av_vels + committed stand-in
pressure golds for 256x256/1024x1024).

Part B: temporal-depth A/B on HBM-bound grids (2048^2, 8192^2): block
kernel vs temporal T in {2,4,8} x B in {16,32}, f32 and bf16, interleaved
in one process so relay throttling hits all variants equally.

Writes results JSON to the path in argv[1] (default bench_r2_tpu.json).
"""

import dataclasses
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
    print(f"[tpu-r2 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def check_av(av_vels, tag):
    ref = np.loadtxt(f"{REF}/check/{tag}.av_vels.dat", usecols=[1])
    diff = ref - np.asarray(av_vels, np.float64)
    pct = 100.0 * diff / (ref - diff)
    return float(np.abs(pct).max())


def check_fs(params, cells, obstacles, tag):
    """Max pressure %-diff vs the gold (upstream full pair or stand-in)."""
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu.json"
    import jax

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import (
        run_simulation, select_resident, select_temporal, select_step_fn,
    )
    import jax.numpy as jnp

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    # ---- Part A: official configs, auto dispatch, golden gates ------------
    for tag in ("128x128", "128x256", "256x256", "1024x1024"):
        params = read_params(f"{REF}/input_{tag}.params")
        obstacles = read_obstacles(f"{REF}/obstacles_{tag}.dat", params)
        # Which kernel does auto pick?
        if select_resident(params, "auto", jnp.float32) is not None:
            kernel = "resident"
        elif select_temporal(params, "auto", jnp.float32) is not None:
            kernel = "temporal"
        else:
            kernel = select_step_fn(params, "auto", jnp.float32)[1]
        log(f"{tag}: auto -> {kernel}; running {params.max_iters} iters ...")
        r = run_simulation(params, obstacles, backend="auto")
        mlups = r.mlups(params)
        av_pct = check_av(r.av_vels, tag)
        fs_pct = check_fs(params, r.cells, obstacles, tag)
        rec = {
            "config": tag, "kernel": kernel, "iters": params.max_iters,
            "loop_s": round(r.elapsed, 4), "compile_s": round(r.compile_time, 2),
            "mlups": round(mlups, 1),
            "av_max_pct": av_pct, "fs_max_pct": fs_pct,
            "golden_pass": av_pct < 1.0 and (fs_pct is None or fs_pct < 1.0),
            "reynolds": r.reynolds(params, obstacles),
        }
        RESULTS["part_a"].append(rec)
        log(f"{tag}: {rec['loop_s']}s = {rec['mlups']} MLUPS, "
            f"av {av_pct:.3g}% fs {fs_pct if fs_pct is None else round(fs_pct, 4)}% "
            f"pass={rec['golden_pass']}")

    # ---- Part B: temporal depth/block A/B on HBM-bound grids --------------
    def timed(tag_b, n, size, iters, backend, dtype, depth=None, block=None):
        params = LBMParams(
            nx=size, ny=size, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((size, size), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        env = {}
        if depth is not None:
            env["LBM_TEMPORAL_DEPTH"] = str(depth)
        if block is not None:
            env["LBM_TEMPORAL_BLOCK"] = str(block)
        old = {k: os.environ.get(k) for k in ("LBM_TEMPORAL_DEPTH", "LBM_TEMPORAL_BLOCK")}
        for k in old:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            # warmup (compile + first exec), then best-of-n timed passes
            run_simulation(params, obstacles, backend=backend, dtype=dtype)
            passes = [
                run_simulation(params, obstacles, backend=backend, dtype=dtype)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag_b}: FAILED {type(e).__name__}: {str(e)[:300]}")
            RESULTS["part_b"].append({"variant": tag_b, "error": str(e)[:300]})
            return
        finally:
            for k, v in old.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v
        best = min(p.elapsed for p in passes)
        mlups = size * size * iters / best / 1e6
        rec = {"variant": tag_b, "size": size, "iters": iters,
               "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["part_b"].append(rec)
        log(f"{tag_b}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    for size, iters in ((2048, 400), (8192, 100)):
        timed(f"{size}:block:f32", 2, size, iters, "pallas", f32)
        timed(f"{size}:temporal:T2:B16:f32", 2, size, iters, "temporal", f32, 2, 16)
        timed(f"{size}:temporal:T4:B16:f32", 2, size, iters, "temporal", f32, 4, 16)
        timed(f"{size}:temporal:T4:B32:f32", 2, size, iters, "temporal", f32, 4, 32)
        timed(f"{size}:temporal:T8:B16:f32", 2, size, iters, "temporal", f32, 8, 16)
        timed(f"{size}:temporal:T8:B32:f32", 2, size, iters, "temporal", f32, 8, 32)
        timed(f"{size}:block:bf16", 2, size, iters, "pallas", bf16)
        timed(f"{size}:temporal:T2:B16:bf16", 2, size, iters, "temporal", bf16, 2, 16)
        timed(f"{size}:temporal:T4:B16:bf16", 2, size, iters, "temporal", bf16, 4, 16)
        timed(f"{size}:temporal:T8:B16:bf16", 2, size, iters, "temporal", bf16, 8, 16)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
