#!/usr/bin/env python
"""Round-2 TPU session 4: paired-collision A/B + depth re-sweep + golden gates.

The collide refactor (ops/collide.py) cut the per-cell VPU op count ~30%
(paired equilibrium, one-op obstacle select, row-local forcing test in the
value-carry path). This session measures it where compute binds:

Part A — LBM_COLLIDE literal-vs-paired A/B, interleaved in one process:
  256^2 resident value-carry, 1024^2 resident ping-pong, 2048^2 temporal
  T4:B16 + block control, 8192^2 temporal T4:B16. A bitwise check on the
  256^2 final states proves the env toggle reached the kernel builds.

Part B — temporal depth re-sweep with the slimmer compute (paired):
  T in {2, 6, 8} x B16 at 2048^2 (T4 already in part A), T6 at 8192^2.

Part C — all four official configs through auto dispatch with the paired
default, full iteration counts, golden gates evaluated in-process.

Writes JSON to argv[1] (default bench_r2_tpu4.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
RESULTS = {"part_a": [], "part_b": [], "part_c": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2d {time.strftime('%H:%M:%S')}] {msg}", flush=True)


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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu4.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import (
        run_simulation, select_resident, select_temporal, select_step_fn,
    )

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def make_inputs(size, iters):
        params = LBMParams(
            nx=size, ny=size, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((size, size), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        return params, obstacles

    def timed(bucket, tag, n, size, iters, backend, collide,
              depth=None, block=None, keep_cells=False):
        params, obstacles = make_inputs(size, iters)
        saved = {
            k: os.environ.pop(k, None)
            for k in ("LBM_COLLIDE", "LBM_TEMPORAL_DEPTH", "LBM_TEMPORAL_BLOCK")
        }
        os.environ["LBM_COLLIDE"] = collide
        if depth is not None:
            os.environ["LBM_TEMPORAL_DEPTH"] = str(depth)
        if block is not None:
            os.environ["LBM_TEMPORAL_BLOCK"] = str(block)
        try:
            run_simulation(params, obstacles, backend=backend)  # warmup
            passes = [
                run_simulation(params, obstacles, backend=backend)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}")
            RESULTS[bucket].append({"variant": tag, "error": str(e)[:300]})
            return None
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v
        best = min(p.elapsed for p in passes)
        mlups = size * size * iters / best / 1e6
        rec = {"variant": tag, "size": size, "iters": iters,
               "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS[bucket].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")
        return passes[-1].cells if keep_cells else mlups

    # ---- Part A: collide-form A/B ------------------------------------------
    cells_lit = timed("part_a", "256:resident-vc:literal", 2, 256, 40000,
                      "resident", "literal", keep_cells=True)
    cells_par = timed("part_a", "256:resident-vc:paired", 2, 256, 40000,
                      "resident", "paired", keep_cells=True)
    if cells_lit is not None and cells_par is not None:
        identical = bool(np.array_equal(cells_lit, cells_par))
        RESULTS["meta"]["ab_toggle_effective"] = not identical
        log(f"collide-toggle sanity: final states bitwise-identical={identical} "
            "(must be False — different rounding proves both forms compiled)")
    for tag, size, iters, backend, depth, block in (
        ("1024:resident-pp", 1024, 6000, "resident", None, None),
        ("2048:temporal-T4:B16", 2048, 400, "temporal", 4, 16),
        ("2048:block", 2048, 400, "pallas", None, None),
        ("8192:temporal-T4:B16", 8192, 100, "temporal", 4, 16),
    ):
        timed("part_a", f"{tag}:literal", 2, size, iters, backend, "literal",
              depth, block)
        timed("part_a", f"{tag}:paired", 2, size, iters, backend, "paired",
              depth, block)
    # bracket throttle drift
    timed("part_a", "256:resident-vc:literal:again", 2, 256, 40000,
          "resident", "literal")

    # ---- Part B: temporal depth re-sweep (paired) --------------------------
    for depth in (2, 6, 8):
        timed("part_b", f"2048:temporal-T{depth}:B16:paired", 2, 2048, 400,
              "temporal", "paired", depth, 16)
    timed("part_b", "8192:temporal-T6:B16:paired", 2, 8192, 100,
          "temporal", "paired", 6, 16)
    timed("part_b", "2048:temporal-T4:B16:paired:again", 2, 2048, 400,
          "temporal", "paired", 4, 16)

    # ---- Part C: official configs, auto dispatch (paired default), gates ---
    os.environ.pop("LBM_COLLIDE", None)
    for tag in ("128x128", "128x256", "256x256", "1024x1024"):
        params = read_params(f"{REF}/input_{tag}.params")
        obstacles = read_obstacles(f"{REF}/obstacles_{tag}.dat", params)
        if select_resident(params, "auto", jnp.float32) is not None:
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
            "loop_s": round(r.elapsed, 4), "compile_s": round(r.compile_time, 2),
            "mlups": round(r.mlups(params), 1),
            "av_max_pct": av_pct, "fs_max_pct": fs_pct,
            "golden_pass": av_pct < 1.0 and (fs_pct is None or fs_pct < 1.0),
        }
        RESULTS["part_c"].append(rec)
        log(f"{tag}: {rec['loop_s']}s = {rec['mlups']} MLUPS, "
            f"av {av_pct:.3g}% fs {fs_pct if fs_pct is None else round(fs_pct, 4)}% "
            f"pass={rec['golden_pass']}")

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
