#!/usr/bin/env python
"""Round-2 TPU session 10: 8192^2 kernel/shape A/B + 512^2 aa-vs-resident.

The 8192^2 row has never had a clean within-session A/B across kernels
(round-1 recorded temporal-T2 6,128 vs block 3,136 in one session; the
round-2 sessions were throttled 2-3x and T8's compile hangs). This
session interleaves the variants that are KNOWN to compile at 8192
(block B8/B16, temporal T4/T6 at B16) plus a 2048^2 control pair, and
settles whether 512^2 (9 MB state) belongs to AA or ping-pong in auto.

Writes JSON to argv[1] (default bench_r2_tpu10.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = {"part_a": [], "part_b": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2j {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu10.json"
    import jax

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def timed(bucket, tag, n, size, iters, backend, depth=None, block=None):
        params = LBMParams(
            nx=size, ny=size, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((size, size), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        saved = {
            k: os.environ.pop(k, None)
            for k in ("LBM_TEMPORAL_DEPTH", "LBM_TEMPORAL_BLOCK",
                      "LBM_PALLAS_BLOCK")
        }
        if depth is not None:
            os.environ["LBM_TEMPORAL_DEPTH"] = str(depth)
        if block is not None:
            knob = "LBM_PALLAS_BLOCK" if backend == "pallas" else "LBM_TEMPORAL_BLOCK"
            os.environ[knob] = str(block)
        try:
            run_simulation(params, obstacles, backend=backend)  # warmup
            passes = [
                run_simulation(params, obstacles, backend=backend)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS[bucket].append({"variant": tag, "error": str(e)[:300]})
            return
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

    # ---- Part A: 512^2 regime assignment -----------------------------------
    for tag, backend in (
        ("512:resident#0", "resident"), ("512:aa#1", "aa"),
        ("512:resident#2", "resident"), ("512:aa#3", "aa"),
    ):
        timed("part_a", tag, 2, 512, 20000, backend)

    # ---- Part B: 8192^2 kernel A/B (+ 2048^2 control) ----------------------
    # NOTE: LBM_PALLAS_BLOCK is read under _run_loop's jit trace, so two
    # block-kernel runs with identical signatures would reuse the first
    # trace's frozen B — the B16 variant gets a distinct iteration count
    # (104) to force a fresh trace. (The temporal knobs are resolved
    # outside jit and threaded as static args; they don't need this.)
    for tag, backend, depth, block, size, iters in (
        ("8192:block:B8#0", "pallas", None, 8, 8192, 100),
        ("8192:temporal-T4:B16#0", "temporal", 4, 16, 8192, 100),
        ("8192:block:B16#1", "pallas", None, 16, 8192, 104),
        ("8192:temporal-T6:B16#1", "temporal", 6, 16, 8192, 100),
        ("2048:block#ctl", "pallas", None, None, 2048, 400),
        ("2048:temporal-T4:B16#ctl", "temporal", 4, 16, 2048, 400),
        ("8192:block:B8#2", "pallas", None, 8, 8192, 100),
        ("8192:temporal-T4:B16#2", "temporal", 4, 16, 8192, 100),
    ):
        timed("part_b", tag, 2, size, iters, backend, depth, block)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
