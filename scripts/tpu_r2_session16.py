#!/usr/bin/env python
"""Round-2 TPU session 16: 1408^2 f32 A/B (AA's new 72 MB auto ceiling).

The budget-aware tile picker fits 1408^2 f32 (71.3 MB state) under the
relay's ~91 MB total-VMEM compile ceiling (bench_r2_tpu15.json). This
times it against the temporal incumbent through the driver.

Writes JSON to argv[1] (default bench_r2_tpu16.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = {"ab": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2p {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu16.json"
    import jax

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def timed(tag, n, ny, nx, iters, backend):
        params = LBMParams(
            nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((ny, nx), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        try:
            run_simulation(params, obstacles, backend=backend)
            passes = [
                run_simulation(params, obstacles, backend=backend)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["ab"].append({"variant": tag, "error": str(e)[:300]})
            return
        best = min(p.elapsed for p in passes)
        mlups = ny * nx * iters / best / 1e6
        rec = {"variant": tag, "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["ab"].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    for tag, backend in (
        ("1408:temporal#0", "temporal"), ("1408:aa#1", "aa"),
        ("1408:temporal#2", "temporal"), ("1408:aa#3", "aa"),
    ):
        timed(tag, 2, 1408, 1408, 1000, backend)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
