#!/usr/bin/env python
"""Round-2 TPU session 17: 4096^2 bf16 block-vs-temporal (crossover refine).

The bf16 crossover threshold (1 GB: block wins at 2048^2, temporal at
8192^2 — bench_r2_tpu14.json) leaves 4096^2 bf16 (302 MB) on the block
side unmeasured. This settles it.

Writes JSON to argv[1] (default bench_r2_tpu17.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = {"rows": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2q {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu17.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def timed(tag, n, size, iters, backend, depth=None):
        params = LBMParams(
            nx=size, ny=size, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((size, size), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        saved = os.environ.pop("LBM_TEMPORAL_DEPTH", None)
        if depth is not None:
            os.environ["LBM_TEMPORAL_DEPTH"] = str(depth)
        try:
            run_simulation(params, obstacles, backend=backend, dtype=jnp.bfloat16)
            passes = [
                run_simulation(params, obstacles, backend=backend, dtype=jnp.bfloat16)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["rows"].append({"variant": tag, "error": str(e)[:300]})
            return
        finally:
            os.environ.pop("LBM_TEMPORAL_DEPTH", None)
            if saved is not None:
                os.environ["LBM_TEMPORAL_DEPTH"] = saved
        best = min(p.elapsed for p in passes)
        mlups = size * size * iters / best / 1e6
        rec = {"variant": tag, "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["rows"].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    timed("4096:block:bf16#0", 2, 4096, 300, "pallas")
    timed("4096:temporal-T4:bf16#1", 2, 4096, 300, "temporal", depth=4)
    timed("4096:block:bf16#2", 2, 4096, 300, "pallas")
    timed("4096:temporal-T4:bf16#3", 2, 4096, 300, "temporal", depth=4)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
