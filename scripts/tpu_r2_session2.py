#!/usr/bin/env python
"""Round-2 TPU session 2: temporal-depth A/B for the HALO-CARRY kernel
(the state-view variant was reverted — Mosaic rejects (9,T,nx) views for
T<8 and the T=8 one measured below halo-carry T=2).

Variants per grid (2048^2, 8192^2), interleaved in one process:
block-kernel baseline; temporal T in {2,3,4} x B in {16,32}; bf16 block +
temporal T2/T4. Writes JSON to argv[1] (default bench_r2_tpu2.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = {"part_b": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2b {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu2.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def timed(tag_b, n, size, iters, backend, dtype, depth=None, block=None):
        params = LBMParams(
            nx=size, ny=size, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((size, size), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        for k in ("LBM_TEMPORAL_DEPTH", "LBM_TEMPORAL_BLOCK"):
            os.environ.pop(k, None)
        if depth is not None:
            os.environ["LBM_TEMPORAL_DEPTH"] = str(depth)
        if block is not None:
            os.environ["LBM_TEMPORAL_BLOCK"] = str(block)
        try:
            run_simulation(params, obstacles, backend=backend, dtype=dtype)
            passes = [
                run_simulation(params, obstacles, backend=backend, dtype=dtype)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag_b}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["part_b"].append({"variant": tag_b, "error": str(e)[:200]})
            return
        finally:
            for k in ("LBM_TEMPORAL_DEPTH", "LBM_TEMPORAL_BLOCK"):
                os.environ.pop(k, None)
        best = min(p.elapsed for p in passes)
        mlups = size * size * iters / best / 1e6
        rec = {"variant": tag_b, "size": size, "iters": iters,
               "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["part_b"].append(rec)
        log(f"{tag_b}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    f32, bf16 = jnp.float32, jnp.bfloat16
    for size, iters in ((2048, 400), (8192, 100)):
        timed(f"{size}:block:f32", 2, size, iters, "pallas", f32)
        timed(f"{size}:temporal:T2:B16:f32", 2, size, iters, "temporal", f32, 2, 16)
        timed(f"{size}:temporal:T3:B16:f32", 2, size, iters, "temporal", f32, 3, 16)
        timed(f"{size}:temporal:T4:B16:f32", 2, size, iters, "temporal", f32, 4, 16)
        timed(f"{size}:temporal:T2:B32:f32", 2, size, iters, "temporal", f32, 2, 32)
        timed(f"{size}:temporal:T4:B32:f32", 2, size, iters, "temporal", f32, 4, 32)
        timed(f"{size}:block:bf16", 2, size, iters, "pallas", bf16)
        timed(f"{size}:temporal:T2:B16:bf16", 2, size, iters, "temporal", bf16, 2, 16)
        timed(f"{size}:temporal:T4:B16:bf16", 2, size, iters, "temporal", bf16, 4, 16)
        # re-run the baseline at the end to bracket throttling drift
        timed(f"{size}:block:f32:again", 2, size, iters, "pallas", f32)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
