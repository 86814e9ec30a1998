#!/usr/bin/env python
"""Round-2 TPU session 13: large-grid table completion.

Fills the remaining BENCHMARKS rows: 8192^2 bf16 (block B8 and, compile
permitting, temporal T4-bf16) against an f32 T4 control, and 4096^2 f32
temporal-vs-block (the scaling table's 4096 row predates the temporal
kernel). Variants interleaved; best-of-2 per segment.

Writes JSON to argv[1] (default bench_r2_tpu13.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = {"rows": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2m {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu13.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def timed(tag, n, size, iters, backend, dtype=None, depth=None, block=None):
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
        kw = {} if dtype is None else {"dtype": dtype}
        try:
            run_simulation(params, obstacles, backend=backend, **kw)
            passes = [
                run_simulation(params, obstacles, backend=backend, **kw)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["rows"].append({"variant": tag, "error": str(e)[:300]})
            return
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None)
                if v is not None:
                    os.environ[k] = v
        best = min(p.elapsed for p in passes)
        mlups = size * size * iters / best / 1e6
        rec = {"variant": tag, "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["rows"].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    bf16 = jnp.bfloat16
    for tag, size, iters, backend, dtype, depth, block in (
        # 4096^2 f32 first (fast compiles): block control then T4.
        ("4096:block:B8", 4096, 200, "pallas", None, None, 8),
        ("4096:temporal-T4:B16", 4096, 200, "temporal", None, 4, 16),
        # 8192^2: bf16 block (halved traffic), f32 T4 control, bf16 T4.
        ("8192:block:B8:bf16", 8192, 100, "pallas", bf16, None, 8),
        ("8192:temporal-T4:B16:f32", 8192, 100, "temporal", None, 4, 16),
        ("8192:temporal-T4:B16:bf16", 8192, 100, "temporal", bf16, 4, 16),
        # repeats for throttle bracketing
        ("4096:temporal-T4:B16#2", 4096, 200, "temporal", None, 4, 16),
        ("8192:block:B8:bf16#2", 8192, 100, "pallas", bf16, None, 8),
    ):
        timed(tag, 2, size, iters, backend, dtype, depth, block)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
