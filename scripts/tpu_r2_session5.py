#!/usr/bin/env python
"""Round-2 TPU session 5: clean collide-form A/B + temporal depth sweep.

Session 4's A/B was void (jit.lower() trace caching froze the collide
form — fixed by threading it as a static arg) and drifted ~2x within the
session. This rerun alternates literal/paired segments per config so each
comparison has same-window brackets, then sweeps temporal depth with the
paired form, anchored by repeats.

Part A — alternating L,P,L,P per config (2 timed passes per segment):
  1024^2 resident ping-pong (headline), 256^2 resident value-carry,
  2048^2 temporal T4:B16, 2048^2 block (DMA-bound control).
Part B — temporal depth sweep, paired: 2048^2 T in {2,4,6,8,12,16} B16,
  8192^2 T in {4,6,8} B16, bf16 head-to-head at 2048^2 (block vs T8),
  anchored by a repeated T4 row.
Part C — official 1024^2 config once through auto (fresh headline).

Writes JSON to argv[1] (default bench_r2_tpu5.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
RESULTS = {"part_a": [], "part_b": [], "part_c": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2e {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu5.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def timed(bucket, tag, n, size, iters, backend, collide,
              depth=None, block=None, dtype=None, keep_cells=False):
        params = LBMParams(
            nx=size, ny=size, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((size, size), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        saved = {
            k: os.environ.pop(k, None)
            for k in ("LBM_COLLIDE", "LBM_TEMPORAL_DEPTH", "LBM_TEMPORAL_BLOCK")
        }
        os.environ["LBM_COLLIDE"] = collide
        if depth is not None:
            os.environ["LBM_TEMPORAL_DEPTH"] = str(depth)
        if block is not None:
            os.environ["LBM_TEMPORAL_BLOCK"] = str(block)
        kw = {} if dtype is None else {"dtype": dtype}
        try:
            run_simulation(params, obstacles, backend=backend, **kw)  # warmup
            passes = [
                run_simulation(params, obstacles, backend=backend, **kw)
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

    # ---- Part A: alternating collide-form segments --------------------------
    ab_configs = (
        ("1024:resident-pp", 1024, 6000, "resident", None, None),
        ("256:resident-vc", 256, 40000, "resident", None, None),
        ("2048:temporal-T4:B16", 2048, 400, "temporal", 4, 16),
        ("2048:block", 2048, 400, "pallas", None, None),
    )
    sanity = {}
    for tag, size, iters, backend, depth, block in ab_configs:
        for seg, mode in enumerate(("literal", "paired", "literal", "paired")):
            res = timed("part_a", f"{tag}:{mode}#{seg}", 2, size, iters,
                        backend, mode, depth, block,
                        keep_cells=(tag.startswith("1024") and seg < 2))
            if tag.startswith("1024") and seg < 2:
                sanity[mode] = res
    if len(sanity) == 2:
        identical = bool(np.array_equal(sanity["literal"], sanity["paired"]))
        RESULTS["meta"]["ab_toggle_effective"] = not identical
        log(f"collide-toggle sanity: bitwise-identical={identical} (must be False)")

    # ---- Part B: temporal depth sweep (paired) ------------------------------
    for depth in (2, 4, 6, 8, 12, 16):
        timed("part_b", f"2048:temporal-T{depth}:B16:paired", 2, 2048, 400,
              "temporal", "paired", depth, 16)
    timed("part_b", "2048:block:bf16", 2, 2048, 400, "pallas", "paired",
          dtype=jnp.bfloat16)
    timed("part_b", "2048:temporal-T8:B16:bf16", 2, 2048, 400, "temporal",
          "paired", 8, 16, dtype=jnp.bfloat16)
    timed("part_b", "2048:temporal-T4:B16:paired:anchor", 2, 2048, 400,
          "temporal", "paired", 4, 16)
    for depth in (4, 6, 8):
        timed("part_b", f"8192:temporal-T{depth}:B16:paired", 2, 8192, 100,
              "temporal", "paired", depth, 16)
    timed("part_b", "8192:block:f32", 2, 8192, 100, "pallas", "paired")

    # ---- Part C: official 1024^2 headline through auto (paired default) -----
    os.environ.pop("LBM_COLLIDE", None)
    params = read_params(f"{REF}/input_1024x1024.params")
    obstacles = read_obstacles(f"{REF}/obstacles_1024x1024.dat", params)
    for i in range(3):
        r = run_simulation(params, obstacles, backend="auto")
        rec = {"config": "1024x1024-official", "pass": i,
               "loop_s": round(r.elapsed, 4), "mlups": round(r.mlups(params), 1)}
        RESULTS["part_c"].append(rec)
        log(f"1024x1024 official #{i}: {rec['loop_s']}s = {rec['mlups']} MLUPS")

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
