#!/usr/bin/env python
"""Round-2 TPU session 3: clean official-config timings (best-of-2, after a
throwaway warmup run so the first timed config doesn't absorb session
ramp-up). Writes JSON to argv[1]."""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(f"[tpu-r3 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu3.json"
    import jax

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.runtime.driver import run_simulation

    results = {"meta": {"device": str(jax.devices()[0])}, "configs": []}

    # Throwaway warmup: absorbs the relay session ramp.
    p0 = read_params("/root/reference/input_128x128.params")
    o0 = read_obstacles("/root/reference/obstacles_128x128.dat", p0)
    run_simulation(dataclasses.replace(p0, max_iters=2000), o0)
    log("warmup done")

    for tag in ("128x128", "128x256", "256x256", "1024x1024"):
        params = read_params(f"/root/reference/input_{tag}.params")
        obstacles = read_obstacles(f"/root/reference/obstacles_{tag}.dat", params)
        passes = [run_simulation(params, obstacles) for _ in range(2)]
        best = min(p.elapsed for p in passes)
        mlups = params.nx * params.ny * params.max_iters / best / 1e6
        rec = {"config": tag, "iters": params.max_iters, "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        results["configs"].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
