#!/usr/bin/env python
"""Round-2 TPU session 11: official-config refresh on the final dispatch.

Clean within-session numbers for the four official configs now that auto
routes 128x128/128x256/256x256 to the AA kernel (the session-9 numbers
for the small configs were warmup-contaminated or single-shot), plus a
final alternating full-official 1024^2 A/B (resident vs aa) to settle the
headline path with the full 20k-iteration count.

Writes JSON to argv[1] (default bench_r2_tpu11.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
RESULTS = {"official": [], "headline": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2k {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu11.json"
    import jax

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    # Throwaway to absorb the session warmup.
    params = read_params(f"{REF}/input_128x128.params")
    obstacles = read_obstacles(f"{REF}/obstacles_128x128.dat", params)
    run_simulation(params, obstacles, backend="auto")
    log("warmup absorbed")

    # ---- official configs, clean best-of-3, auto dispatch ------------------
    for tag in ("128x128", "128x256", "256x256"):
        params = read_params(f"{REF}/input_{tag}.params")
        obstacles = read_obstacles(f"{REF}/obstacles_{tag}.dat", params)
        run_simulation(params, obstacles, backend="auto")  # shape warmup
        passes = [
            run_simulation(params, obstacles, backend="auto") for _ in range(3)
        ]
        best = min(p.elapsed for p in passes)
        mlups = params.nx * params.ny * params.max_iters / best / 1e6
        rec = {"config": tag, "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["official"].append(rec)
        log(f"{tag} auto: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    # ---- 1024^2 full-official headline: resident vs aa, alternating --------
    params = read_params(f"{REF}/input_1024x1024.params")
    obstacles = read_obstacles(f"{REF}/obstacles_1024x1024.dat", params)
    for backend in ("resident", "aa"):  # shape warmups
        run_simulation(params, obstacles, backend=backend)
    for seg, backend in enumerate(("resident", "aa", "resident", "aa")):
        r = run_simulation(params, obstacles, backend=backend)
        rec = {"variant": f"1024:{backend}#{seg}",
               "loop_s": round(r.elapsed, 4),
               "mlups": round(r.mlups(params), 1)}
        RESULTS["headline"].append(rec)
        log(f"1024 {backend}#{seg}: {rec['loop_s']}s = {rec['mlups']} MLUPS")

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
