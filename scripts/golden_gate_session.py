#!/usr/bin/env python
"""Golden-gate validation session: run official configs end-to-end through
the CURRENT auto dispatch on the live backend and evaluate the upstream
checker semantics in-process.

    python scripts/golden_gate_session.py OUT.json [precision] [config...]

precision: f32 (default) | bf16 | c16.  Default configs: all four.
Uses the committed stand-in golds for the two final_state files absent
from the reference mount (tests/golden/, provenance-asserted there).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REF = "/root/reference"
GOLD_FALLBACK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "tests", "golden")

CONFIGS = ["128x128", "128x256", "256x256", "1024x1024"]


def log(m):
    print(f"[gold {time.strftime('%H:%M:%S')}] {m}", flush=True)


def gold_path(cfg, kind):
    p = f"{REF}/check/{cfg}.{kind}.dat"
    if os.path.exists(p):
        return p
    p2 = os.path.join(GOLD_FALLBACK, f"{cfg}.{kind}.dat")
    return p2 if os.path.exists(p2) else None


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r3_gold.json"
    precision = sys.argv[2] if len(sys.argv) > 2 else "f32"
    configs = sys.argv[3:] or CONFIGS

    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.ops.reference import velocity_field
    from lbm_tpu.runtime.driver import run_simulation

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "c16": "c16"}[precision]
    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "precision": precision}, "configs": {}}
    log(f"device: {results['meta']['device']}; precision {precision}")

    for cfg in configs:
        params = read_params(f"{REF}/input_{cfg}.params")
        obstacles = read_obstacles(f"{REF}/obstacles_{cfg}.dat", params)
        t0 = time.time()
        res = run_simulation(params, obstacles, backend="auto", dtype=dtype)
        mlups = res.mlups(params)
        rec = {"loop_s": round(res.elapsed, 4), "mlups": round(mlups, 1),
               "compile_s": round(res.compile_time, 1)}
        log(f"{cfg}: loop {res.elapsed:.3f}s = {mlups:.0f} MLUPS "
            f"(wall {time.time()-t0:.0f}s)")

        av_gold = gold_path(cfg, "av_vels")
        if av_gold:
            ref_av = np.loadtxt(av_gold, usecols=[1])
            d = 100.0 * (ref_av - res.av_vels) / res.av_vels
            rec["av_max_pct"] = round(float(np.max(np.abs(d))), 4)
        fs_gold = gold_path(cfg, "final_state")
        if fs_gold:
            ref_p = np.loadtxt(fs_gold, usecols=[5])
            _, _, _, pressure = velocity_field(
                jnp.asarray(res.cells), jnp.asarray(np.asarray(obstacles))
            )
            sim_p = np.where(np.asarray(obstacles).ravel() == 1,
                             params.density / 3.0,
                             np.asarray(pressure).ravel())
            d = 100.0 * (ref_p - sim_p) / sim_p
            rec["pressure_max_pct"] = round(float(np.max(np.abs(d))), 4)
        rec["gate"] = (
            "pass"
            if all(rec.get(k, 0.0) <= 1.0
                   for k in ("av_max_pct", "pressure_max_pct"))
            and np.isfinite(res.av_vels).all()
            else "FAIL"
        )
        log(f"{cfg}: av {rec.get('av_max_pct')}% pressure "
            f"{rec.get('pressure_max_pct')}% -> {rec['gate']}")
        results["configs"][cfg] = rec
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    log("done: " + json.dumps({c: r["gate"] for c, r in results["configs"].items()}))


if __name__ == "__main__":
    main()
