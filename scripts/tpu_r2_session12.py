#!/usr/bin/env python
"""Round-2 TPU session 12: golden confirmation of the AA-flagship dispatch.

Auto now routes every f32 state <= 60 MB to the AA kernel — including the
1024^2 headline config (AA won the full-official A/B +3%,
bench_r2_tpu11.json). This session re-runs the 1024^2 official config
through auto and evaluates BOTH golden checks (upstream av_vels + the
committed stand-in pressure gold), closing the last unvalidated
path/config pair.

Writes JSON to argv[1] (default bench_r2_tpu12.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
RESULTS = {"golden": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2l {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu12.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import C_SQ
    from lbm_tpu.runtime.driver import run_simulation, select_aa

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    params = read_params(f"{REF}/input_1024x1024.params")
    obstacles = read_obstacles(f"{REF}/obstacles_1024x1024.dat", params)
    assert select_aa(params, "auto", jnp.float32) is False, "auto must pick AA"
    r = run_simulation(params, obstacles, backend="auto")

    ref_av = np.loadtxt(f"{REF}/check/1024x1024.av_vels.dat", usecols=[1])
    diff = ref_av - np.asarray(r.av_vels, np.float64)
    av_pct = float(np.abs(100.0 * diff / (ref_av - diff)).max())

    cells = np.asarray(r.cells, np.float64)
    rho = cells.sum(axis=0)
    pressure = np.where(
        np.asarray(obstacles) != 0, params.density * C_SQ, rho * C_SQ
    )
    ref_p = np.load(os.path.join(GOLDEN_DIR, "1024x1024.golden.npz"))["pressure"]
    dp = ref_p - pressure
    fs_pct = float(np.abs(100.0 * dp / (ref_p - dp)).max())

    rec = {"config": "1024x1024-auto(aa)", "loop_s": round(r.elapsed, 4),
           "mlups": round(r.mlups(params), 1), "av_max_pct": av_pct,
           "fs_max_pct": fs_pct,
           "golden_pass": av_pct < 1.0 and fs_pct < 1.0,
           "reynolds": r.reynolds(params, obstacles)}
    RESULTS["golden"].append(rec)
    log(f"1024x1024 auto(aa): {rec['loop_s']}s = {rec['mlups']} MLUPS, "
        f"av {av_pct:.3g}% fs {fs_pct:.3g}% pass={rec['golden_pass']}")

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
