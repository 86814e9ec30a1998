#!/usr/bin/env python
"""Round-5 end-of-round certification: golden gates for the two routes
whose defaults changed this round, on silicon.

1. c16 1024^2 official config through --backend aa: the av_route c16
   extension (bench_r5_c16probe.json, +4.8%) changed this explicit
   route's reduction form to the MXU fold — re-gate at the upstream 1%
   tolerance (reference check/check.py:26-31 semantics).
2. sharded mesh=1 1024^2 official config through run_simulation_sharded
   --backend band2: the lean halo protocol became the default
   (LBM_SHARD_LEAN) — re-gate the production sharded path.
3. bench.py-equivalent official 1024^2 f32 auto run (the headline
   config) as the session's closing sanity number.

    python scripts/r5_certify_session.py OUT.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REF = "/root/reference"


def log(m):
    print(f"[r5cert {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r5_certify.json"

    import jax

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.parallel.sharded import run_simulation_sharded
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "sections": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # warm
    pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obw = np.zeros((1024, 1024), np.int32)
    obw[0, :] = obw[-1, :] = 1
    t0 = time.time()
    r = run_simulation(pw, obw, backend="aa", fetch_final=False)
    log(f"warm: {r.elapsed:.3f}s loop, {time.time() - t0:.0f}s wall")

    cfg = "1024x1024"
    params = read_params(f"{REF}/input_{cfg}.params")
    obstacles = read_obstacles(f"{REF}/obstacles_{cfg}.dat", params)
    ref_av = np.loadtxt(f"{REF}/check/{cfg}.av_vels.dat", usecols=[1])

    def gate(tag, runner):
        try:
            t0 = time.time()
            res = runner()
            d = 100.0 * (ref_av - res.av_vels) / res.av_vels
            rec = {"loop_s": round(res.elapsed, 4),
                   "mlups": round(res.mlups(params), 1),
                   "av_max_pct": round(float(np.max(np.abs(d))), 4),
                   "gate": "pass"
                   if np.isfinite(res.av_vels).all()
                   and float(np.max(np.abs(d))) <= 1.0 else "FAIL",
                   "wall_s": round(time.time() - t0, 1)}
        except Exception as e:
            rec = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        results["sections"][tag] = rec
        log(f"{tag}: {rec}")
        dump()

    gate("c16_aa_mxuav_golden", lambda: run_simulation(
        params, obstacles, backend="aa", dtype="c16"))
    gate("sharded_lean_golden", lambda: run_simulation_sharded(
        params, obstacles, n_devices=1, backend="band2"))
    gate("official_f32_auto", lambda: run_simulation(
        params, obstacles, backend="auto"))
    log("done")


if __name__ == "__main__":
    main()
