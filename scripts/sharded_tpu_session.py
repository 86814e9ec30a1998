#!/usr/bin/env python
"""Sharded-production-path TPU certification (VERDICT r3 item 2).

All sharded validation so far is CPU-mesh/interpret (tests/test_sharded.py,
dryrun_multichip) plus a standalone kernel compile probe — the production
``run_simulation_sharded`` composition (shard_map + ppermute + Pallas under
the real Mosaic/XLA:TPU stack) had never EXECUTED on silicon. One chip is
available, so this runs the real code path at mesh=1 (the collectives
compile and execute as self-permutes — same program structure, degenerate
ring):

1. 1-D mesh=1 golden gate: the full official 1024x1024 config through
   ``run_simulation_sharded`` (auto backend), checked against the golden
   av_vels and the stand-in pressure gold at the upstream 1% tolerance.
2. 2-D (1,1)-mesh golden gate: same config through
   ``run_simulation_sharded_2d`` (the col_fix kernel + corner exchanges).
3. A timed comm-avoiding band2-sharded run (--backend band2 --mesh 1,
   2048^2): the T-steps-per-ppermute schedule's first hardware timing.

    python scripts/sharded_tpu_session.py OUT.json [--skip-2d]

Writes one JSON file; every section records pass/fail + timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REF = "/root/reference"
GOLD_FALLBACK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "tests", "golden")


def log(m):
    print(f"[shard {time.strftime('%H:%M:%S')}] {m}", flush=True)


def gold_path(cfg, kind):
    p = f"{REF}/check/{cfg}.{kind}.dat"
    if os.path.exists(p):
        return p
    p2 = os.path.join(GOLD_FALLBACK, f"{cfg}.{kind}.dat")
    return p2 if os.path.exists(p2) else None


def gate(res, params, obstacles, cfg):
    import jax.numpy as jnp

    from lbm_tpu.ops.reference import velocity_field

    rec = {"loop_s": round(res.elapsed, 4),
           "mlups": round(res.mlups(params), 1),
           "compile_s": round(res.compile_time, 1)}
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
    return rec


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r4_sharded.json"
    skip_2d = "--skip-2d" in sys.argv

    import jax

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.parallel.sharded import (
        run_simulation_sharded,
        run_simulation_sharded_2d,
    )

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "sections": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    cfg = "1024x1024"
    params = read_params(f"{REF}/input_{cfg}.params")
    obstacles = read_obstacles(f"{REF}/obstacles_{cfg}.dat", params)

    # 1. 1-D mesh=1 golden gate (absorbs the session warmup too).
    try:
        t0 = time.time()
        res = run_simulation_sharded(params, obstacles, n_devices=1,
                                     backend="auto")
        rec = gate(res, params, obstacles, cfg)
        rec["wall_s"] = round(time.time() - t0, 1)
        results["sections"]["mesh1_1d_golden"] = rec
        log(f"1-D mesh=1 golden: {rec}")
    except Exception as e:
        results["sections"]["mesh1_1d_golden"] = {
            "error": f"{type(e).__name__}: {str(e)[:300]}"}
        log(f"1-D mesh=1 golden FAILED: {e}")
    dump()

    # 2. 2-D (1,1) mesh golden gate (col_fix kernel + corner exchanges).
    if not skip_2d:
        try:
            t0 = time.time()
            res = run_simulation_sharded_2d(params, obstacles,
                                            mesh_shape=(1, 1),
                                            backend="auto")
            rec = gate(res, params, obstacles, cfg)
            rec["wall_s"] = round(time.time() - t0, 1)
            results["sections"]["mesh11_2d_golden"] = rec
            log(f"2-D (1,1) golden: {rec}")
        except Exception as e:
            results["sections"]["mesh11_2d_golden"] = {
                "error": f"{type(e).__name__}: {str(e)[:300]}"}
            log(f"2-D (1,1) golden FAILED: {e}")
        dump()

    # 3. Timed comm-avoiding band2-sharded run at a real shard shape.
    try:
        p2 = LBMParams(nx=2048, ny=2048, max_iters=1024, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
        obs2 = np.zeros((2048, 2048), np.int32)
        obs2[0, :] = obs2[-1, :] = 1
        t0 = time.time()
        res = run_simulation_sharded(p2, obs2, n_devices=1, backend="band2")
        rec = {"loop_s": round(res.elapsed, 4),
               "mlups": round(res.mlups(p2), 1),
               "compile_s": round(res.compile_time, 1),
               "wall_s": round(time.time() - t0, 1),
               "finite": bool(np.isfinite(res.av_vels).all())}
        results["sections"]["band2_sharded_2048_timed"] = rec
        log(f"band2-sharded 2048^2 x1024: {rec}")
    except Exception as e:
        results["sections"]["band2_sharded_2048_timed"] = {
            "error": f"{type(e).__name__}: {str(e)[:300]}"}
        log(f"band2-sharded timed FAILED: {e}")
    dump()
    log("done")


if __name__ == "__main__":
    main()
