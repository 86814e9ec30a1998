#!/usr/bin/env python
"""Round-4 follow-up session: mesh=1 sharding overhead measured in-session,
and the band3 kernel's official-config golden gate on silicon.

bench_r4_sharded.json timed the band2-sharded step at 3,431 MLUPS with no
single-device baseline in the same process — relay throughput varies up to
3x BETWEEN processes (CLAUDE.md), so that number is uninterpretable alone.
This session times, in ONE process, interleaved:

1. warm: 1024^2 AA (absorbs the session warmup).
2. single-device band2, 2048^2 x 1024 iters (run_simulation).
3. sharded band2, mesh=1, same config (run_simulation_sharded) —
   the T-per-ppermute protocol under the real XLA:TPU stack.
4. band3 golden gate: the official 1024x1024 config (20k iters) through
   --backend band3, checked against the golden av_vels at the upstream
   1% tolerance (check/check.py:26-31 semantics).

    python scripts/r4b_session.py OUT.json [--brackets 2]
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
    print(f"[r4b {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r4_shardratio.json"
    brackets = 2
    if "--brackets" in sys.argv:
        brackets = int(sys.argv[sys.argv.index("--brackets") + 1])

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

    # 1. warm
    pw = LBMParams(nx=1024, ny=1024, max_iters=2048, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obw = np.zeros((1024, 1024), np.int32)
    obw[0, :] = obw[-1, :] = 1
    t0 = time.time()
    res = run_simulation(pw, obw, backend="aa", fetch_final=False)
    results["sections"]["warm"] = {
        "loop_s": round(res.elapsed, 4), "mlups": round(res.mlups(pw), 1),
        "wall_s": round(time.time() - t0, 1)}
    log(f"warm: {results['sections']['warm']}")
    dump()

    # 2+3. single vs sharded band2 at 2048^2, interleaved brackets.
    p2 = LBMParams(nx=2048, ny=2048, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obs2 = np.zeros((2048, 2048), np.int32)
    obs2[0, :] = obs2[-1, :] = 1
    single, sharded = [], []
    for b in range(brackets):
        try:
            r = run_simulation(p2, obs2, backend="band2", fetch_final=False)
            single.append(r.elapsed)
            log(f"b{b} single band2: {r.elapsed:.4f}s "
                f"({r.mlups(p2):.0f} MLUPS)")
        except Exception as e:
            log(f"b{b} single band2 FAILED: {type(e).__name__}: "
                f"{str(e)[:200]}")
        try:
            r = run_simulation_sharded(p2, obs2, n_devices=1,
                                       backend="band2")
            sharded.append(r.elapsed)
            log(f"b{b} sharded band2: {r.elapsed:.4f}s "
                f"({r.mlups(p2):.0f} MLUPS)")
        except Exception as e:
            log(f"b{b} sharded band2 FAILED: {type(e).__name__}: "
                f"{str(e)[:200]}")
    cells = 2048 * 2048 * 1024 / 1e6
    rec = {}
    if single:
        rec["single_best_s"] = round(min(single), 4)
        rec["single_mlups"] = round(cells / min(single), 1)
    if sharded:
        rec["sharded_best_s"] = round(min(sharded), 4)
        rec["sharded_mlups"] = round(cells / min(sharded), 1)
    if single and sharded:
        rec["mesh1_overhead_x"] = round(min(sharded) / min(single), 3)
    results["sections"]["band2_mesh1_ratio"] = rec
    log(f"ratio: {rec}")
    dump()

    # 4. band3 golden gate, official 1024^2 config.
    cfg = "1024x1024"
    params = read_params(f"{REF}/input_{cfg}.params")
    obstacles = read_obstacles(f"{REF}/obstacles_{cfg}.dat", params)
    try:
        t0 = time.time()
        res = run_simulation(params, obstacles, backend="band3")
        ref_av = np.loadtxt(f"{REF}/check/{cfg}.av_vels.dat", usecols=[1])
        d = 100.0 * (ref_av - res.av_vels) / res.av_vels
        rec = {"loop_s": round(res.elapsed, 4),
               "mlups": round(res.mlups(params), 1),
               "av_max_pct": round(float(np.max(np.abs(d))), 4),
               "gate": "pass"
               if np.isfinite(res.av_vels).all()
               and float(np.max(np.abs(d))) <= 1.0 else "FAIL",
               "wall_s": round(time.time() - t0, 1)}
        results["sections"]["band3_1024_golden"] = rec
        log(f"band3 1024^2 golden: {rec}")
    except Exception as e:
        results["sections"]["band3_1024_golden"] = {
            "error": f"{type(e).__name__}: {str(e)[:300]}"}
        log(f"band3 golden FAILED: {e}")
    dump()
    log("done")


if __name__ == "__main__":
    main()
