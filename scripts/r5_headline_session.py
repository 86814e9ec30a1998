#!/usr/bin/env python
"""Round-5 headline refresh: re-measure the headline-table rows whose
artifacts predate the current defaults (fused collision landed round 4;
256^2 / 128x256 rows still cite round-2 sessions), in ONE process so the
rates are comparable (CLAUDE.md: never compare across processes).

Per row: one warmup pass, then best-of-3 timed passes (fetch_final=False
-- the av series is still fetched, which is also the sync). Official
configs additionally gate av_vels against the upstream golds at the 1%
check.py tolerance. HBM rows run >=1024 iters (round-5 measurement law:
short runs are floored by the ~25-60 ms fixed cost).

    python scripts/r5_headline_session.py OUT.json
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
    print(f"[r5head {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = positional[0] if positional else "bench_r5_headline2.json"

    import jax

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.runtime.driver import run_simulation

    def walls(ny, nx):
        ob = np.zeros((ny, nx), np.int32)
        ob[0, :] = ob[-1, :] = 1
        return ob

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "sections": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    dtype = "c16" if "--c16" in sys.argv else "float32"

    def row(tag, params, obstacles, ref_av=None, backend="auto"):
        try:
            t0 = time.time()
            run_simulation(params, obstacles, backend=backend, dtype=dtype,
                           fetch_final=False)  # warm (absorbs compile)
            passes = [run_simulation(params, obstacles, backend=backend,
                                     dtype=dtype, fetch_final=False)
                      for _ in range(3)]
            res = min(passes, key=lambda r: r.elapsed)
            rec = {"loop_s": round(res.elapsed, 4),
                   "passes_s": [round(r.elapsed, 4) for r in passes],
                   "mlups": round(res.mlups(params), 1),
                   "wall_s": round(time.time() - t0, 1)}
            if ref_av is not None:
                d = 100.0 * (ref_av - res.av_vels) / res.av_vels
                rec["av_max_pct"] = round(float(np.max(np.abs(d))), 4)
                rec["gate"] = ("pass" if np.isfinite(res.av_vels).all()
                               and float(np.max(np.abs(d))) <= 1.0
                               else "FAIL")
        except Exception as e:
            rec = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        results["sections"][tag] = rec
        log(f"{tag}: {rec}")
        dump()

    from lbm_tpu.models.d2q9 import LBMParams

    sizes_arg = next((a.split("=", 1)[1] for a in sys.argv[1:]
                      if a.startswith("--sizes=")), None)
    big = "--big" in sys.argv
    if sizes_arg:
        # e.g. --sizes=2048:8192,3072:4096 -> [(2048, 8192), (3072, 4096)]
        pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
        row("warm_1024", pw, walls(1024, 1024), backend="aa")
        sizes = tuple(tuple(int(x) for x in s.split(":"))
                      for s in sizes_arg.split(","))
    elif not big:
        # Official configs (gold-gated; 128x128 first = warm absorber).
        for cfg in ("128x128", "128x256", "256x256"):
            params = read_params(f"{REF}/input_{cfg}.params")
            obstacles = read_obstacles(f"{REF}/obstacles_{cfg}.dat", params)
            ref_av = np.loadtxt(f"{REF}/check/{cfg}.av_vels.dat", usecols=[1])
            row(f"official_{cfg}", params, obstacles, ref_av=ref_av)
        sizes = ((1536, 2048), (2048, 2048), (3072, 1024), (4096, 1024))
    else:
        # Panel-regime widths (12+ min compiles each when uncached --
        # cheap 1024^2 AA warm first, per the ab_session hard lesson).
        pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
        row("warm_1024", pw, walls(1024, 1024), backend="aa")
        sizes = ((5120, 1024), (6144, 1024), (8192, 1920))

    # HBM-regime rows at the round-5 head (walls geometry, >=1024 iters).
    for n, iters in sizes:
        p = LBMParams(nx=n, ny=n, max_iters=iters, reynolds_dim=10,
                      density=0.1, accel=0.005, omega=1.85)
        row(f"hbm_{n}", p, walls(n, n))

    log("done")


if __name__ == "__main__":
    main()
