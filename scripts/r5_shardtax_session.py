#!/usr/bin/env python
"""Round-5 mesh=1 sharding-tax decomposition (VERDICT r4 item 2).

bench_r4_shardratio_fused.json measured the band2 mesh=1 protocol tax at
1.217x but never attributed it. The two suspect terms (sharded.py
protocol notes):

- compact halo materialization: two (9, nblk*T, nx) arrays built by
  reshape+concat per pass (~75 MB extra HBM traffic at 2048^2 B128 T16
  on a ~302 MB base) -> the LEAN protocol reads interior strips via
  BlockSpec views of cells (LBM_SHARD_LEAN).
- the per-step forcing FIELD: 3 full-buffer compares + 6 full-buffer
  FMAs per step for a 1-row effect -> the ROW form is one dynamic-row
  in-place update (LBM_SHARD_FORCE=row).

One process, interleaved brackets, 2048^2 x 1024 iters, mesh=1:
single-device band2 (the denominator), then sharded under
legacy/lean x field/row. Ratios attribute the tax; the winner becomes
the default.

    python scripts/r5_shardtax_session.py OUT.json [--brackets 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[r5shard {time.strftime('%H:%M:%S')}] {m}", flush=True)


VARIANTS = (
    ("legacy_field", {"LBM_SHARD_LEAN": "0", "LBM_SHARD_FORCE": "field"}),
    ("lean_field", {"LBM_SHARD_LEAN": "1", "LBM_SHARD_FORCE": "field"}),
    ("lean_row", {"LBM_SHARD_LEAN": "1", "LBM_SHARD_FORCE": "row"}),
    ("legacy_row", {"LBM_SHARD_LEAN": "0", "LBM_SHARD_FORCE": "row"}),
)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r5_shardtax.json"
    brackets = 3
    if "--brackets" in sys.argv:
        brackets = int(sys.argv[sys.argv.index("--brackets") + 1])

    import jax

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.parallel.sharded import run_simulation_sharded
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "runs": {}, "summary": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    def rec(tag, secs):
        results["runs"].setdefault(tag, []).append(round(secs, 4))

    # warm: cheap AA run absorbs the session warmup
    pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obw = np.zeros((1024, 1024), np.int32)
    obw[0, :] = obw[-1, :] = 1
    t0 = time.time()
    r = run_simulation(pw, obw, backend="aa", fetch_final=False)
    log(f"warm: {r.elapsed:.3f}s loop, {time.time() - t0:.0f}s wall")

    p2 = LBMParams(nx=2048, ny=2048, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obs2 = np.zeros((2048, 2048), np.int32)
    obs2[0, :] = obs2[-1, :] = 1
    cells = 2048 * 2048 * 1024 / 1e6

    for b in range(brackets):
        try:
            r = run_simulation(p2, obs2, backend="band2", fetch_final=False)
            rec("single", r.elapsed)
            log(f"b{b} single: {r.elapsed:.4f}s ({cells / r.elapsed:.0f})")
        except Exception as e:
            log(f"b{b} single FAILED: {type(e).__name__}: {str(e)[:200]}")
        for tag, env in VARIANTS:
            for k, v in env.items():
                os.environ[k] = v
            try:
                r = run_simulation_sharded(p2, obs2, n_devices=1,
                                           backend="band2")
                rec(tag, r.elapsed)
                log(f"b{b} {tag}: {r.elapsed:.4f}s ({cells / r.elapsed:.0f})")
            except Exception as e:
                log(f"b{b} {tag} FAILED: {type(e).__name__}: {str(e)[:200]}")
        dump()

    singles = results["runs"].get("single", [])
    if singles:
        s = min(singles)
        results["summary"]["single_mlups"] = round(cells / s, 1)
        for tag, _ in VARIANTS:
            runs = results["runs"].get(tag, [])
            if runs:
                results["summary"][tag] = {
                    "best_s": round(min(runs), 4),
                    "mlups": round(cells / min(runs), 1),
                    "overhead_x": round(min(runs) / s, 3),
                }
    dump()
    log(f"summary: {results['summary']}")
    log("done")


if __name__ == "__main__":
    main()
