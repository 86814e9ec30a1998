#!/usr/bin/env python
"""Interleaved f32-vs-c16 A/B at the widths where the separate-process
headline refreshes suggested c16 is FASTER than f32 (1536^2 full-row,
5120^2 panel). Separate-process comparisons are inside the documented
±20% inter-process noise (CLAUDE.md measurement law; flagged in code
review) — this session interleaves both dtypes in ONE process, 3
brackets, best-of-3, long-enough runs that the ~30-60 ms fixed cost is
noise.

    python scripts/r5_c16ab_session.py OUT.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[c16ab {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = positional[0] if positional else "bench_r5_c16ab.json"

    import jax

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    def walls(n):
        ob = np.zeros((n, n), np.int32)
        ob[0, :] = ob[-1, :] = 1
        return ob

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "runs": {}, "sections": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    t0 = time.time()
    r = run_simulation(pw, walls(1024), backend="aa", fetch_final=False)
    log(f"warm: {r.elapsed:.3f}s loop, {time.time() - t0:.0f}s wall")

    cases = ((1536, 4096), (5120, 1024))
    for n, iters in cases:
        p = LBMParams(nx=n, ny=n, max_iters=iters, reynolds_dim=10,
                      density=0.1, accel=0.005, omega=1.85)
        ob = walls(n)
        for dt in ("float32", "c16"):  # compile both before any timing
            run_simulation(p, ob, backend="auto", dtype=dt,
                           fetch_final=False)
        for b in range(3):
            for dt in ("float32", "c16"):
                r = run_simulation(p, ob, backend="auto", dtype=dt,
                                   fetch_final=False)
                results["runs"].setdefault(f"{n}_{dt}", []).append(
                    round(r.elapsed, 4))
                log(f"b{b} {n}^2 {dt}: {r.elapsed:.4f}s")
            dump()
        f32 = min(results["runs"][f"{n}_float32"])
        c16 = min(results["runs"][f"{n}_c16"])
        results["sections"][f"ab_{n}"] = {
            "f32_best_s": f32, "c16_best_s": c16,
            "f32_mlups": round(n * n * iters / f32 / 1e6, 1),
            "c16_mlups": round(n * n * iters / c16 / 1e6, 1),
            "c16_over_f32": round(f32 / c16, 4),
        }
        log(f"ab_{n}: {results['sections'][f'ab_{n}']}")
        dump()
    log("done")


if __name__ == "__main__":
    main()
