#!/usr/bin/env python
"""Re-demo of the probe-toolchain protocol AFTER the platform-pin fix.

The round-5 subprocess isolation pinned ``jax.devices()[0].platform``
("tpu") in the probe child, which selects the native libtpu plugin
instead of the relay's "axon" registration — every cached verdict was a
backend-init error ("No jellyfish device found"), not a compile verdict
(bench_r5_c16probe.json.probecache.json). Fixed: the child now pins the
parent's ``jax_platforms`` CONFIG value. This session re-runs the demo
shapes so the committed cache holds GENUINE toolchain verdicts (the
relay compile-helper's real HTTP 500s), like round 4's in-process cache
did (bench_r4_probe_tpu.probecache.json).

    python scripts/r5_probefix_session.py OUT.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[probefix {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = positional[0] if positional else "bench_r5_probefix.json"
    cache_path = os.path.abspath(out_path) + ".probecache.json"
    if os.path.exists(cache_path):
        os.remove(cache_path)
    os.environ["LBM_PROBE_CACHE"] = cache_path

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
               "sections": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    t0 = time.time()
    r = run_simulation(pw, walls(1024), backend="aa", fetch_final=False)
    log(f"warm: {r.elapsed:.3f}s loop, {time.time() - t0:.0f}s wall")

    os.environ["LBM_TOOLCHAIN"] = "probe"
    cases = [("c16", 1536), ("c16", 2048), ("float32", 1536)]
    for dt, n in cases:
        p = LBMParams(nx=n, ny=n, max_iters=512, reynolds_dim=10,
                      density=0.1, accel=0.005, omega=1.85)
        ob = walls(n)
        secs = []
        for attempt in ("first", "cached"):
            try:
                t0 = time.time()
                r = run_simulation(p, ob, backend="auto", dtype=dt,
                                   fetch_final=False)
                secs.append({"attempt": attempt,
                             "loop_s": round(r.elapsed, 4),
                             "mlups": round(n * n * 512 / r.elapsed / 1e6, 1),
                             "wall_s": round(time.time() - t0, 1)})
                log(f"{dt} {n}^2 {attempt}: loop {r.elapsed:.3f}s, "
                    f"wall {secs[-1]['wall_s']:.0f}s")
            except Exception as e:
                secs.append({"attempt": attempt,
                             "error": f"{type(e).__name__}: {str(e)[:300]}"})
                log(f"{dt} {n}^2 {attempt} FAILED: {e}")
        results["sections"][f"probe_{dt}_{n}"] = secs
        dump()
    os.environ.pop("LBM_TOOLCHAIN", None)
    try:
        with open(cache_path) as f:
            results["sections"]["probe_cache"] = json.load(f)
    except (OSError, ValueError):  # absent, or a merge-race left bad JSON
        results["sections"]["probe_cache"] = "absent"
    dump()
    log("done")


if __name__ == "__main__":
    main()
