#!/usr/bin/env python
"""End-to-end TPU demonstration of LBM_TOOLCHAIN=probe (one process).

Two stages against a throwaway probe cache:

1. 1024^2 f32 auto — the standard-profile route (AA + MXU av fold)
   compiles on this relay; expect a run and an "ok" cache entry.
2. 1536^2 f32 auto — standard routing claims AA (85 MB state), which is
   KNOWN to exceed this relay's compile ceiling (bench_r2_tpu15.json);
   expect ProbeCompileError -> "fail" cached -> transparent fallback to
   the relay route (band2) and a finished run. A rerun of the same
   shape must skip the doomed attempt (cache hit, no second failure).

    python scripts/probe_toolchain_session.py OUT.json

The probe cache is written next to OUT.json (OUT.probecache.json) so
the real ~/.cache is never touched.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[probe-tc {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_probe_toolchain.json"
    cache_path = out_path.replace(".json", "") + ".probecache.json"
    if os.path.exists(cache_path):
        os.remove(cache_path)
    os.environ["LBM_TOOLCHAIN"] = "probe"
    os.environ["LBM_PROBE_CACHE"] = cache_path
    os.environ.setdefault("LBM_PROBE_TIMEOUT", "1200")

    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime import driver

    dev = jax.devices()[0]
    results = {
        "meta": {
            "device": f"{dev.device_kind} ({dev.platform})",
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "cache": cache_path,
        },
        "stages": {},
    }

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    t0 = time.time()
    driver.sync(jnp.zeros((8, 128)) + 1.0)
    log(f"session warm in {time.time()-t0:.0f}s")

    def stage(tag, n, iters):
        params = LBMParams(
            nx=n, ny=n, max_iters=iters, reynolds_dim=n,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((n, n), np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        t0 = time.time()
        try:
            res = driver.run_simulation(
                params, obstacles, backend="auto", fetch_final=False,
            )
            row = {
                "ok": True,
                "elapsed": round(res.elapsed, 3),
                "compile_s": round(res.compile_time, 1),
                "wall_s": round(time.time() - t0, 1),
                "mlups": round(n * n * iters / res.elapsed / 1e6),
                "tot_u_last": float(res.av_vels[-1]),
            }
        except Exception as e:  # noqa: BLE001 — record, don't die
            row = {"ok": False, "error": f"{type(e).__name__}: {str(e)[:300]}"}
        cache = driver._probe_cache_load()
        row["cache"] = {
            k: v["status"] for k, v in cache.items()
        }
        results["stages"][tag] = row
        log(f"{tag}: {row}")
        dump()

    stage("s1_1024_ok_path", 1024, 254 * 8)
    stage("s2_1536_fallback", 1536, 254 * 4)
    stage("s3_1536_cached_skip", 1536, 254 * 4)
    log("done")


if __name__ == "__main__":
    main()
