#!/usr/bin/env python
"""Round-5 c16 session: the MXU av-fold under 16-bit storage (VERDICT r4
item 4's last open cell) + the probe-toolchain demo on real user shapes
(item 8).

Part A — c16 AA 1024^2 (the one relay-valid c16 AA width,
bench_r3_aac16.json) A/B: tree av-fold (shipped) vs LBM_COLLIDE=
fused-mxuav (the embedded (1, rows) x (rows, nx) dot_general that won
+4.9% on f32 AA). The dot runs on in-kernel DECODED f32 values, but
16-bit-storage AA builds are compile-fragile on this relay and were
never probed with the dot (`collision.av_route` storage gate). Compile
pass/fail is a datum either way; a measured win extends av_route to c16.

Part B — LBM_TOOLCHAIN=probe with --backend aa --precision c16 at
1536^2/2048^2: the widths a user with 16-bit storage would actually
want (c16 residency extends 2x past f32), which this relay's compile
helper rejects (nx >= 1280 16-bit width failures). Expect: subprocess
probe compile fails cleanly -> verdict cached -> fallback route runs the
config to completion in the same process -> a second run skips straight
to the fallback on the cached verdict. Demonstrates d2q9-bgk.c:950-1007
-style runtime adaptation with real shapes.

    python scripts/r5_c16probe_session.py OUT.json [--brackets 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[r5c16 {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r5_c16probe.json"
    brackets = 3
    if "--brackets" in sys.argv:
        brackets = int(sys.argv[sys.argv.index("--brackets") + 1])

    # A fresh, committed-to-artifact probe cache for the demo.
    cache_path = os.path.abspath(out_path) + ".probecache.json"
    if os.path.exists(cache_path):
        os.remove(cache_path)
    os.environ["LBM_PROBE_CACHE"] = cache_path

    import jax

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "runs": {}, "sections": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    def rec(tag, secs):
        results["runs"].setdefault(tag, []).append(round(secs, 4))

    def walls(n):
        o = np.zeros((n, n), np.int32)
        o[0, :] = o[-1, :] = 1
        return o

    # warm
    pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    t0 = time.time()
    r = run_simulation(pw, walls(1024), backend="aa", fetch_final=False)
    log(f"warm: {r.elapsed:.3f}s loop, {time.time() - t0:.0f}s wall")

    # Part A: c16 AA 1024^2 tree vs mxuav, interleaved.
    p1 = LBMParams(nx=1024, ny=1024, max_iters=2048, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    ob1 = walls(1024)
    cells_m = 1024 * 1024 * 2048 / 1e6
    mxuav_ok = True
    for b in range(brackets):
        for tag, collide in (("c16_tree", None),
                             ("c16_mxuav", "fused-mxuav")):
            if tag == "c16_mxuav" and not mxuav_ok:
                continue
            if collide is None:
                os.environ.pop("LBM_COLLIDE", None)
            else:
                os.environ["LBM_COLLIDE"] = collide
            try:
                r = run_simulation(p1, ob1, backend="aa", dtype="c16",
                                   fetch_final=False)
                rec(tag, r.elapsed)
                log(f"b{b} {tag}: {r.elapsed:.4f}s "
                    f"({cells_m / r.elapsed:.0f})")
            except Exception as e:
                log(f"b{b} {tag} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
                if tag == "c16_mxuav":
                    mxuav_ok = False
                    results["sections"]["c16_mxuav_compile"] = (
                        f"FAIL: {type(e).__name__}: {str(e)[:300]}")
        dump()
    os.environ.pop("LBM_COLLIDE", None)
    if results["runs"].get("c16_tree") and results["runs"].get("c16_mxuav"):
        t, m = (min(results["runs"]["c16_tree"]),
                min(results["runs"]["c16_mxuav"]))
        results["sections"]["c16_mxuav_vs_tree"] = {
            "tree_mlups": round(cells_m / t, 1),
            "mxuav_mlups": round(cells_m / m, 1),
            "delta_pct": round((t / m - 1) * 100, 2),
        }
    dump()

    # Part B: probe-toolchain demo at the blocked c16 AA widths.
    os.environ["LBM_TOOLCHAIN"] = "probe"
    for n in (1536, 2048):
        p = LBMParams(nx=n, ny=n, max_iters=512, reynolds_dim=10,
                      density=0.1, accel=0.005, omega=1.85)
        ob = walls(n)
        secs = []
        for attempt in ("first", "cached"):
            try:
                t0 = time.time()
                r = run_simulation(p, ob, backend="auto", dtype="c16",
                                   fetch_final=False)
                wall = time.time() - t0
                secs.append({"attempt": attempt,
                             "loop_s": round(r.elapsed, 4),
                             "mlups": round(n * n * 512 / r.elapsed / 1e6, 1),
                             "wall_s": round(wall, 1)})
                log(f"probe c16 {n}^2 {attempt}: loop {r.elapsed:.3f}s, "
                    f"wall {wall:.0f}s")
            except Exception as e:
                secs.append({"attempt": attempt,
                             "error": f"{type(e).__name__}: {str(e)[:300]}"})
                log(f"probe c16 {n}^2 {attempt} FAILED: {e}")
        results["sections"][f"probe_c16_{n}"] = secs
        dump()
    os.environ.pop("LBM_TOOLCHAIN", None)
    try:
        with open(cache_path) as f:
            results["sections"]["probe_cache"] = json.load(f)
    except OSError:
        results["sections"]["probe_cache"] = "absent"
    dump()
    log(f"sections: {json.dumps(results['sections'])[:600]}")
    log("done")


if __name__ == "__main__":
    main()
