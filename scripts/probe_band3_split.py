#!/usr/bin/env python
"""Measure band3's even/odd step-cost split at RUNTIME (not compile walls).

bench_r4_band3ab.json showed band3 at parity with band2 despite 7-19%
lower trapezoid redundancy — so the in-place body must cost more per
step. The compile-isolation probes (probe='evensonly'/'oddsonly', WRONG
physics, same op mix) make the split measurable: each variant runs the
same pass count through a jitted fori chain (AOT-compiled, one scalar
fetch to sync), interleaved in one process, so the per-step cost of the
local S->C body vs the gather/scatter C->S body is a direct A/B.

    python scripts/probe_band3_split.py OUT.json [size] [block] [depth] \
        [--passes 64] [--brackets 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[b3split {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else "bench_r4_band3split.json"
    size = int(args[1]) if len(args) > 1 else 2048
    block = int(args[2]) if len(args) > 2 else 128
    depth = int(args[3]) if len(args) > 3 else 8

    def opt(name, default):
        return int(sys.argv[sys.argv.index(name) + 1]) \
            if name in sys.argv else default

    passes = opt("--passes", 64)
    brackets = opt("--brackets", 3)

    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.ops.pallas_band import nobst_ext
    from lbm_tpu.ops.pallas_band3 import _make_call3, stream_planes
    from lbm_tpu.runtime.driver import sync

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "size": size, "block": block, "depth": depth,
                        "passes": passes,
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "runs": {}, "best": {}}
    log(f"device: {results['meta']['device']} — {size}^2 B{block}T{depth}, "
        f"{passes} passes x {depth} steps")

    params = LBMParams(nx=size, ny=size, max_iters=depth, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    obstacles = np.zeros((size, size), np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    cells = D2Q9.initial_state(params, dtype=jnp.float32)
    state = stream_planes(cells)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    nob_ext = nobst_ext(nobst, block, depth, jnp.float32)
    owner = jnp.ones((1, 1), jnp.float32)

    t0 = time.time()
    sync(jnp.zeros((8, 128)) + 1.0)
    log(f"session warm in {time.time()-t0:.0f}s")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    w1a = float(params.density * params.accel / 9.0)
    w2a = float(params.density * params.accel / 36.0)
    compiled = {}
    for probe in ("full", "evensonly", "oddsonly"):
        try:
            t0 = time.time()
            call = _make_call3(size, size, block, depth, w1a, w2a,
                               float(params.omega), False, "float32",
                               probe="" if probe == "full" else probe)

            def chain(s, call=call):
                def body(_, s):
                    return call(s, s, s, nob_ext, owner)[0]
                s = jax.lax.fori_loop(0, passes, body, s)
                return jnp.float32(s[0, 0, 0])

            fn = jax.jit(chain).lower(state).compile()
            sync(fn(state))  # first dispatch outside the timing
            compiled[probe] = fn
            results["runs"][probe] = []
            log(f"{probe}: compiled+first in {time.time()-t0:.0f}s")
        except Exception as e:
            results["runs"][probe] = [
                {"error": f"{type(e).__name__}: {str(e)[:200]}"}]
            log(f"{probe}: FAIL {type(e).__name__}")
        dump()

    for b in range(brackets):
        for probe, fn in compiled.items():
            t0 = time.time()
            sync(fn(state))
            el = time.time() - t0
            ns_per_step = el / (passes * depth) * 1e9
            results["runs"][probe].append(round(el, 4))
            log(f"b{b} {probe}: {el:.3f}s "
                f"({ns_per_step/size/size*1e0:.3f} ns/cell-step, "
                f"{size*size*passes*depth/el/1e6:.0f} MLUPS-equiv)")
        dump()

    for probe, fn in compiled.items():
        runs = [r for r in results["runs"][probe] if isinstance(r, float)]
        if runs:
            best = min(runs)
            results["best"][probe] = {
                "best_s": round(best, 4),
                "mlups_equiv": round(
                    size * size * passes * depth / best / 1e6, 1),
            }
    if {"evensonly", "oddsonly"} <= results["best"].keys():
        results["best"]["odd_over_even"] = round(
            results["best"]["oddsonly"]["best_s"]
            / results["best"]["evensonly"]["best_s"], 3)
    dump()
    log("best: " + json.dumps(results["best"]))


if __name__ == "__main__":
    main()
