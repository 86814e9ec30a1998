#!/usr/bin/env python
"""Bisect run_band3's compile failure ABOVE the kernel level.

probe_band3_compile.py proved every band3 kernel variant compiles and
runs standalone on TPU (bench_r4_band3probe.json: all 7 OK), yet the
driver path fails the remote compile (bench_r4_band3.json). So the
failure is in the surrounding jit program. Ladder, one process:

    step    jit(step_band3) — one fused pass, fuse_last=True
    run8    run_simulation backend=band3, iters=T  (npasses=1: ONE
            kernel, fuse_last=False, + jnp pre-force + conversions)
    run16   iters=2T (npasses=2: fori over the fused kernel + the
            unfused final — TWO distinct Mosaic kernels in one program)
    run1k   iters=1024 (the failed ab_session shape)

    python scripts/probe_band3_run.py OUT.json [size]
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[b3run {time.strftime('%H:%M:%S')}] {m}", flush=True)


class Timeout(Exception):
    pass


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r4_band3run.json"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.ops.pallas_band import nobst_ext
    from lbm_tpu.ops.pallas_band3 import (
        _force_s_storage,
        pick_config3,
        step_band3,
        stream_planes,
    )
    from lbm_tpu.runtime.driver import run_simulation, sync

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "size": size,
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "probes": {}}
    block, depth = pick_config3(size, size)
    results["meta"]["config"] = [block, depth]
    log(f"device: {results['meta']['device']} — {size}^2 B{block}T{depth}")

    obstacles = np.zeros((size, size), np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1

    t0 = time.time()
    sync(jnp.zeros((8, 128)) + 1.0)
    log(f"session warm in {time.time()-t0:.0f}s")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    def attempt(tag, fn):
        t0 = time.time()
        signal.signal(signal.SIGALRM,
                      lambda *_: (_ for _ in ()).throw(Timeout()))
        signal.alarm(1500)
        try:
            fn()
            results["probes"][tag] = {
                "ok": True, "wall_s": round(time.time() - t0, 1)}
            log(f"{tag}: OK ({time.time()-t0:.0f}s)")
        except Exception as e:
            results["probes"][tag] = {
                "ok": False, "wall_s": round(time.time() - t0, 1),
                "error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"{tag}: FAIL {type(e).__name__} ({time.time()-t0:.0f}s)")
        finally:
            signal.alarm(0)
        dump()

    params0 = LBMParams(nx=size, ny=size, max_iters=depth, reynolds_dim=10,
                        density=0.1, accel=0.005, omega=1.85)

    def v_step():
        cells = D2Q9.initial_state(params0, dtype=jnp.float32)
        nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
        ne = nobst_ext(nobst, block, depth, jnp.float32)
        owner = jnp.ones((1, 1), jnp.float32)

        @jax.jit
        def go(cells):
            st = stream_planes(cells)
            st = _force_s_storage(st, nobst,
                                  float(params0.density * params0.accel / 9),
                                  float(params0.density * params0.accel / 36))
            st, sums = step_band3(st, ne, owner, params0.density,
                                  params0.accel, params0.omega, block, depth)
            return stream_planes(st, sign=-1), sums

        out, _ = go(cells)
        sync(out)

    attempt("step", v_step)

    def runner(iters):
        def fn():
            p = LBMParams(nx=size, ny=size, max_iters=iters, reynolds_dim=10,
                          density=0.1, accel=0.005, omega=1.85)
            res = run_simulation(p, obstacles, backend="band3",
                                 fetch_final=False)
            log(f"  -> {p.nx*p.ny*iters/res.elapsed/1e6:.0f} MLUPS "
                f"(loop {res.elapsed:.3f}s)")
        return fn

    attempt("run8", runner(depth))
    attempt("run16", runner(2 * depth))
    attempt("run1k", runner(1024))
    log("done: " + json.dumps(
        {k: v["ok"] for k, v in results["probes"].items()}))


if __name__ == "__main__":
    main()
