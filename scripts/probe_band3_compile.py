#!/usr/bin/env python
"""Bisect which band3 structural feature the relay compile helper rejects.

bench_r4_band3.json: EVERY band3 config failed the remote compile (HTTP
500, subprocess exit 1) at every size — including B64T8@4096^2 (~58 MB,
far under the footprint ceiling) — while band2 compiled in-session. The
failure is structural, not footprint. The in-place candidates, bisected
here in ONE process (each probe variant is a single pallas_call built by
_make_call3 with a compile-isolation `probe` flag — wrong physics, only
compile success matters):

    full            the real kernel (reproduce the failure)
    nofuse          no fused forcing RMW inside the odd tile loop
    noforce         no C-space force_odd row RMWs
    evensonly       only the local in-place slot-permutation body
    oddsonly        only the gather/scatter body
    alignedscatter  odd scatter writes at the tile origin (aligned rows)
    noscatterwrap   odd scatter clamped in-range (no split stores)

Context: pallas_aa (no grid, manual DMA) compiles the SAME unaligned
in-place writes; band2 (grid + BlockSpecs) compiles aligned ping-pong
writes. band3 = grid + unaligned in-place — the cross product is new.

    python scripts/probe_band3_compile.py OUT.json [size] [block] [depth]
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

PROBES = ["full", "nofuse", "noforce", "evensonly", "oddsonly",
          "alignedscatter", "noscatterwrap"]


def log(m):
    print(f"[b3probe {time.strftime('%H:%M:%S')}] {m}", flush=True)


class Timeout(Exception):
    pass


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r4_band3probe.json"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.ops.pallas_band import nobst_ext
    from lbm_tpu.ops.pallas_band3 import _make_call3, stream_planes
    from lbm_tpu.runtime.driver import sync

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "size": size, "block": block, "depth": depth,
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "probes": {}}
    log(f"device: {results['meta']['device']} — {size}^2 B{block}T{depth}")

    params = LBMParams(nx=size, ny=size, max_iters=depth, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    obstacles = np.zeros((size, size), np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    cells = D2Q9.initial_state(params, dtype=jnp.float32)
    state = stream_planes(cells)
    nobst = (jnp.asarray(obstacles) == 0).astype(jnp.float32)
    nob_ext = nobst_ext(nobst, block, depth, jnp.float32)
    owner = jnp.ones((1, 1), jnp.float32)
    # Warm the session on a trivial op first (the 3-13 min first-fetch).
    t0 = time.time()
    sync(jnp.zeros((8, 128)) + 1.0)
    log(f"session warm in {time.time()-t0:.0f}s")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    for probe in PROBES:
        tag = probe
        t0 = time.time()
        signal.signal(signal.SIGALRM,
                      lambda *_: (_ for _ in ()).throw(Timeout()))
        signal.alarm(1500)
        try:
            call = _make_call3(
                size, size, block, depth,
                float(params.density * params.accel / 9.0),
                float(params.density * params.accel / 36.0),
                float(params.omega), False, "float32",
                probe="" if probe == "full" else probe,
            )
            out, sums = call(state, state, state, nob_ext, owner)
            sync(out)
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
    log("done: " + json.dumps(
        {k: v["ok"] for k, v in results["probes"].items()}))


if __name__ == "__main__":
    main()
