#!/usr/bin/env python
"""Attribute the AA kernel's fixed per-step overhead at small grids.

bench_r4_wide_chunk2.json / bench_r4_b3probe2.json: the official 128-wide
configs pay a fixed ~0.5-0.6 us/step over the VPU compute floor (128^2
13.7k MLUPS vs 256^2's 28.7k), and the chunk ladder proved it is NOT
dispatch. The suspects are the per-step costs that don't scale with the
grid: the forcing rows (~30-40 serial (1, nx) ops incl. lane rolls) and
the per-step |u| reduction to an SMEM scalar (cross-sublane + cross-lane
tree). This probe times PHYSICS-WRONG attribution kernels (pallas_aa
``probe=`` tokens — never driver-reachable) interleaved in one process:

    base       the real kernel
    noforce    forcing rows skipped
    noav       |u| reduction skipped (av series = zeros)
    nofa       both skipped (the pure collide-stream floor)
    fused      LBM_COLLIDE=fused collision form (real physics)

at the 128-wide shapes plus 256^2 as the no-overhead control.

    python scripts/probe_aa_small.py OUT.json [--brackets 3]
"""

from __future__ import annotations

import functools
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[aasmall {time.strftime('%H:%M:%S')}] {m}", flush=True)


class Timeout(Exception):
    pass


# (tag_prefix, ny, nx, iters): iters are multiples of the 254-step chunk so
# every variant is ONE kernel build (no remainder kernel), sized for
# ~0.3-1 s timed runs (>> the ~25 ms sync RPC). The 1024^2 row probes the
# AA latency residue (DESIGN.md fused section: ~79-90% of the VPU ceiling
# at the resident sizes where 128^2 sustains ~95%).
SHAPES = (
    ("g128", 128, 128, 254 * 1200),
    ("g128x256", 256, 128, 254 * 600),
    ("g256", 256, 256, 254 * 500),
    ("g1024", 1024, 1024, 254 * 32),
)
VARIANTS = (
    ("base", "", "fused"),
    ("noforce", "noforce", "fused"),
    ("noav", "noav", "fused"),
    ("nofa", "noforce,noav", "fused"),
    ("paired", "", True),
)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r4_aasmall.json"
    brackets = 3
    if "--brackets" in sys.argv:
        brackets = int(sys.argv[sys.argv.index("--brackets") + 1])

    import jax
    import jax.numpy as jnp

    from lbm_tpu.ops.pallas_aa import run_aa
    from lbm_tpu.runtime.driver import sync

    dev = jax.devices()[0]
    results = {
        "meta": {
            "device": f"{dev.device_kind} ({dev.platform})",
            "shapes": [list(s) for s in SHAPES],
            "variants": [v[0] for v in VARIANTS],
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        },
        "runs": {},
        "errors": {},
    }

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    t0 = time.time()
    sync(jnp.zeros((8, 128)) + 1.0)
    log(f"session warm in {time.time()-t0:.0f}s")

    @functools.partial(jax.jit, static_argnames=("iters", "probe", "collide"))
    def go(cells, nobst, iters, probe, collide):
        _, tot_u = run_aa(
            cells, nobst, 0.1, 0.005, 1.85, iters,
            paired=collide, probe=probe,
        )
        return tot_u[-1]

    cases = {}
    for tag, ny, nx, iters in SHAPES:
        obstacles = np.zeros((ny, nx), np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        nobst = jnp.asarray((obstacles == 0).astype(np.float32))
        base = np.full((9, ny, nx), 0.1 / 9.0, np.float32)
        base[0] *= 4.0
        base[5:] *= 0.25
        cases[tag] = (jax.device_put(jnp.asarray(base)),
                      jax.device_put(nobst), iters, ny, nx)

    def attempt(tag, fn, guard=1500):
        signal.signal(signal.SIGALRM,
                      lambda *_: (_ for _ in ()).throw(Timeout()))
        signal.alarm(guard)
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — error rows, not a dead session
            results["errors"][tag] = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"{tag}: FAIL {type(e).__name__}")
            dump()
            return None
        finally:
            signal.alarm(0)

    # Compile + first-fetch warmup per (shape, variant), then brackets.
    todo = []
    for stag, (cells, nobst, iters, ny, nx) in cases.items():
        for vtag, probe, collide in VARIANTS:
            tag = f"{stag}_{vtag}"
            t0 = time.time()
            ok = attempt(
                tag,
                lambda: (sync(go(cells, nobst, iters, probe, collide)), True)[1],
            )
            if ok is None:
                continue
            log(f"{tag}: compiled+warm in {time.time()-t0:.0f}s")
            todo.append((tag, cells, nobst, iters, probe, collide, ny, nx))
    dump()

    for b in range(brackets):
        for tag, cells, nobst, iters, probe, collide, ny, nx in todo:
            def timed():
                t0 = time.time()
                sync(go(cells, nobst, iters, probe, collide))
                return time.time() - t0

            dt = attempt(f"{tag}@b{b}", timed)
            if dt is None:
                continue
            results["runs"].setdefault(tag, []).append(round(dt, 4))
            log(f"b{b} {tag}: {dt:.4f}s = {ny*nx*iters/dt/1e6:,.0f} MLUPS")
            dump()

    summary = {}
    for tag, times in results["runs"].items():
        stag = tag.rsplit("_", 1)[0]
        _, _, iters, ny, nx = cases[stag]
        best = min(times)
        summary[tag] = {
            "best_s": best,
            "mlups": round(ny * nx * iters / best / 1e6),
            "us_per_step": round(best / iters * 1e6, 4),
        }
    results["summary"] = summary
    dump()
    log("done: " + json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
