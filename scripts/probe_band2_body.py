#!/usr/bin/env python
"""Attribute the band2 HBM-regime residue and A/B the instruction-level
levers (VERDICT r4 item 1 + weak #1).

band2-fused sustains ~16.6-17.8k MLUPS at 2048²/4096² = ~2.5 Tops/s per
buffer cell vs the AA flagship's ~2.86-3.0 — and round 4 closed every
SCHEDULE knob (tile height ±1.4% over 10x, band3 parity, panel carry a
no-op). This session applies the bench_r4_aasmall methodology to the
band2 step body itself: PHYSICS-WRONG attribution kernels (pallas_band2
``probe=`` tokens) that delete one cost at a time, plus the two
real-physics levers the verdict names:

    base       the real kernel (fused default)
    pipe2      two step-tiles' collide chains interleaved at trace time
    mxumom     moment contraction on the idle MXU (dot_general)
    mxuav      the MXU |u|-reduction (collision.av_route's AA win,
               re-probed on band2 under the FUSED default)
    noav       per-tile |u| fold deleted          (reduction share)
    noshift    pulls replaced by unshifted slices (shift/copy share)
    nowhere    obstacle select deleted            (select share)
    nocollide  bgk_relax deleted (stream-only floor; implies noav)
    noforce    forcing rows deleted               (forcing share)

    python scripts/probe_band2_body.py OUT.json [--brackets 3]
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
    print(f"[b2body {time.strftime('%H:%M:%S')}] {m}", flush=True)


class Timeout(Exception):
    pass


# (tag, ny, nx, iters): iters are multiples of the pass depth T so every
# run is whole fused passes (no block-kernel tail), sized for ~0.3-1 s
# timed runs (>> the ~25 ms sync RPC).
SHAPES = (
    ("g2048", 2048, 2048, 2048),
    ("g4096", 4096, 4096, 512),
)
# (tag, probe, collide); the 4096² row runs the subset that matters if
# 2048² shows a signal (compile minutes are the session budget).
VARIANTS_FULL = (
    ("base", "", "fused"),
    ("pipe2", "pipe2", "fused"),
    ("mxumom", "mxumom", "fused"),
    ("mxuav", "", "fused-mxuav"),
    ("noav", "noav", "fused"),
    ("noshift", "noshift", "fused"),
    ("nowhere", "nowhere", "fused"),
    ("nocollide", "nocollide", "fused"),
    ("noforce", "noforce", "fused"),
)
VARIANTS_4096 = ("base", "pipe2", "mxumom", "noav", "nocollide")


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r5_b2body.json"
    brackets = 3
    if "--brackets" in sys.argv:
        brackets = int(sys.argv[sys.argv.index("--brackets") + 1])

    import jax
    import jax.numpy as jnp

    from lbm_tpu.ops.pallas_band import pick_config
    from lbm_tpu.ops.pallas_band2 import run_band2
    from lbm_tpu.runtime.driver import sync

    dev = jax.devices()[0]
    results = {
        "meta": {
            "device": f"{dev.device_kind} ({dev.platform})",
            "shapes": [list(s) for s in SHAPES],
            "variants": [v[0] for v in VARIANTS_FULL],
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        },
        "configs": {},
        "runs": {},
        "errors": {},
    }

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    t0 = time.time()
    sync(jnp.zeros((8, 128)) + 1.0)
    log(f"session warm in {time.time()-t0:.0f}s")

    @functools.partial(jax.jit,
                       static_argnames=("iters", "probe", "collide",
                                        "block", "depth"))
    def go(cells, nobst, iters, probe, collide, block, depth):
        _, tot_u = run_band2(
            cells, nobst, 0.1, 0.005, 1.85, iters, block, depth,
            paired=collide, probe=probe,
        )
        return tot_u[-1]

    cases = {}
    for tag, ny, nx, iters in SHAPES:
        block, depth = pick_config(ny, nx, jnp.float32)
        results["configs"][tag] = [block, depth]
        obstacles = np.zeros((ny, nx), np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        nobst = jnp.asarray((obstacles == 0).astype(np.float32))
        base = np.full((9, ny, nx), 0.1 / 9.0, np.float32)
        base[0] *= 4.0
        base[5:] *= 0.25
        cases[tag] = (jax.device_put(jnp.asarray(base)),
                      jax.device_put(nobst), iters, ny, nx, block, depth)
    dump()

    def attempt(tag, fn, guard=1800):
        signal.signal(signal.SIGALRM,
                      lambda *_: (_ for _ in ()).throw(Timeout()))
        signal.alarm(guard)
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — error rows, not a dead session
            results["errors"][tag] = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"{tag}: FAIL {type(e).__name__}: {str(e)[:150]}")
            dump()
            return None
        finally:
            signal.alarm(0)

    todo = []
    for stag, (cells, nobst, iters, ny, nx, block, depth) in cases.items():
        for vtag, probe, collide in VARIANTS_FULL:
            if stag == "g4096" and vtag not in VARIANTS_4096:
                continue
            tag = f"{stag}_{vtag}"
            t0 = time.time()
            ok = attempt(
                tag,
                lambda: (sync(go(cells, nobst, iters, probe, collide,
                                 block, depth)), True)[1],
            )
            if ok is None:
                continue
            log(f"{tag}: compiled+warm in {time.time()-t0:.0f}s")
            todo.append((tag, cells, nobst, iters, probe, collide,
                         block, depth, ny, nx))
    dump()

    for b in range(brackets):
        for (tag, cells, nobst, iters, probe, collide,
             block, depth, ny, nx) in todo:
            def timed():
                t0 = time.time()
                sync(go(cells, nobst, iters, probe, collide, block, depth))
                return time.time() - t0

            dt = attempt(f"{tag}@b{b}", timed)
            if dt is None:
                continue
            results["runs"].setdefault(tag, []).append(round(dt, 4))
            log(f"b{b} {tag}: {dt:.4f}s = {ny*nx*iters/dt/1e6:,.0f} MLUPS")
            dump()

    summary = {}
    for tag, times in results["runs"].items():
        stag = tag.split("_", 1)[0]
        _, _, iters, ny, nx, _, _ = cases[stag]
        best = min(times)
        summary[tag] = {
            "best_s": best,
            "mlups": round(ny * nx * iters / best / 1e6),
        }
    results["summary"] = summary
    dump()
    log("done: " + json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
