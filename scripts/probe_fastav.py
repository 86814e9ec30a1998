#!/usr/bin/env python
"""A/B the AA |u|-reduction STRUCTURES on TPU (follow-up to probe_aa_small).

History: bench_r4_fastav.json (rsqrt == sqrt, a bit-identical no-op),
bench_r4_vecav.json (hand-vectorized partials LOSE to the tree),
bench_r4_mxuav.json (the MXU ones-row matmul WINS at 1024^2),
bench_r4_avearly.json (trace-order reordering is a wash). Current
variant list (edit VARIANTS per question; probe tokens are parsed by
pallas_aa._aa_kernel):

    treeav   per-tile (tile, nx)->scalar jnp.sum (the shipped default,
             probe "")
    mxuav    ones(1, rows) @ (nob*u) on the idle MXU (the auto route at
             the validated f32 shapes)
    mxuearly mxuav folded before the plane writes (scheduling probe)
    noav     reduction skipped entirely (floor; series is wrong)

at 1024^2 (flagship) and 128^2; iters chunk-aligned (254) so each
variant is one kernel build.

    python scripts/probe_fastav.py OUT.json [--brackets 3]

OUT.json is REQUIRED to be a fresh name in practice: the committed
bench_r4_*.json artifacts above are provenance for docstrings/docs —
never overwrite them.
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
    print(f"[fastav {time.strftime('%H:%M:%S')}] {m}", flush=True)


class Timeout(Exception):
    pass


SHAPES = (
    ("g128", 128, 128, 254 * 1200),
    ("g1024", 1024, 1024, 254 * 32),
)
VARIANTS = (
    ("treeav", ""),
    ("mxuav", "mxuav"),
    ("mxuearly", "mxuav,avearly"),
    ("noav", "noav"),
)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_probe_av.json"
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
        "accuracy": {},
    }

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    t0 = time.time()
    sync(jnp.zeros((8, 128)) + 1.0)
    log(f"session warm in {time.time()-t0:.0f}s")

    @functools.partial(jax.jit, static_argnames=("iters", "probe"))
    def go(cells, nobst, iters, probe):
        _, tot_u = run_aa(
            cells, nobst, 0.1, 0.005, 1.85, iters,
            paired="fused", probe=probe,
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

    finals = {}
    todo = []
    for stag, (cells, nobst, iters, ny, nx) in cases.items():
        for vtag, probe in VARIANTS:
            tag = f"{stag}_{vtag}"
            t0 = time.time()
            val = attempt(
                tag,
                lambda: float(go(cells, nobst, iters, probe)),
            )
            if val is None:
                continue
            finals[tag] = val
            log(f"{tag}: compiled+warm in {time.time()-t0:.0f}s, tot_u[-1]={val:.6g}")
            todo.append((tag, cells, nobst, iters, probe, ny, nx))
    # alternative-structure accuracy on the REAL series value vs the
    # default arm (same physics, different f32 summation order — expect
    # ~1e-7..1e-5 rel). Compares every non-floor variant against the
    # first variant in VARIANTS.
    base_tag = VARIANTS[0][0]
    for stag in cases:
        b = finals.get(f"{stag}_{base_tag}")
        if b is None:
            continue
        for vtag, _ in VARIANTS[1:]:
            if vtag == "noav":
                continue
            a = finals.get(f"{stag}_{vtag}")
            if a is not None and b != 0:
                results["accuracy"][f"{stag}_{vtag}"] = {
                    vtag: a, base_tag: b,
                    "rel_diff": abs(a - b) / abs(b),
                }
    dump()

    for b in range(brackets):
        for tag, cells, nobst, iters, probe, ny, nx in todo:
            def timed():
                t0 = time.time()
                sync(go(cells, nobst, iters, probe))
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
