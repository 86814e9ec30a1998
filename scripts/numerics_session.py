#!/usr/bin/env python
"""On-hardware numerics agreement session: run PAIRS of variants on the
same config in ONE process and report the max |av_A - av_B| / |av_B|.

Complements scripts/ab_session.py (timing): the golden gates only cover
the four official configs, all of which auto-route to the AA kernel —
kernels that activate at larger grids (band/deep/temporal) need their
physics checked on real hardware against the jnp reference backend at a
size they actually serve.

Usage:
    python scripts/numerics_session.py OUT.json PAIR [PAIR...]

PAIR is ``tag:size=N,iters=K,a=<backend[/dtype]>,b=<backend[/dtype]>``
(dtype defaults to f32; geometry is the walls channel, as ab_session).
Optional ``block=``/``depth=``/``panel=``/``tile=`` keys set the
corresponding LBM_BAND_*/LBM_AA_TILE env knobs around BOTH sides of the
pair (they only affect the kernel backends; the jnp reference ignores
them) — e.g. ``panel=1024`` forces the band backend's x-split variant.
Exit code 1 if any pair exceeds ``--rtol`` (default 5e-4 — f32 kernels
reassociate per-step sums differently, and the relay transfer clips f64
mantissas, so exact equality is not expected).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[num {time.strftime('%H:%M:%S')}] {m}", flush=True)


def parse_pair(spec: str) -> dict:
    tag, _, rest = spec.partition(":")
    out = {"tag": tag}
    for kv in rest.split(","):
        k, _, v = kv.partition("=")
        out[k] = v
    out["size"] = int(out["size"])
    out["iters"] = int(out["iters"])
    return out


_KNOB_ENV = {
    "block": "LBM_BAND_BLOCK", "depth": "LBM_BAND_DEPTH",
    "panel": "LBM_BAND_PANEL", "tile": "LBM_AA_TILE",
}


def apply_knobs(p: dict) -> dict:
    """Set the kernel-config env knobs named in the pair spec; returns the
    saved previous values for restore."""
    saved = {}
    for key, env in _KNOB_ENV.items():
        if key in p:
            saved[env] = os.environ.get(env)
            os.environ[env] = str(p[key])
    return saved


def restore_knobs(saved: dict) -> None:
    for env, old in saved.items():
        if old is None:
            os.environ.pop(env, None)
        else:
            os.environ[env] = old


def run_one(size: int, iters: int, spec: str):
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    backend, _, dt = spec.partition("/")
    dtype = {"": jnp.float32, "f32": jnp.float32, "bf16": jnp.bfloat16,
             "c16": "c16"}[dt]
    params = LBMParams(nx=size, ny=size, max_iters=iters, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    obstacles = np.zeros((size, size), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    res = run_simulation(params, obstacles, backend=backend, dtype=dtype)
    return np.asarray(res.av_vels, dtype=np.float64)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("pairs", nargs="+")
    ap.add_argument("--rtol", type=float, default=5e-4)
    args = ap.parse_args()

    results = {"pairs": {}, "rtol": args.rtol}
    failed = False
    for spec in args.pairs:
        p = parse_pair(spec)
        try:
            saved = apply_knobs(p)
            try:
                av_a = run_one(p["size"], p["iters"], p["a"])
                av_b = run_one(p["size"], p["iters"], p["b"])
            finally:
                restore_knobs(saved)
            rel = np.max(np.abs(av_a - av_b) / np.maximum(np.abs(av_b), 1e-30))
            ok = bool(rel <= args.rtol)
            results["pairs"][p["tag"]] = {
                "spec": spec, "max_rel": float(rel), "ok": ok,
            }
            log(f"{p['tag']}: max_rel={rel:.3g} {'OK' if ok else 'FAIL'}")
            failed |= not ok
        except Exception as e:  # record, keep going
            results["pairs"][p["tag"]] = {
                "spec": spec, "error": f"{type(e).__name__}: {str(e)[:300]}",
            }
            log(f"{p['tag']}: ERROR {type(e).__name__}: {str(e)[:200]}")
            failed = True
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
