#!/usr/bin/env python
"""Parameterized one-process TPU A/B bench session (VERDICT r2 item 8:
replaces the per-session tpu_r2_session*.py scaffolding — new sessions add
DATA files, not code files).

TPU perf through the relay varies ±10-15% (occasionally 3x) BETWEEN
processes, so alternatives must be compared WITHIN one process,
interleaved (CLAUDE.md). This harness runs a list of variants in
round-robin brackets (every variant once per bracket, warmup first),
records per-bracket times and the best-of per variant, and writes one
JSON file.

Usage:
    python scripts/ab_session.py OUT.json SPEC [SPEC...] \
        [--passes-per-bracket 1] [--brackets 3] [--warmup 1]

SPEC is ``tag:key=val[,key=val...]`` with keys:
    size      square grid edge (or nx=/ny= separately)   [required]
    iters     timestep count                              [required]
    backend   auto|aa|resident|temporal|deep|band|band2|band3|slab|pallas|reference [auto]
    dtype     f32|bf16|f64|c16                            [f32]
    depth/block for deep, band, and slab map to LBM_DEEP_*/LBM_BAND_*
    slabk/slabs  slab passes-per-visit / slab rows (LBM_SLAB_K/LBM_SLAB_S)
    depth     temporal depth     (env LBM_TEMPORAL_DEPTH)
    block     block height       (env LBM_TEMPORAL_BLOCK or
                                  LBM_PALLAS_BLOCK, by backend)
    tile      AA tile height     (env LBM_AA_TILE)
    collide   paired|literal     (env LBM_COLLIDE)
    clean     0|1  band2 clean-tile specialization (env LBM_BAND2_CLEAN)
    rowforce  0|1  row-targeted band forcing (env LBM_BAND_ROWFORCE)
    unroll    band in-kernel loop unroll     (env LBM_BAND_UNROLL)
    geometry  walls|box|none                              [walls]

Example (the round-2 temporal depth study, as one invocation):
    python scripts/ab_session.py bench_r3_tpuN.json \
        t2:size=8192,iters=100,backend=temporal,depth=2 \
        t4:size=8192,iters=100,backend=temporal,depth=4 \
        blk:size=8192,iters=100,backend=pallas,block=8

Hard-won session rules (bench_r3_panel8192.json failed wholesale):
put a CHEAP variant first (1024^2 AA) so the ~3-13 min first-fetch
session warmup is not charged to a big variant; --timeout must exceed
compile+warmup (>= 1500 for 8192-wide variants — a fired alarm
mid-handshake poisons the relay session for all later variants); never
start while another process holds the TPU lease.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

_ENV_KEYS = (
    "LBM_TEMPORAL_DEPTH", "LBM_TEMPORAL_BLOCK", "LBM_PALLAS_BLOCK",
    "LBM_AA_TILE", "LBM_AA_CHUNK", "LBM_COLLIDE",
    "LBM_DEEP_DEPTH", "LBM_DEEP_BLOCK", "LBM_BAND_DEPTH", "LBM_BAND_BLOCK",
    "LBM_BAND_PANEL", "LBM_BAND_ROWFORCE", "LBM_BAND_UNROLL",
    "LBM_BAND3_DEPTH", "LBM_BAND3_BLOCK", "LBM_BAND3_PANEL",
    "LBM_BAND2_TILEW", "LBM_BAND2_CLEAN",
    "LBM_SLAB_K", "LBM_SLAB_S",
)


def log(msg: str) -> None:
    print(f"[ab {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def parse_spec(spec: str) -> dict:
    tag, _, body = spec.partition(":")
    if not body:
        raise SystemExit(f"bad spec {spec!r}: expected tag:key=val,...")
    kv = {}
    for part in body.split(","):
        k, _, v = part.partition("=")
        if not v:
            raise SystemExit(f"bad spec item {part!r} in {spec!r}")
        kv[k] = v
    out = {"tag": tag}
    out["nx"] = int(kv.get("nx", kv.get("size", 0)))
    out["ny"] = int(kv.get("ny", kv.get("size", 0)))
    if not out["nx"] or not out["ny"]:
        raise SystemExit(f"{spec!r}: size= (or nx=/ny=) is required")
    if "iters" not in kv:
        raise SystemExit(f"{spec!r}: iters= is required")
    out["iters"] = int(kv["iters"])
    out["backend"] = kv.get("backend", "auto")
    out["dtype"] = kv.get("dtype", "f32")
    out["geometry"] = kv.get("geometry", "walls")
    for k in ("depth", "block", "tile", "tilew", "chunk", "panel", "rowforce",
              "unroll", "slabk", "slabs", "clean"):
        if k in kv:
            out[k] = int(kv[k])
    if "collide" in kv:
        out["collide"] = kv["collide"]
    if "force" in kv:
        out["force"] = kv["force"]  # band3: fullrow|panel
    return out


def variant_env(v: dict) -> dict:
    env = {}
    depth_knob = {
        "deep": "LBM_DEEP_DEPTH", "band": "LBM_BAND_DEPTH",
        "slab": "LBM_BAND_DEPTH", "band2": "LBM_BAND_DEPTH",
        "band3": "LBM_BAND3_DEPTH",
    }.get(v["backend"], "LBM_TEMPORAL_DEPTH")
    if "depth" in v:
        env[depth_knob] = str(v["depth"])
    if "block" in v:
        knob = {
            "deep": "LBM_DEEP_BLOCK", "band": "LBM_BAND_BLOCK",
            "slab": "LBM_BAND_BLOCK", "band2": "LBM_BAND_BLOCK",
            "band3": "LBM_BAND3_BLOCK",
        }.get(v["backend"])
        if knob is None:
            knob = (
                "LBM_PALLAS_BLOCK"
                if v["backend"] in ("pallas", "auto", "reference")
                else "LBM_TEMPORAL_BLOCK"
            )
        env[knob] = str(v["block"])
    if "tile" in v:
        env["LBM_AA_TILE"] = str(v["tile"])
    if "tilew" in v:
        env["LBM_BAND2_TILEW"] = str(v["tilew"])
    if "clean" in v:
        env["LBM_BAND2_CLEAN"] = str(v["clean"])
    if "chunk" in v:
        env["LBM_AA_CHUNK"] = str(v["chunk"])
    if "panel" in v:
        env["LBM_BAND3_PANEL" if v["backend"] == "band3"
            else "LBM_BAND_PANEL"] = str(v["panel"])
    if "collide" in v:
        env["LBM_COLLIDE"] = v["collide"]
    if "force" in v:
        env["LBM_BAND3_FORCE"] = v["force"]
    if "rowforce" in v:
        env["LBM_BAND_ROWFORCE"] = str(v["rowforce"])
    if "unroll" in v:
        env["LBM_BAND_UNROLL"] = str(v["unroll"])
    if "slabk" in v:
        env["LBM_SLAB_K"] = str(v["slabk"])
    if "slabs" in v:
        env["LBM_SLAB_S"] = str(v["slabs"])
    return env


def make_case(v: dict):
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import LBMParams

    params = LBMParams(
        nx=v["nx"], ny=v["ny"], max_iters=v["iters"], reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    obstacles = np.zeros((v["ny"], v["nx"]), dtype=np.int32)
    if v["geometry"] in ("walls", "box"):
        obstacles[0, :] = obstacles[-1, :] = 1
    if v["geometry"] == "box":
        obstacles[:, 0] = obstacles[:, -1] = 1
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f64": jnp.float64,
             "c16": "c16"}[v["dtype"]]
    return params, obstacles, dtype


class CompileTimeout(Exception):
    pass


def run_variant(v: dict, timeout: int = 0):
    """One timed run; returns (elapsed_s, mlups) or raises.

    ``timeout`` > 0 arms SIGALRM around the whole run: some kernel shapes
    hang this toolchain's remote-compile helper for >30 min (CLAUDE.md),
    and a hung variant must become an error row, not a stalled session."""
    from lbm_tpu.runtime.driver import run_simulation

    params, obstacles, dtype = make_case(v)
    if timeout > 0:
        signal.signal(
            signal.SIGALRM,
            lambda *_: (_ for _ in ()).throw(CompileTimeout(f"{timeout}s")),
        )
        signal.alarm(timeout)
    saved = {k: os.environ.pop(k, None) for k in _ENV_KEYS}
    try:
        for k, val in variant_env(v).items():
            os.environ[k] = val
        # fetch_final=False: the ~28 MB/s relay D2H fetch of the final state
        # (85 s per 8192^2 run) is pure waste for timing sessions.
        res = run_simulation(params, obstacles, backend=v["backend"],
                             dtype=dtype, fetch_final=False)
    finally:
        if timeout > 0:
            signal.alarm(0)
        for k, old in saved.items():
            os.environ.pop(k, None)
            if old is not None:
                os.environ[k] = old
    mlups = v["nx"] * v["ny"] * v["iters"] / res.elapsed / 1e6
    return res.elapsed, mlups


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("specs", nargs="+")
    ap.add_argument("--brackets", type=int, default=3,
                    help="round-robin passes over all variants")
    ap.add_argument("--passes-per-bracket", type=int, default=1)
    ap.add_argument("--warmup", type=int, default=1,
                    help="untimed runs per variant before bracket 1")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-run SIGALRM guard in seconds (0 = off); hung "
                    "compiles become error rows instead of stalled sessions")
    args = ap.parse_args()

    variants = [parse_spec(s) for s in args.specs]
    import jax

    dev = jax.devices()[0]
    results = {
        "meta": {
            "device": f"{dev.device_kind} ({dev.platform})",
            "argv": sys.argv[1:],
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        },
        "variants": {v["tag"]: dict(v) for v in variants},
        "brackets": [],
        "warmups": {},
        "best": {},
        "errors": {},
    }
    log(f"device: {results['meta']['device']}; {len(variants)} variants, "
        f"{args.brackets} brackets")

    def dump():
        # After EVERY run, not just bracket ends: a hard external kill
        # (e.g. the outer `timeout` wrapper) mid-bracket keeps the data.
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    alive = list(variants)
    for v in list(alive):
        for _ in range(args.warmup):
            try:
                t, m = run_variant(v, args.timeout)
                log(f"warmup {v['tag']}: {t:.3f}s ({m:.0f} MLUPS)")
                results["warmups"].setdefault(v["tag"], []).append(round(t, 4))
            except Exception as e:  # compile failures are data, not crashes
                log(f"warmup {v['tag']}: FAILED {type(e).__name__}: {str(e)[:200]}")
                results["errors"][v["tag"]] = f"{type(e).__name__}: {str(e)[:300]}"
                alive.remove(v)
                break
            finally:
                dump()

    for b in range(args.brackets):
        bracket = {}
        results["brackets"].append(bracket)
        for v in alive:
            times = []
            for _ in range(args.passes_per_bracket):
                try:
                    t, m = run_variant(v, args.timeout)
                except Exception as e:
                    log(f"{v['tag']}: FAILED {type(e).__name__}: {str(e)[:200]}")
                    results["errors"][v["tag"]] = (
                        f"{type(e).__name__}: {str(e)[:300]}"
                    )
                    times = []
                    break
                times.append(t)
                log(f"b{b} {v['tag']}: {t:.3f}s ({m:.0f} MLUPS)")
            if times:
                bracket[v["tag"]] = [round(t, 4) for t in times]
            dump()

    for v in variants:
        ts = [t for b in results["brackets"] for t in b.get(v["tag"], [])]
        if ts:
            best = min(ts)
            results["best"][v["tag"]] = {
                "best_s": round(best, 4),
                "mlups": round(v["nx"] * v["ny"] * v["iters"] / best / 1e6, 1),
                "n_runs": len(ts),
            }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log("best: " + json.dumps(results["best"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
