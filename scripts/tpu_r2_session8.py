#!/usr/bin/env python
"""Round-2 TPU session 7: AA-kernel compile probes + A/B (big tiles).

Session 6: AA passed the 128x128 golden gate on TPU and beat ping-pong at
1024^2 (21,268 vs 20,487), but 1536^2 (24 unrolled tiles) and 2048^2 bf16
(32) crashed the relay's compile helper. The tile picker now targets <=16
unrolled tiles (ragged last tile). This session probes which shapes
compile, bisects with LBM_AA_TILE where they don't, then times the
survivors against the incumbent backends.

Probes call run_aa eagerly (no jit wrapper) so the tile env override
takes effect per call. Timings for validated defaults go through
run_simulation (AOT compile split from the timed loop).

Writes JSON to argv[1] (default bench_r2_tpu8.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
RESULTS = {"probes": [], "ab": [], "golden": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2g {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu8.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.ops.pallas_aa import run_aa, _pick_tile
    from lbm_tpu.runtime.driver import run_simulation, sync

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def make(ny, nx, dtype):
        from lbm_tpu.models.d2q9 import D2Q9

        params = LBMParams(
            nx=nx, ny=ny, max_iters=0, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((ny, nx), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        cells = D2Q9.initial_state(params, dtype=dtype)
        nobst = jnp.asarray((obstacles == 0), jnp.float32)
        return cells, nobst

    def probe(tag, ny, nx, iters, dtype, tile=None):
        """Eager run_aa: compile + 2 timed passes. Returns MLUPS or None."""
        saved = os.environ.pop("LBM_AA_TILE", None)
        if tile is not None:
            os.environ["LBM_AA_TILE"] = str(tile)
        eff_tile = tile if tile is not None else _pick_tile(ny, nx)
        ntiles = -(-ny // eff_tile)
        try:
            cells, nobst = make(ny, nx, dtype)
            t0 = time.perf_counter()
            out, _ = run_aa(cells, nobst, 0.1, 0.005, 1.85, iters)
            sync(out)
            first = time.perf_counter() - t0
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                out, _ = run_aa(cells, nobst, 0.1, 0.005, 1.85, iters)
                sync(out)
                times.append(time.perf_counter() - t0)
            best = min(times)
            mlups = ny * nx * iters / best / 1e6
            rec = {"variant": tag, "tile": eff_tile, "ntiles": ntiles,
                   "first_s": round(first, 2),
                   "all_s": [round(t, 4) for t in times],
                   "mlups": round(mlups, 1)}
            RESULTS["probes"].append(rec)
            log(f"{tag} (tile {eff_tile}, {ntiles} tiles): OK "
                f"{best:.3f}s = {mlups:.0f} MLUPS (first {first:.1f}s)")
            return mlups
        except Exception as e:
            log(f"{tag} (tile {eff_tile}, {ntiles} tiles): FAILED "
                f"{type(e).__name__}: {str(e)[:200]}")
            RESULTS["probes"].append(
                {"variant": tag, "tile": eff_tile, "ntiles": ntiles,
                 "error": str(e)[:300]}
            )
            return None
        finally:
            os.environ.pop("LBM_AA_TILE", None)
            if saved is not None:
                os.environ["LBM_AA_TILE"] = saved

    bf16 = jnp.bfloat16
    f32 = jnp.float32

    # ---- probes: split-scratch kernel (largest VMEM alloc = 5/9 state) ----
    # Session 7: single-scratch compiles crashed the relay compile helper
    # for every state > 59 MB at every tile count; the scratch is now split
    # into 5-plane/4-plane allocations. 1536^2 f32 = 47 MB per alloc.
    ok_1536 = probe("1536:f32:split", 1536, 1536, 400, f32)
    ok_1280 = probe("1280:f32:split", 1280, 1280, 600, f32)
    ok_2048 = probe("2048:bf16:split", 2048, 2048, 400, bf16)
    probe("1448x1408:f32:split", 1448, 1408, 600, f32)
    probe("256:f32:split", 256, 256, 20000, f32)

    # ---- A/B through the driver (defaults only) ----------------------------
    def timed(tag, n, ny, nx, iters, backend, dtype=None):
        params = LBMParams(
            nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((ny, nx), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        kw = {} if dtype is None else {"dtype": dtype}
        try:
            run_simulation(params, obstacles, backend=backend, **kw)
            passes = [
                run_simulation(params, obstacles, backend=backend, **kw)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["ab"].append({"variant": tag, "error": str(e)[:300]})
            return
        best = min(p.elapsed for p in passes)
        mlups = ny * nx * iters / best / 1e6
        rec = {"variant": tag, "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["ab"].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    segments = [
        ("256:resident#0", 256, 256, 40000, "resident", None),
        ("256:aa#1", 256, 256, 40000, "aa", None),
        ("256:resident#2", 256, 256, 40000, "resident", None),
        ("256:aa#3", 256, 256, 40000, "aa", None),
        ("1024:aa#0", 1024, 1024, 6000, "aa", None),
        ("1024:resident#1", 1024, 1024, 6000, "resident", None),
        ("1024:aa#2", 1024, 1024, 6000, "aa", None),
    ]
    if ok_1536:
        segments += [
            ("1536:temporal#0", 1536, 1536, 1000, "temporal", None),
            ("1536:aa#1", 1536, 1536, 1000, "aa", None),
            ("1536:temporal#2", 1536, 1536, 1000, "temporal", None),
            ("1536:aa#3", 1536, 1536, 1000, "aa", None),
        ]
    elif ok_1280:
        segments += [
            ("1280:temporal#0", 1280, 1280, 1200, "temporal", None),
            ("1280:aa#1", 1280, 1280, 1200, "aa", None),
            ("1280:temporal#2", 1280, 1280, 1200, "temporal", None),
            ("1280:aa#3", 1280, 1280, 1200, "aa", None),
        ]
    if ok_2048:
        segments += [
            ("2048:block:bf16#0", 2048, 2048, 600, "pallas", bf16),
            ("2048:aa:bf16#1", 2048, 2048, 600, "aa", bf16),
            ("2048:block:bf16#2", 2048, 2048, 600, "pallas", bf16),
            ("2048:aa:bf16#3", 2048, 2048, 600, "aa", bf16),
        ]
    for tag, ny, nx, iters, backend, dtype in segments:
        timed(tag, 2, ny, nx, iters, backend, dtype)

    # ---- official 1024^2 through backend='aa': golden av check -------------
    params = read_params(f"{REF}/input_1024x1024.params")
    obstacles = read_obstacles(f"{REF}/obstacles_1024x1024.dat", params)
    try:
        r = run_simulation(params, obstacles, backend="aa")
        ref_av = np.loadtxt(f"{REF}/check/1024x1024.av_vels.dat", usecols=[1])
        diff = ref_av - np.asarray(r.av_vels, np.float64)
        av_pct = float(np.abs(100.0 * diff / (ref_av - diff)).max())
        rec = {"config": "1024x1024-aa", "loop_s": round(r.elapsed, 4),
               "mlups": round(r.mlups(params), 1), "av_max_pct": av_pct,
               "golden_pass": av_pct < 1.0}
        RESULTS["golden"].append(rec)
        log(f"1024x1024 aa official: {rec['loop_s']}s = {rec['mlups']} MLUPS, "
            f"av {av_pct:.3g}% pass={rec['golden_pass']}")
    except Exception as e:
        log(f"1024x1024 aa official FAILED: {type(e).__name__}: {str(e)[:300]}")
        RESULTS["golden"].append({"config": "1024x1024-aa", "error": str(e)[:300]})

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
