#!/usr/bin/env python
"""Round-2 TPU session 15: per-plane-scratch AA compile probes.

The AA scratch is now one VMEM allocation per plane (<=9.4 MB each at
1536^2). If the relay compile-helper's failure is allocation-sized, the
blocked regimes open up: 1536^2 f32 (vs temporal 6.7k), 2048^2 bf16 (vs
block 7.5k), 1280^2 bf16. Probes run eagerly (fresh tile env per call);
winners get driver-based A/B rows against the incumbents.

Writes JSON to argv[1] (default bench_r2_tpu15.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS = {"probes": [], "ab": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2o {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu15.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.ops.pallas_aa import run_aa, _pick_tile
    from lbm_tpu.runtime.driver import run_simulation, sync

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def probe(tag, ny, nx, iters, dtype, tile=None):
        saved = os.environ.pop("LBM_AA_TILE", None)
        if tile is not None:
            os.environ["LBM_AA_TILE"] = str(tile)
        eff_tile = tile if tile is not None else _pick_tile(ny, nx)
        try:
            params = LBMParams(
                nx=nx, ny=ny, max_iters=0, reynolds_dim=10,
                density=0.1, accel=0.005, omega=1.85,
            )
            obstacles = np.zeros((ny, nx), dtype=np.int32)
            obstacles[0, :] = obstacles[-1, :] = 1
            cells = D2Q9.initial_state(params, dtype=dtype)
            nobst = jnp.asarray((obstacles == 0), jnp.float32)
            t0 = time.perf_counter()
            out, _ = run_aa(cells, nobst, 0.1, 0.005, 1.85, iters)
            sync(out)
            first = time.perf_counter() - t0
            rec = {"variant": tag, "tile": eff_tile, "ok": True,
                   "first_s": round(first, 2)}
            log(f"{tag} (tile {eff_tile}): compile+run OK ({first:.1f}s eager)")
            RESULTS["probes"].append(rec)
            return True
        except Exception as e:
            log(f"{tag} (tile {eff_tile}): FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["probes"].append(
                {"variant": tag, "tile": eff_tile, "ok": False,
                 "error": str(e)[:300]}
            )
            return False
        finally:
            os.environ.pop("LBM_AA_TILE", None)
            if saved is not None:
                os.environ["LBM_AA_TILE"] = saved

    f32, bf16 = jnp.float32, jnp.bfloat16
    ok_1536 = probe("1536:f32:per-plane", 1536, 1536, 60, f32)
    if not ok_1536:
        # smaller temps: distinguishes a total-VMEM cap from per-alloc
        ok_1536 = probe("1536:f32:per-plane:tile96", 1536, 1536, 60, f32, tile=96)
    ok_1408 = None
    if not ok_1536:
        ok_1408 = probe("1408:f32:per-plane:tile96", 1408, 1408, 60, f32, tile=96)
    ok_2048b = probe("2048:bf16:per-plane", 2048, 2048, 60, bf16)
    ok_1280b = probe("1280:bf16:per-plane", 1280, 1280, 60, bf16)

    # ---- driver A/Bs for whatever opened up --------------------------------
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

    if ok_1536:
        for tag, backend in (
            ("1536:temporal#0", "temporal"), ("1536:aa#1", "aa"),
            ("1536:temporal#2", "temporal"), ("1536:aa#3", "aa"),
        ):
            timed(tag, 2, 1536, 1536, 1000, backend)
    if ok_2048b:
        for tag, backend in (
            ("2048:block:bf16#0", "pallas"), ("2048:aa:bf16#1", "aa"),
            ("2048:block:bf16#2", "pallas"), ("2048:aa:bf16#3", "aa"),
        ):
            timed(tag, 2, 2048, 2048, 600, backend, bf16)
    if ok_1280b:
        for tag, backend in (
            ("1280:block:bf16#0", "pallas"), ("1280:aa:bf16#1", "aa"),
        ):
            timed(tag, 2, 1280, 1280, 1500, backend, bf16)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
