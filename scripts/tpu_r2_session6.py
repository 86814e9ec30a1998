#!/usr/bin/env python
"""Round-2 TPU session 6: AA-resident kernel validation + A/B.

The in-place AA-pattern kernel (ops/pallas_aa.py) keeps ONE copy of the
state in VMEM, doubling the resident range: 1536^2 f32 (85 MB) and
2048^2 bf16 (75.5 MB) run fully on-chip where the block/temporal kernels
stream from HBM.

Part V — real-TPU validation: 128x128 full 40k iters through
  backend='aa', golden-checked against the upstream full gold pair.
Part T — alternating A/B timings (2 passes per segment, alternated to
  bracket relay throttle drift):
  1024^2 f32: resident (ping-pong) vs aa      — is AA at parity where both fit?
  1536^2 f32: aa vs temporal-T4 vs block      — the new f32 win regime
  2048^2 bf16: block vs aa                    — the new bf16 win regime
  1448x1408 f32: aa vs temporal-T4            — scaling-table row (73 MB)
Writes JSON to argv[1] (default bench_r2_tpu6.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"
RESULTS = {"part_v": [], "part_t": [], "meta": {}}


def log(msg):
    print(f"[tpu-r2f {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r2_tpu6.json"
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation

    dev = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev.device_kind} ({dev.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    # ---- Part V: 128x128 golden through backend='aa' -----------------------
    params = read_params(f"{REF}/input_128x128.params")
    obstacles = read_obstacles(f"{REF}/obstacles_128x128.dat", params)
    try:
        r = run_simulation(params, obstacles, backend="aa")
        ref_av = np.loadtxt(f"{REF}/check/128x128.av_vels.dat", usecols=[1])
        diff = ref_av - np.asarray(r.av_vels, np.float64)
        av_pct = float(np.abs(100.0 * diff / (ref_av - diff)).max())
        from lbm_tpu.models.d2q9 import C_SQ

        cells = np.asarray(r.cells, np.float64)
        rho = cells.sum(axis=0)
        pressure = np.where(
            np.asarray(obstacles) != 0, params.density * C_SQ, rho * C_SQ
        )
        ref_p = np.loadtxt(
            f"{REF}/check/128x128.final_state.dat", usecols=[5]
        ).reshape(pressure.shape)
        dp = ref_p - pressure
        fs_pct = float(np.abs(100.0 * dp / (ref_p - dp)).max())
        rec = {
            "config": "128x128-aa", "loop_s": round(r.elapsed, 4),
            "mlups": round(r.mlups(params), 1), "av_max_pct": av_pct,
            "fs_max_pct": fs_pct, "golden_pass": av_pct < 1.0 and fs_pct < 1.0,
        }
        RESULTS["part_v"].append(rec)
        log(f"128x128 aa: {rec['loop_s']}s = {rec['mlups']} MLUPS, "
            f"av {av_pct:.3g}% fs {fs_pct:.3g}% pass={rec['golden_pass']}")
    except Exception as e:
        log(f"128x128 aa FAILED: {type(e).__name__}: {str(e)[:500]}")
        RESULTS["part_v"].append({"config": "128x128-aa", "error": str(e)[:500]})

    # ---- Part T: alternating A/B segments ----------------------------------
    def timed(tag, n, ny, nx, iters, backend, dtype=None):
        params = LBMParams(
            nx=nx, ny=ny, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = np.zeros((ny, nx), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        kw = {} if dtype is None else {"dtype": dtype}
        try:
            run_simulation(params, obstacles, backend=backend, **kw)  # warmup
            passes = [
                run_simulation(params, obstacles, backend=backend, **kw)
                for _ in range(n)
            ]
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:400]}")
            RESULTS["part_t"].append({"variant": tag, "error": str(e)[:400]})
            return
        best = min(p.elapsed for p in passes)
        mlups = ny * nx * iters / best / 1e6
        rec = {"variant": tag, "ny": ny, "nx": nx, "iters": iters,
               "best_s": round(best, 4),
               "all_s": [round(p.elapsed, 4) for p in passes],
               "mlups": round(mlups, 1)}
        RESULTS["part_t"].append(rec)
        log(f"{tag}: best {best:.3f}s = {mlups:.0f} MLUPS {rec['all_s']}")

    bf16 = jnp.bfloat16
    segments = (
        # 1024^2 f32: ping-pong resident vs AA, alternated
        ("1024:resident#0", 1024, 1024, 6000, "resident", None),
        ("1024:aa#1", 1024, 1024, 6000, "aa", None),
        ("1024:resident#2", 1024, 1024, 6000, "resident", None),
        ("1024:aa#3", 1024, 1024, 6000, "aa", None),
        # 1536^2 f32: AA's new regime vs what auto picks today
        ("1536:aa#0", 1536, 1536, 1000, "aa", None),
        ("1536:temporal#1", 1536, 1536, 1000, "temporal", None),
        ("1536:block#2", 1536, 1536, 1000, "pallas", None),
        ("1536:aa#3", 1536, 1536, 1000, "aa", None),
        ("1536:temporal#4", 1536, 1536, 1000, "temporal", None),
        ("1536:block#5", 1536, 1536, 1000, "pallas", None),
        # 2048^2 bf16: block (today's auto) vs AA
        ("2048:block:bf16#0", 2048, 2048, 600, "pallas", bf16),
        ("2048:aa:bf16#1", 2048, 2048, 600, "aa", bf16),
        ("2048:block:bf16#2", 2048, 2048, 600, "pallas", bf16),
        ("2048:aa:bf16#3", 2048, 2048, 600, "aa", bf16),
        # 1448x1408 f32 (73 MB): the round-1 scaling-table row
        ("1448x1408:aa#0", 1448, 1408, 800, "aa", None),
        ("1448x1408:temporal#1", 1448, 1408, 800, "temporal", None),
        ("1448x1408:aa#2", 1448, 1408, 800, "aa", None),
    )
    for tag, ny, nx, iters, backend, dtype in segments:
        timed(tag, 2, ny, nx, iters, backend, dtype)

    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    log(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
