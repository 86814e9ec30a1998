#!/usr/bin/env python
"""Weak/strong-scaling benchmark: the 8192x8192 lattice over a device mesh.

Default (real devices — a TPU pod slice, or this repo's single chip):
runs the sharded band2 path over every mesh size in 1..N that divides the
device count and prints one JSON line per mesh size:

    {"metric": "mlups_8192_mesh1", "value": ..., "unit": "MLUPS", ...}

``--out FILE`` additionally writes the full weak-scaling artifact: per-mesh
MLUPS, halo traffic per step, protocol efficiency vs the mesh=1 run, and
the DESIGN.md-roofline prediction to compare against.

``--cpu-mesh`` validates the PROTOCOL (not the speed) on a virtual
8-device CPU mesh — runs a small grid through the identical sharded code
(interpret-mode kernels) so a pod owner can check the sweep end-to-end
without hardware. Numbers are protocol-relative only.

Real-pod invocation (see BENCHMARKS.md "Weak-scaling runbook"):

    PYTHONPATH=... python bench_scaling.py 1024 --out scaling_pod.json

Expected shape of the result (DESIGN.md roofline): the band2 sharded
protocol sends 2 x 9 x T rows of halo per shard per T-step pass — halo
bytes/body bytes = T/rows_local (< 0.4% at 8192^2 on 8 shards), so weak
scaling is bounded by the mesh=1 protocol tax (bench_r5_shardtax.json),
not by ICI bandwidth.

Reference scaling contract: /root/reference README.md:74-102 (the
reported results table) and SURVEY.md:274 (the 8192^2 1->8-chip config).
"""

import json
import sys
import time

N_SIDE = 8192
BASELINE_MLUPS = 128 * 128 * 40000 / 4.5 / 1e6  # reference's best ~146


def _mesh_run(params, obstacles, n, backend):
    from lbm_tpu.parallel.sharded import run_simulation_sharded
    from lbm_tpu.runtime.driver import run_simulation

    if n == 1:
        run_simulation(params, obstacles, backend=backend, fetch_final=False)
        return run_simulation(params, obstacles, backend=backend,
                              fetch_final=False)
    run_simulation_sharded(params, obstacles, n_devices=n, backend=backend)
    return run_simulation_sharded(params, obstacles, n_devices=n,
                                  backend=backend)


def main() -> int:
    cpu_mesh = "--cpu-mesh" in sys.argv
    out_path = None
    argv = [a for a in sys.argv[1:] if a != "--cpu-mesh"]
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]

    if cpu_mesh:
        import jax

        # The TPU-relay sitecustomize pins jax_platforms via config, so the
        # env var alone does not switch backends (tests/conftest.py pattern).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        import os

        # Small-block kernel config so every mesh in 1..8 divides the
        # 256-row grid into supported local shapes (tests' band config).
        os.environ.setdefault("LBM_BAND_BLOCK", "16")
        os.environ.setdefault("LBM_BAND_DEPTH", "8")
        side = 256
        default_iters = 64
        backend = "band2"
    else:
        side = N_SIDE
        default_iters = 200
        backend = "auto"

    import jax
    import numpy as np  # noqa: F401

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.utils.geometry import box

    iters = int(argv[0]) if argv else default_iters
    params = LBMParams(
        nx=side, ny=side, max_iters=iters, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    obstacles = box(side, side)

    n_avail = len(jax.devices())
    meshes = [n for n in (1, 2, 4, 8) if n <= n_avail]

    artifact = {
        "meta": {
            "side": side, "iters": iters, "backend": backend,
            "cpu_mesh": cpu_mesh,
            "device": f"{jax.devices()[0].device_kind} "
                      f"({jax.devices()[0].platform}) x {n_avail}",
            "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        },
        "meshes": {},
    }
    base_mlups = None
    for n in meshes:
        try:
            res = _mesh_run(params, obstacles, n, backend)
        except Exception as e:  # pragma: no cover - per-mesh failure datum
            artifact["meshes"][str(n)] = {
                "error": f"{type(e).__name__}: {str(e)[:200]}"
            }
            print(f"# mesh={n} FAILED: {e}", file=sys.stderr)
            continue
        mlups = res.mlups(params)
        if base_mlups is None:
            base_mlups = mlups
        # band2 sharded halo protocol: one (9, T, nx) pair ppermuted per
        # shard per T-step pass -> 2*9*nx*itemsize bytes per shard per
        # STEP, independent of T (DESIGN.md; T divides out).
        halo_bytes_step = 2 * 9 * side * 4 if n > 1 else 0
        body_bytes_step = 2 * 9 * (side // n) * side * 4 // 1  # rd+wr
        rec = {
            "mlups": round(mlups, 1),
            "loop_s": round(res.elapsed, 4),
            "halo_bytes_per_shard_step": halo_bytes_step,
            "halo_to_body_ratio": round(
                halo_bytes_step / body_bytes_step, 6
            ),
            "efficiency_vs_mesh1": round(mlups / (base_mlups * n), 3)
            if base_mlups
            else None,
        }
        artifact["meshes"][str(n)] = rec
        print(
            json.dumps(
                {
                    "metric": f"mlups_{side}_mesh{n}",
                    "value": round(mlups, 1),
                    "unit": "MLUPS",
                    "vs_baseline": round(mlups / BASELINE_MLUPS, 2),
                }
            )
        )
        print(
            f"# mesh={n}: loop {res.elapsed:.3f}s for {iters} iters",
            file=sys.stderr,
        )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"# artifact -> {out_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
