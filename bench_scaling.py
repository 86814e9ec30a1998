#!/usr/bin/env python
"""Weak-scaling benchmark: the 8192x8192 lattice over a device mesh.

Runs the sharded fused-kernel path over 1..N devices (whatever divides the
available device count) and prints one JSON line per mesh size:

    {"metric": "mlups_8192_mesh1", "value": ..., "unit": "MLUPS", ...}

On a single-chip host this measures the one-chip 8192^2 number; on a pod
slice it sweeps the mesh (halo exchange rides ICI). Iterations default to
200 (the grid has 67M cells — 200 iters is ~13.4G updates).
"""

import json
import sys
import time

N_SIDE = 8192
BASELINE_MLUPS = 128 * 128 * 40000 / 4.5 / 1e6  # reference's best ~146


def main() -> int:
    import jax
    import numpy as np

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.parallel.sharded import run_simulation_sharded
    from lbm_tpu.runtime.driver import run_simulation
    from lbm_tpu.utils.geometry import box

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    params = LBMParams(
        nx=N_SIDE, ny=N_SIDE, max_iters=iters, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    obstacles = box(N_SIDE, N_SIDE)

    n_avail = len(jax.devices())
    meshes = [n for n in (1, 2, 4, 8) if n <= n_avail]

    for n in meshes:
        # Warm with the SAME shape so the timed pass reuses compiled programs
        # (remote compiles are async — the first execution pays them).
        if n == 1:
            run_simulation(params, obstacles, backend="auto")
            res = run_simulation(params, obstacles, backend="auto")
        else:
            run_simulation_sharded(params, obstacles, n_devices=n, backend="auto")
            res = run_simulation_sharded(params, obstacles, n_devices=n, backend="auto")
        mlups = res.mlups(params)
        print(
            json.dumps(
                {
                    "metric": f"mlups_8192_mesh{n}",
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
