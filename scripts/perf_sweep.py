#!/usr/bin/env python
"""Block-size performance sweep (the framework's analogue of the reference's
hand-kept "OpenCL tests.numbers" optimization log — see BENCHMARKS.md for
recorded results).

Runs each candidate block height B in ONE process, interleaved over
repetitions to cancel environment drift, and prints a table.

Usage: python scripts/perf_sweep.py <size> [iters] [blocks...]
e.g.:  python scripts/perf_sweep.py 1024x1024 2000 8 16 32
       python scripts/perf_sweep.py 8192 100 8 16
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv) -> int:
    if not argv:
        print(__doc__)
        return 2
    size = argv[0]
    iters = int(argv[1]) if len(argv) > 1 else 1000
    blocks = [int(b) for b in argv[2:]] or [8, 16, 32]

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime.driver import run_simulation
    from lbm_tpu.utils.geometry import box

    ref_input = f"/root/reference/input_{size}.params"
    if os.path.exists(ref_input):
        from lbm_tpu.io import read_obstacles, read_params

        params = read_params(ref_input)
        obstacles = read_obstacles(f"/root/reference/obstacles_{size}.dat", params)
    else:
        n = int(size.split("x")[0])
        params = LBMParams(
            nx=n, ny=n, max_iters=iters, reynolds_dim=10,
            density=0.1, accel=0.005, omega=1.85,
        )
        obstacles = box(n, n)
    params = dataclasses.replace(params, max_iters=iters)
    warm = dataclasses.replace(params, max_iters=5)

    run_simulation(warm, obstacles, backend="pallas")
    print(f"# {size}, {iters} iters, blocks {blocks}, 3 interleaved reps")
    results = {b: [] for b in blocks}
    for rep in range(3):
        for b in blocks:
            os.environ["LBM_PALLAS_BLOCK"] = str(b)
            run_simulation(warm, obstacles, backend="pallas")
            r = run_simulation(params, obstacles, backend="pallas")
            mlups = r.mlups(params)
            results[b].append(mlups)
            print(f"rep {rep} B={b:<4} {r.elapsed:.3f} s = {mlups:.0f} MLUPS", flush=True)
    print("\n# medians:")
    for b in blocks:
        med = sorted(results[b])[len(results[b]) // 2]
        print(f"B={b:<4} {med:.0f} MLUPS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
