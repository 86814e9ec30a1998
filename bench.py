#!/usr/bin/env python
"""Benchmark: single-chip throughput on the reference's largest config.

Runs the 1024x1024 lattice (input_1024x1024.params geometry) with the fused
Pallas kernel on the first available device, times the official
20000-iteration jitted loop after AOT compile + warmup, and prints ONE
JSON line:

    {"metric": "mlups_1024x1024", "value": ..., "unit": "MLUPS", "vs_baseline": ...}

vs_baseline is relative to the reference's best published number: its final
OpenCL version runs 128x128 x 40k iters in 4.5 s on a BCP3 GPU node
(`OpenCL tests.numbers` row 12) = 145.6 MLUPS.
"""

import dataclasses
import json
import os
import sys
import time

BASELINE_MLUPS = 128 * 128 * 40000 / 4.5 / 1e6  # reference's best: ~145.6

# A TPU session whose best-of-3 lands below this is relay-throttled (the
# clean rate is ~24-27k MLUPS; throttled processes have measured 3-100x
# slow, e.g. a 385 s loop in bench_r4_probe_tpu.json stage 1 minutes
# before a clean 0.26 s run). Throttling is per-PROCESS (per relay
# session), so the effective mitigation is ONE re-exec into a fresh
# process, not more in-process passes.
_RETRY_FLOOR_MLUPS = float(os.environ.get("LBM_BENCH_FLOOR_MLUPS", "8000"))


def main() -> int:
    import jax

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.runtime.driver import run_simulation

    params = read_params("/root/reference/input_1024x1024.params")
    obstacles = read_obstacles("/root/reference/obstacles_1024x1024.dat", params)

    # Default = the config's own official 20000 iters. Short loops are
    # floored by the fixed per-run sync cost (~25-60 ms RPC,
    # bench_r3_synccost/fixedcost.json): 2000-iter runs under-reported by
    # ~30% (bench_r2_tpu5/8.json) and the round-4 6000-iter default
    # (~0.3 s loop) still gave up ~8% vs the official 20k-iter record
    # (24,214 in BENCH_r04.json vs 26,715 in the same round's official
    # sessions, BENCHMARKS.md headline). At 20k the loop is ~0.8 s and the
    # fixed cost is noise -- and the timed run IS the official config.
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    p = dataclasses.replace(params, max_iters=iters)

    platform = jax.devices()[0].platform
    backend = "auto"
    # Warmup with the SAME iteration count so the timed passes reuse the
    # exact compiled programs (remote compilation is async — the first
    # execution of a new program shape pays it), then best-of-3 timed runs
    # (the shared-TPU environment shows multi-x throttling noise; the best
    # pass reflects the kernel, not the neighbors).
    warm = run_simulation(p, obstacles, backend=backend)
    if (
        platform == "tpu"
        and warm.mlups(p) < _RETRY_FLOOR_MLUPS
        and not os.environ.get("LBM_BENCH_RETRY")
    ):
        # Throttle detected at the WARMUP already (windows can run
        # 100-15,000x slow — CLAUDE.md): don't pay three throttled
        # timed passes first; re-exec into a fresh relay session now.
        print(
            f"# throttled session (warmup {warm.mlups(p):.0f} MLUPS < "
            f"{_RETRY_FLOOR_MLUPS:.0f} floor): re-exec once in a fresh "
            "process",
            file=sys.stderr, flush=True,
        )
        os.environ["LBM_BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    passes = [run_simulation(p, obstacles, backend=backend) for _ in range(3)]
    result = min(passes, key=lambda r: r.elapsed)
    mlups = result.mlups(p)
    if (
        platform == "tpu"
        and mlups < _RETRY_FLOOR_MLUPS
        and not os.environ.get("LBM_BENCH_RETRY")
    ):
        # Throttled session: nothing printed yet — replace this process
        # with a fresh one (fresh relay session) and let IT print the line.
        print(
            f"# throttled session ({mlups:.0f} MLUPS < {_RETRY_FLOOR_MLUPS:.0f}"
            " floor): re-exec once in a fresh process",
            file=sys.stderr, flush=True,
        )
        os.environ["LBM_BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
    print(
        json.dumps(
            {
                "metric": "mlups_1024x1024",
                "value": round(mlups, 1),
                "unit": "MLUPS",
                "vs_baseline": round(mlups / BASELINE_MLUPS, 2),
            }
        )
    )
    print(
        f"# {platform}, {iters} iters, best loop {result.elapsed:.3f}s of "
        f"{[round(r.elapsed, 3) for r in passes]}, backend={backend}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
