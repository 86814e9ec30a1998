#!/usr/bin/env python
"""Round-5 sharding-tax part 4: fixed cost or per-pass cost?

Part 3 (bench_r5_shardtax3.json) showed the tax survives with NO
protocol and NO shard_map: a plain jit of the same fori-loop scaffolding
around the unmodified single-device kernel runs ~1.31x the driver path.
The loop jaxprs are structurally identical to run_band2's, so the
remaining candidates are (a) a FIXED first-call/dispatch cost the driver
path doesn't pay, or (b) a real per-pass cost from some compiled-code
difference. Discriminate by an iters ladder (the affine-fit trick of
bench_r3_synccost) and a second-call timing:

  single_<N>   run_simulation --backend band2, N iters
  bare_<N>     the part-3 "bare" custom loop, N iters
  bare2nd      the bare@1024 compiled called twice, second call timed
               (fresh synced inputs, so nothing lazy lands inside it)

    python scripts/r5_shardtax4_session.py OUT.json [--brackets 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from r5_shardtax2_session import make_bare_band2_step, make_nomap_loop


def log(m):
    print(f"[r5shard4 {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r5_shardtax4.json"
    brackets = 3
    if "--brackets" in sys.argv:
        brackets = int(sys.argv[sys.argv.index("--brackets") + 1])

    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.runtime.driver import run_simulation, sync, upload_obstacles

    dev = jax.devices()[0]
    results = {"meta": {"device": f"{dev.device_kind} ({dev.platform})",
                        "time": time.strftime("%Y-%m-%d %H:%M:%S")},
               "runs": {}, "summary": {}}
    log(f"device: {results['meta']['device']}")

    def dump():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    def rec(tag, secs):
        results["runs"].setdefault(tag, []).append(round(secs, 4))

    # warm
    pw = LBMParams(nx=1024, ny=1024, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obw = np.zeros((1024, 1024), np.int32)
    obw[0, :] = obw[-1, :] = 1
    t0 = time.time()
    r = run_simulation(pw, obw, backend="aa", fetch_final=False)
    log(f"warm: {r.elapsed:.3f}s loop, {time.time() - t0:.0f}s wall")

    obs2 = np.zeros((2048, 2048), np.int32)
    obs2[0, :] = obs2[-1, :] = 1
    B, T = 128, 16
    iters_list = (1024, 4096)

    def params_for(n):
        return LBMParams(nx=2048, ny=2048, max_iters=n, reynolds_dim=10,
                         density=0.1, accel=0.005, omega=1.85)

    compiled_bare = {}

    def get_bare(n):
        if n not in compiled_bare:
            p = params_for(n)
            cells = jax.device_put(D2Q9.initial_state(p, dtype=jnp.float32))
            od = jax.device_put(upload_obstacles(obs2))
            inv = jnp.float32(1.0 / (obs2 == 0).sum())
            compiled_bare[n] = (
                make_nomap_loop(p, make_bare_band2_step(B, T))
                .lower(cells, od, inv).compile(),
                od, inv,
            )
        return compiled_bare[n]

    def run_bare(n, presync=False):
        comp, od, inv = get_bare(n)
        p = params_for(n)
        cells = jax.device_put(D2Q9.initial_state(p, dtype=jnp.float32))
        if presync:
            sync(cells)
            sync(od)
        t0 = time.perf_counter()
        out, av = comp(cells, od, inv)
        sync(av)
        return time.perf_counter() - t0

    sharded_mode = "--sharded" in sys.argv
    if sharded_mode:
        from lbm_tpu.parallel.sharded import run_simulation_sharded
        os.environ["LBM_SHARD_LEAN"] = "1"

    def run_variant(n):
        if sharded_mode:
            r = run_simulation_sharded(params_for(n), obs2, n_devices=1,
                                       backend="band2")
            return r.elapsed
        return run_bare(n)

    for b in range(brackets):
        for n in iters_list:
            try:
                r = run_simulation(params_for(n), obs2, backend="band2",
                                   fetch_final=False)
                rec(f"single_{n}", r.elapsed)
                log(f"b{b} single_{n}: {r.elapsed:.4f}s")
            except Exception as e:
                log(f"b{b} single_{n} FAILED: {type(e).__name__}: "
                    f"{str(e)[:200]}")
            try:
                secs = run_variant(n)
                rec(f"bare_{n}", secs)
                log(f"b{b} {'sharded' if sharded_mode else 'bare'}_{n}: "
                    f"{secs:.4f}s")
            except Exception as e:
                log(f"b{b} bare_{n} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
        try:
            secs = run_bare(1024, presync=True)
            rec("bare2nd", secs)
            log(f"b{b} bare2nd: {secs:.4f}s")
        except Exception as e:
            log(f"b{b} bare2nd FAILED: {type(e).__name__}: {str(e)[:300]}")
        dump()

    # affine fits
    for fam in ("single", "bare"):
        t1 = results["runs"].get(f"{fam}_1024", [])
        t4 = results["runs"].get(f"{fam}_4096", [])
        if t1 and t4:
            s1, s4 = min(t1), min(t4)
            slope = (s4 - s1) / (4096 - 1024)
            results["summary"][fam] = {
                "best_1024_s": round(s1, 4), "best_4096_s": round(s4, 4),
                "us_per_iter": round(slope * 1e6, 3),
                "fixed_s": round(s1 - slope * 1024, 4),
            }
    if "single" in results["summary"] and "bare" in results["summary"]:
        results["summary"]["slope_ratio"] = round(
            results["summary"]["bare"]["us_per_iter"]
            / results["summary"]["single"]["us_per_iter"], 3)
    b2 = results["runs"].get("bare2nd", [])
    if b2:
        results["summary"]["bare2nd_best_s"] = round(min(b2), 4)
    dump()
    log(f"summary: {results['summary']}")
    log("done")


if __name__ == "__main__":
    main()
