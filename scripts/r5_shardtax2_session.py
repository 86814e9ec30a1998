#!/usr/bin/env python
"""Round-5 mesh=1 sharding-tax decomposition, part 2: structure, not body.

bench_r5_shardtax.json refuted the two body hypotheses: the lean halo
protocol cut 1.219x only to 1.187x and the row forcing form is a wash —
the kernel body under lean+row is within ~1% of the single-device kernel,
yet ~19% of tax remains. The residual is ~0.85 ms/pass at 2048^2 B128 T16
(= roughly one full 302 MB state read+write at ~310 GB/s), pointing at
the shard_map/loop STRUCTURE (e.g. XLA inserting a carry copy per pass,
or collective-adjacent copies), not the step body.

Variants, one process, interleaved (all mesh=1, 2048^2 x 1024 iters):

  single    run_simulation --backend band2 (denominator)
  lean      the round-5 champion protocol (lean + field)
  noperm    lean with the ppermute pair replaced by local slices
            (probe_no_collectives — identity at mesh=1): prices the
            degenerate collectives + any copies XLA plants around them
  bare      the UNMODIFIED single-device step_band2 wrapped in
            build_sharded_loop via a custom step_fn (no halos, no r0,
            no psum): prices shard_map + the loop scaffolding alone

    python scripts/r5_shardtax2_session.py OUT.json [--brackets 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def log(m):
    print(f"[r5shard2 {time.strftime('%H:%M:%S')}] {m}", flush=True)


def make_bare_band2_step(block, depth, interpret=False):
    """The single-device band2 pass as a build_sharded_loop step_fn —
    valid ONLY at mesh=1 (local rows == global ny, so the kernel's wrap
    indexing and owner-gated static forcing rows are exactly the
    single-device semantics). No ppermute, no r0, no psum."""
    import jax.numpy as jnp

    from lbm_tpu.ops.pallas_band import nobst_ext
    from lbm_tpu.ops.pallas_band2 import step_band2

    T = depth

    def step(cells, nob_ext_arr, density, accel, omega):
        owner = jnp.ones((1, 1), jnp.float32)
        out, sums = step_band2(cells, nob_ext_arr, owner, density, accel,
                               omega, block, T, interpret=interpret)
        return out, jnp.stack(sums)

    def prepare(obstacles, dtype):
        nob = (obstacles == 0).astype(dtype)
        return nobst_ext(nob, block, T, dtype)

    step.prepare = prepare
    step.init_state = lambda c: c
    step.extract = lambda s: s
    step.steps_per_call = T
    step.tail_step = None  # n_iters must divide T in this probe
    return step


def make_nomap_loop(params, step_fn):
    """build_sharded_loop's local_loop verbatim, WITHOUT the shard_map
    wrapper (and without the mesh): isolates shard_map itself from the
    loop scaffolding. Valid only single-device."""
    import jax
    import jax.numpy as jnp

    n_iters = params.max_iters
    density, accel, omega = (float(params.density), float(params.accel),
                             float(params.omega))
    spc = step_fn.steps_per_call

    def local_loop(cells, obstacles, inv_tot_cells):
        av_vels = jnp.zeros((n_iters,), dtype=jnp.float32)
        obstacles_prep = step_fn.prepare(obstacles, cells.dtype)

        def body(tt, carry):
            state, av = carry
            state, sums = step_fn(state, obstacles_prep, density, accel,
                                  omega)
            av = jax.lax.dynamic_update_slice(
                av, (sums * inv_tot_cells).astype(jnp.float32), (tt * spc,))
            return state, av

        state, av_vels = jax.lax.fori_loop(
            0, n_iters // spc, body, (cells, av_vels))
        return state, av_vels

    return jax.jit(local_loop, donate_argnums=(0,))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r5_shardtax2.json"
    brackets = 3
    if "--brackets" in sys.argv:
        brackets = int(sys.argv[sys.argv.index("--brackets") + 1])

    import jax

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.parallel.sharded import (
        make_mesh,
        make_sharded_band_step,
        run_simulation_sharded,
    )
    from lbm_tpu.runtime.driver import run_simulation

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

    p2 = LBMParams(nx=2048, ny=2048, max_iters=1024, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obs2 = np.zeros((2048, 2048), np.int32)
    obs2[0, :] = obs2[-1, :] = 1
    cells_m = 2048 * 2048 * 1024 / 1e6
    B, T = 128, 16

    os.environ["LBM_SHARD_LEAN"] = "1"
    os.environ["LBM_SHARD_FORCE"] = "field"
    variants = {
        "lean": dict(backend="band2"),
        "noperm": dict(step_factory=lambda: make_sharded_band_step(
            B, T, 2048, band2=True, lean=True, rowforce=False,
            probe_no_collectives=True)),
        "bare": dict(step_factory=lambda: make_bare_band2_step(B, T)),
        "nomap": dict(nomap=True),
    }
    if "--part3" in sys.argv:
        variants = {
            "bare": dict(step_factory=lambda: make_bare_band2_step(B, T)),
            "nomap": dict(nomap=True),
        }

    def run_nomap():
        import jax.numpy as jnp

        from lbm_tpu.models.d2q9 import D2Q9
        from lbm_tpu.runtime.driver import sync, upload_obstacles

        cells = jax.device_put(D2Q9.initial_state(p2, dtype=jnp.float32))
        obstacles_dev = jax.device_put(upload_obstacles(obs2))
        inv = jnp.float32(1.0 / (obs2 == 0).sum())
        compiled = (
            make_nomap_loop(p2, make_bare_band2_step(B, T))
            .lower(cells, obstacles_dev, inv).compile()
        )
        t0 = time.perf_counter()
        out, av = compiled(cells, obstacles_dev, inv)
        sync(av)
        return time.perf_counter() - t0

    def run_custom(step_fn):
        """run_simulation_sharded's protocol for a custom step_fn."""
        import jax.numpy as jnp

        from lbm_tpu.models.d2q9 import D2Q9
        from lbm_tpu.parallel.sharded import AXIS, build_sharded_loop
        from lbm_tpu.runtime.driver import sync, upload_obstacles
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as Pspec

        mesh = make_mesh(1)
        cells_sharding = NamedSharding(mesh, Pspec(None, AXIS, None))
        obst_sharding = NamedSharding(mesh, Pspec(AXIS, None))
        cells = jax.device_put(
            D2Q9.initial_state(p2, dtype=jnp.float32), cells_sharding)
        obstacles_dev = jax.device_put(
            upload_obstacles(obs2), obst_sharding)
        inv = jnp.float32(1.0 / (obs2 == 0).sum())
        compiled = (
            build_sharded_loop(mesh, p2, step_fn=step_fn)
            .lower(cells, obstacles_dev, inv).compile()
        )
        t0 = time.perf_counter()
        out, av = compiled(cells, obstacles_dev, inv)
        sync(av)
        return time.perf_counter() - t0

    for b in range(brackets):
        try:
            r = run_simulation(p2, obs2, backend="band2", fetch_final=False)
            rec("single", r.elapsed)
            log(f"b{b} single: {r.elapsed:.4f}s ({cells_m / r.elapsed:.0f})")
        except Exception as e:
            log(f"b{b} single FAILED: {type(e).__name__}: {str(e)[:200]}")
        for tag, spec in variants.items():
            try:
                if "backend" in spec:
                    r = run_simulation_sharded(p2, obs2, n_devices=1,
                                               backend=spec["backend"])
                    secs = r.elapsed
                elif spec.get("nomap"):
                    secs = run_nomap()
                else:
                    secs = run_custom(spec["step_factory"]())
                rec(tag, secs)
                log(f"b{b} {tag}: {secs:.4f}s ({cells_m / secs:.0f})")
            except Exception as e:
                log(f"b{b} {tag} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
        dump()

    singles = results["runs"].get("single", [])
    if singles:
        s = min(singles)
        results["summary"]["single_mlups"] = round(cells_m / s, 1)
        for tag in variants:
            runs = results["runs"].get(tag, [])
            if runs:
                results["summary"][tag] = {
                    "best_s": round(min(runs), 4),
                    "mlups": round(cells_m / min(runs), 1),
                    "overhead_x": round(min(runs) / s, 3),
                }
    dump()
    log(f"summary: {results['summary']}")
    log("done")


if __name__ == "__main__":
    main()
