#!/usr/bin/env python
"""Round-3 HBM-regime bisection (VERDICT r2 next-round item 1).

The temporal kernel runs at <50% of its traffic-derived ceiling at 8192^2
f32 (7.7k MLUPS vs ~16k from 19/T plane-passes at the measured ~310 GB/s).
This session bisects WHERE the time goes, in one process, interleaved:

  - t4_copy:   same BlockSpecs/DMA pattern, physics replaced by +1
               (pure achievable traffic rate at depth 4)
  - t4_nosum:  full physics minus the per-step reductions
  - t4_noroll: full physics minus the east/west lane rolls
  - t4_full:   the shipped kernel (B16), plus a B32 / T6 / T8-compile probe
  - block_b8:  the single-step kernel baseline
  - *_c16:     first on-TPU compile + rate check of the companded-int16
               storage mode (half traffic, a few extra VPU ops)

Writes JSON to argv[1] (default bench_r3_roofline.json).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "bench_r3_roofline.json"
SIZE = int(os.environ.get("PROBE_SIZE", "8192"))
ITERS = int(os.environ.get("PROBE_ITERS", "96"))
INTERPRET = os.environ.get("PROBE_INTERPRET", "") == "1"  # CPU smoke only

RESULTS = {"meta": {"size": SIZE, "iters": ITERS}, "runs": [], "best": {}}


def log(m):
    print(f"[roofline {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.ops import pallas_step as PS
    from lbm_tpu.ops import pallas_temporal as PT
    from lbm_tpu.ops.devspace import DevSpec, encode_state
    from lbm_tpu.runtime.driver import sync

    dev0 = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev0.device_kind} ({dev0.platform})"
    log(f"device: {RESULTS['meta']['device']}; grid {SIZE}^2 x {ITERS}")

    params = LBMParams(nx=SIZE, ny=SIZE, max_iters=ITERS, reynolds_dim=10,
                       density=0.1, accel=0.005, omega=1.85)
    obstacles = np.zeros((SIZE, SIZE), dtype=np.int32)
    obstacles[0, :] = obstacles[-1, :] = 1
    nobst_f32 = jnp.asarray((obstacles == 0), jnp.float32)
    cells_f32 = D2Q9.initial_state(params, dtype=jnp.float32)
    spec = DevSpec.for_params(params.density, params.accel)
    dev_tuple = (*spec.bg, spec.h)
    cells_c16 = encode_state(cells_f32, spec)
    nobst_i16 = jnp.asarray((obstacles == 0), jnp.int16)

    def build_temporal(block, depth, probe=None, c16=False):
        dt = jnp.int16 if c16 else jnp.float32
        cells0 = cells_c16 if c16 else cells_f32
        nob = nobst_i16 if c16 else nobst_f32
        nob_ext = PT.nobst_ext(nob, block, depth, dt)
        owner = jnp.ones((1, 1), jnp.float32)
        npasses = ITERS // depth
        dv = dev_tuple if c16 else None

        # nob_ext/owner ride as ARGUMENTS: closing over a ~400 MB array
        # inlines it as an HLO constant and blows the relay's compile
        # request size limit (HTTP 413).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_(state, nob_ext_a, owner_a):
            def body(j, st):
                st, _sums = PT.step_t_pallas(
                    st, nob_ext_a, owner_a, params.density, params.accel,
                    params.omega, block, depth, probe=probe, dev=dv,
                    interpret=INTERPRET,
                )
                return st
            return jax.lax.fori_loop(0, npasses, body, state)

        def run(state):
            return run_(state, nob_ext, owner)

        def init():
            # fresh copies: run() donates its input buffers
            c = jnp.array(cells0)
            last, first = PT.make_halos_t(c, block, depth)
            return (c, last, first)

        return run, init

    def build_block(block, c16=False):
        dt = jnp.int16 if c16 else jnp.float32
        cells0 = cells_c16 if c16 else cells_f32
        nob = (nobst_i16 if c16 else nobst_f32).astype(dt)
        dv = dev_tuple if c16 else None
        step = (PS.lbm_step_pallas_interpret if INTERPRET
                else PS.lbm_step_pallas)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_(state, nob_a):
            def body(j, st):
                st, _ = step(st, nob_a, params.density, params.accel,
                             params.omega, block=block, dev=dv)
                return st
            return jax.lax.fori_loop(0, ITERS, body, state)

        def run(state):
            return run_(state, nob)

        def init():
            return PS._init_state(jnp.array(cells0), block)

        return run, init

    variants = {
        "t4_full": lambda: build_temporal(16, 4),
        "t4_copy": lambda: build_temporal(16, 4, probe="copy"),
        "t4_nosum": lambda: build_temporal(16, 4, probe="nosum"),
        "t4_noroll": lambda: build_temporal(16, 4, probe="noroll"),
        "t4_b32": lambda: build_temporal(32, 4),
        "t6_b16": lambda: build_temporal(16, 6),
        "t8_b16": lambda: build_temporal(16, 8),
        "block_b8": lambda: build_block(8),
        "t4_c16": lambda: build_temporal(16, 4, c16=True),
        "block_c16": lambda: build_block(16, c16=True),
    }
    order = list(variants)

    compiled = {}
    for name in order:
        try:
            t0 = time.time()
            run, init = variants[name]()
            state = init()
            state = run(state)  # compile + warmup
            sync(state[0] if isinstance(state, tuple) else state)
            log(f"{name}: compiled+warm in {time.time()-t0:.0f}s")
            compiled[name] = (run, init, state)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["runs"].append({"variant": name,
                                    "error": f"{type(e).__name__}: {str(e)[:300]}"})

    for bracket in range(3):
        for name, (run, init, _state) in list(compiled.items()):
            state = init()
            t0 = time.perf_counter()
            state = run(state)
            sync(state[0] if isinstance(state, tuple) else state)
            dt = time.perf_counter() - t0
            mlups = SIZE * SIZE * ITERS / dt / 1e6
            RESULTS["runs"].append(
                {"variant": name, "bracket": bracket, "s": round(dt, 4),
                 "mlups": round(mlups, 1)}
            )
            log(f"b{bracket} {name}: {dt:.3f}s = {mlups:.0f} MLUPS")
        with open(OUT, "w") as f:
            json.dump(RESULTS, f, indent=1)

    for name in compiled:
        ts = [r["s"] for r in RESULTS["runs"]
              if r.get("variant") == name and "s" in r]
        if ts:
            RESULTS["best"][name] = round(SIZE * SIZE * ITERS / min(ts) / 1e6, 1)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("best MLUPS: " + json.dumps(RESULTS["best"]))


if __name__ == "__main__":
    main()
