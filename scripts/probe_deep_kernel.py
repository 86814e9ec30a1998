#!/usr/bin/env python
"""Round-3 deep state-view kernel A/B (follows probe_temporal_roofline.py's
bisection: the halo-carry pattern caps at ~54% of streaming bandwidth).

Interleaved, one process. Variants at PROBE_SIZE^2 (default 4096):
deep T8 x B{32,64,128} f32, deep c16 T16/T8 x B64, deep-copy probeless
baselines t4_b32 (best halo-carry) and block_c16, plus the traffic model's
sanity probe deep_t8_b64 at ITERS doubled.

Writes JSON to argv[1] (default bench_r3_deep.json).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "bench_r3_deep.json"
SIZE = int(os.environ.get("PROBE_SIZE", "4096"))
ITERS = int(os.environ.get("PROBE_ITERS", "96"))

RESULTS = {"meta": {"size": SIZE, "iters": ITERS}, "runs": [], "best": {}}


def log(m):
    print(f"[deep {time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.ops import pallas_deep as PD
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
    nobst_i16 = jnp.asarray((obstacles == 0), jnp.int16)
    cells_f32 = D2Q9.initial_state(params, dtype=jnp.float32)
    spec = DevSpec.for_params(params.density, params.accel)
    dev_tuple = (*spec.bg, spec.h)
    cells_c16 = encode_state(cells_f32, spec)

    nob_ext_cache = {}

    def nob_ext_for(block, depth, dt, mod):
        key = (block, depth, str(dt))
        if key not in nob_ext_cache:
            nob = nobst_i16 if dt == jnp.int16 else nobst_f32
            nob_ext_cache[key] = mod.nobst_ext(nob, block, depth, dt)
        return nob_ext_cache[key]

    owner = jnp.ones((1, 1), jnp.float32)

    def build_deep(block, depth, c16=False):
        dt = jnp.int16 if c16 else jnp.float32
        cells0 = cells_c16 if c16 else cells_f32
        nob_ext = nob_ext_for(block, depth, dt, PT)  # same layout as PT
        dv = dev_tuple if c16 else None
        npasses = ITERS // depth

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_(cells, nob_ext_a, owner_a):
            def body(j, c):
                c, _sums = PD.step_deep(
                    c, nob_ext_a, owner_a, params.density, params.accel,
                    params.omega, block, depth, dev=dv,
                )
                return c
            return jax.lax.fori_loop(0, npasses, body, cells)

        return (lambda s: run_(s, nob_ext, owner)), (lambda: jnp.array(cells0))

    def build_temporal(block, depth):
        nob_ext = nob_ext_for(block, depth, jnp.float32, PT)
        npasses = ITERS // depth

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_(state, nob_ext_a, owner_a):
            def body(j, st):
                st, _s = PT.step_t_pallas(
                    st, nob_ext_a, owner_a, params.density, params.accel,
                    params.omega, block, depth,
                )
                return st
            return jax.lax.fori_loop(0, npasses, body, state)

        def init():
            c = jnp.array(cells_f32)
            last, first = PT.make_halos_t(c, block, depth)
            return (c, last, first)

        return (lambda s: run_(s, nob_ext, owner)), init

    def build_block(block, c16=False):
        dt = jnp.int16 if c16 else jnp.float32
        cells0 = cells_c16 if c16 else cells_f32
        nob = (nobst_i16 if c16 else nobst_f32).astype(dt)
        dv = dev_tuple if c16 else None

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_(state, nob_a):
            def body(j, st):
                st, _ = PS.lbm_step_pallas(st, nob_a, params.density,
                                           params.accel, params.omega,
                                           block=block, dev=dv)
                return st
            return jax.lax.fori_loop(0, ITERS, body, state)

        return (lambda s: run_(s, nob)), (
            lambda: PS._init_state(jnp.array(cells0), block)
        )

    variants = {
        "deep_t8_b32": lambda: build_deep(32, 8),
        "deep_t8_b64": lambda: build_deep(64, 8),
        "deep_t16_b64": lambda: build_deep(64, 16),
        "t4_b32": lambda: build_temporal(32, 4),
        "block_c16": lambda: build_block(16, c16=True),
        "deep_c16_t8_b64": lambda: build_deep(64, 8, c16=True),
        # risky compiles LAST (b128 exceeds the helper; c16 t16 hung 30+ min)
        "deep_c16_t16_b64": lambda: build_deep(64, 16, c16=True),
    }

    import signal

    class _CompileTimeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _CompileTimeout()

    signal.signal(signal.SIGALRM, _alarm)

    compiled = {}
    for name, mk in variants.items():
        try:
            t0 = time.time()
            # A hung 16-bit deep-unroll compile (known relay pathology)
            # must not block the whole session.
            signal.alarm(int(os.environ.get("PROBE_COMPILE_TIMEOUT", "720")))
            run, init = mk()
            state = init()
            state = run(state)
            sync(state[0] if isinstance(state, tuple) else state)
            signal.alarm(0)
            log(f"{name}: compiled+warm in {time.time()-t0:.0f}s")
            del state
            import gc

            gc.collect()
            compiled[name] = (run, init)
        except _CompileTimeout:
            signal.alarm(0)
            log(f"{name}: COMPILE TIMEOUT after {time.time()-t0:.0f}s")
            RESULTS["runs"].append({"variant": name, "error": "compile timeout"})
        except Exception as e:
            signal.alarm(0)
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS["runs"].append({"variant": name,
                                    "error": f"{type(e).__name__}: {str(e)[:300]}"})

    for bracket in range(3):
        for name, (run, init) in list(compiled.items()):
            state = init()
            t0 = time.perf_counter()
            state = run(state)
            sync(state[0] if isinstance(state, tuple) else state)
            dt = time.perf_counter() - t0
            del state
            mlups = SIZE * SIZE * ITERS / dt / 1e6
            RESULTS["runs"].append({"variant": name, "bracket": bracket,
                                    "s": round(dt, 4), "mlups": round(mlups, 1)})
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
