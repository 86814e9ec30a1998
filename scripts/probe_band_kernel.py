#!/usr/bin/env python
"""Round-3 band-kernel A/B: fixed-buffer in-kernel-loop deep blocking
(T=16-32) vs the deep T8 and halo-carry t4 kernels, at the 1536-band
(where AA cannot compile and temporal was the fallback), 2048^2 and
4096^2. One process, interleaved, compile alarms.

Writes JSON to argv[1] (default bench_r3_band.json).
"""

import functools
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "bench_r3_band.json"
RESULTS = {"meta": {}, "runs": [], "best": {}}


def log(m):
    print(f"[band {time.strftime('%H:%M:%S')}] {m}", flush=True)


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


class _CompileTimeout(Exception):
    pass


def main():
    import jax
    import jax.numpy as jnp

    from lbm_tpu.models.d2q9 import D2Q9, LBMParams
    from lbm_tpu.ops import pallas_band as PB
    from lbm_tpu.ops import pallas_deep as PD
    from lbm_tpu.ops import pallas_temporal as PT
    from lbm_tpu.ops.devspace import DevSpec, encode_state
    from lbm_tpu.runtime.driver import sync

    signal.signal(signal.SIGALRM,
                  lambda *_: (_ for _ in ()).throw(_CompileTimeout()))
    dev0 = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev0.device_kind} ({dev0.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    for size, plans in (
        (1536, [("t4_b16", "t4", (16, 4), False),
                ("deep_t8b64", "deep", (64, 8), False),
                ("band_pick", "band", None, False),
                ("band_b128t16", "band", (128, 16), False),
                ("band_c16", "band", None, True)]),
        (2048, [("deep_t8b64", "deep", (64, 8), False),
                ("band_b128t16", "band", (128, 16), False)]),
        (4096, [("deep_t8b64", "deep", (64, 8), False),
                ("band_b64t16", "band", (64, 16), False)]),
    ):
        iters = 192 if size == 1536 else 96
        params = LBMParams(nx=size, ny=size, max_iters=iters, reynolds_dim=10,
                           density=0.1, accel=0.005, omega=1.85)
        obstacles = np.zeros((size, size), dtype=np.int32)
        obstacles[0, :] = obstacles[-1, :] = 1
        nobst_f32 = jnp.asarray((obstacles == 0), jnp.float32)
        nobst_i16 = jnp.asarray((obstacles == 0), jnp.int16)
        cells_f32 = D2Q9.initial_state(params, dtype=jnp.float32)
        spec = DevSpec.for_params(params.density, params.accel)
        dev_tuple = (*spec.bg, spec.h)
        cells_c16 = encode_state(cells_f32, spec)
        owner = jnp.ones((1, 1), jnp.float32)
        nob_cache = {}

        def nob_ext_for(block, depth, dt):
            key = (block, depth, str(dt))
            if key not in nob_cache:
                nob = nobst_i16 if dt == jnp.int16 else nobst_f32
                nob_cache[key] = PT.nobst_ext(nob, block, depth, dt)
            return nob_cache[key]

        def build(kind, cfg, c16):
            dt = jnp.int16 if c16 else jnp.float32
            if cfg is None:
                mod = {"band": PB, "deep": PD}[kind]
                cfg = mod.pick_config(size, size, dt)
                if cfg is None:
                    raise ValueError("no config")
            block, depth = cfg
            cells0 = cells_c16 if c16 else cells_f32
            nob_ext = nob_ext_for(block, depth, dt)
            dv = dev_tuple if c16 else None
            npasses = iters // depth
            step = {"band": PB.step_band, "deep": PD.step_deep,
                    "t4": None}[kind]

            if kind == "t4":
                @functools.partial(jax.jit, donate_argnums=(0,))
                def run_(st, nob_a, owner_a):
                    def body(j, s2):
                        s2, _ = PT.step_t_pallas(
                            s2, nob_a, owner_a, params.density, params.accel,
                            params.omega, block, depth, dev=dv)
                        return s2
                    return jax.lax.fori_loop(0, npasses, body, st)

                def init():
                    c = jnp.array(cells0)
                    last, first = PT.make_halos_t(c, block, depth)
                    return (c, last, first)
            else:
                @functools.partial(jax.jit, donate_argnums=(0,))
                def run_(c, nob_a, owner_a):
                    def body(j, cc):
                        cc, _ = step(cc, nob_a, owner_a, params.density,
                                     params.accel, params.omega, block,
                                     depth, dev=dv)
                        return cc
                    return jax.lax.fori_loop(0, npasses, body, c)

                def init():
                    return jnp.array(cells0)

            return (lambda s: run_(s, nob_ext, owner)), init, f"B{block}T{depth}"

        compiled = {}
        for name, kind, cfg, c16 in plans:
            full = f"{size}:{name}"
            try:
                t0 = time.time()
                signal.alarm(720)
                run, init, tag = build(kind, cfg, c16)
                st = run(init())
                sync(st[0] if isinstance(st, tuple) else st)
                signal.alarm(0)
                del st
                import gc

                gc.collect()
                log(f"{full} ({tag}): compiled+warm in {time.time()-t0:.0f}s")
                compiled[full] = (run, init, tag)
            except _CompileTimeout:
                signal.alarm(0)
                log(f"{full}: COMPILE TIMEOUT")
                RESULTS["runs"].append({"variant": full, "error": "compile timeout"})
            except Exception as e:
                signal.alarm(0)
                log(f"{full}: FAILED {type(e).__name__}: {str(e)[:200]}")
                RESULTS["runs"].append(
                    {"variant": full,
                     "error": f"{type(e).__name__}: {str(e)[:300]}"})
            save()

        for b in range(3):
            for full, (run, init, tag) in list(compiled.items()):
                st = init()
                t0 = time.perf_counter()
                st = run(st)
                sync(st[0] if isinstance(st, tuple) else st)
                dt_s = time.perf_counter() - t0
                del st
                mlups = size * size * iters / dt_s / 1e6
                RESULTS["runs"].append({"variant": full, "cfg": tag,
                                        "bracket": b, "s": round(dt_s, 4),
                                        "mlups": round(mlups, 1)})
                log(f"b{b} {full} ({tag}): {dt_s:.3f}s = {mlups:.0f} MLUPS")
            save()

    for r in RESULTS["runs"]:
        if "s" in r:
            v = r["variant"]
            RESULTS["best"][v] = max(RESULTS["best"].get(v, 0), r["mlups"])
    save()
    log("best: " + json.dumps(RESULTS["best"]))


if __name__ == "__main__":
    main()
