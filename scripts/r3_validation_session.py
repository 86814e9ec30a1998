#!/usr/bin/env python
"""Round-3 validation session (one TPU process):

1. c16 golden gates: all four official configs end-to-end at
   --precision c16 through auto dispatch, upstream checker semantics.
2. deep-kernel golden gate: the official 1024^2 config through
   --backend deep f32 (physics validation of the state-view kernel on
   real hardware) + its MLUPS.
3. Width probes: deep f32 + c16 at 2048^2 and 8192^2 (96 iters,
   interleaved vs the t4 halo-carry baseline) — the compile-validation
   evidence the auto policy caps need.

Writes JSON to argv[1] (default bench_r3_validation.json).
"""

import functools
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "bench_r3_validation.json"
RESULTS = {"meta": {}, "gold": {}, "probe": {"runs": [], "best": {}}}
REF = "/root/reference"
GOLD_FALLBACK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "tests", "golden")


def log(m):
    print(f"[r3val {time.strftime('%H:%M:%S')}] {m}", flush=True)


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def gold_path(cfg, kind):
    p = f"{REF}/check/{cfg}.{kind}.dat"
    if os.path.exists(p):
        return p
    p2 = os.path.join(GOLD_FALLBACK, f"{cfg}.{kind}.dat")
    return p2 if os.path.exists(p2) else None


class _CompileTimeout(Exception):
    pass


def main():
    import jax
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params
    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.ops.reference import velocity_field
    from lbm_tpu.runtime.driver import run_simulation

    signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(_CompileTimeout()))

    dev0 = jax.devices()[0]
    RESULTS["meta"]["device"] = f"{dev0.device_kind} ({dev0.platform})"
    log(f"device: {RESULTS['meta']['device']}")

    def gate(cfg, res, params, obstacles, tag):
        rec = {"loop_s": round(res.elapsed, 4),
               "mlups": round(res.mlups(params), 1)}
        av_gold = gold_path(cfg, "av_vels")
        if av_gold:
            ref_av = np.loadtxt(av_gold, usecols=[1])
            d = 100.0 * (ref_av - res.av_vels) / res.av_vels
            rec["av_max_pct"] = round(float(np.max(np.abs(d))), 4)
        fs_gold = gold_path(cfg, "final_state")
        if fs_gold:
            ref_p = np.loadtxt(fs_gold, usecols=[5])
            _, _, _, pressure = velocity_field(
                jnp.asarray(res.cells), jnp.asarray(np.asarray(obstacles)))
            sim_p = np.where(np.asarray(obstacles).ravel() == 1,
                             params.density / 3.0, np.asarray(pressure).ravel())
            d = 100.0 * (ref_p - sim_p) / sim_p
            rec["pressure_max_pct"] = round(float(np.max(np.abs(d))), 4)
        rec["gate"] = (
            "pass"
            if np.isfinite(res.av_vels).all()
            and all(rec.get(k, 0.0) <= 1.0
                    for k in ("av_max_pct", "pressure_max_pct"))
            else "FAIL"
        )
        RESULTS["gold"][tag] = rec
        log(f"{tag}: {rec}")
        save()

    # ---- 1. c16 golden gates --------------------------------------------
    for cfg in ["128x128", "128x256", "256x256", "1024x1024"]:
        params = read_params(f"{REF}/input_{cfg}.params")
        obstacles = read_obstacles(f"{REF}/obstacles_{cfg}.dat", params)
        try:
            res = run_simulation(params, obstacles, backend="auto", dtype="c16")
            gate(cfg, res, params, obstacles, f"c16:{cfg}")
        except Exception as e:
            RESULTS["gold"][f"c16:{cfg}"] = {
                "error": f"{type(e).__name__}: {str(e)[:300]}"}
            log(f"c16:{cfg} FAILED {e}")
            save()

    # ---- 2. deep-kernel golden gate at 1024^2 f32 -----------------------
    params = read_params(f"{REF}/input_1024x1024.params")
    obstacles = read_obstacles(f"{REF}/obstacles_1024x1024.dat", params)
    try:
        res = run_simulation(params, obstacles, backend="deep",
                             dtype=jnp.float32)
        gate("1024x1024", res, params, obstacles, "deep-f32:1024x1024")
    except Exception as e:
        RESULTS["gold"]["deep-f32:1024x1024"] = {
            "error": f"{type(e).__name__}: {str(e)[:300]}"}
        log(f"deep-f32:1024 FAILED {e}")
        save()

    # ---- 3. width probes ------------------------------------------------
    from lbm_tpu.models.d2q9 import D2Q9
    from lbm_tpu.ops import pallas_deep as PD
    from lbm_tpu.ops import pallas_step as PS
    from lbm_tpu.ops import pallas_temporal as PT
    from lbm_tpu.ops.devspace import DevSpec, encode_state
    from lbm_tpu.runtime.driver import sync

    for size in (2048, 8192):
        iters = 96
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

        def build_deep(c16):
            dt = jnp.int16 if c16 else jnp.float32
            cfg = PD.pick_config(size, size, dt)
            if cfg is None:
                raise ValueError("no deep config")
            block, depth = cfg
            cells0 = cells_c16 if c16 else cells_f32
            nob_ext = nob_ext_for(block, depth, dt)
            dv = dev_tuple if c16 else None
            npasses = iters // depth

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run_(c, nob_a, owner_a):
                def body(j, cc):
                    cc, _ = PD.step_deep(cc, nob_a, owner_a, params.density,
                                         params.accel, params.omega, block,
                                         depth, dev=dv)
                    return cc
                return jax.lax.fori_loop(0, npasses, body, c)

            return (lambda s: run_(s, nob_ext, owner)), (
                lambda: jnp.array(cells0)), f"B{block}T{depth}"

        def build_t4(c16):
            dt = jnp.int16 if c16 else jnp.float32
            cells0 = cells_c16 if c16 else cells_f32
            nob_ext = nob_ext_for(16, 4, dt)
            dv = dev_tuple if c16 else None
            npasses = iters // 4

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run_(st, nob_a, owner_a):
                def body(j, s2):
                    s2, _ = PT.step_t_pallas(s2, nob_a, owner_a,
                                             params.density, params.accel,
                                             params.omega, 16, 4, dev=dv)
                    return s2
                return jax.lax.fori_loop(0, npasses, body, st)

            def init():
                c = jnp.array(cells0)
                last, first = PT.make_halos_t(c, 16, 4)
                return (c, last, first)

            return (lambda s: run_(s, nob_ext, owner)), init, "B16T4"

        variants = {
            f"{size}:t4_f32": lambda: build_t4(False),
            f"{size}:deep_f32": lambda: build_deep(False),
            f"{size}:deep_c16": lambda: build_deep(True),
            f"{size}:t4_c16": lambda: build_t4(True),
        }
        compiled = {}
        for name, mk in variants.items():
            try:
                t0 = time.time()
                signal.alarm(720)
                run, init, cfg_tag = mk()
                st = run(init())
                sync(st[0] if isinstance(st, tuple) else st)
                signal.alarm(0)
                del st
                import gc

                gc.collect()
                log(f"{name} ({cfg_tag}): compiled+warm in {time.time()-t0:.0f}s")
                compiled[name] = (run, init, cfg_tag)
            except _CompileTimeout:
                signal.alarm(0)
                log(f"{name}: COMPILE TIMEOUT")
                RESULTS["probe"]["runs"].append({"variant": name,
                                                 "error": "compile timeout"})
            except Exception as e:
                signal.alarm(0)
                log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
                RESULTS["probe"]["runs"].append(
                    {"variant": name,
                     "error": f"{type(e).__name__}: {str(e)[:300]}"})
            save()

        for b in range(3):
            for name, (run, init, cfg_tag) in list(compiled.items()):
                st = init()
                t0 = time.perf_counter()
                st = run(st)
                sync(st[0] if isinstance(st, tuple) else st)
                dt_s = time.perf_counter() - t0
                del st
                mlups = size * size * iters / dt_s / 1e6
                RESULTS["probe"]["runs"].append(
                    {"variant": name, "cfg": cfg_tag, "bracket": b,
                     "s": round(dt_s, 4), "mlups": round(mlups, 1)})
                log(f"b{b} {name} ({cfg_tag}): {dt_s:.3f}s = {mlups:.0f} MLUPS")
            save()

    for r in RESULTS["probe"]["runs"]:
        if "s" in r:
            v = r["variant"]
            cur = RESULTS["probe"]["best"].get(v, 0)
            RESULTS["probe"]["best"][v] = max(cur, r["mlups"])
    save()
    log("done: " + json.dumps(RESULTS["probe"]["best"]))


if __name__ == "__main__":
    main()
