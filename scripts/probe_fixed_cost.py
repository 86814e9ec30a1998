"""Decompose the band-regime per-run fixed cost (~30 ns/cell in elapsed).

bench_r3_gatherfix.json: wall = a + c*iters with slope c footprint-invariant
(~12.4-12.9k MLUPS) and a ~= 28-33 ns/cell. probe_sync_cost.py cleared
``driver.sync`` (25-35 ms at every size) and measured D2H full fetch at a
dismal ~28 MB/s. Remaining suspects for `a`: the H2D upload of the dense
int32 obstacle mask (4 B/cell -> ~30 ns/cell at ~130 MB/s upload), the
eager initial-state broadcast, per-executable first-run load, or a
per-call input rehandling cost.

Measured here, per size (2048/4096/8192):
  up_i32 / up_i8   jnp.asarray(host mask) + sync     (dense upload, 4 B vs 1 B)
  init             D2Q9.initial_state eager broadcast + sync
  exec x3          band chunk (16 iters): first vs steady-state executions,
                   donation chain like the production loop
  fresh            steady-state execution on freshly-made inputs
                   [init_s, upload_s, exec_s]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.models.d2q9 import D2Q9, LBMParams
from lbm_tpu.runtime import driver


def timed(f):
    t0 = time.perf_counter()
    r = f()
    return round(time.perf_counter() - t0, 4), r


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    out = {}
    p0 = LBMParams(nx=256, ny=256, max_iters=64, reynolds_dim=10,
                   density=0.1, accel=0.005, omega=1.85)
    obs0 = np.zeros((256, 256), np.int32)
    obs0[0] = obs0[-1] = 1
    t0 = time.perf_counter()
    driver.run_simulation(p0, obs0, backend="band")
    print(f"warmup run: {time.perf_counter() - t0:.1f} s", flush=True)

    from lbm_tpu.ops.pallas_band import pick_config

    for n in (2048, 4096, 8192):
        params = LBMParams(nx=n, ny=n, max_iters=16, reynolds_dim=10,
                           density=0.1, accel=0.005, omega=1.85)
        obstacles = np.zeros((n, n), np.int32)
        obstacles[0] = obstacles[-1] = 1
        r = {}
        t, obs_dev = timed(lambda: jnp.asarray(obstacles))
        ts, _ = timed(lambda: driver.sync(obs_dev))
        r["up_i32"] = [t, ts]
        t, obs8 = timed(lambda: jnp.asarray(obstacles.astype(np.int8)))
        ts, _ = timed(lambda: driver.sync(obs8))
        r["up_i8"] = [t, ts]
        t, cells0 = timed(lambda: D2Q9.initial_state(params, jnp.float32))
        ts, _ = timed(lambda: driver.sync(cells0))
        r["init"] = [t, ts]

        cfg = dict(n_iters=16, density=0.1, accel=0.005, omega=1.85,
                   interpret=False, paired=True, dev=None)
        fr = pick_config(n, n, jnp.float32)
        if fr is not None:
            cfg.update(block=fr[0], depth=fr[1])
        else:  # panel widths: no full-row config fits
            from lbm_tpu.runtime.driver import band_config

            b, d, p = band_config(params, jnp.float32)
            cfg.update(block=b, depth=d, panel=p)
        inv = float(1.0 / (obstacles == 0).sum())
        comp = driver._run_band.lower(cells0, obs_dev, inv, **cfg).compile()
        cells = cells0
        execs = []
        for _ in range(3):
            t0 = time.perf_counter()
            cells, av = comp(cells, obs_dev, inv)
            driver.sync(av)
            execs.append(round(time.perf_counter() - t0, 4))
        r["exec"] = execs
        # steady-state with FRESH input buffers (mimics a new bench run in
        # a warm process): new initial state + new obstacles upload
        t, cells_f = timed(lambda: D2Q9.initial_state(params, jnp.float32))
        t2, obs_f = timed(lambda: jnp.asarray(obstacles))
        t0 = time.perf_counter()
        cells_f, av = comp(cells_f, obs_f, inv)
        driver.sync(av)
        r["fresh"] = [t, t2, round(time.perf_counter() - t0, 4)]
        out[n] = r
        print(n, json.dumps(r), flush=True)
    json.dump(out, open("bench_r3_fixedcost.json", "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
