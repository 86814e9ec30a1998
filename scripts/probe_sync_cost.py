"""Isolate the per-run fixed cost seen in short band-regime runs.

bench_r3_gatherfix.json's iters-ladder fits are affine: wall = a + c*iters
with a footprint-invariant slope (~12.4-12.9k MLUPS at 2048^2-8192^2) and
a fixed cost a ~= 28-33 ns/cell -- suspiciously equal to one full-state
host fetch at the relay's ~1.2 GB/s. Prime suspect: ``driver.sync`` does
``device_get(x.ravel()[:1])`` and the relay may implement the EAGER ravel
by round-tripping the whole buffer.

This probe times, on device-resident arrays of several sizes (created by
a jitted fill, never transferred):
  ravel1   device_get(x.ravel()[:1])          -- the current sync
  jitfirst device_get(jit(lambda a: a.reshape(-1)[:1])(x))
  getall   np.asarray(x)                      -- full fetch (bandwidth ref)
Each timed twice (second time excludes tracing/compile of the extractor).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(f):
    t0 = time.perf_counter()
    f()
    return round(time.perf_counter() - t0, 4)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    make = jax.jit(
        lambda n: jnp.full((9, n, n), 0.1, jnp.float32), static_argnums=0
    )
    jfirst = jax.jit(lambda a: a.reshape(-1)[:1])
    out = {}
    # warmup: first fetch pays the relay session warmup
    x = make(256)
    t0 = time.perf_counter()
    jax.device_get(x.ravel()[:1])
    print(f"warmup fetch: {time.perf_counter() - t0:.1f} s", flush=True)
    for n in (1024, 2048, 4096, 8192):
        x = make(n)
        r = {}
        r["ravel1"] = [t(lambda: jax.device_get(x.ravel()[:1]))
                       for _ in range(2)]
        r["jitfirst"] = [t(lambda: jax.device_get(jfirst(x)))
                         for _ in range(2)]
        if n <= 4096:
            r["getall"] = [t(lambda: np.asarray(x))]
        out[n] = r
        print(n, json.dumps(r), flush=True)
    json.dump(out, open("bench_r3_synccost.json", "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
