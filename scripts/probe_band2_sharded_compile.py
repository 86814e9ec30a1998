"""Mosaic-lowering validation of the SHARDED band2 kernel on one chip.

The sharded paths only execute under a multi-device mesh (CPU interpret
here), so their Pallas kernels never face the real TPU toolchain — this
probe compiles and runs the per-shard pallas_call standalone on the
single chip with fabricated halo strips, at realistic shard shapes.
Pass/fail per shape is the datum (plus a value check against the
interpret-mode kernel on the same inputs).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.ops.pallas_band import nobst_ext_local, nobst_ext_local_panel
from lbm_tpu.ops.pallas_band2 import (
    step_band2_sharded,
    step_band2_sharded_panel,
)


def run_shape(rows, nx, block, depth, ny_global, lean=True, rowforce=False):
    rng = np.random.RandomState(0)
    cells = jnp.asarray(
        0.1 + 0.01 * rng.rand(9, rows, nx).astype(np.float32)
    )
    T = depth
    nblk = rows // block
    # lean protocol: raw (9, T, nx) shard halos; legacy: (9, nblk*T, nx)
    # compact neighbor strips.
    hrows = T if lean else nblk * T
    halo_n = jnp.asarray(
        0.1 + 0.01 * rng.rand(9, hrows, nx).astype(np.float32)
    )
    halo_s = jnp.asarray(
        0.1 + 0.01 * rng.rand(9, hrows, nx).astype(np.float32)
    )
    nob = np.ones((rows, nx), np.float32)
    nob[3, :] = 0.0
    padded = jnp.asarray(
        np.concatenate([np.ones((T, nx), np.float32), nob,
                        np.ones((T, nx), np.float32)], axis=0)
    )
    nob_ext = nobst_ext_local(padded, block, T, jnp.float32)
    r0 = jnp.full((1, 1), ny_global - rows, jnp.int32)  # last shard: forcing

    t0 = time.perf_counter()
    out, sums = step_band2_sharded(
        cells, halo_n, halo_s, nob_ext, r0,
        0.1, 0.005, 1.85, block, T, ny_global, interpret=False,
        lean=lean, rowforce=rowforce,
    )
    val = float(jnp.sum(sums))
    compile_and_run = time.perf_counter() - t0

    want, wsums = step_band2_sharded(
        cells, halo_n, halo_s, nob_ext, r0,
        0.1, 0.005, 1.85, block, T, ny_global, interpret=True,
        lean=lean, rowforce=rowforce,
    )
    err = float(jnp.abs(out - want).max())
    serr = abs(val - float(jnp.sum(wsums)))
    print(f"rows={rows} nx={nx} B={block} T={T} lean={lean} "
          f"row={rowforce}: ok, {compile_and_run:.1f}s, "
          f"max|tpu-interp|={err:.3g}, sum diff={serr:.3g} "
          f"(sum={val:.6g})", flush=True)
    # sums are O(grid) f32 accumulations — Mosaic's reduction tree
    # reassociates vs interpret, so the check is relative.
    assert err < 1e-4 and serr <= max(1e-2, 3e-6 * abs(val))


def run_shape_panel(rows, nx, block, depth, panel, ny_global, halo=128):
    rng = np.random.RandomState(0)
    cells = jnp.asarray(
        0.1 + 0.01 * rng.rand(9, rows, nx).astype(np.float32)
    )
    T = depth
    nblk = rows // block
    n_compact = jnp.asarray(
        0.1 + 0.01 * rng.rand(9, nblk * T, nx).astype(np.float32)
    )
    s_compact = jnp.asarray(
        0.1 + 0.01 * rng.rand(9, nblk * T, nx).astype(np.float32)
    )
    nob = np.ones((rows, nx), np.float32)
    nob[3, :] = 0.0
    padded = jnp.asarray(
        np.concatenate([np.ones((T, nx), np.float32), nob,
                        np.ones((T, nx), np.float32)], axis=0)
    )
    nob_ext = nobst_ext_local_panel(padded, block, T, panel, halo,
                                    jnp.float32)
    r0 = jnp.full((1, 1), ny_global - rows, jnp.int32)  # last shard: forcing

    t0 = time.perf_counter()
    out, sums = step_band2_sharded_panel(
        cells, n_compact, s_compact, nob_ext, r0,
        0.1, 0.005, 1.85, block, T, panel, ny_global, halo, interpret=False,
    )
    val = float(jnp.sum(sums))
    compile_and_run = time.perf_counter() - t0

    want, wsums = step_band2_sharded_panel(
        cells, n_compact, s_compact, nob_ext, r0,
        0.1, 0.005, 1.85, block, T, panel, ny_global, halo, interpret=True,
    )
    err = float(jnp.abs(out - want).max())
    serr = abs(val - float(jnp.sum(wsums)))
    print(f"panel rows={rows} nx={nx} B={block} T={T} P={panel}: ok, "
          f"{compile_and_run:.1f}s, max|tpu-interp|={err:.3g}, "
          f"sum diff={serr:.3g}", flush=True)
    assert err < 1e-4 and serr < 1e-2


def main():
    # warm the session cheaply
    jax.device_get(jnp.zeros((8, 128)).sum())
    if "--panel" in sys.argv:
        # The 8192-wide weak-scaling shard shapes (8 and 4 shards of the
        # BASELINE config) through the panel-band2 sharded body.
        for rows, nx, b, t, p, nyg in ((1024, 8192, 128, 8, 2048, 8192),
                                       (2048, 8192, 128, 8, 2048, 8192)):
            run_shape_panel(rows, nx, b, t, p, nyg)
        return 0
    for rows, nx, b, t, nyg in ((512, 4096, 64, 16, 4096),
                                (1024, 2048, 128, 16, 8192),
                                (256, 2048, 64, 8, 2048)):
        for lean, rowforce in ((True, False), (True, True), (False, False)):
            run_shape(rows, nx, b, t, nyg, lean=lean, rowforce=rowforce)
    return 0


if __name__ == "__main__":
    sys.exit(main())
