"""Shared scaffolding for the band kernel family (pallas_band / band2 /
band3).

The three families implement different step BODIES (value-carry planes,
ref-resident ping-pong, in-place AA S-space) on the SAME garbage-creep
schedule: load a W = B + 2T row window, advance T steps in-kernel, store
the central B rows (pallas_band.py:173's creep argument). This module
holds the schedule plumbing they previously re-implemented three times
(VERDICT r4 weak #5 / item 6): the D2Q9 constants, and the
grid/BlockSpec/out-shape tuples for the three window layouts —
full-row, x-split panel (9-view 3x3 buffer assembly), and their
sharded-local variants.

Reference semantics these specs serve: kernels.cl:44-201 (the fused
step the bodies implement), d2q9-bgk.c:146-152 (normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# D2Q9 lattice: per-plane y/x shifts, opposite-plane table (kernels.cl
# speed ordering), and the forcing planes as (plane, sign, weight-kind)
# with kind 1 -> w1a, 2 -> w2a (kernels.cl:33-41).
CYS = (0, 0, 1, 0, -1, 1, 1, -1, -1)
CXS = (0, 1, 0, -1, 0, 1, -1, -1, 1)
OPP = (0, 3, 4, 1, 2, 7, 8, 5, 6)
FORCE = ((1, 1.0, 1), (3, -1.0, 1), (5, 1.0, 2),
         (6, -1.0, 2), (7, -1.0, 2), (8, 1.0, 2))


def _vmem(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _smem(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.SMEM)


def fullrow_specs(rows, nx, block, T, mask_rows, dtype, *, wrap=True,
                  steps=None, halo_inputs=False):
    """(grid, in_specs, out_specs, out_shape) for the full-row creep
    schedule. Input order ``(cells, top, bot[, halo_dn, halo_up], mask,
    scalar)``; outputs ``(out_cells, sums)``.

    ``wrap=True``: top/bot are wrapped T-row-strip VIEWS of the cells
    array itself (single-device kernels, and the lean sharded protocol's
    interior strips). ``wrap=False``: strip ``i`` of separate compact
    neighbor arrays (the legacy sharded protocol). ``halo_inputs`` adds
    the lean protocol's two constant-index-map (9, T, nx) shard-halo
    inputs (fetched once — the Pallas pipeline skips re-DMA when the
    block index is unchanged). ``steps`` sizes the per-step sums output
    (band3's odd-step schedule uses steps != T).
    """
    nblk = rows // block
    spt, nstrip = block // T, rows // T
    steps = T if steps is None else steps
    if wrap:
        top = _vmem((9, T, nx), lambda i: (0, (i * spt - 1) % nstrip, 0))
        bot = _vmem((9, T, nx), lambda i: (0, ((i + 1) * spt) % nstrip, 0))
    else:
        top = _vmem((9, T, nx), lambda i: (0, i, 0))
        bot = _vmem((9, T, nx), lambda i: (0, i, 0))
    in_specs = [_vmem((9, block, nx), lambda i: (0, i, 0)), top, bot]
    if halo_inputs:
        in_specs += [
            _vmem((9, T, nx), lambda i: (0, 0, 0)),
            _vmem((9, T, nx), lambda i: (0, 0, 0)),
        ]
    in_specs += [
        _vmem((mask_rows, nx), lambda i: (i, 0)),
        _smem((1, 1), lambda i: (0, 0)),
    ]
    out_specs = [
        _vmem((9, block, nx), lambda i: (0, i, 0)),
        _smem((nblk, steps), lambda i: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((9, rows, nx), dtype),
        jax.ShapeDtypeStruct((nblk, steps), jnp.float32),
    ]
    return (nblk,), in_specs, out_specs, out_shape


def panel_specs(rows, nx, block, T, P, H, mask_rows, dtype, *,
                wrap_rows=True, steps=None):
    """(grid, in_specs, out_specs, out_shape) for the x-split panel
    schedule: the 9-view 3x3 buffer assembly ``(c, n, s, w, e, nw, ne,
    sw, se)`` + extended mask + SMEM scalar, outputs ``(out_cells,
    sums)``. Row strips wrap (single-device) or index per-block compact
    arrays (sharded); column strips always wrap locally — x never
    crosses the 1-D row mesh.
    """
    nblk, npan = rows // block, nx // P
    spt, nstrip = block // T, rows // T
    sph, nstripx = P // H, nx // H
    steps = T if steps is None else steps
    if wrap_rows:
        def rt(i, j):
            return (i * spt - 1) % nstrip

        def rb(i, j):
            return ((i + 1) * spt) % nstrip
    else:
        def rt(i, j):
            return i

        def rb(i, j):
            return i

    def cl(i, j):
        return (j * sph - 1) % nstripx

    def cr(i, j):
        return ((j + 1) * sph) % nstripx

    in_specs = [
        _vmem((9, block, P), lambda i, j: (0, i, j)),
        _vmem((9, T, P), lambda i, j: (0, rt(i, j), j)),
        _vmem((9, T, P), lambda i, j: (0, rb(i, j), j)),
        _vmem((9, block, H), lambda i, j: (0, i, cl(i, j))),
        _vmem((9, block, H), lambda i, j: (0, i, cr(i, j))),
        _vmem((9, T, H), lambda i, j: (0, rt(i, j), cl(i, j))),
        _vmem((9, T, H), lambda i, j: (0, rt(i, j), cr(i, j))),
        _vmem((9, T, H), lambda i, j: (0, rb(i, j), cl(i, j))),
        _vmem((9, T, H), lambda i, j: (0, rb(i, j), cr(i, j))),
        _vmem((mask_rows, P + 2 * H), lambda i, j: (i, j)),
        _smem((1, 1), lambda i, j: (0, 0)),
    ]
    out_specs = [
        _vmem((9, block, P), lambda i, j: (0, i, j)),
        _smem((nblk, npan, steps), lambda i, j: (0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((9, rows, nx), dtype),
        jax.ShapeDtypeStruct((nblk, npan, steps), jnp.float32),
    ]
    return (nblk, npan), in_specs, out_specs, out_shape


def creep_call(kern, specs, *, scratch_shapes=(), vmem_limit=None,
               interpret=False):
    """Assemble the family's ``pallas_call`` from a ``*_specs`` tuple.
    ``vmem_limit`` is the family's own byte estimate (clamped to the
    127 MB ceiling); ``interpret`` drops compiler params entirely, as
    every family did by hand before."""
    grid, in_specs, out_specs, out_shape = specs
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=list(scratch_shapes),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            vmem_limit_bytes=min(127 * 1024 * 1024, vmem_limit),
        ),
        interpret=interpret,
    )


def run_creep(cells, nobst, density, accel, omega, n_iters, T, step_call,
              *, interpret=False, paired=None, dev=None):
    """The family's shared pass loop: ``n_iters // T`` fused passes via
    ``step_call(cells) -> (cells, sums-tuple-of-T-scalars)`` inside one
    ``fori_loop``, then the ``n_iters % T`` remainder on the single-step
    block kernel (mirroring the reference's uniform per-step loop,
    d2q9-bgk.c:179-199, at the schedule's pass granularity)."""
    from lbm_tpu.ops import pallas_step as PS

    npasses = n_iters // T
    tot_u = jnp.zeros((n_iters,), jnp.float32)

    def body(j, carry):
        cells, tot_u = carry
        cells, sums = step_call(cells)
        tot_u = jax.lax.dynamic_update_slice(
            tot_u, jnp.stack(sums), (T * j,)
        )
        return cells, tot_u

    if npasses:
        cells, tot_u = jax.lax.fori_loop(0, npasses, body, (cells, tot_u))
    rem = n_iters % T
    if rem:
        step = (
            PS.lbm_step_pallas_interpret if interpret else PS.lbm_step_pallas
        )
        nob_plain = nobst.astype(cells.dtype)
        carry = step.init_state(cells)
        for r in range(rem):
            carry, s = step(carry, nob_plain, density, accel, omega,
                            paired=paired, dev=dev)
            tot_u = tot_u.at[n_iters - rem + r].set(s)
        cells = step.extract(carry)
    return cells, tot_u
