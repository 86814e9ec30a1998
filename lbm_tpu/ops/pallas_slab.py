"""Hierarchical slab blocking: shrink the ACTIVE HBM working set.

The same-cell-count control (bench_r3_widthctl.json) found the band
regime's per-cell rate falls ~0.73x per total-grid-footprint doubling at
fixed kernel config — row width, invocation count, redundancy, and
traffic are all exonerated (DESIGN.md "band regime"). If the mechanism
is locality over the ACTIVE working set (HBM page/TLB behavior), then
processing a large grid in y-slabs of the fast-footprint size — each
advanced K band passes (K*T steps) before moving to the next slab —
should recover the small-grid per-cell rate on large grids.

Scheme (one generation = K*T timesteps):

- the grid is split into ``n_super = ny // S`` y-slabs of S rows;
- slab j's working copy covers global rows ``[j*S - K*T, j*S + S + K*T)``
  (static slices of the input state; the two edge slabs concatenate the
  periodic wrap rows — no full-state pre-roll or padded copy exists);
- each of the K passes runs the slab kernel over the whole FIXED-height
  slab; garbage creeps T rows per pass inward from the slab edges (the
  band kernel's creep argument, pallas_band.py:7-15, replayed at the
  slab level), so after K passes the central S rows are genuine and are
  concatenated back into the next state;
- all slabs of a generation read the SAME input state and produce
  disjoint row ranges, so slab order is free (XLA may interleave).

The kernel is the full-grid band kernel with two changes borrowed from
the sharded-local variant: forcing selects buffer rows by GLOBAL row
index (the accelerate row ny-2 lands at j-dependent offsets, including
genuine halo copies in the neighbor slabs — all copies must be forced,
exactly like the sharded path), and the per-step reductions use a
separate OWNERSHIP mask (physics mask x [global row in the slab's owned
S rows]) so each global cell is counted exactly once per step across
slabs. Physics per step is the shared paired collision (ops/collision.py;
reference: kernels.cl:7-42, 44-201; the sum's unblocked-cell semantics
follow d2q9-bgk.c:146-152).

Cost model vs the plain band kernel at the same (B, T): per-cell HBM
traffic rises by the slab-level redundancy ``(S + 2KT)/S`` (≈1.06 at
S=2048, K=4, T=16) and per-cell compute by the same factor; the bet is
that confining K consecutive passes to a ~2x-state-of-S-rows region
buys back the footprint penalty (~1.4x at 4096² vs 2048²-sized slabs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default
from lbm_tpu.ops.pallas_band import band_supported
from lbm_tpu.ops.pallas_temporal import _sublane_tile, nobst_ext

_CYS = (0, 0, 1, 0, -1, 1, 1, -1, -1)
_CXS = (0, 1, 0, -1, 0, 1, -1, -1, 1)
_OPP = (0, 3, 4, 1, 2, 7, 8, 5, 6)


def slab_supported(ny: int, nx: int, block: int, depth: int,
                   kpasses: int, sblock: int, dtype=jnp.float32) -> bool:
    kt = kpasses * depth
    return (
        kpasses >= 1
        and sblock % block == 0
        and (2 * kt) % block == 0          # slab height stays block-aligned
        and band_supported(sblock + 2 * kt, nx, block, depth, dtype)
        and ny % sblock == 0
        and ny > sblock                    # one slab == the plain band kernel
        and kt <= sblock                   # edge-slab wrap concat stays valid
    )


def _kernel_slab(c_ref, top_ref, bot_ref, nobst_ref, smask_ref, r0_ref,
                 out_ref, sums_ref,
                 *, block: int, depth: int, ny: int, nx: int,
                 w1a: float, w2a: float, omega: float, out_dtype,
                 paired: bool = True, dev=None):
    i = pl.program_id(0)
    B, T = block, depth
    W = B + 2 * T

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    def up_roll(p):
        return pltpu.roll(p, 1, 0)

    def down_roll(p):
        return pltpu.roll(p, W - 1, 0)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    # Ownership-weighted reduction mask: physics mask x [global row owned
    # by this slab] — zero for whole blocks outside the central S rows, so
    # every global (row, step) pair is summed by exactly one slab.
    smask_mid = smask_ref[...][:B].astype(jnp.float32)
    r0 = r0_ref[0, 0]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    gl = jnp.remainder(rows_iota + (r0 + i * B - T), ny)
    sel_force = (gl == ny - 2).astype(jnp.float32)
    nob_force = sel_force * nob_all

    def force(planes):
        ok = (
            (planes[3] - w1a > 0.0)
            & (planes[6] - w2a > 0.0)
            & (planes[7] - w2a > 0.0)
        ).astype(jnp.float32)
        am = ok * nob_force
        return (
            planes[0],
            planes[1] + w1a * am,
            planes[2],
            planes[3] - w1a * am,
            planes[4],
            planes[5] + w2a * am,
            planes[6] - w2a * am,
            planes[7] - w2a * am,
            planes[8] + w2a * am,
        )

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    buf = tuple(
        jnp.concatenate(
            [load(top_ref[k], k), load(c_ref[k], k), load(bot_ref[k], k)],
            axis=0,
        )
        for k in range(9)
    )

    def step_body(s, buf):
        buf = force(buf)

        def pull(k):
            cy, cx = _CYS[k], _CXS[k]
            p = buf[k]
            if cy == 1:
                p = up_roll(p)
            elif cy == -1:
                p = down_roll(p)
            if cx == 1:
                p = east(p)
            elif cx == -1:
                p = west(p)
            return p

        t = tuple(pull(k) for k in range(9))
        relaxed, usq = bgk_relax(t, omega, paired=paired)
        new = tuple(
            jnp.where(nob_b_all, relaxed[k], t[_OPP[k]]) for k in range(9)
        )
        sums_ref[i, s] = av_total(av_fold(None, smask_mid, usq[T : T + B], paired))
        return new

    buf = jax.lax.fori_loop(0, T, step_body, buf)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = buf[k][T : T + B]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call_slab(slab_rows, nx, ny_global, block, depth, w1a, w2a, omega,
                    interpret, dtype_name, paired=True, dev=None):
    dtype = jnp.dtype(dtype_name)
    nblk = slab_rows // block
    T = depth
    spt = block // T
    nstrip = slab_rows // T
    tile = _sublane_tile(dtype)
    mask_rows = block + 2 * T + (-(block + 2 * T)) % tile
    kern = functools.partial(
        _kernel_slab, block=block, depth=T, ny=ny_global, nx=nx,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # In-slab modular strips: the wrap rows hold the slab's other
            # end — garbage-zone data, covered by the creep argument.
            pl.BlockSpec((9, T, nx),
                         lambda i: (0, (i * spt - 1) % nstrip, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, T, nx),
                         lambda i: (0, ((i + 1) * spt) % nstrip, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mask_rows, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, T), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, slab_rows, nx), dtype),
            jax.ShapeDtypeStruct((nblk, T), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                127 * 1024 * 1024,
                2 * (9 * (block + 2 * depth) * nx * 4)
                + 4 * (9 * block * nx * dtype.itemsize)
                + 16 * 1024 * 1024,
            ),
        ),
        interpret=interpret,
    )


def step_band_slab(slab, nob_ext_arr, smask_arr, r0, density, accel, omega,
                   block, depth, ny_global,
                   *, interpret=False, paired=None, dev=None):
    """Advance one slab T timesteps in a single fused pass.

    ``r0`` is the slab's global starting row (of slab row 0, may be
    negative for the wrap slab) as a (1, 1) int32. Returns
    ``(new_slab, (T,) ownership-weighted per-step sums)``."""
    _, slab_rows, nx = slab.shape
    call = _make_call_slab(
        slab_rows, nx, ny_global, block, depth,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        slab.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev,
    )
    out, sums = call(slab, slab, slab, nob_ext_arr, smask_arr, r0)
    return out, jnp.sum(sums, axis=0)


def run_band_slab(cells, nobst, density, accel, omega, n_iters, block, depth,
                  kpasses, sblock, *, interpret=False, paired=None, dev=None):
    """Run ``n_iters`` steps via hierarchical slab blocking; K*T steps per
    generation; a trailing ``n_iters % (K*T)`` remainder runs through the
    plain band kernel's contract (full-row passes + single-step tail).
    Same contract as run_band/run_deep/run_temporal."""
    from lbm_tpu.ops.pallas_band import run_band

    _, ny, nx = cells.shape
    T, K, S = depth, kpasses, sblock
    KT = K * T
    if not slab_supported(ny, nx, block, depth, kpasses, sblock, cells.dtype):
        raise ValueError(
            f"slab kernel unsupported: grid {ny}x{nx}, block {block}, depth "
            f"{T}, kpasses {K}, sblock {S}, dtype {cells.dtype.name}"
        )
    if paired is None:
        paired = paired_default()
    n_super = ny // S
    slab_rows = S + 2 * KT
    mask_dtype = cells.dtype

    # Static per-slab constants: extended physics masks (true global rows,
    # stacked per block by the full-grid builder — its in-array wrap matches
    # the kernel's in-slab modular strips), ownership sum masks, r0 scalars.
    from lbm_tpu.ops.pallas_temporal import circ_slice

    owned = (
        (jnp.arange(slab_rows) >= KT) & (jnp.arange(slab_rows) < KT + S)
    )
    nob_exts, smasks, r0s = [], [], []
    for j in range(n_super):
        r0 = j * S - KT
        slab_mask = circ_slice(nobst, r0, slab_rows)
        nob_exts.append(nobst_ext(slab_mask, block, T, mask_dtype))
        smasks.append((slab_mask * owned[:, None]).astype(mask_dtype))
        r0s.append(jnp.full((1, 1), r0, jnp.int32))

    def slab_input(state, j):
        lo, hi = j * S - KT, j * S + S + KT
        if lo >= 0 and hi <= ny:
            return jax.lax.slice_in_dim(state, lo, hi, axis=1)
        if lo < 0:  # first slab: top halo wraps to the grid's last rows
            return jnp.concatenate(
                [state[:, lo % ny :], state[:, :hi]], axis=1
            )
        return jnp.concatenate(  # last slab: bottom halo wraps to row 0
            [state[:, lo:], state[:, : hi - ny]], axis=1
        )

    ngens = n_iters // KT

    def gen_body(g, carry):
        state, tot_u = carry
        centers = []
        gen_sums = jnp.zeros((KT,), jnp.float32)
        for j in range(n_super):
            slab = slab_input(state, j)
            parts = []
            for k in range(K):
                slab, sums = step_band_slab(
                    slab, nob_exts[j], smasks[j], r0s[j],
                    density, accel, omega, block, T, ny,
                    interpret=interpret, paired=paired, dev=dev,
                )
                parts.append(sums)
            gen_sums = gen_sums + jnp.concatenate(parts)
            centers.append(slab[:, KT : KT + S])
        state = jnp.concatenate(centers, axis=1)
        tot_u = jax.lax.dynamic_update_slice(tot_u, gen_sums, (KT * g,))
        return state, tot_u

    tot_u = jnp.zeros((n_iters,), jnp.float32)
    if ngens:
        cells, tot_u = jax.lax.fori_loop(0, ngens, gen_body, (cells, tot_u))
    rem = n_iters % KT
    if rem:
        cells, tail = run_band(
            cells, nobst, density, accel, omega, rem, block, depth,
            interpret=interpret, paired=paired, dev=dev,
        )
        tot_u = jax.lax.dynamic_update_slice(tot_u, tail, (n_iters - rem,))
    return cells, tot_u
