"""Deep temporally-blocked kernel with STATE-VIEW halos: T timesteps per
HBM pass, neighbor rows read straight from the input state.

Why this exists (round-3 roofline bisection, bench_r3_roofline_4096.json):
the halo-carry temporal kernel (`pallas_temporal.py`) ships each block's
boundary row-packs as separate ``(nblk, 9T, nx)`` side arrays — per pass
that is ``4T`` extra row-planes read+written against ``2B`` of state, a
**2T/B traffic overhead** (50% at the shipped B16/T4). Its copy-only probe
measured 8.7k MLUPS at 4096^2 — the PATTERN, not compute, caps it at ~54%
of the chip's streaming bandwidth.

This kernel removes the side arrays: the input state is read-only during a
pass (the output is a separate buffer), so block ``i`` can read its
neighbors' boundary strips DIRECTLY from the input via two extra
``(9, T, nx)`` BlockSpecs with modular index maps. Traffic per step falls
to ``2/T + 2/B`` plane-passes (vs ``2/T + 4/B``), and nothing is written
but the state itself.

The catch that killed this shape in round 2: Mosaic requires block sublane
dims divisible by 8, so the strip height — which equals the pass depth T —
needs **T % 8 == 0, T >= 8**. At the B16/B32 tried then, the trapezoid's
redundant compute (``1 + 2T/B``) ate the traffic win; at B = 64-128 the
redundancy is 12-25% and deep T pays off. c16 storage (ops/devspace.py)
composes: half the bytes on exactly this pattern (T=8 i16 strips compile
and run on TPU — bench_r3_deep.json; T=16 compiles hang, avoid).

Physics per step is identical to the halo-carry kernel (same extended
(B+2T)-row buffer, same forcing-row offsets, same reduction discipline) —
see pallas_temporal.py's module docstring for the step algebra and the
reference citations (kernels.cl:7-42, 44-201).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default
from lbm_tpu.ops.pallas_temporal import _sublane_tile, nobst_ext

_CYS = (0, 0, 1, 0, -1, 1, 1, -1, -1)
_CXS = (0, 1, 0, -1, 0, 1, -1, -1, 1)
_OPP = (0, 3, 4, 1, 2, 7, 8, 5, 6)


def deep_supported(ny: int, nx: int, block: int, depth: int,
                   dtype=jnp.float32) -> bool:
    # Mosaic's block-shape rule is sublane-dim % 8 (measured: i16 blocks of
    # 16/24 rows compile on the relay toolchain), so the strip height needs
    # depth % 8 regardless of dtype; pick_config still DEFAULTS 16-bit
    # storage to T=16 (the native tile) pending an on-TPU T=8-i16 probe.
    del dtype
    return (
        nx % 128 == 0
        and depth % 8 == 0             # strip height = T must sublane-align
        and depth >= 8
        and block % depth == 0         # strip index maps need T | B
        and ny % block == 0
        and depth <= ny - 2
    )


def _kernel(cells_ref, top_ref, bot_ref, nobst_ref, owner_ref,
            out_ref, sums_ref,
            *, block: int, nblk: int, depth: int, nx: int,
            w1a: float, w2a: float, omega: float, out_dtype,
            paired: bool = True, dev=None):
    i = pl.program_id(0)
    B, T = block, depth

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    nob_all = nobst_ref[...][: B + 2 * T].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    nob_mid = nob_all[T : T + B]
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)
    nob_force_owner = nob_all[B + T - 2 : B + T - 1]
    nob_force_first = nob_all[T - 2 : T - 1] if T >= 2 else nob_force_owner

    def force(planes, n_rows, pos, nob_row, gate):
        """Accelerate-flow at buffer row ``pos`` (kernels.cl:21-41)."""
        ok = (
            (planes[3][pos : pos + 1] - w1a > 0.0)
            & (planes[6][pos : pos + 1] - w2a > 0.0)
            & (planes[7][pos : pos + 1] - w2a > 0.0)
        ).astype(jnp.float32)
        m_row = ok * nob_row * gate
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
        sel = (rows_i == pos).astype(jnp.float32)
        am = sel * m_row
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

    # (B+2T)-row extended input, rows r0-T .. r0+B+T-1 — the halo strips are
    # VIEWS of the input state (blocks i-1's last T rows / i+1's first T).
    buf = tuple(
        jnp.concatenate(
            [load(top_ref[k], k), load(cells_ref[k], k), load(bot_ref[k], k)],
            axis=0,
        )
        for k in range(9)
    )

    for s in range(1, T + 1):
        u = T - s + 1
        n_in = B + 2 * u
        n_out = B + 2 * (u - 1)
        buf = force(buf, n_in, B + u - 2, nob_force_owner, gate_last)
        if u >= 2:
            buf = force(buf, n_in, u - 2, nob_force_first, gate_first)

        def pull(k, buf=buf, n_out=n_out):
            cy, cx = _CYS[k], _CXS[k]
            lo = 1 - cy
            p = buf[k][lo : lo + n_out]
            if cx == 1:
                p = east(p)
            elif cx == -1:
                p = west(p)
            return p

        t = tuple(pull(k) for k in range(9))
        relaxed, usq = bgk_relax(t, omega, paired=paired)
        nob_b_out = nob_b_all[s : s + n_out]
        buf = tuple(
            jnp.where(nob_b_out, relaxed[k], t[_OPP[k]]) for k in range(9)
        )
        c0 = u - 1
        sums_ref[i, s - 1] = av_total(
            av_fold(None, nob_mid, usq[c0 : c0 + B], paired)
        )

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        if dev is None:
            out_ref[k] = buf[k].astype(out_dtype)
        else:
            out_ref[k] = encode_value(buf[k] - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call(ny, nx, block, depth, w1a, w2a, omega, interpret, dtype_name,
               paired=True, dev=None):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    T = depth
    spt = block // T          # strips per block (index-map granularity)
    nstrip = ny // T
    tile = _sublane_tile(dtype)
    mask_rows = block + 2 * T + (-(block + 2 * T)) % tile
    kern = functools.partial(
        _kernel, block=block, nblk=nblk, depth=T, nx=nx,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            # The input state again, viewed as T-row strips: block i's
            # above-halo is strip (i*spt - 1) mod nstrip, its below-halo
            # strip ((i+1)*spt) mod nstrip.
            pl.BlockSpec((9, T, nx),
                         lambda i: (0, (i * spt - 1) % nstrip, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, T, nx),
                         lambda i: (0, ((i + 1) * spt) % nstrip, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mask_rows, nx), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, T), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct((nblk, T), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            # Live set: 2 consecutive step buffers (shrinking from B+2T
            # rows) + the double-buffered in/out blocks and strips.
            vmem_limit_bytes=min(
                127 * 1024 * 1024,
                6 * (9 * (block + 2 * depth) * nx * 4) + 16 * 1024 * 1024,
            ),
        ),
        interpret=interpret,
    )


def step_deep(cells, nob_ext_arr, owner, density, accel, omega, block, depth,
              *, interpret=False, paired=None, dev=None):
    """Advance T timesteps: one pass over the grid, input read-only (the
    strips alias it), output a fresh buffer. Returns (new_cells, sums)."""
    _, ny, nx = cells.shape
    call = _make_call(
        ny, nx, block, depth,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev,
    )
    out, sums = call(cells, cells, cells, nob_ext_arr, owner)
    return out, tuple(jnp.sum(sums[:, s]) for s in range(depth))


def run_deep(cells, nobst, density, accel, omega, n_iters, block, depth,
             *, interpret=False, paired=None, dev=None):
    """Run ``n_iters`` steps, T per pass; the trailing ``n_iters % T`` steps
    use the single-step block kernel. Same contract as
    ``pallas_temporal.run_temporal``."""
    from lbm_tpu.ops import pallas_step as PS

    _, ny, nx = cells.shape
    T = depth
    if not deep_supported(ny, nx, block, T, cells.dtype):
        raise ValueError(
            f"deep kernel unsupported: grid {ny}x{nx}, block {block}, "
            f"depth {T}, dtype {cells.dtype.name}"
        )
    nob_ext_arr = nobst_ext(nobst, block, T, cells.dtype)
    owner = jnp.ones((1, 1), jnp.float32)
    if paired is None:
        paired = paired_default()

    npasses = n_iters // T
    tot_u = jnp.zeros((n_iters,), jnp.float32)

    def body(j, carry):
        cells, tot_u = carry
        cells, sums = step_deep(
            cells, nob_ext_arr, owner, density, accel, omega, block, T,
            interpret=interpret, paired=paired, dev=dev,
        )
        tot_u = jax.lax.dynamic_update_slice(tot_u, jnp.stack(sums), (T * j,))
        return cells, tot_u

    if npasses:
        cells, tot_u = jax.lax.fori_loop(0, npasses, body, (cells, tot_u))
    rem = n_iters % T
    if rem:
        step = PS.lbm_step_pallas_interpret if interpret else PS.lbm_step_pallas
        nob_plain = nobst.astype(cells.dtype)
        carry = step.init_state(cells)
        for r in range(rem):
            carry, s = step(carry, nob_plain, density, accel, omega,
                            paired=paired, dev=dev)
            tot_u = tot_u.at[n_iters - rem + r].set(s)
        cells = step.extract(carry)
    return cells, tot_u


def pick_config(ny: int, nx: int, dtype=jnp.float32) -> tuple[int, int] | None:
    """(block, depth) for the deep kernel, or None. Depth defaults to 8 for
    ALL dtypes: the minimum legal strip height (Mosaic sublane rule is
    mod-8 — on-TPU-confirmed for i16 strips, bench_r3_deep.json), deeper T
    only adds trapezoid redundancy once traffic stops binding (measured:
    c16-T8 ~= f32-T8 at 4096^2 — neither is traffic-bound), and T=16
    compiles hang/time out on this toolchain. Block = the largest of
    64/32/16 that divides ny and keeps the working set inside VMEM at this
    width (B64 beat B32 by 16% at 4096^2; B128 measured pathologically
    slow at 1024-wide and below-trend at 2048^2 — short grids starve the
    pipeline). ``LBM_DEEP_BLOCK`` / ``LBM_DEEP_DEPTH`` override for
    sweeps."""
    if nx % 128 != 0:
        return None
    T = 8
    ov_t = os.environ.get("LBM_DEEP_DEPTH")
    if ov_t:
        T = int(ov_t)
    ov_b = os.environ.get("LBM_DEEP_BLOCK")
    if ov_b:
        b = int(ov_b)
        return (b, T) if deep_supported(ny, nx, b, T, dtype) else None
    itemsize = jnp.dtype(dtype).itemsize
    # B capped at 64: B64 beat B32 by 16% at 4096^2, but B128 measured
    # pathologically slow at 1024-wide (155 MLUPS) and below-trend at
    # 2048^2 — the short grids (few blocks) starve the pipeline.
    for b in (64, 32, 16):
        if not deep_supported(ny, nx, b, T, dtype):
            continue
        # live f32 step buffers (2 levels) + double-buffered io blocks
        vmem = (2 * 9 * (b + 2 * T) * nx * 4) + (4 * 9 * b * nx * itemsize)
        if vmem <= 80 * 1024 * 1024:
            return (b, T)
    return None
