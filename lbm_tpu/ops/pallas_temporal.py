"""Temporally-blocked Pallas kernel: T timesteps per HBM pass.

Large grids (state > VMEM) are HBM-bandwidth-bound: the block-streaming
kernel moves 19 row-planes per step (9 read + 9 written + mask). Classic
temporal blocking divides that by the depth T: each row block is read once,
advanced T timesteps entirely in VMEM, and written once — ~(19/T + ε)
row-planes per step. This generalizes the round-1 depth-2 kernel to any
T >= 2 (the wavefront/trapezoid scheme for the reference's hot loop,
kernels.cl:44-201) and supports bf16 storage (f32 arithmetic in-kernel).

Mechanics (generalizing pallas_step's carried-halo design to depth T):

- the loop carry holds, per block, its input's first-T and last-T rows of
  all 9 planes (``(nblk, 9T, nx)`` packed arrays, plane k at rows
  [Tk, Tk+T)); block i reads its neighbors' slots via modular BlockSpec
  index maps to build a ``(B+2T)``-row extended tile;
- step s (s = 1..T) consumes a ``B + 2(T-s+1)``-row buffer and produces a
  ``B + 2(T-s)``-row one; step T yields exactly the central B output rows.
  Each step's global-row bookkeeping: the step-s input buffer covers global
  rows ``r0-u .. r0+B+u-1`` with ``u = T-s+1``;
- the row-(ny-2) forcing (kernels.cl:7-42) is applied to every copy of that
  global row in the step's input buffer, with masks recomputed from the
  respective pre-forcing values — exactly the reference's
  accelerate-before-stream ordering for every one of the T steps. Row ny-2
  appears at offset ``B+u-2`` for the last block (interior copy) and at
  offset ``u-2`` for block 0 (wrap copy in the above-halo, present iff
  u >= 2); no other copies exist for B >= 8 > T+2 (see the offset analysis
  in the repo history / tests);
- the kernel emits the OUTPUT's boundary row-T-packs as side outputs (= the
  next pass's input halos) and one ``(nblk, T)`` SMEM partial-sum row (the
  per-step reductions; each step's sum uses only the central B rows so each
  global row is counted exactly once across blocks).

The driver runs ``n_iters // T`` fused passes; a trailing remainder of
``n_iters % T`` steps falls back to the single-step block kernel.
Constraints: nx % 128 == 0, B | ny, B >= 8 (16 for bf16), T <= ny - 2.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default

_CYS = (0, 0, 1, 0, -1, 1, 1, -1, -1)
_CXS = (0, 1, 0, -1, 0, 1, -1, -1, 1)
_OPP = (0, 3, 4, 1, 2, 7, 8, 5, 6)

DEFAULT_DEPTH = 2


def _sublane_tile(dtype) -> int:
    # Native tile height: 16 sublanes for the 16-bit storage modes
    # (bf16 and c16/int16), 8 for f32.
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def temporal_supported(ny: int, nx: int, block: int, depth: int = 2,
                       dtype=jnp.float32) -> bool:
    tile = _sublane_tile(dtype)
    return (
        nx % 128 == 0
        and block % tile == 0
        and ny % block == 0
        and block >= 8
        and 2 <= depth <= min(block, ny - 2)
    )


def _kernel(cells_ref, top_ref, bot_ref, nobst_ref, owner_ref,
            out_ref, top_out_ref, bot_out_ref, sums_ref,
            *, block: int, nblk: int, depth: int, nx: int,
            w1a: float, w2a: float, omega: float, out_dtype,
            paired: bool = True, dev=None, probe=None):
    """``probe`` (perf-bisection only, scripts/probe_temporal_roofline.py;
    WRONG physics): "copy" = skip all physics, stream blocks through with a
    +1 transform (pure HBM-traffic rate); "noroll" = full physics minus the
    east/west lane rolls; "nosum" = full physics minus the per-step
    reductions."""
    i = pl.program_id(0)
    B, T = block, depth

    if probe == "copy":
        for k in range(9):
            val = (cells_ref[k].astype(jnp.float32) + 1.0).astype(out_dtype)
            out_ref[k] = val
            top_out_ref[0, T * k : T * k + T] = val[0:T]
            bot_out_ref[0, T * k : T * k + T] = val[B - T : B]
        for s in range(T):
            sums_ref[i, s] = jnp.sum(cells_ref[0].astype(jnp.float32))
        return

    def east(p):
        return p if probe == "noroll" else pltpu.roll(p, 1, 1)

    def west(p):
        return p if probe == "noroll" else pltpu.roll(p, nx - 1, 1)

    # nobst_ref block covers rows r0-T .. r0+B+T-1 (built by the driver with
    # wrap) plus alignment pad rows; all step masks slice from it.
    nob_all = nobst_ref[...][: B + 2 * T].astype(jnp.float32)  # (B+2T, nx)
    nob_b_all = nob_all > 0.0
    nob_mid = nob_all[T : T + B]
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)
    # Global row ny-2's obstacle mask: interior copy (owner block) and the
    # block-0 above-halo wrap copy hold the same row, so one slice serves
    # both forcing sites.
    nob_force_owner = nob_all[B + T - 2 : B + T - 1]
    nob_force_first = nob_all[T - 2 : T - 1] if T >= 2 else nob_force_owner

    def force(planes, n_rows, pos, nob_row, gate):
        """Accelerate-flow at buffer row ``pos`` (kernels.cl:21-41), masked by
        the joint positivity condition recomputed from the current values."""
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

    # ---- build the (B+2T)-row extended input: rows r0-T .. r0+B+T-1 -------
    # top_ref = neighbor (i-1)'s LAST-T input rows; bot_ref = (i+1)'s FIRST-T.
    # c16 storage (``dev`` = (bg0..bg8, h), ops/devspace.py) decodes here and
    # re-encodes at the stores; all T fused steps run on full f32 values.
    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    buf = tuple(
        jnp.concatenate(
            [
                load(top_ref[0, T * k : T * k + T], k),
                load(cells_ref[k], k),
                load(bot_ref[0, T * k : T * k + T], k),
            ],
            axis=0,
        )
        for k in range(9)
    )

    # ---- T fused steps ------------------------------------------------------
    for s in range(1, T + 1):
        u = T - s + 1          # input halo depth this step
        n_in = B + 2 * u
        n_out = B + 2 * (u - 1)
        # Forcing on every copy of global row ny-2 in this step's input.
        buf = force(buf, n_in, B + u - 2, nob_force_owner, gate_last)
        if u >= 2:
            buf = force(buf, n_in, u - 2, nob_force_first, gate_first)

        def pull(k, buf=buf, n_out=n_out):
            cy, cx = _CYS[k], _CXS[k]
            lo = 1 - cy  # output row o pulls input row o + 1 - cy
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
        # Per-step reduction over the CENTRAL B rows only (each global row
        # counted by exactly one block).
        c0 = u - 1
        if probe == "nosum":
            sums_ref[i, s - 1] = usq[0, 0]
        else:
            sums_ref[i, s - 1] = av_total(
                av_fold(None, nob_mid, usq[c0 : c0 + B], paired)
            )

    # ---- outputs -------------------------------------------------------------
    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        if dev is None:
            val = buf[k].astype(out_dtype)
        else:
            val = encode_value(buf[k] - dev[k], dev[9]).astype(out_dtype)
        out_ref[k] = val
        # Side outputs: the OUTPUT's boundary row-packs (= next pass's halos).
        top_out_ref[0, T * k : T * k + T] = val[0:T]
        bot_out_ref[0, T * k : T * k + T] = val[B - T : B]


@functools.lru_cache(maxsize=None)
def _make_call(ny, nx, block, depth, w1a, w2a, omega, interpret, dtype_name,
               paired=True, dev=None, probe=None):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    T = depth
    tile = _sublane_tile(dtype)
    mask_rows = block + 2 * T + (-(block + 2 * T)) % tile
    kern = functools.partial(
        _kernel, block=block, nblk=nblk, depth=T, nx=nx,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev, probe=probe,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            # (i-1)'s LAST-T input rows of the 9 planes, packed on the second
            # axis; (i+1)'s FIRST-T rows likewise.
            pl.BlockSpec((1, 9 * T, nx), lambda i: ((i - 1) % nblk, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * T, nx), lambda i: ((i + 1) % nblk, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mask_rows, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * T, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9 * T, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, T), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct((nblk, 9 * T, nx), dtype),
            jax.ShapeDtypeStruct((nblk, 9 * T, nx), dtype),
            jax.ShapeDtypeStruct((nblk, T), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            # Live set ≈ the step-buffer chain (decreasing sizes) + the
            # double-buffered in/out blocks; generous headroom, hard-capped.
            vmem_limit_bytes=min(
                120 * 1024 * 1024,
                (T + 4) * (9 * (block + 2 * T) * nx * 4) + 16 * 1024 * 1024,
            ),
        ),
        interpret=interpret,
    )


def make_halos_t(cells, block, depth):
    """Initial depth-T halo arrays, indexed by producer block: ``bot[j]`` =
    block j's FIRST-T rows (consumed by j-1 as its below-halo); ``top[j]`` =
    block j's LAST-T rows (consumed by j+1 as its above-halo). Packed
    ``(nblk, 9T, nx)`` with plane k at rows [Tk, Tk+T)."""
    nblk = cells.shape[1] // block
    T = depth
    tops = []
    bots = []
    for k in range(9):
        plane = cells[k].reshape(nblk, block, cells.shape[2])
        tops.append(plane[:, block - T :, :])
        bots.append(plane[:, :T, :])
    top = jnp.concatenate(tops, axis=1)  # (nblk, 9T, nx), plane-major packs
    bot = jnp.concatenate(bots, axis=1)
    return top, bot


def circ_slice(arr, start: int, length: int, axis: int = 0):
    """``length`` consecutive elements of ``arr`` along ``axis`` starting at
    ``start``, wrapping periodically — built from STATIC slices + concat,
    never a fancy-index gather. (XLA lowers integer-array indexing to a
    real gather, which the mask builders paid once per chunk call at tens
    of ns per row-element — the dominant cost of short large-grid runs
    until the bench_r3_footprint.json session isolated it.)"""
    n = arr.shape[axis]
    start %= n
    if start + length <= n:
        return jax.lax.slice_in_dim(arr, start, start + length, axis=axis)
    parts = [jax.lax.slice_in_dim(arr, start, n, axis=axis)]
    length -= n - start
    while length > n:  # ranges can exceed one full wrap on tiny grids
        parts.append(arr)
        length -= n
    parts.append(jax.lax.slice_in_dim(arr, 0, length, axis=axis))
    return jnp.concatenate(parts, axis=axis)


def nobst_ext(nobst, block, depth, dtype=jnp.float32):
    """(nblk*(B+2T+pad), nx) stacked per-block masks covering rows
    r0-T..r0+B+T-1 with wrap, plus pad rows per block for sublane alignment —
    BlockSpec (B+2T+pad, nx) @ (i, 0) slices block i's."""
    ny, nx = nobst.shape
    nblk = ny // block
    T = depth
    tile = _sublane_tile(dtype)
    pad = (-(block + 2 * T)) % tile
    rows = []
    for j in range(nblk):
        r0 = j * block
        rows.append(
            circ_slice(nobst, r0 - T, block + 2 * T).astype(dtype)
        )
        if pad:
            rows.append(jnp.zeros((pad, nx), dtype))
    return jnp.concatenate(rows, axis=0)


def step_t_pallas(state, nob_ext_arr, owner, density, accel, omega, block,
                  depth, *, interpret=False, paired=None, dev=None,
                  probe=None):
    """Advance T timesteps. ``state`` = (cells, last_t, first_t) where the
    halo arrays are indexed by producer block (see make_halos_t).

    Returns ``(state', (tot_u_step1, ..., tot_u_stepT))``.
    """
    cells, last_t, first_t = state
    _, ny, nx = cells.shape
    call = _make_call(
        ny, nx, block, depth,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev, probe=probe,
    )
    out, first_o, last_o, sums = call(cells, last_t, first_t, nob_ext_arr, owner)
    # Kernel side outputs: top_out = the block's FIRST-T output rows,
    # bot_out = its LAST-T — i.e. the next pass's first_t/last_t arrays.
    return (out, last_o, first_o), tuple(jnp.sum(sums[:, s]) for s in range(depth))


def run_temporal(cells, nobst, density, accel, omega, n_iters, block,
                 depth: int = DEFAULT_DEPTH, *, interpret=False, paired=None,
                 dev=None):
    """Run ``n_iters`` steps, T per HBM pass; the trailing ``n_iters % T``
    steps use the single-step block kernel. Returns
    ``(final_cells, tot_u_series)``. Storage dtype follows ``cells``
    (f32, bf16, or — with ``dev`` — c16/int16 companded deviations);
    arithmetic is f32 in-kernel either way."""
    from lbm_tpu.ops import pallas_step as PS

    _, ny, nx = cells.shape
    T = depth
    if not temporal_supported(ny, nx, block, T, cells.dtype):
        raise ValueError(
            f"temporal kernel unsupported: grid {ny}x{nx}, block {block}, "
            f"depth {T}, dtype {cells.dtype.name}"
        )
    last_t, first_t = make_halos_t(cells, block, T)
    nob_ext_arr = nobst_ext(nobst, block, T, cells.dtype)
    owner = jnp.ones((1, 1), jnp.float32)
    if paired is None:
        paired = paired_default()

    npasses = n_iters // T
    tot_u = jnp.zeros((n_iters,), jnp.float32)

    def body(j, carry):
        state, tot_u = carry
        state, sums = step_t_pallas(
            state, nob_ext_arr, owner, density, accel, omega, block, T,
            interpret=interpret, paired=paired, dev=dev,
        )
        tot_u = jax.lax.dynamic_update_slice(
            tot_u, jnp.stack(sums), (T * j,)
        )
        return state, tot_u

    state = (cells, last_t, first_t)
    if npasses:
        state, tot_u = jax.lax.fori_loop(0, npasses, body, (state, tot_u))
    cells = state[0]
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


def pick_block(ny: int, nx: int, depth: int = DEFAULT_DEPTH,
               dtype=jnp.float32) -> int | None:
    """Temporal-kernel block height (B=16 measured fastest at depth 2:
    8192^2 6,128 vs 4,983 MLUPS at B=8; 2048^2 6,272 vs 4,935).
    ``LBM_TEMPORAL_BLOCK`` overrides for sweeps."""
    if nx % 128 != 0:
        return None
    tile = _sublane_tile(dtype)
    override = os.environ.get("LBM_TEMPORAL_BLOCK")
    if override:
        b = int(override)
        return b if temporal_supported(ny, nx, b, depth, dtype) else None
    for b in (16, 8) if tile == 8 else (16,):
        if temporal_supported(ny, nx, b, depth, dtype):
            return b
    return None


def pick_depth(ny: int, nx: int, dtype=jnp.float32) -> int:
    """Fused-pass depth. ``LBM_TEMPORAL_DEPTH`` overrides for sweeps.

    Default 4 where a block exists for it: the round-2 within-session A/B
    (BENCHMARKS.md, bench_r2_tpu2.json) measured T4:B16 fastest in the
    HBM-bound f32 regime — 2048^2 +55% and 8192^2 +30% over the block
    kernel vs +32%/+17% for shallower depths (and the depth-2 kernel's
    8192-wide compile is flaky on the relay toolchain). Falls back to 2."""
    override = os.environ.get("LBM_TEMPORAL_DEPTH")
    if override:
        return int(override)
    if pick_block(ny, nx, 4, dtype) is not None:
        return 4
    return DEFAULT_DEPTH
