"""In-place AA-pattern band kernel: the band creep schedule on ONE buffer.

band2 (ops/pallas_band2.py) closed most of the HBM-regime gap by running
the resident step body on the band schedule, but it still ping-pongs TWO
(9, W, nx) VMEM scratch buffers and pays the trapezoid redundancy
(B+2T)/B = 1.25 at its validated configs. This kernel removes the second
buffer with the AA streaming pattern (Bailey et al., ICPP 2009 — the same
scheme as the resident flagship, ops/pallas_aa.py): the buffer state
alternates between arrangement **S** (slot (x, i) holds the post-streaming
arrival t_i(x)) and **C** (slot (x, opp(i)) holds the post-collision value
f*_i(x)).

- The *even* step (S -> C) is fully cell-local: read the 9 slots at x,
  BGK-relax (kernels.cl:109-177), bounce-back (kernels.cl:100-107), write
  value-traveling-k into slot opp(k) of the SAME cell. Zero relayouts,
  zero garbage creep.
- The *odd* step (C -> S) gathers t_k(x) from (x - c_k, opp(k)), relaxes,
  and scatters the value traveling k to (x + c_k, k) — both neighboring
  streamings around one collision. Garbage creeps 2 rows per odd step.

Creep accounting: 0 + 2 per double-step = T rows over T steps — the SAME
band invariant as pallas_band.py:173 (load W = B + 2T rows, advance T
in-kernel steps, store the central B rows), at HALF the scratch VMEM.
The freed VMEM buys larger B at fixed footprint: redundancy (B+2T)/B
drops from band2's 1.25 toward 1.06-1.125, and the even steps' zero-
relayout locality removes half the band body's roll/concat traffic. The
in-place safety argument is pallas_aa's verbatim: the unique reader and
unique writer of any (row, lane, slot) address is the same cell (even
steps trivially; odd steps because reader-of (w, j) = writer-of (w, j) =
cell w - c_j, preserved by the buffer-wrap modulus), so a reads-then-
writes tile discipline is race-free for any tile order.

**Chunk interface**: HBM holds arrangement S between passes (exactly
``run_aa``'s resident-arranged chunking) — ``run_band3`` converts R -> S
once per call (``stream_planes``), runs even-T passes (S -> S), converts
back at the end; the ``n_iters % T`` remainder runs the single-step block
kernel in R space.

**Forcing** (kernels.cl:7-42) appears at the two gated static buffer rows
of the band family (mid row B+T-2 of the last block, top-margin row T-2
of block 0 — pallas_band2.py:116). The C-space (odd step) forcing is a
1-row in-place update at ``pos``. The S-space (even step) forcing reads
rows pos-1..pos+1 — at the block-0 margin, row T-3 goes garbage at step
T-2 (creep reaches it) while rows T-2/T-1 are still live, so applying it
inside the even step would corrupt two genuine rows. Instead each odd
step FUSES the next even step's forcing into its scatter: the S-space
mask m at lane x equals the positivity test on the colliding cell
(pos, x)'s own outputs f*_3/6/7 (the scatter is what produces the S rows
the mask reads), so the fused form — compute m0 from out_3/6/7 at row
pos, RMW slot k at row pos+cy_k by shift_x(m0, cx_k)*w_k — is
bit-identical to pallas_aa.force_even and reads every input one step
earlier, while still genuine. The FIRST forcing of a chunk is applied in
jnp on the full periodic S state (``force_s``); the chunk's FINAL pass
must not fuse its trailing odd step (the stored state must be unforced
for a clean handoff), and — measured, bench_r4_band3run.json — the relay
compile helper rejects any kernel mixing a ``fori_loop`` with an
unrolled tail pair while accepting the uniform-fori kernels, so the
final pass splits into two uniform kernels on the same depth-T geometry:
``(steps=T-2, fuse=True)`` + ``(steps=2, fuse=False)``.

Physics per step is the shared paired collision (ops/collision.py).
Reference semantics: kernels.cl:7-42 (forcing), 44-201 (fused step);
normalization d2q9-bgk.c:146-152. Storage f32/bf16/c16 (dev codec at the
HBM boundary only; the buffer is f32).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default
from lbm_tpu.ops.pallas_band import (
    band_panel_supported,
    band_supported,
    nobst_ext,
    nobst_ext_panel,
)
from lbm_tpu.ops import band_common as BC
from lbm_tpu.ops.pallas_band2 import _pick_tile_w
from lbm_tpu.ops.pallas_temporal import _sublane_tile

_CYS, _CXS, _OPP, _FORCE = BC.CYS, BC.CXS, BC.OPP, BC.FORCE


def band3_supported(ny: int, nx: int, block: int, depth: int,
                    dtype=jnp.float32) -> bool:
    # Even depth: passes must map S -> S. block >= 2T keeps the forcing
    # row's appearances at the two static gated positions (pallas_band2).
    return (
        band_supported(ny, nx, block, depth, dtype)
        and depth % 2 == 0
        and block >= 2 * depth
    )


def band3_panel_supported(ny: int, nx: int, block: int, depth: int,
                          panel: int, halo: int = 128,
                          dtype=jnp.float32) -> bool:
    return (
        band_panel_supported(ny, nx, block, depth, panel, halo, dtype)
        and depth % 2 == 0
        and block >= 2 * depth
    )


def force_s(state, nobst, w1a: float, w2a: float, owner=1.0):
    """jnp S-space accelerate_flow on the full periodic state (f32).

    Bit-identical to pallas_aa.force_even: the pre-stream delta on plane k
    at row ny-2 lands post-streaming at row ny-2+cy_k, lane-shifted by
    cx_k, in slot k; the positivity mask reads planes 3/6/7 through the
    same shifts (kernels.cl:29-41)."""
    ny = state.shape[1]

    def east(p):
        return jnp.roll(p, 1, axis=-1)

    def shift_x(p, cx):
        return jnp.roll(p, cx, axis=-1) if cx else p

    ok = (
        (east(state[3, ny - 2]) - w1a > 0.0)
        & (east(state[6, ny - 1]) - w2a > 0.0)
        & (east(state[7, ny - 3]) - w2a > 0.0)
    ).astype(state.dtype)
    m = ok * (nobst[ny - 2] > 0).astype(state.dtype) * owner
    wgt = {1: w1a, 2: w2a}
    for k, sign, kind in _FORCE:
        r = (ny - 2 + _CYS[k]) % ny
        state = state.at[k, r].add(shift_x(m, _CXS[k]) * sign * wgt[kind])
    return state


def _make_body(*, B, T, WX_roll, tile_w, w1a, w2a, omega, paired,
               sums_cols=None, probe=""):
    """Shared even/odd step bodies over a (9, W, width) scratch ref.

    ``WX_roll`` is the lane-roll width (nx for full-row, P+2H for panels);
    ``sums_cols = (H, H+P)`` restricts the reduction window for panels.
    Returns (even_step, odd_step) closures over (s_ref, nob_all, nob_b_all,
    gates, sums_write).

    ``probe`` selects compile-isolation variants (WRONG PHYSICS — only for
    scripts/probe_band3_compile.py to bisect which structural feature the
    relay compile helper rejects): "noforce" skips force_odd, "nofuse"
    skips the fused forcing, "alignedscatter" writes the odd scatter at
    the tile origin instead of r0+cy, "noscatterwrap" clamps scatter
    writes to in-range rows (no split stores)."""
    W = B + 2 * T
    ntiles = W // tile_w
    wgt = {1: w1a, 2: w2a}

    def build(s_ref, nob_all, nob_b_all, gate_last, gate_first, sums_write):
        def east(p):
            return pltpu.roll(p, 1, 1)

        def west(p):
            return pltpu.roll(p, WX_roll - 1, 1)

        def shift_x(p, cx):
            return east(p) if cx == 1 else (west(p) if cx == -1 else p)

        def read(k, lo, h):
            """Rows [lo, lo+h) of slot k with buffer wrap (garbage zone)."""
            lo = lo % W
            if lo + h <= W:
                return s_ref[k, lo : lo + h]
            return jnp.concatenate(
                [s_ref[k, lo:W], s_ref[k, : lo + h - W]], axis=0
            )

        def write(k, lo, val):
            h = val.shape[0]
            lo = lo % W
            if lo + h <= W:
                s_ref[k, lo : lo + h] = val
            else:
                split = W - lo
                s_ref[k, lo:W] = val[:split]
                s_ref[k, : lo + h - W] = val[split:]

        def row(k, r):
            r = r % W
            return s_ref[k, r : r + 1]

        def part_fold(total, usq, r0):
            lo, hi = max(r0, T), min(r0 + tile_w, T + B)
            if lo >= hi:
                return total
            nob = nob_all[lo:hi]
            u_sq = usq[lo - r0 : hi - r0]
            if sums_cols is not None:
                c0, c1 = sums_cols
                return av_fold(total, nob[:, c0:c1], u_sq[:, c0:c1], paired)
            return av_fold(total, nob, u_sq, paired)

        positions = ((B + T - 2, gate_last), (T - 2, gate_first))

        def force_odd():
            """C-space forcing: plane k lives at slot opp(k), row pos."""
            if probe == "noforce":
                return
            for pos, gate in positions:
                m = (
                    (row(_OPP[3], pos) - w1a > 0.0)
                    & (row(_OPP[6], pos) - w2a > 0.0)
                    & (row(_OPP[7], pos) - w2a > 0.0)
                ).astype(jnp.float32) * nob_all[pos : pos + 1] * gate
                for k, sign, kind in _FORCE:
                    s = _OPP[k]
                    write(s, pos, row(s, pos) + m * sign * wgt[kind])

        def even_step(s):
            """S -> C: local collide, slot opp(k) <- value traveling k.
            (Forcing already applied — by force_s before the chunk, or by
            the previous odd step's fusion.)"""
            total = None
            for j in range(ntiles):
                r0 = j * tile_w
                t = tuple(s_ref[k, r0 : r0 + tile_w] for k in range(9))
                relaxed, usq = bgk_relax(t, omega, paired=paired)
                nob_b = nob_b_all[r0 : r0 + tile_w]
                for k in range(9):
                    s_ref[_OPP[k], r0 : r0 + tile_w] = jnp.where(
                        nob_b, relaxed[k], t[_OPP[k]]
                    )
                total = part_fold(total, usq, r0)
            sums_write(s, av_total(total))

        def odd_step(s, fuse: bool):
            """C -> S: gather t_k from (x - c_k, opp(k)), collide, scatter
            value-traveling-k to (x + c_k, k); optionally fuse the next
            even step's forcing (see module docstring)."""
            force_odd()
            total = None
            for j in range(ntiles):
                r0 = j * tile_w
                t = tuple(
                    shift_x(read(_OPP[k], r0 - _CYS[k], tile_w), _CXS[k])
                    for k in range(9)
                )
                relaxed, usq = bgk_relax(t, omega, paired=paired)
                nob_b = nob_b_all[r0 : r0 + tile_w]
                outs = [
                    jnp.where(nob_b, relaxed[k], t[_OPP[k]]) for k in range(9)
                ]
                for k in range(9):
                    if probe == "alignedscatter":
                        write(k, r0, shift_x(outs[k], _CXS[k]))
                    elif probe == "noscatterwrap":
                        lo = min(max(r0 + _CYS[k], 0), W - tile_w)
                        write(k, lo, shift_x(outs[k], _CXS[k]))
                    else:
                        write(k, r0 + _CYS[k], shift_x(outs[k], _CXS[k]))
                # Fused next-step S-space forcing: m at lane x equals the
                # positivity test on cell (pos, x)'s outputs (the scatter
                # writes exactly the S rows force_even would read).
                if fuse and probe != "nofuse":
                    for pos, gate in positions:
                        if not (r0 <= pos < r0 + tile_w):
                            continue
                        o = pos - r0
                        m0 = (
                            (outs[3][o : o + 1] - w1a > 0.0)
                            & (outs[6][o : o + 1] - w2a > 0.0)
                            & (outs[7][o : o + 1] - w2a > 0.0)
                        ).astype(jnp.float32) * nob_all[pos : pos + 1] * gate
                        for k, sign, kind in _FORCE:
                            r = pos + _CYS[k]
                            write(
                                k, r,
                                row(k, r)
                                + shift_x(m0, _CXS[k]) * sign * wgt[kind],
                            )
                total = part_fold(total, usq, r0)
            sums_write(s, av_total(total))

        return even_step, odd_step

    return build


class _PlaneView:
    """state[k, ...] views dispatching to per-plane scratch refs (the
    pallas_aa allocation shape — probe='perplane' tests whether Mosaic
    accepts the in-place pattern on 2-D refs where the 3-D one fails)."""

    def __init__(self, planes):
        self.planes = planes

    def __getitem__(self, idx):
        k, *rest = idx
        return self.planes[k][tuple(rest) if len(rest) > 1 else rest[0]]

    def __setitem__(self, idx, val):
        k, *rest = idx
        self.planes[k][tuple(rest) if len(rest) > 1 else rest[0]] = val


def _kernel3(cells_ref, top_ref, bot_ref, nobst_ref, owner_ref,
             out_ref, sums_ref, *scratch,
             block: int, nblk: int, depth: int, steps: int, nx: int,
             tile_w: int, w1a: float, w2a: float, omega: float, out_dtype,
             paired: bool = True, dev=None, fuse: bool = True,
             probe: str = ""):
    # ``steps`` (even, <= depth) decouples the fori trip count from the
    # buffer geometry: the body must be ONE uniform fori — the relay
    # compile helper rejects a kernel mixing a fori with an unrolled tail
    # pair (bench_r4_band3run.json: the old fuse_last=False kernel failed
    # at every size while the uniform fused kernel compiled). ``fuse`` is
    # per-kernel: run_band3's final pass is (steps=T-2, fuse=True) +
    # (steps=2, fuse=False).
    s_ref = scratch[0] if len(scratch) == 1 else _PlaneView(scratch)
    i = pl.program_id(0)
    B, T = block, depth
    W = B + 2 * T

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    for k in range(9):
        s_ref[k, :T] = load(top_ref[k], k)
        s_ref[k, T : T + B] = load(cells_ref[k], k)
        s_ref[k, T + B :] = load(bot_ref[k], k)

    def sums_write(s, total):
        sums_ref[i, s] = total

    even_step, odd_step = _make_body(
        B=B, T=T, WX_roll=nx, tile_w=tile_w,
        w1a=w1a, w2a=w2a, omega=omega, paired=paired, probe=probe,
    )(s_ref, nob_all, nob_b_all, gate_last, gate_first, sums_write)

    if probe == "evensonly":   # compile-isolation: local in-place body only
        def two_steps(h, carry):
            even_step(2 * h)
            even_step(2 * h + 1)
            return carry
    elif probe == "oddsonly":  # compile-isolation: gather/scatter body only
        def two_steps(h, carry):
            odd_step(2 * h, True)
            odd_step(2 * h + 1, True)
            return carry
    else:
        def two_steps(h, carry):
            even_step(2 * h)
            odd_step(2 * h + 1, fuse)
            return carry

    jax.lax.fori_loop(0, steps // 2, two_steps, 0)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = s_ref[k, T : T + B]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call3(ny, nx, block, depth, w1a, w2a, omega, interpret, dtype_name,
                paired=True, dev=None, steps=None, fuse=True, probe=""):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    T = depth
    steps = T if steps is None else steps
    W = block + 2 * T
    tile = _sublane_tile(dtype)
    mask_rows = W + (-W) % tile
    tile_w = _pick_tile_w(W, nx)
    kern = functools.partial(
        _kernel3, block=block, nblk=nblk, depth=T, steps=steps, nx=nx,
        tile_w=tile_w, w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype,
        paired=paired, dev=dev, fuse=fuse, probe=probe,
    )
    return BC.creep_call(
        kern,
        BC.fullrow_specs(ny, nx, block, T, mask_rows, dtype, steps=steps),
        scratch_shapes=(
            [pltpu.VMEM((W, nx), jnp.float32) for _ in range(9)]
            if probe == "perplane"
            else [pltpu.VMEM((9, W, nx), jnp.float32)]
        ),
        # ONE scratch generation + double-buffered io + tile temporaries.
        vmem_limit=(9 * W * nx * 4)
        + 4 * (9 * block * nx * dtype.itemsize)
        + 15 * tile_w * nx * 4
        + 20 * 1024 * 1024,
        interpret=interpret,
    )


def _kernel3_panel(c_ref, n_ref, s_ref_in, w_ref, e_ref,
                   nw_ref, ne_ref, sw_ref, se_ref, nobst_ref, owner_ref,
                   out_ref, sums_ref, s_ref,
                   *, block: int, nblk: int, depth: int, steps: int,
                   panel: int, halo: int, tile_w: int, w1a: float,
                   w2a: float, omega: float, out_dtype,
                   paired: bool = True, dev=None, fuse: bool = True):
    i = pl.program_id(0)
    j = pl.program_id(1)
    B, T, P, H = block, depth, panel, halo
    W = B + 2 * T
    WX = P + 2 * H

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    for k in range(9):
        s_ref[k, :T] = jnp.concatenate(
            [load(nw_ref[k], k), load(n_ref[k], k), load(ne_ref[k], k)],
            axis=1,
        )
        s_ref[k, T : T + B] = jnp.concatenate(
            [load(w_ref[k], k), load(c_ref[k], k), load(e_ref[k], k)],
            axis=1,
        )
        s_ref[k, T + B :] = jnp.concatenate(
            [load(sw_ref[k], k), load(s_ref_in[k], k), load(se_ref[k], k)],
            axis=1,
        )

    def sums_write(s, total):
        sums_ref[i, j, s] = total

    even_step, odd_step = _make_body(
        B=B, T=T, WX_roll=WX, tile_w=tile_w,
        w1a=w1a, w2a=w2a, omega=omega, paired=paired,
        sums_cols=(H, H + P),
    )(s_ref, nob_all, nob_b_all, gate_last, gate_first, sums_write)

    def two_steps(h, carry):
        even_step(2 * h)
        odd_step(2 * h + 1, fuse)
        return carry

    # ONE uniform fori: the relay compile helper rejects a fori plus an
    # unrolled tail in the same kernel (bench_r4_band3run.json).
    jax.lax.fori_loop(0, steps // 2, two_steps, 0)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = s_ref[k, T : T + B, H : H + P]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call3_panel(ny, nx, block, depth, panel, halo, w1a, w2a, omega,
                      interpret, dtype_name, paired=True, dev=None,
                      steps=None, fuse=True):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    npan = nx // panel
    T, P, H = depth, panel, halo
    steps = T if steps is None else steps
    W = block + 2 * T
    WX = P + 2 * H
    tile = _sublane_tile(dtype)
    mask_rows = W + (-W) % tile
    tile_w = _pick_tile_w(W, WX)
    kern = functools.partial(
        _kernel3_panel, block=block, nblk=nblk, depth=T, steps=steps,
        panel=P, halo=H, tile_w=tile_w, w1a=w1a, w2a=w2a, omega=omega,
        out_dtype=dtype, paired=paired, dev=dev, fuse=fuse,
    )

    return BC.creep_call(
        kern,
        BC.panel_specs(ny, nx, block, T, P, H, mask_rows, dtype,
                       steps=steps),
        scratch_shapes=[
            pltpu.VMEM((9, W, WX), jnp.float32),
        ],
        vmem_limit=(9 * W * WX * 4)
        + 4 * (9 * block * P * dtype.itemsize)
        + 15 * tile_w * WX * 4
        + 20 * 1024 * 1024,
        interpret=interpret,
    )


def step_band3(cells_s, nob_ext_arr, owner, density, accel, omega, block,
               depth, *, steps=None, fuse=True, interpret=False,
               paired=None, dev=None):
    """Advance the S-arranged state ``steps`` (default T) timesteps in one
    in-place pass on the depth-T buffer geometry."""
    _, ny, nx = cells_s.shape
    steps = depth if steps is None else steps
    call = _make_call3(
        ny, nx, block, depth,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells_s.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev, steps=steps, fuse=bool(fuse),
    )
    out, sums = call(cells_s, cells_s, cells_s, nob_ext_arr, owner)
    return out, tuple(jnp.sum(sums[:, s]) for s in range(steps))


def step_band3_panel(cells_s, nob_ext_arr, owner, density, accel, omega,
                     block, depth, panel, halo=128, *, steps=None,
                     fuse=True, interpret=False, paired=None, dev=None):
    """Advance the S-arranged state ``steps`` (default T) timesteps in one
    panelled pass on the depth-T buffer geometry."""
    _, ny, nx = cells_s.shape
    steps = depth if steps is None else steps
    call = _make_call3_panel(
        ny, nx, block, depth, panel, halo,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells_s.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev, steps=steps, fuse=bool(fuse),
    )
    out, sums = call(*([cells_s] * 9), nob_ext_arr, owner)
    return out, tuple(jnp.sum(sums[:, :, s]) for s in range(steps))


def _force_s_storage(state, nobst, w1a, w2a, dev=None):
    """force_s for any storage dtype: decode the 3 affected rows
    (ny-3..ny-1 — never wrapping to row 0), force at f32, re-encode.
    encode(decode(q)) == q exactly (ops/devspace.py), so untouched entries
    in the slice round-trip bit-exactly."""
    ny = state.shape[1]
    if dev is None and state.dtype == jnp.float32:
        return force_s(state, nobst, w1a, w2a)
    if dev is None:  # bf16
        sl = state[:, ny - 3 :, :].astype(jnp.float32)
        sl = _force_slice(sl, nobst[ny - 3 :], w1a, w2a)
        return state.at[:, ny - 3 :, :].set(sl.astype(state.dtype))
    from lbm_tpu.ops.devspace import DevSpec, decode_state, encode_state

    spec = DevSpec(bg=tuple(dev[:9]), h=float(dev[9]))
    sl = decode_state(state[:, ny - 3 :, :], spec)
    sl = _force_slice(sl, nobst[ny - 3 :], w1a, w2a)
    return state.at[:, ny - 3 :, :].set(encode_state(sl, spec))


def _force_slice(sl, nob3, w1a, w2a):
    """force_s on the 3-row slice (rows 0/1/2 = ny-3/ny-2/ny-1)."""
    def east(p):
        return jnp.roll(p, 1, axis=-1)

    def shift_x(p, cx):
        return jnp.roll(p, cx, axis=-1) if cx else p

    ok = (
        (east(sl[3, 1]) - w1a > 0.0)
        & (east(sl[6, 2]) - w2a > 0.0)
        & (east(sl[7, 0]) - w2a > 0.0)
    ).astype(sl.dtype)
    m = ok * (nob3[1] > 0).astype(sl.dtype)
    wgt = {1: w1a, 2: w2a}
    for k, sign, kind in _FORCE:
        r = 1 + _CYS[k]
        sl = sl.at[k, r].add(shift_x(m, _CXS[k]) * sign * wgt[kind])
    return sl


def stream_planes(cells, sign: int = 1):
    """R -> S (sign=+1): slot (x, i) <- f_i(x - c_i); sign=-1 inverts.
    Works on raw storage values (f32/bf16/c16 codes roll unchanged)."""
    return jnp.stack(
        [
            jnp.roll(cells[k], (sign * _CYS[k], sign * _CXS[k]), (0, 1))
            for k in range(9)
        ]
    )


def run_band3(cells, nobst, density, accel, omega, n_iters, block, depth,
              *, panel=None, halo=128, interpret=False, paired=None,
              dev=None):
    """Run ``n_iters`` steps, T per in-place pass; trailing ``n_iters % T``
    steps use the single-step block kernel. Same contract as run_band2
    (R-arranged in/out; ``panel`` selects the x-split variant)."""
    from lbm_tpu.ops import pallas_step as PS

    _, ny, nx = cells.shape
    T = depth
    if panel is not None:
        if not band3_panel_supported(ny, nx, block, T, panel, halo,
                                     cells.dtype):
            raise ValueError(
                f"panel band3 kernel unsupported: grid {ny}x{nx}, block "
                f"{block}, depth {T}, panel {panel}, halo {halo}, "
                f"dtype {cells.dtype.name}"
            )
        nob_ext_arr = nobst_ext_panel(nobst, block, T, panel, halo,
                                      cells.dtype)
    elif not band3_supported(ny, nx, block, T, cells.dtype):
        raise ValueError(
            f"band3 kernel unsupported: grid {ny}x{nx}, block {block}, "
            f"depth {T}, dtype {cells.dtype.name}"
        )
    else:
        nob_ext_arr = nobst_ext(nobst, block, T, cells.dtype)
    owner = jnp.ones((1, 1), jnp.float32)
    if paired is None:
        paired = paired_default()
    w1a = float(density * accel / 9.0)
    w2a = float(density * accel / 36.0)

    npasses = n_iters // T
    tot_u = jnp.zeros((n_iters,), jnp.float32)

    if npasses:
        state = stream_planes(cells)  # R -> S, once per chunk
        # The chunk's first forcing, on the full periodic S state (every
        # later one is fused into the preceding odd step's scatter).
        state = _force_s_storage(state, nobst, w1a, w2a, dev=dev)

        def one_pass(state, steps, fuse):
            if panel is not None:
                return step_band3_panel(
                    state, nob_ext_arr, owner, density, accel, omega,
                    block, T, panel, halo, steps=steps, fuse=fuse,
                    interpret=interpret, paired=paired, dev=dev,
                )
            return step_band3(
                state, nob_ext_arr, owner, density, accel, omega, block, T,
                steps=steps, fuse=fuse, interpret=interpret, paired=paired,
                dev=dev,
            )

        def body(j, carry):
            state, tot_u = carry
            state, sums = one_pass(state, T, True)
            tot_u = jax.lax.dynamic_update_slice(
                tot_u, jnp.stack(sums), (T * j,)
            )
            return state, tot_u

        if npasses > 1:
            state, tot_u = jax.lax.fori_loop(
                0, npasses - 1, body, (state, tot_u)
            )
        # Final pass: the trailing odd step must not fuse (the stored state
        # is unforced), and each kernel must be ONE uniform fori (the relay
        # compile helper rejects a fori + unrolled tail in one kernel —
        # bench_r4_band3run.json) — so split it: (T-2, fused) + (2, unfused)
        # passes on the same depth-T geometry.
        sums = ()
        if T > 2:
            state, sums = one_pass(state, T - 2, True)
        state, sums2 = one_pass(state, 2, False)
        tot_u = jax.lax.dynamic_update_slice(
            tot_u, jnp.stack(sums + sums2), (T * (npasses - 1),)
        )
        cells = stream_planes(state, sign=-1)  # S -> R
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


# --- Config picking -----------------------------------------------------------
# The single scratch buffer halves the VMEM the schedule needs, so B can
# roughly double at fixed footprint vs band2. The regime is VPU-bound
# (DESIGN.md roofline addendum): rate scales ~1/redundancy, so the picker
# minimizes (B+2T)/B subject to the compile-footprint budget, tie-breaking
# toward deeper T (fewer passes, less io traffic).

_VMEM_TARGET = 90 * 1024 * 1024  # the relay compile helper's proven budget


def _vmem3(ny, nx, block, depth, itemsize, width=None):
    """Estimated compiled footprint: scratch + double-buffered io blocks
    (2x in + 2x out of (9, B, io_w)) + margin strips + tile temporaries.
    ``width`` = P + 2H for the panel variant (io blocks are P wide)."""
    W = block + 2 * depth
    wx = nx if width is None else width          # buffer / roll width
    io_w = nx if width is None else width - 256  # P = width - 2*halo(128)
    tile_w = _pick_tile_w(W, wx)
    return (
        9 * W * wx * 4                       # the single scratch
        + 4 * 9 * block * io_w * itemsize    # in/out io double-buffering
        + 4 * 9 * depth * wx * itemsize      # margin strips (approx)
        + 15 * tile_w * wx * 4               # live tile temporaries
        + 4 * 1024 * 1024                    # mask window + slack
    )


def pick_config3(ny: int, nx: int, dtype=jnp.float32) -> tuple[int, int] | None:
    """(block, depth) minimizing redundancy within the VMEM budget, or
    None. ``LBM_BAND3_BLOCK`` / ``LBM_BAND3_DEPTH`` override for sweeps."""
    if nx % 128 != 0:
        return None
    itemsize = jnp.dtype(dtype).itemsize
    ov_b = os.environ.get("LBM_BAND3_BLOCK")
    ov_t = os.environ.get("LBM_BAND3_DEPTH")
    if ov_b or ov_t:
        b = int(ov_b) if ov_b else 128
        t = int(ov_t) if ov_t else 8
        return (b, t) if band3_supported(ny, nx, b, t, dtype) else None
    best = None
    for b in (512, 384, 256, 192, 128, 96, 64, 48, 32, 16):
        for t in (16, 8):
            if not band3_supported(ny, nx, b, t, dtype):
                continue
            if _vmem3(ny, nx, b, t, itemsize) > _VMEM_TARGET:
                continue
            red = (b + 2 * t) / b
            # prefer min redundancy; tie -> deeper T (fewer passes)
            key = (red, -t)
            if best is None or key < best[0]:
                best = (key, (b, t))
    return None if best is None else best[1]


def pick_config3_panel(
    ny: int, nx: int, dtype=jnp.float32, halo: int = 128,
) -> tuple[int, int, int] | None:
    """(block, depth, panel) for the x-split variant, or None.
    ``LBM_BAND3_PANEL`` overrides the panel width."""
    itemsize = jnp.dtype(dtype).itemsize
    ov_p = os.environ.get("LBM_BAND3_PANEL")
    panels = (int(ov_p),) if ov_p else (2048, 1024, 512, 256)
    best = None
    for p in panels:
        if nx % p or p % halo:
            continue
        for b in (256, 192, 128, 96, 64, 32, 16):
            for t in (16, 8):
                if not band3_panel_supported(ny, nx, b, t, p, halo, dtype):
                    continue
                if _vmem3(ny, nx, b, t, itemsize, width=p + 2 * halo) \
                        > _VMEM_TARGET:
                    continue
                red = (b + 2 * t) / b * (p + 2 * halo) / p
                key = (red, -p, -t)
                if best is None or key < best[0]:
                    best = (key, (b, t, p))
    return None if best is None else best[1]
