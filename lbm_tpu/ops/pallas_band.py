"""Band kernel: fixed-buffer deep temporal blocking with an IN-KERNEL step
loop — T = 16-32 timesteps per HBM pass.

The deep state-view kernel (`pallas_deep.py`) unrolls its T steps in
Python, so the Mosaic program grows with T and this toolchain's compile
helper hangs at T=16 (bench_r3_deep.json). This kernel makes the step loop
a ``jax.lax.fori_loop`` INSIDE the kernel, which requires a uniform body:
the extended buffer keeps its full ``W = B + 2T`` height on every step
instead of shrinking. Rows within distance s of the buffer edge are
garbage after s steps (they lack true neighbors — the y-shift wraps the
buffer), but garbage only creeps INWARD one row per step and the output
takes the central B rows after exactly T steps, which are computed from
genuine data throughout. The per-step reduction slices the central band
BEFORE any arithmetic on it, so edge garbage (including 1/rho infinities)
never contaminates the sums.

Costs vs the unrolled trapezoid: redundant compute ``(B+2T)/B`` (vs
``1 + T/B``) — so B must be >= ~4T — and the same ``2/T + 2/B``
plane-pass traffic. What it buys: T bounded by VMEM, not program size.
At B=256/T=32 a pass moves ~0.07 plane-passes/step — firmly compute-bound
— with 1.25x redundancy. This is the designed replacement for the
"split-invocation AA" idea (VERDICT r2 item 6): two half-grid AA calls
with a per-step seam handoff would reload both halves from HBM every
step (block-kernel traffic — residency lost); keeping a BAND resident
for T steps is the version of that idea that actually preserves
residency, and it serves any grid width, not just the 72-100 MB band.

Forcing-row offsets are constant across steps because the buffer does not
shrink (row ny-2 sits at buffer row B+T-2 in the owner block and at T-2 in
block 0's wrap halo); physics per step is the shared paired collision
(ops/collision.py; reference: kernels.cl:7-42, 44-201).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops import band_common as BC
from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default
from lbm_tpu.ops.pallas_temporal import _sublane_tile, nobst_ext

_CYS, _CXS, _OPP = BC.CYS, BC.CXS, BC.OPP


def unroll_default() -> int:
    """In-kernel step-loop unroll factor (LBM_BAND_UNROLL, default 1).
    Unrolling by u multiplies the Mosaic program size by u (still bounded,
    unlike the deep kernel's full-T unroll) and gives the scheduler u
    consecutive step bodies to pipeline. Must divide T. Implemented as an
    outer ``fori_loop`` over T//u with a u-step Python-unrolled body —
    Pallas TPU's own ``fori_loop(unroll=...)`` supports only 1 or full
    unroll (probed: NotImplementedError, bench_r3_bandtune.json)."""
    v = int(os.environ.get("LBM_BAND_UNROLL", "1"))
    if v < 1:
        raise ValueError(f"LBM_BAND_UNROLL={v}: must be >= 1")
    return v


def _run_steps(T: int, step_body, buf, unroll: int):
    """T applications of ``step_body(s, buf)`` with partial unrolling:
    an outer ``fori_loop`` over T//unroll groups of ``unroll`` inlined
    steps (step index stays exact for the per-step sums writes)."""
    if unroll <= 1:
        return jax.lax.fori_loop(0, T, step_body, buf)
    if T % unroll:
        raise ValueError(f"unroll={unroll} must divide depth T={T}")
    if unroll >= T:
        for s in range(T):
            buf = step_body(s, buf)
        return buf

    def group(j, b):
        for k in range(unroll):
            b = step_body(j * unroll + k, b)
        return b

    return jax.lax.fori_loop(0, T // unroll, group, buf)


def rowforce_default() -> bool:
    """Row-targeted accelerate-flow (LBM_BAND_ROWFORCE=1): update ONLY the
    forcing row via a static-slice concat (NOT dynamic_update_slice —
    Mosaic has no TPU lowering for it) instead of a full-buffer masked FMA
    on 6 planes (the broadcast form costs ~12 VPU ops/cell/step at W=96
    for a 1-row effect). Whether Mosaic lowers the 1-row concat cheaper
    than the dense FMA is an empirical question — default off until a TPU
    A/B lands."""
    return os.environ.get("LBM_BAND_ROWFORCE", "0") == "1"


def _make_force(w1a: float, w2a: float, rowforce: bool):
    """Build the accelerate-flow step (kernels.cl:7-42 semantics): add/sub
    w1a/w2a on the forcing row where the three donor densities stay
    positive. ``force(planes, sel, nob_row, gate, pos)`` — ``sel`` is the
    (W, 1) row-selector mask (broadcast form only), ``pos`` the static
    buffer row, ``gate`` the traced owner gate (0 or 1)."""
    if not rowforce:

        def force(planes, sel, nob_row, gate, pos):
            ok = (
                (planes[3][pos : pos + 1] - w1a > 0.0)
                & (planes[6][pos : pos + 1] - w2a > 0.0)
                & (planes[7][pos : pos + 1] - w2a > 0.0)
            ).astype(jnp.float32)
            am = sel * (ok * nob_row * gate)
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

        return force

    def force(planes, sel, nob_row, gate, pos):
        del sel
        ok = (
            (planes[3][pos : pos + 1] - w1a > 0.0)
            & (planes[6][pos : pos + 1] - w2a > 0.0)
            & (planes[7][pos : pos + 1] - w2a > 0.0)
        ).astype(jnp.float32)
        am = ok * nob_row * gate  # (1, row width)

        def upd(p, delta):
            # Static-slice concat, NOT dynamic_update_slice: ``pos`` is a
            # Python int, and Mosaic has no TPU lowering for
            # dynamic_update_slice on values (probed — NotImplementedError,
            # bench_r3_bandtune.json).
            return jnp.concatenate(
                [p[:pos], p[pos : pos + 1] + delta, p[pos + 1 :]], axis=0
            )

        return (
            planes[0],
            upd(planes[1], w1a * am),
            planes[2],
            upd(planes[3], -w1a * am),
            planes[4],
            upd(planes[5], w2a * am),
            upd(planes[6], -w2a * am),
            upd(planes[7], -w2a * am),
            upd(planes[8], w2a * am),
        )

    return force


def band_supported(ny: int, nx: int, block: int, depth: int,
                   dtype=jnp.float32) -> bool:
    del dtype
    return (
        nx % 128 == 0
        and depth % 8 == 0         # halo strips are (9, T, nx) blocks
        and depth >= 8
        and block % depth == 0     # strip index maps need T | B
        and ny % block == 0
        and depth <= ny - 2
    )


def _kernel(cells_ref, top_ref, bot_ref, nobst_ref, owner_ref,
            out_ref, sums_ref,
            *, block: int, nblk: int, depth: int, nx: int,
            w1a: float, w2a: float, omega: float, out_dtype,
            paired: bool = True, dev=None, rowforce: bool = False,
            unroll: int = 1):
    i = pl.program_id(0)
    B, T = block, depth
    W = B + 2 * T

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    def up_roll(p):     # tmp[r] = p[r-1] (buffer-wrap: garbage zone only)
        return pltpu.roll(p, 1, 0)

    def down_roll(p):   # tmp[r] = p[r+1]
        return pltpu.roll(p, W - 1, 0)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    nob_mid = nob_all[T : T + B]
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)
    nob_force_owner = nob_all[B + T - 2 : B + T - 1]
    nob_force_first = nob_all[T - 2 : T - 1]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    sel_owner = (rows_iota == B + T - 2).astype(jnp.float32)
    sel_first = (rows_iota == T - 2).astype(jnp.float32)
    force = _make_force(w1a, w2a, rowforce)

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    buf = tuple(
        jnp.concatenate(
            [load(top_ref[k], k), load(cells_ref[k], k), load(bot_ref[k], k)],
            axis=0,
        )
        for k in range(9)
    )

    def step_body(s, buf):
        buf = force(buf, sel_owner, nob_force_owner, gate_last, B + T - 2)
        buf = force(buf, sel_first, nob_force_first, gate_first, T - 2)

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
        # Central band sliced BEFORE any reduction arithmetic: edge garbage
        # (incl. 1/rho infinities) never reaches the sums.
        sums_ref[i, s] = av_total(av_fold(None, nob_mid, usq[T : T + B], paired))
        return new

    buf = _run_steps(T, step_body, buf, unroll)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = buf[k][T : T + B]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call(ny, nx, block, depth, w1a, w2a, omega, interpret, dtype_name,
               paired=True, dev=None, rowforce=False, unroll=1):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    T = depth
    tile = _sublane_tile(dtype)
    mask_rows = block + 2 * T + (-(block + 2 * T)) % tile
    kern = functools.partial(
        _kernel, block=block, nblk=nblk, depth=T, nx=nx,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev, rowforce=rowforce, unroll=unroll,
    )
    return BC.creep_call(
        kern,
        BC.fullrow_specs(ny, nx, block, T, mask_rows, dtype),
        # 2 live W-row f32 buffer generations + double-buffered io.
        vmem_limit=2 * (9 * (block + 2 * depth) * nx * 4)
        + 4 * (9 * block * nx * dtype.itemsize)
        + 16 * 1024 * 1024,
        interpret=interpret,
    )


def step_band(cells, nob_ext_arr, owner, density, accel, omega, block, depth,
              *, interpret=False, paired=None, dev=None, rowforce=None,
              unroll=None):
    """Advance T timesteps in one pass. Returns (new_cells, sums tuple)."""
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
        rowforce=rowforce_default() if rowforce is None else rowforce,
        unroll=unroll_default() if unroll is None else unroll,
    )
    out, sums = call(cells, cells, cells, nob_ext_arr, owner)
    return out, tuple(jnp.sum(sums[:, s]) for s in range(depth))


def run_band(cells, nobst, density, accel, omega, n_iters, block, depth,
             *, panel=None, halo=128, interpret=False, paired=None, dev=None,
             rowforce=None, unroll=None):
    """Run ``n_iters`` steps, T per pass; trailing ``n_iters % T`` steps use
    the single-step block kernel. Same contract as run_temporal/run_deep.
    ``panel`` (columns per x-panel) selects the panel variant for widths
    whose full-row configs exceed VMEM."""
    _, ny, nx = cells.shape
    T = depth
    if panel is not None:
        if not band_panel_supported(ny, nx, block, T, panel, halo,
                                    cells.dtype):
            raise ValueError(
                f"panel band kernel unsupported: grid {ny}x{nx}, block "
                f"{block}, depth {T}, panel {panel}, halo {halo}, "
                f"dtype {cells.dtype.name}"
            )
        nob_ext_arr = nobst_ext_panel(nobst, block, T, panel, halo,
                                      cells.dtype)
    elif not band_supported(ny, nx, block, T, cells.dtype):
        raise ValueError(
            f"band kernel unsupported: grid {ny}x{nx}, block {block}, "
            f"depth {T}, dtype {cells.dtype.name}"
        )
    else:
        nob_ext_arr = nobst_ext(nobst, block, T, cells.dtype)
    owner = jnp.ones((1, 1), jnp.float32)
    if paired is None:
        paired = paired_default()
    if rowforce is None:
        rowforce = rowforce_default()
    if unroll is None:
        unroll = unroll_default()

    if panel is not None:
        def step_call(cells):
            return step_band_panel(
                cells, nob_ext_arr, owner, density, accel, omega, block, T,
                panel, halo, interpret=interpret, paired=paired, dev=dev,
                rowforce=rowforce, unroll=unroll,
            )
    else:
        def step_call(cells):
            return step_band(
                cells, nob_ext_arr, owner, density, accel, omega, block, T,
                interpret=interpret, paired=paired, dev=dev,
                rowforce=rowforce, unroll=unroll,
            )

    return BC.run_creep(cells, nobst, density, accel, omega, n_iters, T,
                        step_call, interpret=interpret, paired=paired,
                        dev=dev)


# --- Panel variant: x-split for widths whose full-row band configs -----------
# exceed VMEM (8192-wide f32 and beyond). Rows are processed in panels of
# P columns with an H-column halo on each side, assembled with the row
# halos into a (B+2T, P+2H) buffer. The garbage-creep argument extends to
# x unchanged: the x-rolls wrap the BUFFER (wrong data at the panel
# edges), garbage creeps inward one column per step, and after T <= H
# steps the central P columns are still computed from genuine data. The
# global x-periodic boundary costs nothing: panel 0's west halo is the
# last H columns of the row (modulo col-strip index map), exactly like
# the y wrap. Redundant compute (B+2T)/B * (P+2H)/P.


def band_panel_supported(ny: int, nx: int, block: int, depth: int,
                         panel: int, halo: int = 128,
                         dtype=jnp.float32) -> bool:
    del dtype
    return (
        panel % 128 == 0
        and halo % 128 == 0
        and nx % panel == 0
        and panel % halo == 0      # col-strip index maps need H | P
        and depth <= halo          # garbage creep must not cross the halo
        and depth % 8 == 0
        and depth >= 8
        and block % depth == 0
        and ny % block == 0
        and depth <= ny - 2
    )


def _kernel_panel(c_ref, n_ref, s_ref, w_ref, e_ref,
                  nw_ref, ne_ref, sw_ref, se_ref, nobst_ref, owner_ref,
                  out_ref, sums_ref,
                  *, block: int, nblk: int, depth: int, panel: int,
                  halo: int, w1a: float, w2a: float, omega: float,
                  out_dtype, paired: bool = True, dev=None,
                  rowforce: bool = False, unroll: int = 1):
    i = pl.program_id(0)
    j = pl.program_id(1)
    B, T, P, H = block, depth, panel, halo
    W = B + 2 * T
    WX = P + 2 * H

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, WX - 1, 1)

    def up_roll(p):
        return pltpu.roll(p, 1, 0)

    def down_roll(p):
        return pltpu.roll(p, W - 1, 0)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    nob_mid = nob_all[T : T + B, H : H + P]
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)
    nob_force_owner = nob_all[B + T - 2 : B + T - 1]
    nob_force_first = nob_all[T - 2 : T - 1]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    sel_owner = (rows_iota == B + T - 2).astype(jnp.float32)
    sel_first = (rows_iota == T - 2).astype(jnp.float32)
    force = _make_force(w1a, w2a, rowforce)

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    def row(top, mid, bot, k):
        return jnp.concatenate(
            [load(top[k], k), load(mid[k], k), load(bot[k], k)], axis=1
        )

    buf = tuple(
        jnp.concatenate(
            [
                row(nw_ref, n_ref, ne_ref, k),
                row(w_ref, c_ref, e_ref, k),
                row(sw_ref, s_ref, se_ref, k),
            ],
            axis=0,
        )
        for k in range(9)
    )

    def step_body(s, buf):
        buf = force(buf, sel_owner, nob_force_owner, gate_last, B + T - 2)
        buf = force(buf, sel_first, nob_force_first, gate_first, T - 2)

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
        sums_ref[i, j, s] = av_total(
            av_fold(None, nob_mid, usq[T : T + B, H : H + P], paired)
        )
        return new

    buf = _run_steps(T, step_body, buf, unroll)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = buf[k][T : T + B, H : H + P]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


def nobst_ext_panel(nobst, block, depth, panel, halo, dtype=jnp.float32):
    """(nblk*(B+2T+pad), npan*(P+2H)) stacked per-(i,j) extended masks —
    BlockSpec (B+2T+pad, P+2H) @ (i, j) slices block (i, j)'s."""
    from lbm_tpu.ops.pallas_temporal import circ_slice

    ny, nx = nobst.shape
    nblk, npan = ny // block, nx // panel
    T, H = depth, halo
    tile = _sublane_tile(dtype)
    pad = (-(block + 2 * T)) % tile
    col_blocks = []
    for jp in range(npan):
        cols = circ_slice(nobst, jp * panel - H, panel + 2 * H, axis=1)
        rows = []
        for ib in range(nblk):
            rows.append(
                circ_slice(cols, ib * block - T, block + 2 * T).astype(dtype)
            )
            if pad:
                rows.append(jnp.zeros((pad, panel + 2 * H), dtype))
        col_blocks.append(jnp.concatenate(rows, axis=0))
    return jnp.concatenate(col_blocks, axis=1)


@functools.lru_cache(maxsize=None)
def _make_call_panel(ny, nx, block, depth, panel, halo, w1a, w2a, omega,
                     interpret, dtype_name, paired=True, dev=None,
                     rowforce=False, unroll=1):
    dtype = jnp.dtype(dtype_name)
    nblk, npan = ny // block, nx // panel
    T, H, P = depth, halo, panel
    tile = _sublane_tile(dtype)
    mask_rows = block + 2 * T + (-(block + 2 * T)) % tile
    kern = functools.partial(
        _kernel_panel, block=block, nblk=nblk, depth=T, panel=P, halo=H,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev, rowforce=rowforce, unroll=unroll,
    )

    return BC.creep_call(
        kern,
        BC.panel_specs(ny, nx, block, T, P, H, mask_rows, dtype),
        vmem_limit=2 * (9 * (block + 2 * T) * (P + 2 * H) * 4)
        + 2 * 9 * ((block + 2 * T) * (P + 2 * H) + block * P)
        * dtype.itemsize
        + 16 * 1024 * 1024,
        interpret=interpret,
    )


def step_band_panel(cells, nob_ext_arr, owner, density, accel, omega,
                    block, depth, panel, halo=128,
                    *, interpret=False, paired=None, dev=None,
                    rowforce=None, unroll=None):
    """Advance T timesteps in one panelled pass."""
    _, ny, nx = cells.shape
    call = _make_call_panel(
        ny, nx, block, depth, panel, halo,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev,
        rowforce=rowforce_default() if rowforce is None else rowforce,
        unroll=unroll_default() if unroll is None else unroll,
    )
    out, sums = call(*([cells] * 9), nob_ext_arr, owner)
    return out, tuple(jnp.sum(sums[:, :, s]) for s in range(depth))


# --- Sharded-local variant: the band schedule as a per-shard step ------------
# (parallel/sharded.py make_sharded_band_step). The shard holds `rows`
# contiguous global rows starting at r0 = shard_index * rows; its T-row
# top/bottom halos arrive by ppermute each pass, so — unlike the full-grid
# kernel — every buffer edge row is GENUINE data and garbage creeps only
# from the buffer boundary itself. One ppermute pair per T steps replaces
# the single-step kernel's per-step 3-row exchange: T x fewer ICI
# collectives (communication-avoiding stencil scheme, TPU-first design).
#
# Forcing: the accelerate row (global ny-2, d2q9-bgk.c:252) may land
# anywhere in a shard's buffer (including the wrapped halo), so instead of
# the full-grid kernel's two static selectors, the selector compares the
# buffer rows' GLOBAL indices — (r0 + i*B - T + w) mod ny — against ny-2;
# r0 rides in as an SMEM scalar. The guard is evaluated elementwise and
# masked by the selector (identical result on the selected row).


def _kernel_sharded(c_ref, n_ref, s_ref, nobst_ref, r0_ref, out_ref, sums_ref,
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
    nob_mid = nob_all[T : T + B]
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
            [load(n_ref[k], k), load(c_ref[k], k), load(s_ref[k], k)],
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
        sums_ref[i, s] = av_total(av_fold(None, nob_mid, usq[T : T + B], paired))
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


def nobst_ext_local(nob_padded, block, depth, dtype=jnp.float32):
    """Per-block stacked extended masks from an already-halo-exchanged
    (rows + 2T, nx) local mask (genuine neighbor rows at both ends)."""
    T = depth
    rows = nob_padded.shape[0] - 2 * T
    nblk = rows // block
    tile = _sublane_tile(dtype)
    pad = (-(block + 2 * T)) % tile
    pieces = []
    for i in range(nblk):
        pieces.append(
            nob_padded[i * block : i * block + block + 2 * T].astype(dtype)
        )
        if pad:
            pieces.append(
                jnp.zeros((pad, nob_padded.shape[1]), dtype)
            )
    return jnp.concatenate(pieces, axis=0)


@functools.lru_cache(maxsize=None)
def _make_call_sharded(rows, nx, ny_global, block, depth, w1a, w2a, omega,
                       interpret, dtype_name, paired=True, dev=None):
    dtype = jnp.dtype(dtype_name)
    nblk = rows // block
    T = depth
    tile = _sublane_tile(dtype)
    mask_rows = block + 2 * T + (-(block + 2 * T)) % tile
    kern = functools.partial(
        _kernel_sharded, block=block, depth=T, ny=ny_global, nx=nx,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev,
    )
    return BC.creep_call(
        kern,
        BC.fullrow_specs(rows, nx, block, T, mask_rows, dtype, wrap=False),
        vmem_limit=2 * (9 * (block + 2 * depth) * nx * 4)
        + 4 * (9 * block * nx * dtype.itemsize)
        + 16 * 1024 * 1024,
        interpret=interpret,
    )


def step_band_sharded(cells, n_compact, s_compact, nob_ext_arr, r0,
                      density, accel, omega, block, depth, ny_global,
                      *, interpret=False, paired=None, dev=None):
    """Advance T timesteps on one shard's rows in a single fused pass.

    ``n_compact``/``s_compact`` are the per-block T-row neighbor strips
    (block i's rows come from the previous/next block or, at the shard
    edges, the ppermuted halos); ``r0`` is the shard's global starting row
    as a (1, 1) int32. Returns (new_cells, (T,) per-step LOCAL partial
    sums) — the caller psums across the mesh axis."""
    _, rows, nx = cells.shape
    call = _make_call_sharded(
        rows, nx, ny_global, block, depth,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev,
    )
    out, sums = call(cells, n_compact, s_compact, nob_ext_arr, r0)
    return out, jnp.sum(sums, axis=0)


# --- Sharded panel variant: x-split sharded-local band step ------------------
# For shard widths whose full-row sharded buffer exceeds VMEM (8192-wide
# and beyond — the BASELINE weak-scaling config). Combines the panel
# kernel's (B+2T, P+2H) 3x3 buffer assembly (x halos are LOCAL column
# strips: the mesh is 1-D over rows, so the x-periodic wrap never leaves
# the shard) with the sharded kernel's genuine ppermuted T-row y-halos
# and global-row forcing selector. Garbage creeps only in x (from the
# panel halo edge); y edges are genuine data, exactly like the full-row
# sharded kernel.


def nobst_ext_local_panel(nob_padded, block, depth, panel, halo,
                          dtype=jnp.float32):
    """Per-(block, panel) stacked extended masks from an already
    halo-exchanged (rows + 2T, nx) local mask — the panel analogue of
    ``nobst_ext_local`` (rows genuine at both ends, columns wrap)."""
    from lbm_tpu.ops.pallas_temporal import circ_slice

    T, H = depth, halo
    rows = nob_padded.shape[0] - 2 * T
    nx = nob_padded.shape[1]
    nblk = rows // block
    tile = _sublane_tile(dtype)
    pad = (-(block + 2 * T)) % tile
    col_blocks = []
    for jp in range(nx // panel):
        cols = circ_slice(nob_padded, jp * panel - H, panel + 2 * H, axis=1)
        pieces = []
        for i in range(nblk):
            pieces.append(
                cols[i * block : i * block + block + 2 * T].astype(dtype)
            )
            if pad:
                pieces.append(jnp.zeros((pad, panel + 2 * H), dtype))
        col_blocks.append(jnp.concatenate(pieces, axis=0))
    return jnp.concatenate(col_blocks, axis=1)


def _kernel_sharded_panel(c_ref, n_ref, s_ref, w_ref, e_ref,
                          nw_ref, ne_ref, sw_ref, se_ref,
                          nobst_ref, r0_ref, out_ref, sums_ref,
                          *, block: int, depth: int, panel: int, halo: int,
                          ny: int, w1a: float, w2a: float, omega: float,
                          out_dtype, paired: bool = True, dev=None):
    i = pl.program_id(0)
    j = pl.program_id(1)
    B, T, P, H = block, depth, panel, halo
    W = B + 2 * T
    WX = P + 2 * H

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, WX - 1, 1)

    def up_roll(p):
        return pltpu.roll(p, 1, 0)

    def down_roll(p):
        return pltpu.roll(p, W - 1, 0)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    nob_mid = nob_all[T : T + B, H : H + P]
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

    def row(top, mid, bot, k):
        return jnp.concatenate(
            [load(top[k], k), load(mid[k], k), load(bot[k], k)], axis=1
        )

    buf = tuple(
        jnp.concatenate(
            [
                row(nw_ref, n_ref, ne_ref, k),
                row(w_ref, c_ref, e_ref, k),
                row(sw_ref, s_ref, se_ref, k),
            ],
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
        sums_ref[i, j, s] = av_total(
            av_fold(None, nob_mid, usq[T : T + B, H : H + P], paired)
        )
        return new

    buf = jax.lax.fori_loop(0, T, step_body, buf)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = buf[k][T : T + B, H : H + P]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call_sharded_panel(rows, nx, ny_global, block, depth, panel, halo,
                             w1a, w2a, omega, interpret, dtype_name,
                             paired=True, dev=None):
    dtype = jnp.dtype(dtype_name)
    T, H, P = depth, halo, panel
    tile = _sublane_tile(dtype)
    mask_rows = block + 2 * T + (-(block + 2 * T)) % tile
    kern = functools.partial(
        _kernel_sharded_panel, block=block, depth=T, panel=P, halo=H,
        ny=ny_global, w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype,
        paired=paired, dev=dev,
    )
    return BC.creep_call(
        kern,
        BC.panel_specs(rows, nx, block, T, P, H, mask_rows, dtype,
                       wrap_rows=False),
        vmem_limit=2 * (9 * (block + 2 * T) * (P + 2 * H) * 4)
        + 2 * 9 * ((block + 2 * T) * (P + 2 * H) + block * P)
        * dtype.itemsize
        + 16 * 1024 * 1024,
        interpret=interpret,
    )


def step_band_sharded_panel(cells, n_compact, s_compact, nob_ext_arr, r0,
                            density, accel, omega, block, depth, panel,
                            ny_global, halo=128,
                            *, interpret=False, paired=None, dev=None):
    """Advance T timesteps on one shard's rows in a single panelled pass.

    Same contract as ``step_band_sharded`` (compact T-row neighbor strips,
    r0 SMEM scalar, (T,) local partial sums) with the x axis processed in
    P-column panels; the w/e/corner views are column strips of the SAME
    local arrays (x never leaves the shard on a 1-D row mesh)."""
    _, rows, nx = cells.shape
    call = _make_call_sharded_panel(
        rows, nx, ny_global, block, depth, panel, halo,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev,
    )
    out, sums = call(cells, n_compact, s_compact, cells, cells,
                     n_compact, n_compact, s_compact, s_compact,
                     nob_ext_arr, r0)
    return out, jnp.sum(sums, axis=(0, 1))


def pick_config(ny: int, nx: int, dtype=jnp.float32) -> tuple[int, int] | None:
    """(block, depth) for the band kernel, or None: the MINIMUM-redundancy
    ``(B+2T)/B`` config over T in {32, 16}, B in {4T..8T} that fits the
    VMEM budget, ties toward deeper T. Probed twice: at 2048^2 f32,
    (128,16) red 1.25 beats the old deepest-T pick (128,32) red 1.5 by
    +6.4% (bench_r3_latency.json) and +4.8% (bench_r3_pick1536.json);
    at 1536^2 the policy's (128,16) ties the old (192,32) red 1.333
    (-1.2%, within session noise) — the simple rule is kept.
    ``LBM_BAND_BLOCK`` / ``LBM_BAND_DEPTH`` override for sweeps."""
    if nx % 128 != 0:
        return None
    if os.environ.get("LBM_BAND_PANEL"):
        # Panel explicitly requested: the full-row picker must defer, or
        # band_config routes an LBM_BAND_BLOCK/DEPTH override pair to a
        # full-row config that ignores the panel knob. (This exact bug
        # invalidated the bench_r3_panelwidths + panel8192 "panel shape
        # fails" probes — they compiled 147-245 MB FULL-ROW configs.)
        return None
    ov_b = os.environ.get("LBM_BAND_BLOCK")
    ov_t = os.environ.get("LBM_BAND_DEPTH")
    if ov_b and ov_t:
        b, t = int(ov_b), int(ov_t)
        return (b, t) if band_supported(ny, nx, b, t, dtype) else None
    itemsize = jnp.dtype(dtype).itemsize
    # Relay-toolchain compile ceiling for this kernel shape: 67.5 MB
    # estimates compile and run (1536^2 B192/T32), 78.8 MB fails with the
    # HTTP-500 helper error (5120^2 B64/T16, bench_r3_bandpicks.json).
    # 70 MB keeps every TPU-validated pick and rejects the failing band.
    budget = 70 * 1024 * 1024
    best = None
    best_key = None
    for t in (32, 16):
        for mult in (8, 6, 4):
            b = t * mult
            if not band_supported(ny, nx, b, t, dtype):
                continue
            vmem = (2 * 9 * (b + 2 * t) * nx * 4) + (4 * 9 * b * nx * itemsize)
            if vmem > budget:
                continue
            key = ((b + 2 * t) / b, -t)
            if best_key is None or key < best_key:
                best, best_key = (b, t), key
    return best


def pick_config_panel(ny: int, nx: int, dtype=jnp.float32,
                      halo: int = 128,
                      t16_special: bool = True) -> tuple[int, int, int] | None:
    """(block, depth, panel) for the panel variant, or None. Enumerates
    fitting configs and picks the lowest redundant-compute ratio
    ``(1 + 2T/B)(1 + 2H/P)`` — the regime this kernel serves is
    compute-bound (BENCHMARKS.md round-3 roofline), so redundancy, not
    traffic, sets the rate; ties break toward deeper T (less traffic).
    ``LBM_BAND_BLOCK`` / ``LBM_BAND_DEPTH`` / ``LBM_BAND_PANEL``
    override for sweeps. ``t16_special=False`` disables the 8192^2 T16
    shortcut — the SHARDED panel kernels are compile-probed at T8 only
    (probe_band2_sharded_compile.py), so their pickers must not claim the
    full-grid-kernel-validated T16 shape (ADVICE r3)."""
    ov_b = os.environ.get("LBM_BAND_BLOCK")
    ov_t = os.environ.get("LBM_BAND_DEPTH")
    ov_p = os.environ.get("LBM_BAND_PANEL")
    if ov_b and ov_t and ov_p:
        b, t, p = int(ov_b), int(ov_t), int(ov_p)
        ok = band_panel_supported(ny, nx, b, t, p, halo, dtype)
        return (b, t, p) if ok else None
    itemsize = jnp.dtype(dtype).itemsize
    budget = 80 * 1024 * 1024
    best = None
    best_key = None
    panels = (int(ov_p),) if ov_p else (4096, 2048, 1024)
    # T=8 default; T=16 only at the TPU-validated shape. (128, 16, 2048)
    # at 8192^2 compiles (bench_r3_panelwidths2.json) and BEATS T8 by a
    # consistent +2.8% (bench_r3_bigblock.json: 13,602 vs 13,226, all
    # brackets + warmup) — the deeper pass halves the per-pass fixed work
    # and its extra redundancy (1.25 vs 1.125) costs less in this
    # VPU-bound regime. Other widths' T16 panel compiles are UNPROBED on
    # this toolchain, so they stay T8 (validated-sizes invariant;
    # override triple for sweeps).
    if (
        t16_special
        and (ny, nx) == (8192, 8192)
        and not ov_p
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)  # c16 T16 unprobed
        and band_panel_supported(ny, nx, 128, 16, 2048, halo, dtype)
    ):
        return (128, 16, 2048)
    for t in (8,):
        for mult in (16, 12, 8, 6, 4):
            b = t * mult
            for p in panels:
                if p >= nx:  # full-width configs are plain pick_config's job
                    continue
                if not band_panel_supported(ny, nx, b, t, p, halo, dtype):
                    continue
                w, wx = b + 2 * t, p + 2 * halo
                vmem = (2 * 9 * w * wx * 4
                        + 2 * 9 * (w * wx + b * p) * itemsize)
                if vmem > budget:
                    continue
                red = (w / b) * (wx / p)
                key = (red, -t)
                if best_key is None or key < best_key:
                    best, best_key = (b, t, p), key
    return best
