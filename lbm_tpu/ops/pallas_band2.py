"""Ref-resident band kernel: the band schedule with the resident kernel's
step structure.

Same-size A/Bs isolate a 1.6x per-buffer-cell gap between the VMEM-resident
kernels (~24k MLUPS, ops/pallas_resident.py / pallas_aa.py) and the band
kernel (~14.6k, ops/pallas_band.py) that none of traffic, redundancy, row
width, or invocation count explain (bench_r3_crossover.json; DESIGN.md
roofline addendum). The structural differences are in the T-step loop body:

  band:      carries 9 whole (W, nx) planes as ``lax.fori_loop`` VALUES,
             shifts by whole-plane ``pltpu.roll``, applies forcing as
             full-buffer masked FMAs on 6 planes (x2 occurrences).
  resident:  state lives in MUTABLE VMEM REFS (ping-pong windows), shifts
             are absorbed into tile-slice OFFSETS (plus one boundary row
             concat), forcing touches only the forcing row.

This kernel replays the band garbage-creep schedule (load W = B + 2T rows,
advance T steps in-kernel, store the central B rows; garbage creeps one row
per step inward from the buffer edges and never reaches the middle —
pallas_band.py:173's argument verbatim) with the resident body: two VMEM
scratch buffers ping-ponged by a ``fori_loop`` over T/2 double-steps,
row-tiled slice pulls, and 1-row read-modify-write forcing at the two
STATIC buffer rows where the accelerate row ny-2 can appear (mid row
B+T-2 of the last block, top-margin row T-2 of block 0 — gated by
program_id exactly like pallas_band.py:199-205).

Physics per step is the shared paired collision (ops/collision.py).
Reference semantics: kernels.cl:7-42 (forcing), 44-201 (fused step);
normalization d2q9-bgk.c:146-152. Storage: f32/bf16/c16 (dev codec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops import band_common as BC
from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default
from lbm_tpu.ops.pallas_band import band_supported, nobst_ext
from lbm_tpu.ops.pallas_temporal import _sublane_tile

_CYS, _CXS, _OPP, _FORCE = BC.CYS, BC.CXS, BC.OPP, BC.FORCE


def band2_supported(ny: int, nx: int, block: int, depth: int,
                    dtype=jnp.float32) -> bool:
    # depth must be even for the ping-pong to end in buffer A; block >= 2T
    # keeps the forcing row's appearances at exactly the two static
    # positions handled below (same implicit assumption as pallas_band).
    return (
        band_supported(ny, nx, block, depth, dtype)
        and depth % 2 == 0
        and block >= 2 * depth
    )


def _tilew_env() -> str | None:
    """The LBM_BAND2_TILEW override, read by the step wrappers OUTSIDE the
    lru-cached builders so a changed env value is a new cache key (the
    same env-knob-outside-the-trace rule as every other LBM_* knob)."""
    import os

    return os.environ.get("LBM_BAND2_TILEW") or None


def _pick_tile_w(W: int, nx: int, override: str | None = None) -> int:
    """Rows per step-tile: keep ~15 live tile-planes within ~12 MB.
    ``override`` (from ``LBM_BAND2_TILEW``, via ``_tilew_env``) pins the
    height for scheduling sweeps (must divide the buffer height W and be
    a multiple of 8)."""
    if override:
        t = int(override)
        if t < 8 or t % 8 or W % t:
            raise ValueError(
                f"LBM_BAND2_TILEW={override}: tile must be a multiple of 8 "
                f"that divides the buffer height W={W}"
            )
        return t
    max_rows = max(8, (12 * 1024 * 1024) // (15 * nx * 4) // 8 * 8)
    t = min(W, max_rows)
    while W % t:
        t -= 8
    return max(t, 8)


def _kernel2(cells_ref, top_ref, bot_ref, nobst_ref, owner_ref,
             out_ref, sums_ref, a_ref, b_ref,
             *, block: int, nblk: int, depth: int, nx: int, tile_w: int,
             w1a: float, w2a: float, omega: float, out_dtype,
             paired: bool = True, dev=None, probe: str = "",
             dirty=None):
    # ``probe`` tokens (scripts/probe_band2_body.py only — never
    # driver-reachable). Attribution (PHYSICS-WRONG, the
    # bench_r4_aasmall methodology applied to the HBM-regime residue,
    # VERDICT r4 weak #1): "noforce" skips the forcing rows, "noav" the
    # per-tile |u| fold, "noshift" replaces every pull with the
    # unshifted mid slice, "nowhere" skips the obstacle select,
    # "nocollide" stores the pulled planes unrelaxed (stream-only
    # floor; implies noav). Real-physics levers (VERDICT r4 item 1):
    # "pipe2" interleaves two step-tiles' collide chains at trace time
    # (collision.bgk_relax_interleaved — bit-identical per lane),
    # "mxumom" contracts the moments on the idle MXU
    # (collision.bgk_relax_mxumom).
    probe_noforce = "noforce" in probe
    probe_noav = ("noav" in probe) or ("nocollide" in probe)
    probe_noshift = "noshift" in probe
    probe_nowhere = "nowhere" in probe
    probe_nocollide = "nocollide" in probe
    probe_pipe2 = "pipe2" in probe
    probe_mxumom = "mxumom" in probe
    i = pl.program_id(0)
    B, T = block, depth
    W = B + 2 * T
    wgt = {1: w1a, 2: w2a}

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    for k in range(9):
        a_ref[k, :T] = load(top_ref[k], k)
        a_ref[k, T : T + B] = load(cells_ref[k], k)
        a_ref[k, T + B :] = load(bot_ref[k], k)

    def force_rows(src):
        """In-place accelerate_flow on the (up to) two buffer rows holding
        global row ny-2 — 1-row ops replacing pallas_band's full-buffer
        masked FMAs (the reference mutates cells in place the same way,
        kernels.cl:29-41)."""
        for pos, gate in ((B + T - 2, gate_last), (T - 2, gate_first)):
            s1 = src[1, pos : pos + 1]
            s3 = src[3, pos : pos + 1]
            s5 = src[5, pos : pos + 1]
            s6 = src[6, pos : pos + 1]
            s7 = src[7, pos : pos + 1]
            s8 = src[8, pos : pos + 1]
            ok = (
                (s3 - w1a > 0.0) & (s6 - w2a > 0.0) & (s7 - w2a > 0.0)
            ).astype(jnp.float32)
            am = ok * nob_all[pos : pos + 1] * gate
            vals = {1: s1, 3: s3, 5: s5, 6: s6, 7: s7, 8: s8}
            for k, sign, kind in _FORCE:
                src[k, pos : pos + 1] = vals[k] + sign * wgt[kind] * am

    ntiles = W // tile_w

    def tile_pulls(src, r0):
        def rowm(k, r):
            r = r % W  # buffer wrap: garbage zone only (creep argument)
            return src[k, r : r + 1]

        def pull(k):
            cy, cx = _CYS[k], _CXS[k]
            if probe_noshift:
                return src[k, r0 : r0 + tile_w]
            if cy == 0:
                p = src[k, r0 : r0 + tile_w]
            elif cy == 1:  # t[r] = src[r-1]
                p = jnp.concatenate(
                    [rowm(k, r0 - 1), src[k, r0 : r0 + tile_w - 1]],
                    axis=0,
                )
            else:  # t[r] = src[r+1]
                p = jnp.concatenate(
                    [src[k, r0 + 1 : r0 + tile_w], rowm(k, r0 + tile_w)],
                    axis=0,
                )
            if cx == 1:
                p = east(p)
            elif cx == -1:
                p = west(p)
            return p

        return tuple(pull(k) for k in range(9))

    def tile_relax(t):
        if probe_nocollide:
            return t, None
        if probe_mxumom:
            from lbm_tpu.ops.collision import bgk_relax_mxumom

            return bgk_relax_mxumom(t, omega)
        return bgk_relax(t, omega, paired=paired)

    def tile_finish(dst, r0, t, relaxed, usq, total):
        nob_b = nob_b_all[r0 : r0 + tile_w]
        for k in range(9):
            dst[k, r0 : r0 + tile_w] = (
                relaxed[k]
                if probe_nowhere
                else jnp.where(nob_b, relaxed[k], t[_OPP[k]])
            )
        # Central-band partial only: static intersection of this tile
        # with rows [T, T+B) — edge garbage (incl. 1/rho infinities)
        # never reaches the sums.
        lo, hi = max(r0, T), min(r0 + tile_w, T + B)
        if lo < hi and not probe_noav:
            total = av_fold(
                total, nob_all[lo:hi], usq[lo - r0 : hi - r0], paired
            )
        return total

    def av_partial(nob, usq, lo, hi, r0):
        """One tile's scalar |u| partial (``nob=None`` = unmasked)."""
        return av_total(
            av_fold(None, nob, usq[lo - r0 : hi - r0], paired)
        )

    def one_step(src, dst, s):
        if not probe_noforce:
            force_rows(src)
        if dirty is not None:
            # Clean-tile specialization (bench_r5_b2body.json: the
            # 9-plane obstacle select costs ~6.4% of the step, the
            # mask multiply part of the |u| fold more): ``dirty[j]`` is
            # the STATIC tuple of block indices whose window rows
            # [j*tile_w, (j+1)*tile_w) contain any obstacle, computed
            # from the HOST mask at dispatch time (``dirty_tiles``).
            # Statically-clean tiles compile a select-free store and an
            # unmasked fold; statically-dirty tiles the full path; mixed
            # tiles branch at runtime on the block id (``pl.when`` both
            # ways — each program executes one). The per-step sum
            # accumulates through the SMEM slot (0.0 + part1 + part2 is
            # bit-identical to the value-chain form).
            sums_ref[i, s] = jnp.float32(0.0)

            def store_clean(r0, relaxed):
                for k in range(9):
                    dst[k, r0 : r0 + tile_w] = relaxed[k]

            def store_dirty(r0, t, relaxed):
                nob_b = nob_b_all[r0 : r0 + tile_w]
                for k in range(9):
                    dst[k, r0 : r0 + tile_w] = jnp.where(
                        nob_b, relaxed[k], t[_OPP[k]]
                    )

            for j in range(ntiles):
                r0 = j * tile_w
                t = tile_pulls(src, r0)
                relaxed, usq = bgk_relax(t, omega, paired=paired)
                lo, hi = max(r0, T), min(r0 + tile_w, T + B)
                dl = dirty[j]
                if len(dl) == 0:
                    store_clean(r0, relaxed)
                    if lo < hi:
                        sums_ref[i, s] = sums_ref[i, s] + av_partial(
                            None, usq, lo, hi, r0
                        )
                elif len(dl) == nblk:
                    store_dirty(r0, t, relaxed)
                    if lo < hi:
                        sums_ref[i, s] = sums_ref[i, s] + av_partial(
                            nob_all[lo:hi], usq, lo, hi, r0
                        )
                else:
                    pred = i == dl[0]
                    for bi in dl[1:]:
                        pred = pred | (i == bi)

                    @pl.when(pred)
                    def _(r0=r0, t=t, relaxed=relaxed, usq=usq,
                          lo=lo, hi=hi):
                        store_dirty(r0, t, relaxed)
                        if lo < hi:
                            sums_ref[i, s] = sums_ref[i, s] + av_partial(
                                nob_all[lo:hi], usq, lo, hi, r0
                            )

                    @pl.when(jnp.logical_not(pred))
                    def _(r0=r0, relaxed=relaxed, usq=usq, lo=lo, hi=hi):
                        store_clean(r0, relaxed)
                        if lo < hi:
                            sums_ref[i, s] = sums_ref[i, s] + av_partial(
                                None, usq, lo, hi, r0
                            )
            return
        total = None
        if probe_pipe2:
            from lbm_tpu.ops.collision import bgk_relax_interleaved

            for j0 in range(0, ntiles, 2):
                r0s = [jj * tile_w for jj in range(j0, min(j0 + 2, ntiles))]
                ts = [tile_pulls(src, r0) for r0 in r0s]
                outs = bgk_relax_interleaved(ts, omega)
                for r0, t, (relaxed, usq) in zip(r0s, ts, outs):
                    total = tile_finish(dst, r0, t, relaxed, usq, total)
        else:
            for j in range(ntiles):
                r0 = j * tile_w
                t = tile_pulls(src, r0)
                relaxed, usq = tile_relax(t)
                total = tile_finish(dst, r0, t, relaxed, usq, total)
        sums_ref[i, s] = av_total(total)

    def two_steps(h, carry):
        one_step(a_ref, b_ref, 2 * h)
        one_step(b_ref, a_ref, 2 * h + 1)
        return carry

    jax.lax.fori_loop(0, T // 2, two_steps, 0)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = a_ref[k, T : T + B]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call2(ny, nx, block, depth, w1a, w2a, omega, interpret, dtype_name,
                paired=True, dev=None, tilew=None, probe="", dirty=None):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    T = depth
    W = block + 2 * T
    tile = _sublane_tile(dtype)
    mask_rows = W + (-W) % tile
    tile_w = _pick_tile_w(W, nx, tilew)
    assert not (probe and dirty), "probe variants run without clean-tiles"
    kern = functools.partial(
        _kernel2, block=block, nblk=nblk, depth=T, nx=nx, tile_w=tile_w,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev, probe=probe, dirty=dirty,
    )
    return BC.creep_call(
        kern,
        BC.fullrow_specs(ny, nx, block, T, mask_rows, dtype),
        scratch_shapes=[
            pltpu.VMEM((9, W, nx), jnp.float32),
            pltpu.VMEM((9, W, nx), jnp.float32),
        ],
        # 2 scratch generations + double-buffered io + tile temporaries.
        vmem_limit=2 * (9 * W * nx * 4)
        + 4 * (9 * block * nx * dtype.itemsize)
        + 15 * tile_w * nx * 4
        + 20 * 1024 * 1024,
        interpret=interpret,
    )


# --- Panel variant: x-split for widths whose full-row configs exceed ---------
# VMEM (8192-wide f32). Identical to pallas_band.py's panel scheme (P-column
# panels with H-column halos; garbage creeps in x exactly as in y, T <= H
# keeps the central P columns genuine) with the band2 step body. x-shifts
# stay lane rolls — absorbing them into lane-offset slices would break
# 128-lane alignment and force Mosaic relayouts, unlike the free
# sublane-offset y slices.


def band2_panel_supported(ny: int, nx: int, block: int, depth: int,
                          panel: int, halo: int = 128,
                          dtype=jnp.float32) -> bool:
    from lbm_tpu.ops.pallas_band import band_panel_supported

    return (
        band_panel_supported(ny, nx, block, depth, panel, halo, dtype)
        and depth % 2 == 0
        and block >= 2 * depth
    )


def _kernel2_panel(c_ref, n_ref, s_ref, w_ref, e_ref,
                   nw_ref, ne_ref, sw_ref, se_ref, nobst_ref, owner_ref,
                   out_ref, sums_ref, a_ref, b_ref,
                   *, block: int, nblk: int, depth: int, panel: int,
                   halo: int, tile_w: int, w1a: float, w2a: float,
                   omega: float, out_dtype, paired: bool = True, dev=None):
    i = pl.program_id(0)
    j = pl.program_id(1)
    B, T, P, H = block, depth, panel, halo
    W = B + 2 * T
    WX = P + 2 * H
    wgt = {1: w1a, 2: w2a}

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, WX - 1, 1)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    owner = owner_ref[0, 0]
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0) * owner
    gate_first = jnp.where(i == 0, 1.0, 0.0)

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    for k in range(9):
        a_ref[k, :T] = jnp.concatenate(
            [load(nw_ref[k], k), load(n_ref[k], k), load(ne_ref[k], k)],
            axis=1,
        )
        a_ref[k, T : T + B] = jnp.concatenate(
            [load(w_ref[k], k), load(c_ref[k], k), load(e_ref[k], k)],
            axis=1,
        )
        a_ref[k, T + B :] = jnp.concatenate(
            [load(sw_ref[k], k), load(s_ref[k], k), load(se_ref[k], k)],
            axis=1,
        )

    def force_rows(src):
        # Whole-WX-row forcing (the x halos hold genuine copies of row ny-2
        # and must be forced identically — same as the value kernel).
        for pos, gate in ((B + T - 2, gate_last), (T - 2, gate_first)):
            s1 = src[1, pos : pos + 1]
            s3 = src[3, pos : pos + 1]
            s5 = src[5, pos : pos + 1]
            s6 = src[6, pos : pos + 1]
            s7 = src[7, pos : pos + 1]
            s8 = src[8, pos : pos + 1]
            ok = (
                (s3 - w1a > 0.0) & (s6 - w2a > 0.0) & (s7 - w2a > 0.0)
            ).astype(jnp.float32)
            am = ok * nob_all[pos : pos + 1] * gate
            vals = {1: s1, 3: s3, 5: s5, 6: s6, 7: s7, 8: s8}
            for k, sign, kind in _FORCE:
                src[k, pos : pos + 1] = vals[k] + sign * wgt[kind] * am

    ntiles = W // tile_w

    def one_step(src, dst, s):
        force_rows(src)
        total = None
        for jt in range(ntiles):
            r0 = jt * tile_w

            def rowm(k, r):
                r = r % W
                return src[k, r : r + 1]

            def pull(k):
                cy, cx = _CYS[k], _CXS[k]
                if cy == 0:
                    p = src[k, r0 : r0 + tile_w]
                elif cy == 1:
                    p = jnp.concatenate(
                        [rowm(k, r0 - 1), src[k, r0 : r0 + tile_w - 1]],
                        axis=0,
                    )
                else:
                    p = jnp.concatenate(
                        [src[k, r0 + 1 : r0 + tile_w], rowm(k, r0 + tile_w)],
                        axis=0,
                    )
                if cx == 1:
                    p = east(p)
                elif cx == -1:
                    p = west(p)
                return p

            t = tuple(pull(k) for k in range(9))
            relaxed, usq = bgk_relax(t, omega, paired=paired)
            nob_b = nob_b_all[r0 : r0 + tile_w]
            for k in range(9):
                dst[k, r0 : r0 + tile_w] = jnp.where(
                    nob_b, relaxed[k], t[_OPP[k]]
                )
            lo, hi = max(r0, T), min(r0 + tile_w, T + B)
            if lo < hi:
                total = av_fold(
                    total, nob_all[lo:hi, H : H + P],
                    usq[lo - r0 : hi - r0, H : H + P], paired,
                )
        sums_ref[i, j, s] = av_total(total)

    def two_steps(h, carry):
        one_step(a_ref, b_ref, 2 * h)
        one_step(b_ref, a_ref, 2 * h + 1)
        return carry

    jax.lax.fori_loop(0, T // 2, two_steps, 0)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = a_ref[k, T : T + B, H : H + P]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call2_panel(ny, nx, block, depth, panel, halo, w1a, w2a, omega,
                      interpret, dtype_name, paired=True, dev=None,
                      tilew=None):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    npan = nx // panel
    T, P, H = depth, panel, halo
    W = block + 2 * T
    WX = P + 2 * H
    tile = _sublane_tile(dtype)
    mask_rows = W + (-W) % tile
    tile_w = _pick_tile_w(W, WX, tilew)
    kern = functools.partial(
        _kernel2_panel, block=block, nblk=nblk, depth=T, panel=P, halo=H,
        tile_w=tile_w, w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype,
        paired=paired, dev=dev,
    )

    return BC.creep_call(
        kern,
        BC.panel_specs(ny, nx, block, T, P, H, mask_rows, dtype),
        scratch_shapes=[
            pltpu.VMEM((9, W, WX), jnp.float32),
            pltpu.VMEM((9, W, WX), jnp.float32),
        ],
        vmem_limit=2 * (9 * W * WX * 4)
        + 4 * (9 * block * P * dtype.itemsize)
        + 15 * tile_w * WX * 4
        + 20 * 1024 * 1024,
        interpret=interpret,
    )


def step_band2_panel(cells, nob_ext_arr, owner, density, accel, omega,
                     block, depth, panel, halo=128,
                     *, interpret=False, paired=None, dev=None):
    """Advance T timesteps in one panelled pass."""
    _, ny, nx = cells.shape
    call = _make_call2_panel(
        ny, nx, block, depth, panel, halo,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev, tilew=_tilew_env(),
    )
    out, sums = call(*([cells] * 9), nob_ext_arr, owner)
    return out, tuple(jnp.sum(sums[:, :, s]) for s in range(depth))


# --- Sharded-local variant (parallel/sharded.py make_sharded_band_step) ------
# Same contract as pallas_band._kernel_sharded: the shard's T-row halos
# arrive by ppermute (buffer edges are GENUINE data; garbage creeps only
# from the boundary), and the accelerate row may land anywhere, so forcing
# uses the global-row selector (r0 SMEM scalar + program_id). Two
# implementations, selected by ``LBM_SHARD_FORCE`` (resolved outside the
# trace, keys the kernel-build caches):
#
# ``row``: the accelerate row appears AT MOST ONCE in a block's W-row
# window (the window is a contiguous arc of W < ny global rows), at
# buffer row ``pos = (ny-2 - (r0 + i*B - T)) mod ny`` when ``pos < W`` —
# so the forcing is ONE dynamic-row in-place update per step
# (``pl.when(pos < W)`` + ``pl.ds`` ref indexing), the sharded analogue
# of the full-grid kernel's two static 1-row updates.
#
# ``field`` (the round-4 form, the default until the row form is
# TPU-measured): a per-step forcing FIELD — am_all = selector x
# elementwise positivity (3 full-buffer reads + compares), each forced
# plane's pull adding its y-aligned slice of am_all BEFORE the x-roll.
# Costs ~10 full-buffer VPU ops per step for a 1-row effect — a suspect
# term of the round-4 mesh=1 sharding tax (VERDICT r4 weak #3). Both
# match kernels.cl:29-41 per-cell semantics (tests/test_sharded.py).


def _kernel2_sharded(*refs, block: int, depth: int, nblk: int, ny: int,
                     nx: int, tile_w: int, w1a: float, w2a: float,
                     omega: float, out_dtype, paired: bool = True,
                     dev=None, lean: bool = False, rowforce: bool = False):
    """Sharded band2 body. Two protocol levers (VERDICT r4 weak #3, the
    mesh=1 tax decomposition):

    ``lean``: neighbor T-row strips are BlockSpec VIEWS of the local
    ``cells`` array (the single-device ``_make_call2`` index-map trick,
    zero extra HBM materialization) and only the two shard-crossing
    strips arrive as small ppermuted halo arrays (``hdn_ref``/
    ``hup_ref``, fetched once — their index map is constant, so the
    Pallas pipeline skips the re-DMA on every later grid step). The
    legacy protocol instead materializes two (9, nblk*T, nx) compact
    arrays per pass (~75 MB of extra HBM traffic at 2048^2 B128 T16).

    ``rowforce``: accelerate_flow as ONE dynamic-row in-place update at
    buffer row ``pos = (ny-2 - (r0 + i*B - T)) mod ny`` when pos < W —
    the sharded analogue of the full-grid kernel's two static 1-row
    updates — instead of the per-step forcing FIELD (3 full-buffer
    compares + 6 full-buffer FMAs for a 1-row effect).
    """
    if lean:
        (c_ref, n_ref, s_ref, hdn_ref, hup_ref, nobst_ref, r0_ref,
         out_ref, sums_ref, a_ref, b_ref) = refs
    else:
        (c_ref, n_ref, s_ref, nobst_ref, r0_ref,
         out_ref, sums_ref, a_ref, b_ref) = refs
    i = pl.program_id(0)
    B, T = block, depth
    W = B + 2 * T
    wgt = {1: w1a, 2: w2a}

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    r0 = r0_ref[0, 0]
    if rowforce:
        sel_nob = None
        pos = jnp.remainder(
            jnp.int32(ny - 2) - (r0 + i * B - T), jnp.int32(ny)
        )
    else:
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        gl = jnp.remainder(rows_iota + (r0 + i * B - T), ny)
        sel_nob = (gl == ny - 2).astype(jnp.float32) * nob_all

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    if lean:
        first = i == 0
        last = i == nblk - 1
        for k in range(9):
            a_ref[k, :T] = jnp.where(
                first, load(hdn_ref[k], k), load(n_ref[k], k)
            )
            a_ref[k, T : T + B] = load(c_ref[k], k)
            a_ref[k, T + B :] = jnp.where(
                last, load(hup_ref[k], k), load(s_ref[k], k)
            )
    else:
        for k in range(9):
            a_ref[k, :T] = load(n_ref[k], k)
            a_ref[k, T : T + B] = load(c_ref[k], k)
            a_ref[k, T + B :] = load(s_ref[k], k)

    ntiles = W // tile_w
    sign = {1: 1.0, 5: 1.0, 8: 1.0, 3: -1.0, 6: -1.0, 7: -1.0}
    kind = {1: 1, 3: 1, 5: 2, 6: 2, 7: 2, 8: 2}

    def force_row(src):
        """In-place accelerate_flow at the (at most one — the window is a
        contiguous arc of W < ny global rows) buffer row holding global
        row ny-2; the mutate-then-pull order matches the reference
        (kernels.cl:29-41 runs before propagate)."""

        @pl.when(pos < W)
        def _():
            d = pl.ds(pos, 1)
            s1 = src[1, d]
            s3 = src[3, d]
            s5 = src[5, d]
            s6 = src[6, d]
            s7 = src[7, d]
            s8 = src[8, d]
            ok = (
                (s3 - w1a > 0.0) & (s6 - w2a > 0.0) & (s7 - w2a > 0.0)
            ).astype(jnp.float32)
            am = ok * nobst_ref[d].astype(jnp.float32)
            vals = {1: s1, 3: s3, 5: s5, 6: s6, 7: s7, 8: s8}
            for k, sgn, knd in _FORCE:
                src[k, d] = vals[k] + sgn * wgt[knd] * am

    def one_step(src, dst, s):
        if rowforce:
            force_row(src)
            am_all = None
        else:
            ok = (
                (src[3] - w1a > 0.0)
                & (src[6] - w2a > 0.0)
                & (src[7] - w2a > 0.0)
            ).astype(jnp.float32)
            am_all = sel_nob * ok  # (W, nx); nonzero on the forcing rows

        def am_rows(lo, h):
            """am_all rows [lo, lo+h) with buffer wrap (garbage zone)."""
            lo %= W
            if lo + h <= W:
                return am_all[lo : lo + h]
            return jnp.concatenate(
                [am_all[lo:], am_all[: lo + h - W]], axis=0
            )

        total = None
        for jt in range(ntiles):
            r0t = jt * tile_w

            def rowm(k, r):
                r = r % W
                return src[k, r : r + 1]

            def pull(k):
                cy, cx = _CYS[k], _CXS[k]
                if cy == 0:
                    p = src[k, r0t : r0t + tile_w]
                elif cy == 1:
                    p = jnp.concatenate(
                        [rowm(k, r0t - 1), src[k, r0t : r0t + tile_w - 1]],
                        axis=0,
                    )
                else:
                    p = jnp.concatenate(
                        [src[k, r0t + 1 : r0t + tile_w],
                         rowm(k, r0t + tile_w)],
                        axis=0,
                    )
                if k in sign and not rowforce:
                    # forcing delta, y-aligned to the source rows
                    p = p + sign[k] * wgt[kind[k]] * am_rows(r0t - cy, tile_w)
                if cx == 1:
                    p = east(p)
                elif cx == -1:
                    p = west(p)
                return p

            t = tuple(pull(k) for k in range(9))
            relaxed, usq = bgk_relax(t, omega, paired=paired)
            nob_b = nob_b_all[r0t : r0t + tile_w]
            for k in range(9):
                dst[k, r0t : r0t + tile_w] = jnp.where(
                    nob_b, relaxed[k], t[_OPP[k]]
                )
            lo, hi = max(r0t, T), min(r0t + tile_w, T + B)
            if lo < hi:
                total = av_fold(
                    total, nob_all[lo:hi], usq[lo - r0t : hi - r0t], paired
                )
        sums_ref[i, s] = av_total(total)

    def two_steps(h, carry):
        one_step(a_ref, b_ref, 2 * h)
        one_step(b_ref, a_ref, 2 * h + 1)
        return carry

    jax.lax.fori_loop(0, T // 2, two_steps, 0)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = a_ref[k, T : T + B]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call2_sharded(rows, nx, ny_global, block, depth, w1a, w2a, omega,
                        interpret, dtype_name, paired=True, dev=None,
                        tilew=None, lean=True, rowforce=False):
    dtype = jnp.dtype(dtype_name)
    nblk = rows // block
    T = depth
    W = block + 2 * T
    tile = _sublane_tile(dtype)
    mask_rows = W + (-W) % tile
    tile_w = _pick_tile_w(W, nx, tilew)
    kern = functools.partial(
        _kernel2_sharded, block=block, depth=T, nblk=nblk, ny=ny_global,
        nx=nx, tile_w=tile_w, w1a=w1a, w2a=w2a, omega=omega,
        out_dtype=dtype, paired=paired, dev=dev, lean=lean,
        rowforce=rowforce,
    )
    # lean: neighbor strips are views of the local cells array (the
    # single-device index maps, local wrap — edge content is garbage and
    # unread) + the two constant-map shard-halo inputs, fetched once.
    halo_vmem = 4 * (9 * T * nx * dtype.itemsize) if lean else 0
    return BC.creep_call(
        kern,
        BC.fullrow_specs(rows, nx, block, T, mask_rows, dtype,
                         wrap=lean, halo_inputs=lean),
        scratch_shapes=[
            pltpu.VMEM((9, W, nx), jnp.float32),
            pltpu.VMEM((9, W, nx), jnp.float32),
        ],
        vmem_limit=2 * (9 * W * nx * 4)
        + 4 * (9 * block * nx * dtype.itemsize)
        + 15 * tile_w * nx * 4
        + halo_vmem
        + 20 * 1024 * 1024,
        interpret=interpret,
    )


def step_band2_sharded(cells, halo_dn, halo_up, nob_ext_arr, r0,
                       density, accel, omega, block, depth, ny_global,
                       *, interpret=False, paired=None, dev=None,
                       lean=True, rowforce=False):
    """Advance the local shard T timesteps (band2 body).

    With ``lean`` (the default; VERDICT r4 item 2), ``halo_dn``/
    ``halo_up`` are the raw (9, T, nx) ppermuted shard halos — interior
    neighbor strips are read straight from ``cells`` by BlockSpec index
    maps, so nothing is materialized. With ``lean=False`` (the legacy
    protocol, kept for the tax A/B) they are the (9, nblk*T, nx)
    compact neighbor-strip arrays of pallas_band.step_band_sharded.
    ``rowforce`` selects the 1-dynamic-row forcing form over the
    per-step forcing field (see ``_kernel2_sharded``)."""
    _, rows, nx = cells.shape
    call = _make_call2_sharded(
        rows, nx, ny_global, block, depth,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev, tilew=_tilew_env(), lean=bool(lean),
        rowforce=bool(rowforce),
    )
    if lean:
        out, sums = call(cells, cells, cells, halo_dn, halo_up,
                         nob_ext_arr, r0)
    else:
        out, sums = call(cells, halo_dn, halo_up, nob_ext_arr, r0)
    return out, jnp.sum(sums, axis=0)  # (T,) per-step local partials


def _kernel2_sharded_panel(c_ref, n_ref, s_ref, w_ref, e_ref,
                           nw_ref, ne_ref, sw_ref, se_ref,
                           nobst_ref, r0_ref, out_ref, sums_ref,
                           a_ref, b_ref,
                           *, block: int, depth: int, panel: int, halo: int,
                           ny: int, tile_w: int, w1a: float, w2a: float,
                           omega: float, out_dtype, paired: bool = True,
                           dev=None):
    """The sharded band2 body on the x-split panel schedule: the panel
    kernel's 9-view buffer assembly and [H, H+P) sums window
    (``_kernel2_panel``) with the sharded kernel's dynamic forcing field
    (``_kernel2_sharded``'s r0 selector + y-aligned am slices in the
    pulls). x halos are column strips of the SAME local arrays — x never
    leaves the shard on the 1-D row mesh."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    B, T, P, H = block, depth, panel, halo
    W = B + 2 * T
    WX = P + 2 * H
    wgt = {1: w1a, 2: w2a}

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, WX - 1, 1)

    nob_all = nobst_ref[...][:W].astype(jnp.float32)
    nob_b_all = nob_all > 0.0
    r0 = r0_ref[0, 0]
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    gl = jnp.remainder(rows_iota + (r0 + i * B - T), ny)
    # The extended mask already holds the x-halo copies of each row, so the
    # selector forces the halo columns identically to the genuine panel.
    sel_nob = (gl == ny - 2).astype(jnp.float32) * nob_all

    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    for k in range(9):
        a_ref[k, :T] = jnp.concatenate(
            [load(nw_ref[k], k), load(n_ref[k], k), load(ne_ref[k], k)],
            axis=1,
        )
        a_ref[k, T : T + B] = jnp.concatenate(
            [load(w_ref[k], k), load(c_ref[k], k), load(e_ref[k], k)],
            axis=1,
        )
        a_ref[k, T + B :] = jnp.concatenate(
            [load(sw_ref[k], k), load(s_ref[k], k), load(se_ref[k], k)],
            axis=1,
        )

    ntiles = W // tile_w
    sign = {1: 1.0, 5: 1.0, 8: 1.0, 3: -1.0, 6: -1.0, 7: -1.0}
    kind = {1: 1, 3: 1, 5: 2, 6: 2, 7: 2, 8: 2}

    def one_step(src, dst, s):
        ok = (
            (src[3] - w1a > 0.0)
            & (src[6] - w2a > 0.0)
            & (src[7] - w2a > 0.0)
        ).astype(jnp.float32)
        am_all = sel_nob * ok  # (W, WX); nonzero on the forcing row(s) only

        def am_rows(lo, h):
            """am_all rows [lo, lo+h) with buffer wrap (garbage zone)."""
            lo %= W
            if lo + h <= W:
                return am_all[lo : lo + h]
            return jnp.concatenate(
                [am_all[lo:], am_all[: lo + h - W]], axis=0
            )

        total = None
        for jt in range(ntiles):
            r0t = jt * tile_w

            def rowm(k, r):
                r = r % W
                return src[k, r : r + 1]

            def pull(k):
                cy, cx = _CYS[k], _CXS[k]
                if cy == 0:
                    p = src[k, r0t : r0t + tile_w]
                elif cy == 1:
                    p = jnp.concatenate(
                        [rowm(k, r0t - 1), src[k, r0t : r0t + tile_w - 1]],
                        axis=0,
                    )
                else:
                    p = jnp.concatenate(
                        [src[k, r0t + 1 : r0t + tile_w],
                         rowm(k, r0t + tile_w)],
                        axis=0,
                    )
                if k in sign:  # forcing delta, y-aligned to the source rows
                    p = p + sign[k] * wgt[kind[k]] * am_rows(r0t - cy, tile_w)
                if cx == 1:
                    p = east(p)
                elif cx == -1:
                    p = west(p)
                return p

            t = tuple(pull(k) for k in range(9))
            relaxed, usq = bgk_relax(t, omega, paired=paired)
            nob_b = nob_b_all[r0t : r0t + tile_w]
            for k in range(9):
                dst[k, r0t : r0t + tile_w] = jnp.where(
                    nob_b, relaxed[k], t[_OPP[k]]
                )
            lo, hi = max(r0t, T), min(r0t + tile_w, T + B)
            if lo < hi:
                total = av_fold(
                    total, nob_all[lo:hi, H : H + P],
                    usq[lo - r0t : hi - r0t, H : H + P], paired,
                )
        sums_ref[i, j, s] = av_total(total)

    def two_steps(h, carry):
        one_step(a_ref, b_ref, 2 * h)
        one_step(b_ref, a_ref, 2 * h + 1)
        return carry

    jax.lax.fori_loop(0, T // 2, two_steps, 0)

    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value
    for k in range(9):
        mid = a_ref[k, T : T + B, H : H + P]
        if dev is None:
            out_ref[k] = mid.astype(out_dtype)
        else:
            out_ref[k] = encode_value(mid - dev[k], dev[9]).astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _make_call2_sharded_panel(rows, nx, ny_global, block, depth, panel, halo,
                              w1a, w2a, omega, interpret, dtype_name,
                              paired=True, dev=None, tilew=None):
    dtype = jnp.dtype(dtype_name)
    nblk = rows // block
    npan = nx // panel
    T, P, H = depth, panel, halo
    W = block + 2 * T
    WX = P + 2 * H
    tile = _sublane_tile(dtype)
    mask_rows = W + (-W) % tile
    tile_w = _pick_tile_w(W, WX, tilew)
    kern = functools.partial(
        _kernel2_sharded_panel, block=block, depth=T, panel=P, halo=H,
        ny=ny_global, tile_w=tile_w, w1a=w1a, w2a=w2a, omega=omega,
        out_dtype=dtype, paired=paired, dev=dev,
    )

    return BC.creep_call(
        kern,
        BC.panel_specs(rows, nx, block, T, P, H, mask_rows, dtype,
                       wrap_rows=False),
        scratch_shapes=[
            pltpu.VMEM((9, W, WX), jnp.float32),
            pltpu.VMEM((9, W, WX), jnp.float32),
        ],
        vmem_limit=2 * (9 * W * WX * 4)
        + 4 * (9 * block * P * dtype.itemsize)
        + 15 * tile_w * WX * 4
        + 20 * 1024 * 1024,
        interpret=interpret,
    )


def step_band2_sharded_panel(cells, n_compact, s_compact, nob_ext_arr, r0,
                             density, accel, omega, block, depth, panel,
                             ny_global, halo=128,
                             *, interpret=False, paired=None, dev=None):
    """Advance the local shard T timesteps in one panelled pass (band2
    body). Same contract as pallas_band.step_band_sharded_panel."""
    _, rows, nx = cells.shape
    call = _make_call2_sharded_panel(
        rows, nx, ny_global, block, depth, panel, halo,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev, tilew=_tilew_env(),
    )
    out, sums = call(cells, n_compact, s_compact, cells, cells,
                     n_compact, n_compact, s_compact, s_compact,
                     nob_ext_arr, r0)
    return out, jnp.sum(sums, axis=(0, 1))  # (T,) per-step local partials


def clean_env() -> bool:
    """LBM_BAND2_CLEAN: "1" enables the clean-tile specialization (skip
    the obstacle select + mask-multiply on step-tiles the HOST mask
    proves obstacle-free — bench_r5_b2body.json attributes ~6% of the
    band2 step to that work), "0"/unset disables. Read OUTSIDE jit so a
    changed value is a new cache key (the standard LBM_* knob rule).

    QUARANTINED NEGATIVE RESULT (bench_r5_clean.json): on silicon with
    walls geometry this is 9-10% SLOWER than base at 2048²/4096² —
    the W = B + 2T window overlap makes the boundary obstacle rows
    dirty *somewhere* for every step-tile, so all tiles are mixed,
    both ``pl.when`` store paths compile, and Mosaic predication
    executes the dual-path work. Kept opt-in for geometries with
    block-aligned obstacle-free bands >= W rows; NEVER auto-routed."""
    import os

    return os.environ.get("LBM_BAND2_CLEAN", "") == "1"


def dirty_tiles(obstacles, block, depth, *, tilew=None):
    """STATIC clean-tile map for ``step_band2``: for each step-tile index
    ``j``, the sorted tuple of grid-block ids ``i`` whose window rows
    ``[j*tile_w, (j+1)*tile_w)`` (global rows ``i*block - T + r mod ny``,
    the exact rows ``nobst_ext`` hands block ``i``) contain ANY obstacle
    cell. Computed from the HOST mask at dispatch time, so it is a
    hashable compile-time constant: ``_kernel2`` compiles a select-free
    store and an unmasked |u| fold for tiles clean across all blocks,
    the full masked path for tiles dirty across all blocks, and a
    ``pl.when`` runtime branch on the block id for mixed tiles.

    ``obstacles`` is the reference-convention host mask (nonzero =
    blocked, d2q9-bgk.c:550-557); ``tilew`` must match the value
    ``step_band2`` resolves (both default to ``_tilew_env()``).
    """
    import numpy as np

    obstacles = np.asarray(obstacles)
    ny = obstacles.shape[0]
    T = depth
    W = block + 2 * T
    tile_w = _pick_tile_w(W, obstacles.shape[1],
                          _tilew_env() if tilew is None else tilew)
    nblk = ny // block
    row_blocked = np.any(obstacles != 0, axis=1)
    tiles = []
    for j in range(W // tile_w):
        dirty = []
        for i in range(nblk):
            rows = (i * block - T + j * tile_w + np.arange(tile_w)) % ny
            if row_blocked[rows].any():
                dirty.append(i)
        tiles.append(tuple(dirty))
    return tuple(tiles)


def step_band2(cells, nob_ext_arr, owner, density, accel, omega, block, depth,
               *, interpret=False, paired=None, dev=None, probe="",
               dirty=None):
    """Advance T timesteps in one pass. Same contract as step_band.
    ``probe`` selects attribution/lever variants (scripts/
    probe_band2_body.py only — see the ``_kernel2`` token list);
    ``dirty`` is the clean-tile specialization bitmap from
    ``dirty_tiles`` (None = no specialization)."""
    _, ny, nx = cells.shape
    call = _make_call2(
        ny, nx, block, depth,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev, tilew=_tilew_env(), probe=probe, dirty=dirty,
    )
    out, sums = call(cells, cells, cells, nob_ext_arr, owner)
    return out, tuple(jnp.sum(sums[:, s]) for s in range(depth))


def run_band2(cells, nobst, density, accel, omega, n_iters, block, depth,
              *, panel=None, halo=128, interpret=False, paired=None,
              dev=None, probe="", dirty=None):
    """Run ``n_iters`` steps, T per pass; trailing ``n_iters % T`` steps use
    the single-step block kernel. Same contract as run_band. ``panel``
    selects the x-split variant. ``probe`` (full-row only) builds the
    attribution/lever kernel variants — probe scripts only. ``dirty``
    (full-row only) is the ``dirty_tiles`` clean-tile map."""
    from lbm_tpu.ops.pallas_band import nobst_ext_panel

    _, ny, nx = cells.shape
    T = depth
    if panel is not None:
        if not band2_panel_supported(ny, nx, block, T, panel, halo,
                                     cells.dtype):
            raise ValueError(
                f"panel band2 kernel unsupported: grid {ny}x{nx}, block "
                f"{block}, depth {T}, panel {panel}, halo {halo}, "
                f"dtype {cells.dtype.name}"
            )
        nob_ext_arr = nobst_ext_panel(nobst, block, T, panel, halo,
                                      cells.dtype)
    elif not band2_supported(ny, nx, block, T, cells.dtype):
        raise ValueError(
            f"band2 kernel unsupported: grid {ny}x{nx}, block {block}, "
            f"depth {T}, dtype {cells.dtype.name}"
        )
    else:
        nob_ext_arr = nobst_ext(nobst, block, T, cells.dtype)
    owner = jnp.ones((1, 1), jnp.float32)
    if paired is None:
        paired = paired_default()

    if probe and panel is not None:
        raise ValueError("band2 probe variants are full-row only")
    if dirty is not None and panel is not None:
        raise ValueError("band2 clean-tile specialization is full-row only")

    if panel is not None:
        def step_call(cells):
            return step_band2_panel(
                cells, nob_ext_arr, owner, density, accel, omega, block, T,
                panel, halo, interpret=interpret, paired=paired, dev=dev,
            )
    else:
        def step_call(cells):
            return step_band2(
                cells, nob_ext_arr, owner, density, accel, omega, block, T,
                interpret=interpret, paired=paired, dev=dev, probe=probe,
                dirty=dirty,
            )

    return BC.run_creep(cells, nobst, density, accel, omega, n_iters, T,
                        step_call, interpret=interpret, paired=paired,
                        dev=dev)
