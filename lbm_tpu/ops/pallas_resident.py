"""VMEM-resident multi-step Pallas kernel.

For lattices whose whole state fits in VMEM (v5e: 128 MB/core), the fastest
schedule is not streaming row blocks per step but keeping the ENTIRE state
on-chip and running many timesteps inside one kernel invocation:

- HBM is touched twice per K-step chunk (state in, state out) instead of
  twice per step — a ~K-fold traffic reduction;
- the state ping-pongs between the INPUT window (pallas refs are mutable
  VMEM — mutations simply never write back to HBM) and the output window,
  two timesteps per loop iteration, so no extra scratch buffer and no
  dynamic buffer-parity control flow are needed; chunks are scheduled so
  the final step lands in the output window (output aliasing is NOT used:
  a compiled output window is write-only until written — reading it before
  the first store returns garbage, which interpret mode masks by copying);
- each timestep is computed in ROW TILES (static python loop) so the live
  temporary set stays tile-sized — v1 of this kernel carried whole planes
  through the loop and spilled ~3.25x the state (1024^2 wanted 199 MB of
  128 MB VMEM); tiling brings 1024^2 (36 MB state) comfortably on-chip;
- with the whole grid resident, periodic wraps need no halos: the y-wrap
  rows are direct (statically indexed) reads of the resident buffer and the
  x-wrap is a lane roll (kernels.cl:80-98's modulo indexing, materialized
  by the memory system instead of arithmetic);
- the per-step reduction writes one scalar per step into an SMEM output.

Accuracy is identical to the block kernel (same f32 arithmetic and
operation order); validated against the jnp oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default

# Whole-state VMEM budget, measured on v5e (128 MB VMEM): input window
# (= state) + output window (= state) + nobst + tile temporaries must fit.
# 1024^2 f32: 36 + 36 + 4 + ~12 = ~88 MB — OK. 40 MB states cap it.
_MAX_STATE_BYTES = 40 * 1024 * 1024
# Steps per mega-call: HBM traffic amortizes as ~2/K state-passes per step.
# Odd so the ping-pong naturally ends in the output window.
_CHUNK_STEPS = 255
# States small enough for the value-carried in-kernel loop (live set ~3.25x).
_VALUE_CARRY_BYTES = 4 * 1024 * 1024
def resident_supported(ny: int, nx: int, dtype=jnp.float32) -> bool:
    if dtype != jnp.float32:
        return False  # bf16 targets HBM-bound large grids; use the block kernel
    return nx % 128 == 0 and ny % 8 == 0 and 9 * ny * nx * 4 <= _MAX_STATE_BYTES


def _pick_tile(ny: int, nx: int) -> int:
    """Tile height: as large as the ~12 MB temporaries budget allows (≈15
    live tile-planes) — small grids run whole-grid single-tile steps."""
    max_rows = max(8, (12 * 1024 * 1024) // (15 * nx * 4) // 8 * 8)
    tr = min(ny, max_rows)
    while ny % tr:
        tr -= 8
    return max(tr, 8)


def _mega_kernel(cells_ref, nobst_ref, owner_ref, out_ref, av_ref,
                 *, steps: int, ny: int, nx: int, tile: int,
                 w1a: float, w2a: float, omega: float, paired: bool = True):
    # cells_ref ("A") arrives DMA'd from HBM and serves as the mutable
    # working buffer; out_ref ("B") is the ping-pong partner whose final
    # contents are written back.
    nobst_full = nobst_ref[...].astype(jnp.float32)
    nob_b_full = nobst_full > 0.0

    cys = (0, 0, 1, 0, -1, 1, 1, -1, -1)
    cxs = (0, 1, 0, -1, 0, 1, -1, -1, 1)
    opp = (0, 3, 4, 1, 2, 7, 8, 5, 6)
    ntiles = ny // tile

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    def one_step(src, dst):
        """One full timestep src -> dst; returns the tot_u partial sum."""
        total = None
        for j in range(ntiles):
            r0 = j * tile
            nob = nobst_full[r0 : r0 + tile]

            def mid(k):
                return src[k, r0 : r0 + tile]

            def row(k, r):
                r = r % ny
                return src[k, r : r + 1]

            # Fused accelerate_flow for the source rows this tile PULLS from.
            # Forcing modifies row ny-2 of planes 1,3,5,6,7,8 before
            # streaming; rather than mutating the buffer, each pull of an
            # affected plane applies the (recomputed) masked delta when its
            # source row range covers ny-2.
            def amask_for(rows_lo: int, height: int):
                """Forcing mask aligned to source rows [rows_lo, rows_lo+height)."""
                pos = (ny - 2 - rows_lo) % ny
                if pos >= height:
                    return None
                s3 = src[3, ny - 2 : ny - 1]
                s6 = src[6, ny - 2 : ny - 1]
                s7 = src[7, ny - 2 : ny - 1]
                nob_row = nobst_full[ny - 2 : ny - 1]
                ok = (
                    (s3 - w1a > 0.0) & (s6 - w2a > 0.0) & (s7 - w2a > 0.0)
                ).astype(jnp.float32)
                m_row = ok * nob_row * owner_ref[0, 0]  # (1, nx)
                rows_i = jax.lax.broadcasted_iota(jnp.int32, (height, 1), 0)
                sel = (rows_i == pos).astype(jnp.float32)
                return sel * m_row

            sign = {1: 1.0, 5: 1.0, 8: 1.0, 3: -1.0, 6: -1.0, 7: -1.0}
            wgt = {1: w1a, 3: w1a, 5: w2a, 6: w2a, 7: w2a, 8: w2a}

            def pull(k):
                """Streamed value t_k for this tile, with fused forcing."""
                cy, cx = cys[k], cxs[k]
                lo = r0 - cy  # source rows are [r0-cy, r0-cy+tile)
                if cy == 0:
                    p = mid(k)
                elif cy == 1:
                    p = jnp.concatenate([row(k, r0 - 1), mid(k)[: tile - 1]], axis=0)
                else:  # cy == -1
                    p = jnp.concatenate([mid(k)[1:], row(k, r0 + tile)], axis=0)
                if k in sign:
                    am = amask_for(lo, tile)
                    if am is not None:
                        p = p + sign[k] * wgt[k] * am
                if cx == 1:
                    p = east(p)
                elif cx == -1:
                    p = west(p)
                return p

            t = tuple(pull(k) for k in range(9))
            relaxed, u_sq = bgk_relax(t, omega, paired=paired)
            nob_b = nob_b_full[r0 : r0 + tile]
            for k in range(9):
                dst[k, r0 : r0 + tile] = jnp.where(nob_b, relaxed[k], t[opp[k]])

            total = av_fold(total, nob, u_sq, paired)
        return av_total(total)

    if 9 * ny * nx * 4 <= _VALUE_CARRY_BYTES:
        # Small-state fast path: carry the planes as VALUES through the loop
        # (measured 2-3x faster per step than ref ping-pong at <=256^2; the
        # ~3.25x live-set blowup that sinks large grids is harmless here).
        # Loop-invariant forcing-row pieces hoisted out of the step: only the
        # joint positivity test depends on the evolving state, and it needs
        # just row ny-2 — NOT full-plane compares (which cost ~8 grid passes
        # per step in the round-1 form).
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0)
        sel = (rows_i == ny - 2).astype(jnp.float32)
        nob_force_row = nobst_full[ny - 2 : ny - 1]
        gate = owner_ref[0, 0]

        def step_body(tt, c):
            r = ny - 2
            ok = (
                (c[3][r : r + 1] - w1a > 0.0)
                & (c[6][r : r + 1] - w2a > 0.0)
                & (c[7][r : r + 1] - w2a > 0.0)
            ).astype(jnp.float32)
            am = sel * (ok * nob_force_row * gate)
            c = (
                c[0],
                c[1] + w1a * am, c[2], c[3] - w1a * am, c[4],
                c[5] + w2a * am, c[6] - w2a * am, c[7] - w2a * am,
                c[8] + w2a * am,
            )

            def roll2(p, cy, cx):
                if cy:
                    p = pltpu.roll(p, cy % ny, 0)
                if cx:
                    p = pltpu.roll(p, cx % nx, 1)
                return p

            t = tuple(roll2(c[k], cys[k], cxs[k]) for k in range(9))
            relaxed, u_sq = bgk_relax(t, omega, paired=paired)
            av_ref[tt, 0] = av_total(av_fold(None, nobst_full, u_sq, paired))
            return tuple(
                jnp.where(nob_b_full, relaxed[k], t[opp[k]]) for k in range(9)
            )

        c_final = jax.lax.fori_loop(
            0, steps, step_body, tuple(cells_ref[k].astype(jnp.float32) for k in range(9))
        )
        for k in range(9):
            out_ref[k] = c_final[k]
    elif steps % 2:
        # A->B first, then pairs of (B->A, A->B): ends in B = out_ref.
        av_ref[0, 0] = one_step(cells_ref, out_ref)

        def two_steps(i, _):
            av_ref[2 * i + 1, 0] = one_step(out_ref, cells_ref)
            av_ref[2 * i + 2, 0] = one_step(cells_ref, out_ref)
            return 0

        jax.lax.fori_loop(0, (steps - 1) // 2, two_steps, 0)
    else:
        # Pairs of (A->B, B->A) end in A; one whole-state copy moves the
        # final state into the output window (cheap vs the steps saved).
        def two_steps(i, _):
            av_ref[2 * i, 0] = one_step(cells_ref, out_ref)
            av_ref[2 * i + 1, 0] = one_step(out_ref, cells_ref)
            return 0

        jax.lax.fori_loop(0, steps // 2, two_steps, 0)
        for k in range(9):
            out_ref[k] = cells_ref[k]


@functools.lru_cache(maxsize=None)
def _make_mega_call(ny, nx, steps, w1a, w2a, omega, interpret, paired=True):
    tile = _pick_tile(ny, nx)
    kern = functools.partial(
        _mega_kernel, steps=steps, ny=ny, nx=nx, tile=tile,
        w1a=w1a, w2a=w2a, omega=omega, paired=paired,
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((steps, 1), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )


def run_resident(cells, nobst, density, accel, omega, n_iters, *,
                 interpret=False, paired=None):
    """Run ``n_iters`` steps with the VMEM-resident mega-kernel.

    Returns ``(final_cells, tot_u_series)`` where the series is the
    UN-normalized per-step sum of |u| over unblocked cells (length n_iters).
    ``paired`` selects the collision form (None → env default); jitted
    callers must thread it as a static arg (see driver._run_resident).
    """
    _, ny, nx = cells.shape
    w1a = float(density * accel / 9.0)
    w2a = float(density * accel / 36.0)
    omega = float(omega)
    owner = jnp.ones((1, 1), jnp.float32)

    n_full = n_iters // _CHUNK_STEPS
    rem = n_iters - n_full * _CHUNK_STEPS
    tot_u = jnp.zeros((n_iters,), jnp.float32)
    if paired is None:
        paired = paired_default()

    if n_full:
        call = _make_mega_call(
            ny, nx, _CHUNK_STEPS, w1a, w2a, omega, interpret, paired
        )

        def body(j, carry):
            cells, tot_u = carry
            cells, av = call(cells, nobst, owner)
            tot_u = jax.lax.dynamic_update_slice(tot_u, av[:, 0], (j * _CHUNK_STEPS,))
            return cells, tot_u

        cells, tot_u = jax.lax.fori_loop(0, n_full, body, (cells, tot_u))
    if rem:
        call = _make_mega_call(ny, nx, rem, w1a, w2a, omega, interpret, paired)
        cells, av = call(cells, nobst, owner)
        tot_u = jax.lax.dynamic_update_slice(tot_u, av[:, 0], (n_full * _CHUNK_STEPS,))
    return cells, tot_u
