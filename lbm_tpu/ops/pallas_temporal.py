"""Temporally-blocked Pallas kernel: TWO timesteps per HBM pass.

Large grids (state > VMEM) are HBM-bandwidth-bound: the block-streaming
kernel moves 19 row-planes per step (9 read + 9 written + mask). Classic
temporal blocking halves that: each row block is read once, advanced TWO
timesteps in VMEM, and written once — ~9.7 row-planes per step.

Mechanics (generalizing pallas_step's carried-halo design to depth 2):

- the loop carry holds, per block, its input's first-2 and last-2 rows of
  all 9 planes (``(nblk, 18, nx)`` top/bottom arrays); block i reads its
  neighbors' slots via modular index maps to build a ``(B+4)``-row extended
  tile;
- step 1 computes the intermediate state on the interior ``B+2`` rows; step
  2 consumes it for the central ``B`` output rows. The row-(ny-2) forcing is
  applied to whichever buffer (extended input, then intermediate) contains
  that global row, with masks recomputed from the respective pre-forcing
  values — exactly the reference's accelerate-before-stream ordering for
  both steps;
- the kernel emits the OUTPUT's boundary row-pairs as side outputs (= the
  next pass's input halos) and one ``(nblk, 2)`` SMEM partial-sum pair (the
  per-step reductions; step 1's sum uses only the central B rows to avoid
  double counting across blocks).

The driver runs ``n_iters // 2`` fused passes; an odd trailing step falls
back to the single-step kernel. Constraint: B >= 8 and the forcing row
ny-2 must not sit in the outermost halo rows' wrap-ambiguous positions —
satisfied for all B >= 8 with B | ny (ny-2 ≡ B-2 mod B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.models.d2q9 import C_SQ, W0, W1, W2

_CYS = (0, 0, 1, 0, -1, 1, 1, -1, -1)
_CXS = (0, 1, 0, -1, 0, 1, -1, -1, 1)
_FCX = (0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0)
_FCY = (0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0)
_WS = (W0, W1, W1, W1, W1, W2, W2, W2, W2)
_OPP = (0, 3, 4, 1, 2, 7, 8, 5, 6)


def temporal_supported(ny: int, nx: int, block: int) -> bool:
    return nx % 128 == 0 and ny % block == 0 and block >= 8 and ny // block >= 1


def _kernel(cells_ref, top_ref, bot_ref, nobst2_ref, owner_ref,
            out_ref, top_out_ref, bot_out_ref, sums_ref,
            *, block: int, nblk: int, ny: int, nx: int,
            w1a: float, w2a: float, omega: float):
    i = pl.program_id(0)
    B = block

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    # nobst2_ref block covers rows [r0-2, r0+B+2) plus 4 alignment pad rows
    # (built by the driver with wrap), so all masks slice from it.
    nob_ext = nobst2_ref[...][: B + 4].astype(jnp.float32)  # (B+4, nx)
    nob_mid = nob_ext[2 : B + 2]
    owner = owner_ref[0, 0]

    def collide_from(t):
        """(relaxed 9-tuple pre-mask, u_sq) from streamed values."""
        rho = (((t[0] + t[1]) + (t[2] + t[3])) + ((t[4] + t[5]) + (t[6] + t[7]))) + t[8]
        inv_rho = 1.0 / rho
        u_x = ((t[1] + t[5] + t[8]) - (t[3] + t[6] + t[7])) * inv_rho
        u_y = ((t[2] + t[5] + t[6]) - (t[4] + t[7] + t[8])) * inv_rho
        u_sq = u_x * u_x + u_y * u_y
        common = 1.0 - u_sq * (0.5 / C_SQ)
        out = []
        for k in range(9):
            if k == 0:
                feq = _WS[0] * rho * common
            else:
                cu = _FCX[k] * u_x + _FCY[k] * u_y if _FCX[k] and _FCY[k] else (
                    _FCX[k] * u_x if _FCX[k] else _FCY[k] * u_y
                )
                feq = _WS[k] * rho * (
                    common + cu * (1.0 / C_SQ) + cu * cu * (0.5 / (C_SQ * C_SQ))
                )
            out.append(t[k] + omega * (feq - t[k]))
        return tuple(out), u_sq, t

    # ---- build the (B+4)-row extended input: rows r0-2 .. r0+B+2 ----------
    # top_ref = neighbor (i-1)'s LAST-2 input rows; bot_ref = (i+1)'s FIRST-2.
    ext = tuple(
        jnp.concatenate(
            [top_ref[0, 2 * k : 2 * k + 2], cells_ref[k], bot_ref[0, 2 * k : 2 * k + 2]],
            axis=0,
        )
        for k in range(9)
    )
    # Forcing for step 1: global row ny-2 appears in the extended tile at
    # offset B for the owner block (i == nblk-1, interior) AND at offset 0
    # for block 0 (whose above-halo rows are ny-2, ny-1 via wrap). Each copy
    # is forced independently (they feed disjoint pull paths).
    gate_last = jnp.where(i == nblk - 1, 1.0, 0.0)
    gate_first = jnp.where(i == 0, 1.0, 0.0)

    def force_traced(planes, n_rows, pos, nob_row, gate):
        ok = (
            (planes[3][pos : pos + 1] - w1a > 0.0)
            & (planes[6][pos : pos + 1] - w2a > 0.0)
            & (planes[7][pos : pos + 1] - w2a > 0.0)
        ).astype(jnp.float32)
        m_row = ok * nob_row * owner * gate
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

    ext = force_traced(ext, B + 4, B, nob_ext[B : B + 1], gate_last)
    ext = force_traced(ext, B + 4, 0, nob_ext[0:1], gate_first)

    # ---- step 1: intermediate rows r0-1 .. r0+B+1 (B+2 rows) --------------
    def pull1(k):
        cy, cx = _CYS[k], _CXS[k]
        lo = 1 - cy  # window start within ext for the intermediate range
        p = ext[k][lo : lo + B + 2]
        if cx == 1:
            p = east(p)
        elif cx == -1:
            p = west(p)
        return p

    relaxed1, usq1, t1 = collide_from(tuple(pull1(k) for k in range(9)))
    nob_inter = nob_ext[1 : B + 3]  # rows r0-1 .. r0+B+1
    obst_inter = 1.0 - nob_inter
    inter = tuple(
        nob_inter * relaxed1[k] + obst_inter * t1[_OPP[k]] for k in range(9)
    )
    # step-1 reduction over the CENTRAL B rows only (offset 1..B+1)
    sums_ref[i, 0] = jnp.sum(nob_mid * jnp.sqrt(usq1[1 : B + 1]))

    # Forcing for step 2: the intermediate covers rows r0-1..r0+B; global
    # ny-2 appears only in the owner block, at offset 1 + (B-2) = B-1.
    inter = force_traced(inter, B + 2, B - 1, nob_ext[B : B + 1], gate_last)

    # ---- step 2: output rows r0 .. r0+B ------------------------------------
    def pull2(k):
        cy, cx = _CYS[k], _CXS[k]
        lo = 1 - cy
        p = inter[k][lo : lo + B]
        if cx == 1:
            p = east(p)
        elif cx == -1:
            p = west(p)
        return p

    relaxed2, usq2, t2 = collide_from(tuple(pull2(k) for k in range(9)))
    obst_mid = 1.0 - nob_mid
    res = []
    for k in range(9):
        val = nob_mid * relaxed2[k] + obst_mid * t2[_OPP[k]]
        out_ref[k] = val
        res.append(val)
    sums_ref[i, 1] = jnp.sum(nob_mid * jnp.sqrt(usq2))

    # ---- side outputs: the OUTPUT's boundary row-pairs ---------------------
    for k in range(9):
        top_out_ref[0, 2 * k : 2 * k + 2] = res[k][0:2]
        bot_out_ref[0, 2 * k : 2 * k + 2] = res[k][B - 2 : B]


@functools.lru_cache(maxsize=None)
def _make_call(ny, nx, block, w1a, w2a, omega, interpret):
    nblk = ny // block
    kern = functools.partial(
        _kernel, block=block, nblk=nblk, ny=ny, nx=nx,
        w1a=w1a, w2a=w2a, omega=omega,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            # (i-1)'s bottom-2 rows of the INPUT state, 9 planes packed on
            # the second axis; (i+1)'s top-2 rows likewise.
            pl.BlockSpec((1, 18, nx), lambda i: ((i - 1) % nblk, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 18, nx), lambda i: ((i + 1) % nblk, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block + 8, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 18, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 18, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 18, nx), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 18, nx), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 2), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                120 * 1024 * 1024, 30 * (9 * block * nx * 4) + 16 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )


def make_halos2(cells, block):
    """Initial depth-2 halo arrays, indexed by producer block: ``bot2[j]`` =
    block j's FIRST-2 rows (consumed by j-1 as its below-halo); ``top2[j]`` =
    block j's LAST-2 rows (consumed by j+1 as its above-halo). Packed
    ``(nblk, 18, nx)`` with plane k at rows [2k, 2k+2)."""
    nblk = cells.shape[1] // block
    tops = []  # last-2 rows per block
    bots = []  # first-2 rows per block
    for k in range(9):
        plane = cells[k].reshape(nblk, block, cells.shape[2])
        tops.append(plane[:, block - 2 :, :])
        bots.append(plane[:, :2, :])
    top2 = jnp.concatenate(tops, axis=1)  # (nblk, 18, nx) — plane-major rows
    bot2 = jnp.concatenate(bots, axis=1)
    # Reorder to plane-k-at-[2k,2k+2): concatenate gave k-blocks of 2 rows in
    # order already (k-major) — correct as built.
    return top2, bot2


def nobst_ext(nobst, block):
    """(nblk*(B+8), nx) stacked per-block masks covering rows r0-2..r0+B+2
    with wrap, plus 4 pad rows per block for sublane alignment — BlockSpec
    (B+8, nx) @ (i, 0) slices block i's."""
    ny, nx = nobst.shape
    nblk = ny // block
    rows = []
    for j in range(nblk):
        r0 = j * block
        idx = (
            [(r0 - 2) % ny, (r0 - 1) % ny]
            + list(range(r0, r0 + block))
            + [(r0 + block) % ny, (r0 + block + 1) % ny]
        )
        rows.append(nobst[jnp.asarray(idx)])
        rows.append(jnp.zeros((4, nx), nobst.dtype))
    return jnp.concatenate(rows, axis=0)


def step2_pallas(state, nob_ext_arr, owner, density, accel, omega, block,
                 *, interpret=False):
    """Advance TWO timesteps. ``state`` = (cells, last2, first2) where the
    halo arrays are indexed by producer block (see make_halos2).

    Returns ``(state', (tot_u_step1, tot_u_step2))``.
    """
    cells, last2, first2 = state
    _, ny, nx = cells.shape
    call = _make_call(
        ny, nx, block,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
    )
    out, first_o, last_o, sums = call(cells, last2, first2, nob_ext_arr, owner)
    # Kernel side outputs: top_out = the block's FIRST-2 output rows,
    # bot_out = its LAST-2 — i.e. the next pass's first2/last2 arrays.
    return (out, last_o, first_o), (jnp.sum(sums[:, 0]), jnp.sum(sums[:, 1]))


def run_temporal(cells, nobst, density, accel, omega, n_iters, block,
                 *, interpret=False):
    """Run ``n_iters`` steps, two per HBM pass; an odd trailing step uses the
    single-step block kernel. Returns ``(final_cells, tot_u_series)``."""
    from lbm_tpu.ops import pallas_step as PS

    _, ny, nx = cells.shape
    cells = cells.astype(jnp.float32)
    last2, first2 = make_halos2(cells, block)
    nob_ext_arr = nobst_ext(nobst.astype(jnp.float32), block)
    owner = jnp.ones((1, 1), jnp.float32)

    npairs = n_iters // 2
    tot_u = jnp.zeros((n_iters,), jnp.float32)

    def body(j, carry):
        state, tot_u = carry
        state, (s1, s2) = step2_pallas(
            state, nob_ext_arr, owner, density, accel, omega, block,
            interpret=interpret,
        )
        tot_u = jax.lax.dynamic_update_slice(
            tot_u, jnp.stack([s1, s2]), (2 * j,)
        )
        return state, tot_u

    state = (cells, last2, first2)
    if npairs:
        state, tot_u = jax.lax.fori_loop(0, npairs, body, (state, tot_u))
    cells = state[0]
    if n_iters % 2:
        if interpret:
            step = PS.lbm_step_pallas_interpret
        else:
            step = PS.lbm_step_pallas
        nob_plain = nobst.astype(jnp.float32)
        cells, s = step(cells, nob_plain, density, accel, omega)
        tot_u = tot_u.at[n_iters - 1].set(s)
    return cells, tot_u


def pick_block(ny: int, nx: int) -> int | None:
    """Temporal-kernel block height (B=16 measured fastest: 8192^2
    6,128 vs 4,983 MLUPS at B=8; 2048^2 6,272 vs 4,935)."""
    if nx % 128 != 0:
        return None
    for b in (16, 8):
        if ny % b == 0:
            return b
    return None
