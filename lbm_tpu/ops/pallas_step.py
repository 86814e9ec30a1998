"""Fused Pallas TPU kernel for the D2Q9/BGK timestep.

One kernel pass fuses the reference's two OpenCL kernels (accelerate_flow,
kernels.cl:7-42, and comp_func, kernels.cl:44-201) plus the per-step
reduction the reference does on the host (d2q9-bgk.c:411-420):

    accelerate row ny-2  →  pull-stream with periodic wrap  →  bounce-back
    →  BGK collision  →  per-block partial sums of |u|

Memory design (the performance ceiling is HBM bandwidth, not FLOPs):

- The state is ONE ``(9, ny, nx)`` f32 array with nx on the 128-lane minor
  axis. A 1-D grid walks row blocks of height B; each grid step streams a
  ``(9, B, nx)`` block HBM→VMEM, computes, and writes the ``(9, B, nx)``
  output block — each cell is read and written exactly once per step.
- x-wrap (kernels.cl:81, 83) is a lane roll inside the block: every block
  holds full rows, so ``pltpu.roll`` along the lane axis IS the periodic
  boundary.
- y-wrap needs one halo row above/below each block for the 6 diagonal/axis
  planes. Instead of overlapping block loads (which would re-read whole
  blocks) or gathering boundary rows with strided slices per step (a
  separate, surprisingly expensive XLA pass), the kernel MAINTAINS the halos
  itself: each block emits its own boundary rows of the NEW state as two
  tiny ``(nblk, 3, nx)`` side outputs, and the next step's kernel reads its
  neighbors' slots via modular BlockSpec index maps. The
  ``(cells, halo_dn, halo_up)`` triple is the loop carry (see
  ``make_halos`` for the one-time initialization).
- The row-(ny-2) forcing is fused in: only the block owning that row applies
  it (a broadcasted row mask under ``program_id == owner``), before the
  streamed values are formed — so every consumer of that row inside the
  block sees accelerated values, exactly like the reference running
  accelerate_flow before comp_func. The halo rows never contain row ny-2
  (boundary rows are ≡ -1, 0 mod B; ny-2 ≡ B-2 mod B, and B ≥ 8).
- The mean-|u| reduction leaves the kernel as per-block partials summed by
  XLA outside — the full ``tot_us`` plane never exists in HBM.

Total HBM traffic per step ≈ 19 row-planes (9 read + 9 written + 1 obstacle
read) vs the reference's 19 + a full |u| plane write + PCIe readback.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops.collision import av_fold, av_total, bgk_relax, paired_default

def _pick_block(ny: int, nx: int, dtype=jnp.float32) -> int | None:
    """Row-block height B (must divide ny; multiples of the sublane tile —
    8 for f32 storage, 16 for the 16-bit storage modes bf16/c16-int16).
    Returns None for shapes the kernel can't tile (caller falls back to the
    jnp step). ``LBM_PALLAS_BLOCK`` overrides for sweeps."""
    tile = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    if nx % 128 != 0 or ny % tile != 0:
        return None
    override = os.environ.get("LBM_PALLAS_BLOCK")
    if override:
        b = int(override)
        return b if (b >= tile and b % tile == 0 and ny % b == 0) else None
    # Measured on v5e (BENCHMARKS.md): small grids are per-call-overhead
    # dominated — run them as ONE block; otherwise fine-grained blocks
    # pipeline best (1024^2: B=8 ~10,240 MLUPS > B=16 > B=32 > B=64).
    if 9 * ny * nx * 4 <= 2 * 1024 * 1024 and ny <= 256:
        return ny
    return tile


def pallas_supported(ny: int, nx: int) -> bool:
    return _pick_block(ny, nx) is not None


def _physics(m, hd, hu, nobst, force_gate, *, block: int, w1a: float,
             w2a: float, omega: float, out_dtype=jnp.float32, colfix=None,
             paired: bool = True):
    """The fused physics of one row block, on plain arrays (shared by the
    1-D, col_fix/2-D, and overlapped-RDMA kernel variants).

    ``m``: 9 ``(block, nx)`` f32 planes; ``hd``/``hu``: ``(3, nx)`` halo rows
    (planes [2,5,6] row-above / [4,7,8] row-below); ``nobst``: f32
    not-obstacle plane; ``force_gate``: 1.0 iff this block holds global row
    ny-2 (block AND shard ownership combined); ``colfix``: optional
    ``(colL, colR)`` 2-D-mesh edge-column patches, each ``(3, block, 1)``.
    Returns ``(res — the 9 new planes at out_dtype, u_sq)``.
    """
    nobst = nobst.astype(jnp.float32)
    obst = 1.0 - nobst

    # --- fused accelerate_flow (kernels.cl:21-41) on the owning block ------
    rows = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    row_sel = (rows == block - 2).astype(jnp.float32)  # row ny-2 lives here
    ok = (
        (m[3] - w1a > 0.0) & (m[6] - w2a > 0.0) & (m[7] - w2a > 0.0)
    ).astype(jnp.float32)
    amask = row_sel * ok * nobst * force_gate
    m = list(m)
    m[1] = m[1] + w1a * amask
    m[5] = m[5] + w2a * amask
    m[8] = m[8] + w2a * amask
    m[3] = m[3] - w1a * amask
    m[6] = m[6] - w2a * amask
    m[7] = m[7] - w2a * amask

    # --- pull streaming (kernels.cl:80-98) ---------------------------------
    def down(p, halo):  # tmp[r] = p[r-1]; halo is this block's row above
        return jnp.concatenate([halo, p[: block - 1]], axis=0)

    def up(p, halo):  # tmp[r] = p[r+1]; halo is this block's row below
        return jnp.concatenate([p[1:], halo], axis=0)

    def east(p):  # tmp[r, x] = p[r, x-1]
        return pltpu.roll(p, 1, 1)

    def west(p):  # tmp[r, x] = p[r, x+1]  (pltpu.roll needs shift >= 0)
        return pltpu.roll(p, p.shape[1] - 1, 1)

    t0 = m[0]
    t1 = east(m[1])
    t2 = down(m[2], hd[0:1])
    t3 = west(m[3])
    t4 = up(m[4], hu[0:1])
    t5 = east(down(m[5], hd[1:2]))
    t6 = west(down(m[6], hd[2:3]))
    t7 = west(up(m[7], hu[1:2]))
    t8 = east(up(m[8], hu[2:3]))
    if colfix is not None:
        # 2-D mesh: the roll wrapped our OWN edge column into lane 0 (east)
        # / lane nx-1 (west); replace it with the x-neighbor's column. The
        # (3, B, 1) patches are pre-aligned per plane by the sharding layer:
        # colL rows are the left shard's last column of planes (1, 5, 8) at
        # pull rows (same / y-1 / y+1 — corners already spliced in); colR
        # likewise for planes (3, 6, 7).
        cl, cr = colfix
        nx_l = m[0].shape[1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (block, nx_l), 1)
        first = lanes == 0
        last = lanes == nx_l - 1
        t1 = jnp.where(first, cl[0], t1)
        t5 = jnp.where(first, cl[1], t5)
        t8 = jnp.where(first, cl[2], t8)
        t3 = jnp.where(last, cr[0], t3)
        t6 = jnp.where(last, cr[1], t6)
        t7 = jnp.where(last, cr[2], t7)
    t = [t0, t1, t2, t3, t4, t5, t6, t7, t8]

    # --- moments + BGK relaxation (kernels.cl:109-177, shared form) --------
    relaxed, u_sq = bgk_relax(t, omega, paired=paired)
    opp = (0, 3, 4, 1, 2, 7, 8, 5, 6)  # kernels.cl:100-107

    # Obstacle select with the bounce-back value (kernels.cl:179-196): a
    # one-op lane select instead of the two-multiply arithmetic blend.
    nob_b = nobst > 0.0
    res = [
        jnp.where(nob_b, relaxed[k], t[opp[k]]).astype(out_dtype)
        for k in range(9)
    ]
    return res, u_sq


def _kernel(*refs, block: int, nblk: int, w1a: float, w2a: float, omega: float,
            out_dtype=jnp.float32, col_fix: bool = False, paired: bool = True,
            dev=None):
    """One row-block of the fused step. See module docstring for the layout.

    w1a/w2a are the accelerate weights density*accel/9 and /36
    (kernels.cl:17-18); omega the BGK relaxation rate.

    ``col_fix=True`` is the 2-D-mesh variant: the shard no longer holds full
    lattice rows, so the lane-roll x-wrap is wrong in exactly one column per
    direction; two extra ``(3, B, 1)`` inputs carry the x-neighbors' edge
    columns (pre-aligned per plane by the sharding layer) and a lane-masked
    select patches the wrapped column. Two extra side outputs emit this
    block's NEW edge columns for the next step's exchange.

    ``dev`` enables c16 storage (ops/devspace.py): a ``(bg0..bg8, h)``
    tuple of the per-plane backgrounds and companding range. Loads decode
    int16 → f32 full values; stores encode back. All physics stays f32.
    """
    if col_fix:
        (cells_ref, halo_dn_ref, halo_up_ref, colL_ref, colR_ref,
         nobst_ref, owner_ref,
         out_ref, halo_dn_out_ref, halo_up_out_ref,
         colL_out_ref, colR_out_ref, sums_ref) = refs
    else:
        (cells_ref, halo_dn_ref, halo_up_ref, nobst_ref, owner_ref,
         out_ref, halo_dn_out_ref, halo_up_out_ref, sums_ref) = refs
    i = pl.program_id(0)
    # owner_ref is 1.0 only on the shard holding global row ny-2 (always 1.0
    # single-device); within that shard the last block's row B-2 is ny-2.
    force_gate = (
        jnp.where(i == nblk - 1, 1.0, 0.0).astype(jnp.float32) * owner_ref[0, 0]
    )
    nobst = nobst_ref[...].astype(jnp.float32)
    from lbm_tpu.ops.devspace import plane_loader

    load = plane_loader(dev)

    m = [load(cells_ref[k], k) for k in range(9)]
    if dev is None:
        hd = halo_dn_ref[0].astype(jnp.float32)
        hu = halo_up_ref[0].astype(jnp.float32)
    else:
        # Halo rows carry planes (2,5,6) / (4,7,8) — decode each with ITS bg.
        hd = jnp.concatenate(
            [load(halo_dn_ref[0, j : j + 1], k) for j, k in enumerate((2, 5, 6))],
            axis=0,
        )
        hu = jnp.concatenate(
            [load(halo_up_ref[0, j : j + 1], k) for j, k in enumerate((4, 7, 8))],
            axis=0,
        )
    colfix = None
    if col_fix:
        if dev is None:
            colfix = (
                colL_ref[...].astype(jnp.float32),
                colR_ref[...].astype(jnp.float32),
            )
        else:
            colfix = (
                jnp.concatenate(
                    [load(colL_ref[j : j + 1], k) for j, k in enumerate((1, 5, 8))],
                    axis=0,
                ),
                jnp.concatenate(
                    [load(colR_ref[j : j + 1], k) for j, k in enumerate((3, 6, 7))],
                    axis=0,
                ),
            )
    res, u_sq = _physics(
        m, hd, hu, nobst, force_gate, block=block, w1a=w1a, w2a=w2a,
        omega=omega, out_dtype=jnp.float32 if dev is not None else out_dtype,
        colfix=colfix, paired=paired,
    )
    if dev is not None:
        from lbm_tpu.ops.devspace import encode_value

        res = [
            encode_value(res[k] - dev[k], dev[9]).astype(jnp.int16)
            for k in range(9)
        ]
    for k in range(9):
        out_ref[k] = res[k]

    # Side outputs: this block's boundary rows of the NEW state, which are
    # exactly the halo rows the next timestep's neighbors will pull.
    halo_dn_out_ref[0, 0:1] = res[2][block - 1 : block]
    halo_dn_out_ref[0, 1:2] = res[5][block - 1 : block]
    halo_dn_out_ref[0, 2:3] = res[6][block - 1 : block]
    halo_up_out_ref[0, 0:1] = res[4][0:1]
    halo_up_out_ref[0, 1:2] = res[7][0:1]
    halo_up_out_ref[0, 2:3] = res[8][0:1]
    if col_fix:
        # New edge columns for the next step's x-exchange: the right
        # neighbor pulls our planes (1, 5, 8) last column; the left neighbor
        # our planes (3, 6, 7) first column.
        nxl = res[0].shape[1]
        for j, k in enumerate((1, 5, 8)):
            colL_out_ref[j] = res[k][:, nxl - 1 : nxl]
        for j, k in enumerate((3, 6, 7)):
            colR_out_ref[j] = res[k][:, 0:1]

    # --- per-block reduction (replaces tot_us + host sum) ------------------
    # sums_ref is the full (nblk, 1) SMEM accumulator, resident across the
    # sequential grid; each block writes its own slot.
    sums_ref[i, 0] = av_total(av_fold(None, nobst, u_sq, paired))


@functools.lru_cache(maxsize=None)
def _make_pallas_call(ny, nx, block, w1a, w2a, omega, interpret,
                      dtype_name="float32", paired=True, dev=None):
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    kern = functools.partial(
        _kernel, block=block, nblk=nblk, w1a=w1a, w2a=w2a, omega=omega,
        out_dtype=dtype, paired=paired, dev=dev,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            # Neighbor halos, selected by modular index maps (see _kernel).
            pl.BlockSpec(
                (1, 3, nx), lambda i: ((i - 1) % nblk, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, nx), lambda i: ((i + 1) % nblk, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct((nblk, 3, nx), dtype),
            jax.ShapeDtypeStruct((nblk, 3, nx), dtype),
            jax.ShapeDtypeStruct((nblk, 1), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            # in+out blocks double-buffered, plus halo slices and headroom.
            vmem_limit_bytes=min(
                120 * 1024 * 1024, 5 * (9 * block * nx * 4) + 8 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _make_pallas_call_2d(ny, nx, block, w1a, w2a, omega, interpret,
                         dtype_name="float32", paired=True):
    """The col_fix variant (2-D mesh shards): two (3, ny, 1) edge-column
    inputs and two matching side outputs around the 1-D call's signature."""
    dtype = jnp.dtype(dtype_name)
    nblk = ny // block
    kern = functools.partial(
        _kernel, block=block, nblk=nblk, w1a=w1a, w2a=w2a, omega=omega,
        out_dtype=dtype, col_fix=True, paired=paired,
    )
    col_spec = pl.BlockSpec((3, block, 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    col_shape = jax.ShapeDtypeStruct((3, ny, 1), dtype)
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 3, nx), lambda i: ((i - 1) % nblk, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, nx), lambda i: ((i + 1) % nblk, 0, 0), memory_space=pltpu.VMEM
            ),
            col_spec,
            col_spec,
            pl.BlockSpec((block, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, block, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            col_spec,
            col_spec,
            pl.BlockSpec((nblk, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct((nblk, 3, nx), dtype),
            jax.ShapeDtypeStruct((nblk, 3, nx), dtype),
            col_shape,
            col_shape,
            jax.ShapeDtypeStruct((nblk, 1), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                120 * 1024 * 1024, 5 * (9 * block * nx * 4) + 8 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )


def _step_carry_2d(state, nobst, density, accel, omega, *, interpret=False,
                   owner=None, paired=None):
    """One fused timestep on a 2-D-mesh shard: the carry is
    ``(cells, halo_dn, halo_up, colfixL, colfixR)`` where the colfix arrays
    are the pre-aligned x-neighbor edge columns (see the sharding layer).

    Returns ``((cells', halo_dn', halo_up', colL_out, colR_out), tot_u)`` —
    note the RAW new edge columns are returned (the sharding layer exchanges
    and re-aligns them into the next step's colfix arrays).
    """
    cells, halo_dn, halo_up, colfixL, colfixR = state
    _, ny, nx = cells.shape
    block = _pick_block(ny, nx, cells.dtype)
    if block is None:
        raise ValueError(f"grid {ny}x{nx} unsupported by the pallas kernel")
    call = _make_pallas_call_2d(
        ny, nx, block,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        dtype_name=cells.dtype.name,
        paired=paired_default() if paired is None else paired,
    )
    if owner is None:
        owner = jnp.ones((1, 1), jnp.float32)
    new_cells, new_dn, new_up, colL_out, colR_out, partials = call(
        cells, halo_dn, halo_up, colfixL, colfixR, nobst, owner
    )
    return (new_cells, new_dn, new_up, colL_out, colR_out), jnp.sum(partials)


def make_halos(cells, block):
    """Initial boundary-row halo arrays for the carry (step t's kernel then
    produces the next pair as side outputs): ``halo_dn[j]`` = last row of
    block j of planes [2,5,6]; ``halo_up[j]`` = first row of planes [4,7,8].
    """
    halo_dn = jnp.stack([cells[k, block - 1 :: block, :] for k in (2, 5, 6)], axis=1)
    halo_up = jnp.stack([cells[k, ::block, :] for k in (4, 7, 8)], axis=1)
    return halo_dn, halo_up


def _prepare_obstacles(obstacles, dtype):
    """Precompute the not-obstacle plane once per run (the kernel's
    arithmetic masking form, kernels.cl:85-86). Stored 16-bit under the
    16-bit state modes (0/1 are exact in bf16 and int16) so the mask stream
    shares the bandwidth saving."""
    if dtype in (jnp.bfloat16, jnp.int16):
        return (obstacles == 0).astype(dtype)
    return (obstacles == 0).astype(jnp.float32)


def _step_carry(state, nobst, density, accel, omega, *, interpret=False,
                owner=None, paired=None, block=None, dev=None):
    """One fused timestep on the ``(cells, halo_dn, halo_up)`` carry.

    The halo pair always equals the boundary rows of ``cells`` — maintained
    by the kernel itself as side outputs, so steady-state steps do zero
    gather work outside the kernel. ``owner`` (default 1.0) gates the
    forcing row for sharded use, where only one shard holds row ny-2.
    """
    cells, halo_dn, halo_up = state
    _, ny, nx = cells.shape
    if block is None:
        block = _pick_block(ny, nx, cells.dtype)
    if block is None:
        raise ValueError(f"grid {ny}x{nx} unsupported by the pallas kernel")
    call = _make_pallas_call(
        ny, nx, block,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        dtype_name=cells.dtype.name,
        paired=paired_default() if paired is None else paired,
        dev=dev,
    )
    if owner is None:
        owner = jnp.ones((1, 1), jnp.float32)
    new_cells, new_dn, new_up, partials = call(cells, halo_dn, halo_up, nobst, owner)
    return (new_cells, new_dn, new_up), jnp.sum(partials)


def _init_state(cells, block=None):
    # int16 is the c16 companded-deviation storage (ops/devspace.py) — the
    # kernel decodes it itself; anything else non-16/32-bit runs f32.
    if cells.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
        cells = cells.astype(jnp.float32)
    if block is None:
        block = _pick_block(cells.shape[1], cells.shape[2], cells.dtype)
    halo_dn, halo_up = make_halos(cells, block)
    return cells, halo_dn, halo_up


def _extract_cells(state):
    return state[0]


def lbm_step_pallas(state, nobst, density, accel, omega, paired=None,
                    block=None, dev=None):
    """Fused-kernel step (TPU). Accepts either the ``(cells, halo_dn,
    halo_up)`` carry (the fast path the driver uses via ``init_state``) or a
    bare ``(9, ny, nx)`` cells array (convenience/oracle form — halos built
    on the fly). Returns the same structure it was given plus ``tot_u``.
    ``paired`` picks the collision form and ``block`` the row-block height
    (None → env defaults); jitted callers must thread both as static args
    (see driver._run_loop: env reads under a trace are frozen by whichever
    call traced first)."""
    if isinstance(state, (tuple, list)):
        return _step_carry(
            tuple(state), nobst, density, accel, omega, paired=paired,
            block=block, dev=dev,
        )
    new_state, tot_u = _step_carry(
        _init_state(state, block), nobst, density, accel, omega,
        paired=paired, block=block, dev=dev,
    )
    return new_state[0], tot_u


lbm_step_pallas.prepare = _prepare_obstacles
lbm_step_pallas.init_state = _init_state
lbm_step_pallas.extract = _extract_cells
lbm_step_pallas.takes_paired = True
lbm_step_pallas.takes_block = True
lbm_step_pallas.takes_dev = True
lbm_step_pallas.pick_block = _pick_block


def lbm_step_pallas_interpret(state, nobst, density, accel, omega,
                              paired=None, block=None, dev=None):
    """Interpreter-mode variant for CPU testing (same semantics, no TPU)."""
    if isinstance(state, (tuple, list)):
        return _step_carry(
            tuple(state), nobst, density, accel, omega, interpret=True,
            paired=paired, block=block, dev=dev,
        )
    new_state, tot_u = _step_carry(
        _init_state(state, block), nobst, density, accel, omega,
        interpret=True, paired=paired, block=block, dev=dev,
    )
    return new_state[0], tot_u


lbm_step_pallas_interpret.prepare = _prepare_obstacles
lbm_step_pallas_interpret.init_state = _init_state
lbm_step_pallas_interpret.extract = _extract_cells
lbm_step_pallas_interpret.takes_paired = True
lbm_step_pallas_interpret.takes_block = True
lbm_step_pallas_interpret.takes_dev = True
lbm_step_pallas_interpret.pick_block = _pick_block
