"""Multi-device domain decomposition over a JAX mesh.

The reference is strictly single-device (job_submit_d2q9-bgk:10 requests
``nodes=1:gpus=1``; the periodic wrap is modulo indexing inside one memory
space, kernels.cl:80-83). The TPU-native scaling path shards the lattice
row-wise over a 1-D device mesh with ``shard_map``:

- each device owns a contiguous block of rows of all 9 speed planes;
- per step, the pull-scheme streaming needs a one-row halo from each
  neighbor: the three north-pulling planes (2, 5, 6) need the previous
  shard's last row and the three south-pulling planes (4, 7, 8) need the
  next shard's first row. Both halos travel in ONE ``lax.ppermute`` each
  (planes stacked), riding the ICI ring — the periodic boundary maps onto
  the ring topology for free;
- the per-step mean-velocity reduction is a ``lax.psum``;
- the whole timestep loop stays inside one jitted ``shard_map``, so halo
  exchange compiles to XLA collective-permutes with no host involvement;
- the fused Pallas kernel runs per shard (``make_sharded_pallas_step``) with
  its kernel-maintained halo slots ppermuted across shard boundaries;
- a 2-D rows x cols mesh (``run_simulation_sharded_2d``) uses a two-phase
  column-then-row exchange that delivers corner values without explicit
  diagonal messages.
"""

from __future__ import annotations


import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbm_tpu.models.d2q9 import D2Q9, LBMParams
from lbm_tpu.ops.collision import paired_default
from lbm_tpu.ops.reference import collide

AXIS = "y"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the row axis of the lattice."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} available"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _exchange_halos(planes_rows, direction: int):
    """ppermute a stacked ``(k, 1, nx)`` set of boundary rows one step around
    the ring. direction=+1 sends to the next shard (i -> i+1), -1 to the
    previous."""
    n = jax.lax.axis_size(AXIS)
    perm = [(i, (i + direction) % n) for i in range(n)]
    return jax.lax.ppermute(planes_rows, AXIS, perm)


def _accelerate_local(cells, obstacles, density, accel, ny_global):
    """Row-``ny-2`` forcing (kernels.cl:7-42) applied by whichever shard owns
    that global row, via a global-row mask."""
    dtype = cells.dtype
    ny_local = cells.shape[1]
    row_offset = jax.lax.axis_index(AXIS) * ny_local
    local_rows = jax.lax.broadcasted_iota(jnp.int32, (ny_local, 1), 0) + row_offset
    row_mask = (local_rows == ny_global - 2).astype(dtype)  # (ny_local, 1)

    w1 = jnp.asarray(density * accel / 9.0, dtype=dtype)
    w2 = jnp.asarray(density * accel / 36.0, dtype=dtype)
    free = (obstacles == 0).astype(dtype)
    ok = (
        (cells[3] - w1 > 0.0) & (cells[6] - w2 > 0.0) & (cells[7] - w2 > 0.0)
    ).astype(dtype)
    m = free * ok * row_mask  # (ny_local, nx)

    zero = jnp.zeros_like(m)
    delta = jnp.stack(
        [zero, w1 * m, zero, -w1 * m, zero, w2 * m, -w2 * m, -w2 * m, w2 * m]
    )
    return cells + delta


def _stream_local(cells):
    """Streaming with ppermute halo exchange. ``cells`` is the local
    ``(9, ny_local, nx)`` block; x-rolls are local (each shard holds full
    rows), y-shifts splice in one halo row from each ring neighbor."""
    # x-rolls first (CX per plane); planes needing the same y-shift are then
    # batched into a single ppermute.
    xr = {
        0: cells[0],
        1: jnp.roll(cells[1], 1, axis=1),
        2: cells[2],
        3: jnp.roll(cells[3], -1, axis=1),
        4: cells[4],
        5: jnp.roll(cells[5], 1, axis=1),
        6: jnp.roll(cells[6], -1, axis=1),
        7: jnp.roll(cells[7], -1, axis=1),
        8: jnp.roll(cells[8], 1, axis=1),
    }
    # Planes pulling from the row below (global y-1): need prev shard's last row.
    south = jnp.stack([xr[2][-1:], xr[5][-1:], xr[6][-1:]])
    south_halo = _exchange_halos(south, +1)
    # Planes pulling from the row above (global y+1): need next shard's first row.
    north = jnp.stack([xr[4][:1], xr[7][:1], xr[8][:1]])
    north_halo = _exchange_halos(north, -1)

    def shift_down(p, halo):  # tmp[r] = p[r-1]
        return jnp.concatenate([halo, p[:-1]], axis=0)

    def shift_up(p, halo):  # tmp[r] = p[r+1]
        return jnp.concatenate([p[1:], halo], axis=0)

    return jnp.stack(
        [
            xr[0],
            xr[1],
            shift_down(xr[2], south_halo[0]),
            xr[3],
            shift_up(xr[4], north_halo[0]),
            shift_down(xr[5], south_halo[1]),
            shift_down(xr[6], south_halo[2]),
            shift_up(xr[7], north_halo[1]),
            shift_up(xr[8], north_halo[2]),
        ]
    )


def lbm_step_sharded(cells, obstacles, density, accel, omega, ny_global):
    """One timestep of the local shard (runs inside shard_map).

    Returns ``(new_cells, tot_u_global)`` — the reduction is already psum'd
    across the mesh.
    """
    cells = _accelerate_local(cells, obstacles, density, accel, ny_global)
    streamed = _stream_local(cells)
    new_cells, tot_u_local = collide(streamed, obstacles, omega)
    return new_cells, jax.lax.psum(tot_u_local, AXIS)


def make_sharded_c16_jnp_step(dev, ny_global: int):
    """c16 jnp per-shard step: decode → jnp sharded step → encode (the
    off-TPU / non-tiling fallback, mirroring devspace.lbm_step_reference_c16
    for the single-device driver)."""
    from lbm_tpu.ops.devspace import DevSpec, decode_state, encode_state

    spec = DevSpec(bg=tuple(dev[:9]), h=float(dev[9]))

    def step(state, obstacles, density, accel, omega):
        full = decode_state(state, spec)
        new, tot_u = lbm_step_sharded(
            full, obstacles, density, accel, omega, ny_global
        )
        return encode_state(new, spec), tot_u

    step.is_jnp = True  # pure-jnp: shard_map vma checking stays on
    return step


AXIS_X = "x"


def make_mesh_2d(py: int, px: int, devices=None) -> Mesh:
    """A 2-D ``(y, x)`` mesh: rows sharded over ``py`` devices, columns over
    ``px`` (SURVEY.md §7.6: the 8192^2 weak-scaling layout)."""
    if devices is None:
        devices = jax.devices()
    if py * px > len(devices):
        raise ValueError(f"requested {py}x{px} mesh, only {len(devices)} devices")
    return Mesh(np.asarray(devices[: py * px]).reshape(py, px), (AXIS, AXIS_X))


def _exchange_cols(planes_cols, direction: int):
    """ppermute a stacked ``(k, ny_local, 1)`` set of boundary columns one
    step around the x-ring."""
    n = jax.lax.axis_size(AXIS_X)
    perm = [(i, (i + direction) % n) for i in range(n)]
    return jax.lax.ppermute(planes_cols, AXIS_X, perm)


def _stream_local_2d(cells):
    """Streaming on a 2-D mesh: phase 1 exchanges one boundary COLUMN per
    x-direction and applies the x-shifts; phase 2 exchanges one boundary ROW
    of the already-x-shifted planes per y-direction. Corner values arrive
    correctly because the y-halo rows are taken from neighbors' x-shifted
    planes (whose edge columns already hold their x-neighbors' data — i.e.
    our diagonal neighbors')."""
    # Phase 1: x-shifts. Planes 1,5,8 pull from x-1 (need left neighbor's
    # last column); planes 3,6,7 pull from x+1 (right neighbor's first col).
    east_cols = jnp.stack([cells[k][:, -1:] for k in (1, 5, 8)])
    east_halo = _exchange_cols(east_cols, +1)  # from left neighbor
    west_cols = jnp.stack([cells[k][:, :1] for k in (3, 6, 7)])
    west_halo = _exchange_cols(west_cols, -1)  # from right neighbor

    def shift_east(p, halo):  # tmp[., x] = p[., x-1]
        return jnp.concatenate([halo, p[:, :-1]], axis=1)

    def shift_west(p, halo):  # tmp[., x] = p[., x+1]
        return jnp.concatenate([p[:, 1:], halo], axis=1)

    xs = {
        0: cells[0],
        1: shift_east(cells[1], east_halo[0]),
        2: cells[2],
        3: shift_west(cells[3], west_halo[0]),
        4: cells[4],
        5: shift_east(cells[5], east_halo[1]),
        6: shift_west(cells[6], west_halo[1]),
        7: shift_west(cells[7], west_halo[2]),
        8: shift_east(cells[8], east_halo[2]),
    }

    # Phase 2: y-shifts of the x-shifted planes (same as the 1-D path).
    south = jnp.stack([xs[2][-1:], xs[5][-1:], xs[6][-1:]])
    south_halo = _exchange_halos(south, +1)
    north = jnp.stack([xs[4][:1], xs[7][:1], xs[8][:1]])
    north_halo = _exchange_halos(north, -1)

    def shift_down(p, halo):
        return jnp.concatenate([halo, p[:-1]], axis=0)

    def shift_up(p, halo):
        return jnp.concatenate([p[1:], halo], axis=0)

    return jnp.stack(
        [
            xs[0],
            xs[1],
            shift_down(xs[2], south_halo[0]),
            xs[3],
            shift_up(xs[4], north_halo[0]),
            shift_down(xs[5], south_halo[1]),
            shift_down(xs[6], south_halo[2]),
            shift_up(xs[7], north_halo[1]),
            shift_up(xs[8], north_halo[2]),
        ]
    )


def lbm_step_sharded_2d(cells, obstacles, density, accel, omega, ny_global):
    """One timestep of the local shard on a 2-D ``(y, x)`` mesh."""
    cells = _accelerate_local(cells, obstacles, density, accel, ny_global)
    streamed = _stream_local_2d(cells)
    new_cells, tot_u_local = collide(streamed, obstacles, omega)
    return new_cells, jax.lax.psum(jax.lax.psum(tot_u_local, AXIS), AXIS_X)


def make_sharded_c16_jnp_step_2d(dev, ny_global: int):
    """c16 jnp per-shard step on a 2-D mesh: decode → jnp 2-D sharded step →
    encode (mirrors ``make_sharded_c16_jnp_step`` for the 1-D row mesh)."""
    from lbm_tpu.ops.devspace import DevSpec, decode_state, encode_state

    spec = DevSpec(bg=tuple(dev[:9]), h=float(dev[9]))

    def step(state, obstacles, density, accel, omega):
        full = decode_state(state, spec)
        new, tot_u = lbm_step_sharded_2d(
            full, obstacles, density, accel, omega, ny_global
        )
        return encode_state(new, spec), tot_u

    step.is_jnp = True  # pure-jnp: shard_map vma checking stays on
    return step


def _exchange_scalar_pair_x(vals, direction: int):
    """ppermute a tiny stacked array one step around the x-ring."""
    n = jax.lax.axis_size(AXIS_X)
    perm = [(i, (i + direction) % n) for i in range(n)]
    return jax.lax.ppermute(vals, AXIS_X, perm)


def _force_edge_cols(colL, colR, cells, nobst, density, accel, owner_row):
    """Apply the row-(ny-2) forcing to the OUTGOING edge columns before the
    x-exchange (the receiving shard streams from these values AFTER its own
    in-kernel forcing, so the sender — who holds all 9 planes at the edge
    cell — must pre-force them). ``colL`` = planes (1,5,8) last column,
    ``colR`` = planes (3,6,7) first column, each (3, ny_l, 1)."""
    dtype = colL.dtype
    ny_l = cells.shape[1]
    w1 = jnp.asarray(density * accel / 9.0, jnp.float32)
    w2 = jnp.asarray(density * accel / 36.0, jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, ny_l, 1), 1)
    row_sel = (rows == ny_l - 2).astype(jnp.float32)

    def mask_at(x):
        ok = (
            (cells[3, ny_l - 2, x].astype(jnp.float32) - w1 > 0.0)
            & (cells[6, ny_l - 2, x].astype(jnp.float32) - w2 > 0.0)
            & (cells[7, ny_l - 2, x].astype(jnp.float32) - w2 > 0.0)
        ).astype(jnp.float32)
        return ok * nobst[ny_l - 2, x].astype(jnp.float32) * owner_row

    dL = jnp.stack([w1, w2, w2]).reshape(3, 1, 1) * row_sel * mask_at(-1)
    dR = jnp.stack([w1, w2, w2]).reshape(3, 1, 1) * row_sel * mask_at(0)
    return (
        (colL.astype(jnp.float32) + dL).astype(dtype),
        (colR.astype(jnp.float32) - dR).astype(dtype),
    )


def _exchange_and_align_cols(colL, colR, dn, up, nblk):
    """x-exchange the new edge columns and splice in the four corner values
    (edge elements of the y-halo rows, which live on the x-neighbors), then
    re-align each plane's column to its pull row:

    - plane 1 pulls (y,   x-1): aligned as-is;
    - plane 5 pulls (y-1, x-1): row r uses the left column's row r-1 (row 0
      = up-left corner);
    - plane 8 pulls (y+1, x-1): row r uses row r+1 (last row = down-left
      corner); mirrored for planes 3/6/7 on the right."""
    recvL = _exchange_cols(colL, +1)  # from the left shard
    recvR = _exchange_cols(colR, -1)  # from the right shard
    nx_l = dn.shape[2]
    # Corner sources: halo_dn slot nblk-1 = up-neighbor's last row of planes
    # (2,5,6); halo_up slot 0 = down-neighbor's first row of planes (4,7,8).
    right_going = jnp.stack(
        [dn[nblk - 1, 1, nx_l - 1], up[0, 2, nx_l - 1]]
    )  # plane 5 / plane 8 edge values, needed by our RIGHT neighbor
    left_going = jnp.stack([dn[nblk - 1, 2, 0], up[0, 1, 0]])  # planes 6 / 7
    c5, c8 = _exchange_scalar_pair_x(right_going, +1)
    c6, c7 = _exchange_scalar_pair_x(left_going, -1)
    one = lambda v: v.reshape(1, 1)
    colfixL = jnp.stack(
        [
            recvL[0],
            jnp.concatenate([one(c5), recvL[1][:-1]], axis=0),
            jnp.concatenate([recvL[2][1:], one(c8)], axis=0),
        ]
    )
    colfixR = jnp.stack(
        [
            recvR[0],
            jnp.concatenate([one(c6), recvR[1][:-1]], axis=0),
            jnp.concatenate([recvR[2][1:], one(c7)], axis=0),
        ]
    )
    return colfixL, colfixR


def make_sharded_pallas_step_2d(interpret: bool = False, paired: bool | None = None):
    """The fused Pallas kernel as the per-shard step on a 2-D (y, x) mesh.

    The kernel runs with ``col_fix=True``: its lane-roll x-wrap is patched in
    the wrapped column with the x-neighbor's edge column (VERDICT r1 item 3).
    Per step, the exchanges are: the 1-D y-ring halo-slot ppermutes, one
    x-ring ppermute of 3 edge columns per direction, and one x-ring ppermute
    of 2 corner scalars per direction — all inside the jitted loop.

    The carry is ``(cells, halo_dn, halo_up, colfixL, colfixR)``; exposes an
    extended ``init_state(cells, nobst, density, accel)`` used by
    ``build_sharded_loop_2d`` (the forcing pre-fix on outgoing columns needs
    the physics constants).

    ``paired`` picks the collision form; it is resolved HERE (factory call,
    outside any trace) so the ``LBM_COLLIDE`` env read keys nothing inside
    jit (ADVICE r2: an env read under the trace is frozen by whichever call
    traced first)."""
    from lbm_tpu.ops import pallas_step as PS

    paired = paired_default() if paired is None else paired

    def owner_row():
        py = jax.lax.axis_size(AXIS)
        return (jax.lax.axis_index(AXIS) == py - 1).astype(jnp.float32)

    def step(state, nobst, density, accel, omega):
        owner = owner_row().reshape(1, 1)
        (cells, dn, up, colL_out, colR_out), tot_local = PS._step_carry_2d(
            state, nobst, density, accel, omega, interpret=interpret, owner=owner,
            paired=paired,
        )
        dn, up = _exchange_boundary_slots(dn, up)
        colL_out, colR_out = _force_edge_cols(
            colL_out, colR_out, cells, nobst, density, accel, owner_row()
        )
        colfixL, colfixR = _exchange_and_align_cols(
            colL_out, colR_out, dn, up, dn.shape[0]
        )
        return (cells, dn, up, colfixL, colfixR), jax.lax.psum(
            jax.lax.psum(tot_local, AXIS), AXIS_X
        )

    def init_state(cells_local, nobst, density, accel):
        cells_local = cells_local.astype(jnp.float32)
        block = PS._pick_block(cells_local.shape[1], cells_local.shape[2])
        if block is None:
            raise ValueError(
                f"local grid {cells_local.shape[1]}x{cells_local.shape[2]} "
                "unsupported by the pallas kernel"
            )
        dn, up = PS.make_halos(cells_local, block)
        dn, up = _exchange_boundary_slots(dn, up)
        colL = jnp.stack([cells_local[k][:, -1:] for k in (1, 5, 8)])
        colR = jnp.stack([cells_local[k][:, :1] for k in (3, 6, 7)])
        colL, colR = _force_edge_cols(
            colL, colR, cells_local, nobst, density, accel, owner_row()
        )
        colfixL, colfixR = _exchange_and_align_cols(colL, colR, dn, up, dn.shape[0])
        return cells_local, dn, up, colfixL, colfixR

    step.init_state_2d = init_state
    step.extract = lambda state: state[0]
    step.prepare = PS._prepare_obstacles
    return step


def build_sharded_loop_2d(mesh: Mesh, params: LBMParams, step_fn=None,
                          n_iters=None):
    """The jitted 2-D-mesh run. ``step_fn`` None = the jnp per-shard step;
    the fused-kernel step (``make_sharded_pallas_step_2d``) plugs in via the
    extended init protocol. ``n_iters`` overrides ``params.max_iters``
    (checkpoint chunking, mirroring build_sharded_loop)."""
    ny_global = params.ny
    density = float(params.density)
    accel = float(params.accel)
    omega = float(params.omega)
    n_iters = params.max_iters if n_iters is None else n_iters

    prepare = getattr(step_fn, "prepare", None) if step_fn is not None else None
    init_state_2d = (
        getattr(step_fn, "init_state_2d", None) if step_fn is not None else None
    )
    extract = getattr(step_fn, "extract", None) if step_fn is not None else None

    def local_loop(cells, obstacles, inv_tot_cells):
        # f32 av series under the 16-bit storage modes (bf16 and c16/int16),
        # matching build_sharded_loop and the single-device driver.
        av_dtype = (
            cells.dtype
            if cells.dtype in (jnp.float32, jnp.float64)
            else jnp.float32
        )
        store_dtype = cells.dtype
        av_vels = jnp.zeros((n_iters,), dtype=av_dtype)
        obstacles_prep = (
            prepare(obstacles, cells.dtype) if prepare is not None else obstacles
        )
        state = (
            init_state_2d(cells, obstacles_prep, density, accel)
            if init_state_2d is not None
            else cells
        )

        def body(tt, carry):
            state, av_vels = carry
            if step_fn is None:
                state, tot_u = lbm_step_sharded_2d(
                    state, obstacles_prep, density, accel, omega, ny_global
                )
            else:
                state, tot_u = step_fn(
                    state, obstacles_prep, density, accel, omega
                )
            av_vels = av_vels.at[tt].set(
                (tot_u * inv_tot_cells).astype(av_vels.dtype)
            )
            return state, av_vels

        state, av_vels = jax.lax.fori_loop(0, n_iters, body, (state, av_vels))
        cells = extract(state) if extract is not None else state
        # Storage dtype is preserved across chunks (bf16 stays bf16; the
        # av series alone promotes to f32), matching build_sharded_loop.
        return cells.astype(store_dtype), av_vels

    shard = P(None, AXIS, AXIS_X)
    # vma checking stays on for the jnp per-shard steps (including the c16
    # decode/step/encode wrapper); only the pallas_call step (whose
    # out_shapes carry no vma annotations) opts out (VERDICT r2 item 7).
    mapped = jax.shard_map(
        local_loop,
        mesh=mesh,
        in_specs=(shard, P(AXIS, AXIS_X), P()),
        out_specs=(shard, P()),
        check_vma=step_fn is None or getattr(step_fn, "is_jnp", False),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def run_simulation_sharded_2d(
    params: LBMParams,
    obstacles: np.ndarray,
    *,
    mesh_shape: tuple[int, int],
    backend: str = "auto",
    dtype=jnp.float32,
    initial_cells: np.ndarray | None = None,
    start_step: int = 0,
    av_vels_prefix: np.ndarray | None = None,
    checkpoint_every: int = 0,
    checkpoint_path: str | None = None,
    checkpoint_format: str = "npz",
):
    """Run the full simulation over a 2-D ``(py, px)`` device mesh.

    Checkpoint/resume/chunking mirror the 1-D runner
    (``run_simulation_sharded``): the loop is compiled per distinct chunk
    length, the resumable state is gathered to host per snapshot, and
    resume threads ``initial_cells``/``start_step``/``av_vels_prefix``
    back in (closes VERDICT r2 weak item 4 — the 2-D mesh previously
    rejected these loudly).

    ``dtype="c16"`` selects companded-deviation storage (ops/devspace.py)
    via the decode/step/encode jnp per-shard step; checkpoints and the
    returned state are decoded f32, mirroring the 1-D runner."""
    dev_spec = None
    dev_tuple = None
    if isinstance(dtype, str) and dtype == "c16":
        from lbm_tpu.ops.devspace import DevSpec

        dev_spec = DevSpec.for_params(params.density, params.accel)
        dev_tuple = (*dev_spec.bg, dev_spec.h)
        dtype = jnp.int16
    py, px = mesh_shape
    mesh = make_mesh_2d(py, px)
    if params.ny % py != 0 or params.nx % px != 0:
        raise ValueError(
            f"grid {params.ny}x{params.nx} not divisible by mesh {py}x{px}"
        )

    step_fn = None
    if backend == "pallas-overlap":
        raise ValueError(
            "pallas-overlap (in-kernel RDMA halo exchange) is 1-D-mesh only"
        )
    if backend == "band":
        raise ValueError(
            "band backend is single-device or 1-D-mesh only; use "
            "--backend auto/pallas/reference with a 2-D mesh"
        )
    if backend in ("resident", "aa", "temporal", "deep"):
        raise ValueError(
            f"{backend} backend is single-device only; use --backend "
            "auto/pallas/reference with a 2-D mesh"
        )
    if dev_tuple is not None:
        # c16 on a 2-D mesh runs the decode/step/encode jnp per-shard step
        # (the 2-D fused kernel is f32-only).
        if backend == "pallas":
            raise ValueError("2-D-mesh pallas backend is f32-only")
        step_fn = make_sharded_c16_jnp_step_2d(dev_tuple, params.ny)
    elif backend in ("auto", "pallas") and dtype == jnp.float32:
        from lbm_tpu.ops.pallas_step import pallas_supported

        fits = pallas_supported(params.ny // py, params.nx // px)
        on_tpu = mesh.devices.flat[0].platform == "tpu"
        if backend == "pallas":
            if not fits:
                raise ValueError(
                    f"local grid {params.ny // py}x{params.nx // px} does not "
                    "fit the pallas kernel's tiling constraints"
                )
            step_fn = make_sharded_pallas_step_2d(interpret=not on_tpu)
        elif on_tpu and fits:
            step_fn = make_sharded_pallas_step_2d()
    elif backend == "pallas":
        raise ValueError("2-D-mesh pallas backend is f32-only")

    from lbm_tpu.runtime.driver import SimulationResult, sync

    cells_sharding = NamedSharding(mesh, P(None, AXIS, AXIS_X))
    obst_sharding = NamedSharding(mesh, P(AXIS, AXIS_X))
    if dev_spec is not None:
        from lbm_tpu.ops.devspace import encode_state

        full = (
            D2Q9.initial_state(params, dtype=jnp.float32)
            if initial_cells is None
            else jnp.asarray(initial_cells, dtype=jnp.float32)
        )
        host_cells = encode_state(full, dev_spec)
    elif initial_cells is None:
        host_cells = D2Q9.initial_state(params, dtype=dtype)
    else:
        host_cells = jnp.asarray(initial_cells, dtype=dtype)
    cells = jax.device_put(host_cells, cells_sharding)
    # 1-bit/cell upload + device-side unpack (driver.upload_obstacles):
    # the dense int32 mask upload was the per-run fixed cost on relay
    # devices (bench_r3_fixedcost.json).
    from lbm_tpu.runtime.driver import upload_obstacles

    obstacles_dev = jax.device_put(
        upload_obstacles(np.asarray(obstacles)), obst_sharding
    )
    tot_cells = int(np.sum(np.asarray(obstacles) == 0))
    inv_dtype = dtype if dtype in (jnp.float32, jnp.float64) else jnp.float32
    inv_tot_cells = jnp.asarray(1.0 / tot_cells, dtype=inv_dtype)

    from lbm_tpu.runtime.driver import compute_chunk_sizes

    if params.max_iters - start_step <= 0:
        raise ValueError("start_step is beyond max_iters")
    av_chunks = [] if av_vels_prefix is None else [np.asarray(av_vels_prefix)]
    chunk_sizes = compute_chunk_sizes(start_step, params.max_iters, checkpoint_every)

    t0 = time.perf_counter()
    compiled = {
        n: build_sharded_loop_2d(mesh, params, step_fn=step_fn, n_iters=n)
        .lower(cells, obstacles_dev, inv_tot_cells)
        .compile()
        for n in sorted(set(chunk_sizes))
    }
    compile_time = time.perf_counter() - t0

    def as_full(state):
        if dev_spec is None:
            return state
        from lbm_tpu.ops.devspace import decode_state

        return decode_state(state, dev_spec)

    elapsed = 0.0
    step = start_step
    for n_chunk in chunk_sizes:
        t0 = time.perf_counter()
        cells, av = compiled[n_chunk](cells, obstacles_dev, inv_tot_cells)
        sync(cells)
        elapsed += time.perf_counter() - t0
        av_chunks.append(np.asarray(av))
        step += n_chunk
        if checkpoint_path is not None and checkpoint_every:
            from lbm_tpu.runtime.checkpoint import save_checkpoint_as

            save_checkpoint_as(
                checkpoint_path, params, np.asarray(as_full(cells)),
                np.concatenate(av_chunks), step, format=checkpoint_format,
            )

    return SimulationResult(
        cells=np.asarray(as_full(cells)),
        av_vels=np.concatenate(av_chunks),
        elapsed=elapsed,
        compile_time=compile_time,
    )


def make_sharded_pallas_step(interpret: bool = False, paired: bool | None = None,
                             dev=None):
    """The fused Pallas kernel as the per-shard step (runs inside shard_map).

    Each shard runs the kernel on its local row block; the kernel maintains
    per-block boundary-row halos as side outputs, and the two slots that
    cross shard boundaries are swapped with ring ``ppermute``s — one send of
    3 rows in each direction per step, riding ICI. The forcing row is gated
    by an owner scalar so only the shard holding global row ny-2 applies it.

    Storage follows the carry's dtype (f32, bf16, or — with ``dev``, the
    static c16 companding tuple — int16 companded deviations; see
    ops/devspace.py). bf16/c16 round between steps exactly like the
    single-device block kernel; arithmetic is f32 in-kernel either way.
    The i16 halo rows ride the ppermutes untouched (exchange involves no
    arithmetic). ``paired`` is resolved at factory time so the
    ``LBM_COLLIDE`` env read never happens under a trace (ADVICE r2).

    The returned function carries ``(cells_local, halo_dn, halo_up)`` and
    exposes the driver's init_state/extract/prepare protocol.
    """
    from lbm_tpu.ops import pallas_step as PS

    paired = paired_default() if paired is None else paired

    def step(state, nobst, density, accel, omega):
        n = jax.lax.axis_size(AXIS)
        idx = jax.lax.axis_index(AXIS)
        owner = (idx == n - 1).astype(jnp.float32).reshape(1, 1)
        (cells, dn, up), tot_local = PS._step_carry(
            state, nobst, density, accel, omega, interpret=interpret, owner=owner,
            paired=paired, dev=dev,
        )
        dn, up = _exchange_boundary_slots(dn, up)
        return (cells, dn, up), jax.lax.psum(tot_local, AXIS)

    def init_state(cells_local):
        if cells_local.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
            cells_local = cells_local.astype(jnp.float32)
        block = PS._pick_block(
            cells_local.shape[1], cells_local.shape[2], cells_local.dtype
        )
        if block is None:
            raise ValueError(
                f"local grid {cells_local.shape[1]}x{cells_local.shape[2]} "
                "unsupported by the pallas kernel"
            )
        dn, up = PS.make_halos(cells_local, block)
        dn, up = _exchange_boundary_slots(dn, up)
        return cells_local, dn, up

    step.init_state = init_state
    step.extract = lambda state: state[0]
    step.prepare = PS._prepare_obstacles
    return step


def make_sharded_pallas_step_overlap(interpret: bool = False,
                                     paired: bool | None = None):
    """Opt-in variant of ``make_sharded_pallas_step``: the cross-shard halo
    exchange happens INSIDE the kernel via async remote copies, overlapping
    the 3-row sends with interior-block compute (see ops/pallas_remote.py).
    The carried halo arrays stay all-local (no ppermute pre-exchange).
    ``paired`` resolves at factory time (never under a trace — ADVICE r2)."""
    from lbm_tpu.ops import pallas_step as PS
    from lbm_tpu.ops.pallas_remote import step_overlap

    paired = paired_default() if paired is None else paired

    def step(state, nobst, density, accel, omega):
        n = jax.lax.axis_size(AXIS)
        idx = jax.lax.axis_index(AXIS)
        owner = (idx == n - 1).astype(jnp.float32).reshape(1, 1)
        neighbors = (
            jnp.stack([(idx - 1) % n, (idx + 1) % n]).astype(jnp.int32).reshape(1, 2)
        )
        state, tot_local = step_overlap(
            state, nobst, density, accel, omega, neighbors, owner,
            interpret=interpret, paired=paired,
        )
        return state, jax.lax.psum(tot_local, AXIS)

    def init_state(cells_local):
        cells_local = cells_local.astype(jnp.float32)
        block = PS._pick_block(cells_local.shape[1], cells_local.shape[2])
        if block is None:
            raise ValueError(
                f"local grid {cells_local.shape[1]}x{cells_local.shape[2]} "
                "unsupported by the pallas kernel"
            )
        dn, up = PS.make_halos(cells_local, block)
        return cells_local, dn, up

    step.init_state = init_state
    step.extract = lambda state: state[0]
    step.prepare = PS._prepare_obstacles
    return step


def _shard_lean_env() -> bool:
    """LBM_SHARD_LEAN: "0" selects the legacy compact-neighbor-strip
    protocol (two materialized (9, nblk*T, nx) arrays per pass); unset/
    "1" the lean protocol (neighbor strips as BlockSpec views of cells,
    only the two T-row shard halos ppermuted — VERDICT r4 item 2's tax
    cut). band2 full-row only; read at factory time, outside any trace."""
    import os

    return os.environ.get("LBM_SHARD_LEAN", "1") != "0"


def _shard_force_env() -> bool:
    """LBM_SHARD_FORCE: "row" selects the 1-dynamic-row forcing form in
    the sharded band2 kernel; unset/"field" the per-step forcing field
    (the round-4 form). band2 full-row only; factory-time env read."""
    import os

    return os.environ.get("LBM_SHARD_FORCE", "field") == "row"


def make_sharded_band_step(block: int, depth: int, ny_global: int,
                           interpret: bool = False,
                           paired: bool | None = None, dev=None,
                           panel: int | None = None, halo: int = 128,
                           band2: bool = False, lean: bool | None = None,
                           rowforce: bool | None = None,
                           probe_no_collectives: bool = False):
    """Communication-avoiding per-shard step: T timesteps per call via the
    band kernel's sharded-local variant (ops/pallas_band.py
    ``step_band_sharded``) with ONE T-row ppermute pair per pass — T x
    fewer ICI collectives than the single-step kernel's per-step 3-row
    exchange, and the per-pass in-VMEM step loop amortizes HBM traffic
    exactly like the single-device band kernel (2/T + 2/B plane-passes
    per step). With ``panel``, the x axis is processed in P-column panels
    (``step_band_sharded_panel``) so shard widths whose full-row buffer
    exceeds VMEM — 8192-wide, the BASELINE weak-scaling config — run the
    same scheme; x halos stay local (the mesh is 1-D over rows).

    Protocol extensions consumed by ``build_sharded_loop``:
    ``steps_per_call = T`` (the loop advances T av_vels slots per call and
    runs ``tail_step`` — the single-step fused kernel — for the
    ``n_iters % T`` remainder, mirroring single-device ``run_band``).
    ``paired`` resolves at factory time (never under a trace — ADVICE r2).
    """
    from lbm_tpu.ops import pallas_band as PBAND

    T = depth
    paired = paired_default() if paired is None else paired
    lean = _shard_lean_env() if lean is None else lean
    rowforce = _shard_force_env() if rowforce is None else rowforce
    lean = lean and band2 and panel is None  # lean protocol: band2 full-row

    def step(cells, nob_ext_arr, density, accel, omega):
        n = jax.lax.axis_size(AXIS)
        idx = jax.lax.axis_index(AXIS)
        rows = cells.shape[1]
        nblk = rows // block
        b = block // T
        fwd = [(j, (j + 1) % n) for j in range(n)]
        bwd = [(j, (j - 1) % n) for j in range(n)]
        # halo_dn = previous shard's last T rows; halo_up = next shard's
        # first T rows (same orientation as _exchange_boundary_slots).
        if probe_no_collectives:
            # ATTRIBUTION PROBE ONLY (PHYSICS-CORRECT solely at mesh=1,
            # where the self-ppermute is the identity): local slices in
            # place of the collectives, to price the ppermute pair.
            halo_dn, halo_up = cells[:, rows - T :], cells[:, :T]
        else:
            halo_dn = jax.lax.ppermute(cells[:, rows - T :], AXIS, fwd)
            halo_up = jax.lax.ppermute(cells[:, :T], AXIS, bwd)
        if nblk > 1 and not lean:
            # Strided strip selection via reshape + static slice, NOT a
            # jnp.take gather (XLA gathers are pathologically slow on TPU;
            # this runs once per T-step pass). Strip i*b-1 = block i-1's
            # last sub-strip; strip (i+1)*b = block i+1's first.
            strips5 = cells.reshape(9, nblk, b, T, cells.shape[2])
            n_compact = jnp.concatenate(
                [halo_dn[:, None], strips5[:, : nblk - 1, b - 1]], axis=1
            ).reshape(9, nblk * T, cells.shape[2])
            s_compact = jnp.concatenate(
                [strips5[:, 1:, 0], halo_up[:, None]], axis=1
            ).reshape(9, nblk * T, cells.shape[2])
        else:
            # lean: the kernel reads interior strips from cells itself;
            # only the two raw shard halos are passed (nblk == 1 legacy
            # degenerates to the same thing).
            n_compact, s_compact = halo_dn, halo_up
        r0 = (idx * rows).astype(jnp.int32).reshape(1, 1)
        if band2 and panel is not None:
            from lbm_tpu.ops.pallas_band2 import step_band2_sharded_panel

            cells, sums = step_band2_sharded_panel(
                cells, n_compact, s_compact, nob_ext_arr, r0,
                density, accel, omega, block, T, panel, ny_global, halo,
                interpret=interpret, paired=paired, dev=dev,
            )
        elif band2:
            from lbm_tpu.ops.pallas_band2 import step_band2_sharded

            cells, sums = step_band2_sharded(
                cells, n_compact, s_compact, nob_ext_arr, r0,
                density, accel, omega, block, T, ny_global,
                interpret=interpret, paired=paired, dev=dev,
                lean=lean, rowforce=rowforce,
            )
        elif panel is None:
            cells, sums = PBAND.step_band_sharded(
                cells, n_compact, s_compact, nob_ext_arr, r0,
                density, accel, omega, block, T, ny_global,
                interpret=interpret, paired=paired, dev=dev,
            )
        else:
            cells, sums = PBAND.step_band_sharded_panel(
                cells, n_compact, s_compact, nob_ext_arr, r0,
                density, accel, omega, block, T, panel, ny_global, halo,
                interpret=interpret, paired=paired, dev=dev,
            )
        if probe_no_collectives:
            return cells, sums  # mesh=1: psum over one shard is identity
        return cells, jax.lax.psum(sums, AXIS)

    def prepare(obstacles, dtype):
        if jnp.dtype(dtype) not in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
            jnp.dtype(jnp.int16),
        ):
            dtype = jnp.float32
        n = jax.lax.axis_size(AXIS)
        nob = (obstacles == 0).astype(dtype)
        fwd = [(j, (j + 1) % n) for j in range(n)]
        bwd = [(j, (j - 1) % n) for j in range(n)]
        m_dn = jax.lax.ppermute(nob[-T:], AXIS, fwd)
        m_up = jax.lax.ppermute(nob[:T], AXIS, bwd)
        padded = jnp.concatenate([m_dn, nob, m_up], axis=0)
        if panel is None:
            return PBAND.nobst_ext_local(padded, block, T, dtype)
        return PBAND.nobst_ext_local_panel(padded, block, T, panel, halo,
                                           dtype)

    def init_state(cells_local):
        if cells_local.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
            cells_local = cells_local.astype(jnp.float32)
        return cells_local

    step.prepare = prepare
    step.init_state = init_state
    step.extract = lambda state: state
    step.steps_per_call = T
    step.tail_step = make_sharded_pallas_step(
        interpret=interpret, paired=paired, dev=dev
    )
    return step


def _exchange_boundary_slots(dn, up):
    """Swap the shard-crossing halo slots around the ring.

    Slot ``nblk-1`` of halo_dn is read by local block 0, whose upstream
    neighbor lives on the previous shard; slot 0 of halo_up is read by the
    last local block, whose downstream neighbor is on the next shard.
    """
    n = jax.lax.axis_size(AXIS)
    nblk = dn.shape[0]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    dn_recv = jax.lax.ppermute(dn[nblk - 1 : nblk], AXIS, fwd)
    up_recv = jax.lax.ppermute(up[0:1], AXIS, bwd)
    return dn.at[nblk - 1 : nblk].set(dn_recv), up.at[0:1].set(up_recv)


def build_sharded_loop(mesh: Mesh, params: LBMParams, step_fn=None, n_iters=None):
    """The full jitted multi-device run: cells and obstacles sharded row-wise,
    the whole ``fori_loop`` inside one shard_map, av_vels replicated.

    ``step_fn`` operates on the local shard and may expose the driver's
    prepare/init_state/extract protocol (the sharded pallas step does);
    default is the jnp reference step. ``n_iters`` overrides
    ``params.max_iters`` (checkpoint chunking).
    """
    ny_global = params.ny
    density = float(params.density)
    accel = float(params.accel)
    omega = float(params.omega)
    n_iters = params.max_iters if n_iters is None else n_iters

    step_fn_is_jnp = step_fn is None or getattr(step_fn, "is_jnp", False)
    if step_fn is None:
        def step_fn(cells, obstacles, d, a, o):  # noqa: ANN001
            return lbm_step_sharded(cells, obstacles, d, a, o, ny_global)

    prepare = getattr(step_fn, "prepare", None)
    init_state = getattr(step_fn, "init_state", None)
    extract = getattr(step_fn, "extract", None)
    # Multi-step-per-call steps (the band sharded step advances T steps
    # per call, returning a (T,) per-step sum vector); the n_iters % T
    # remainder runs on the step's single-step ``tail_step``, mirroring
    # single-device run_band's block-kernel tail.
    spc = getattr(step_fn, "steps_per_call", 1)
    tail_step = getattr(step_fn, "tail_step", None)

    def local_loop(cells, obstacles, inv_tot_cells):
        # The mean-velocity series stays f32 under the 16-bit storage modes
        # (bf16 and c16/int16), matching the single-device driver
        # (driver._run_loop) — VERDICT r2 item 5.
        av_dtype = (
            cells.dtype
            if cells.dtype in (jnp.float32, jnp.float64)
            else jnp.float32
        )
        store_dtype = cells.dtype
        av_vels = jnp.zeros((n_iters,), dtype=av_dtype)
        obstacles_prep = (
            prepare(obstacles, cells.dtype) if prepare is not None else obstacles
        )
        state = init_state(cells) if init_state is not None else cells

        if spc == 1:
            def body(tt, carry):
                state, av_vels = carry
                state, tot_u = step_fn(
                    state, obstacles_prep, density, accel, omega
                )
                av_vels = av_vels.at[tt].set(
                    (tot_u * inv_tot_cells).astype(av_dtype)
                )
                return state, av_vels

            state, av_vels = jax.lax.fori_loop(
                0, n_iters, body, (state, av_vels)
            )
            cells = extract(state) if extract is not None else state
            return cells.astype(store_dtype), av_vels

        main_calls, tail = divmod(n_iters, spc)

        def body(tt, carry):
            state, av_vels = carry
            state, sums = step_fn(state, obstacles_prep, density, accel, omega)
            av_vels = jax.lax.dynamic_update_slice(
                av_vels, (sums * inv_tot_cells).astype(av_dtype), (tt * spc,)
            )
            return state, av_vels

        state, av_vels = jax.lax.fori_loop(
            0, main_calls, body, (state, av_vels)
        )
        cells = extract(state) if extract is not None else state
        if tail:
            t_prep = tail_step.prepare(obstacles, cells.dtype)
            t_state = tail_step.init_state(cells)

            def tbody(k, carry):
                t_state, av_vels = carry
                t_state, tot_u = tail_step(
                    t_state, t_prep, density, accel, omega
                )
                av_vels = av_vels.at[main_calls * spc + k].set(
                    (tot_u * inv_tot_cells).astype(av_dtype)
                )
                return t_state, av_vels

            t_state, av_vels = jax.lax.fori_loop(
                0, tail, tbody, (t_state, av_vels)
            )
            cells = tail_step.extract(t_state)
        return cells.astype(store_dtype), av_vels

    shard = P(None, AXIS, None)
    # The jnp per-shard step verifies under XLA's varying-mesh-axis checking;
    # pallas_call out_shapes carry no vma annotations, so the fused-kernel
    # step keeps the opt-out (its cross-shard correctness is pinned by
    # tests/test_sharded.py instead) — VERDICT r2 item 7.
    mapped = jax.shard_map(
        local_loop,
        mesh=mesh,
        in_specs=(shard, P(AXIS, None), P()),
        out_specs=(shard, P()),
        check_vma=step_fn_is_jnp,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def pick_shard_step(params: LBMParams, n_shards: int, backend: str, dtype,
                    *, on_tpu: bool, dev=None):
    """Resolve the per-shard step for a 1-D row mesh (None = the jnp step).

    dtype-aware: bf16 runs the fused kernel with bf16 storage (f32
    arithmetic), matching the single-device block kernel; f64 routes to
    the jnp step (never a silent downgrade) — VERDICT r2 item 5. With
    ``dev`` (the c16 companding tuple), int16 runs the fused kernel in
    companded-deviation mode, falling back to the decode/step/encode jnp
    wrapper off-TPU.
    """
    if backend in ("resident", "aa", "temporal", "deep", "slab"):
        # Single-device-only kernels: fail loudly rather than silently
        # running the jnp step under a mesh (loud-errors invariant).
        raise ValueError(
            f"{backend} backend is single-device only; use --backend "
            "auto/pallas/pallas-overlap/band/band2/reference with --mesh"
        )
    if backend == "band2":
        # band2's sharded-local variant (ops/pallas_band2.py): the same
        # communication-avoiding T-steps-per-ppermute protocol with the
        # ref-resident step body (+26-29% single-device). Shard widths
        # whose full-row buffer exceeds VMEM fall back to the x-split
        # panel variant (step_band2_sharded_panel) — the 8192-wide
        # BASELINE weak-scaling config runs the fastest step body too.
        from lbm_tpu.ops.pallas_band import pick_config as band_pick
        from lbm_tpu.ops.pallas_band import pick_config_panel as band_pick_panel
        from lbm_tpu.ops.pallas_band2 import (
            band2_panel_supported,
            band2_supported,
        )

        b2_dtype = (
            jnp.dtype(dtype)
            if jnp.dtype(dtype) in (
                jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
                jnp.dtype(jnp.int16),
            )
            else None
        )
        if b2_dtype is None or (
            jnp.dtype(dtype) == jnp.dtype(jnp.int16) and dev is None
        ):
            raise ValueError(
                "sharded band2 backend stores f32/bf16/c16 only; use "
                "--precision f32/bf16/c16"
            )
        rows = params.ny // n_shards
        cfg = band_pick(rows, params.nx, b2_dtype)
        if cfg is not None and band2_supported(rows, params.nx, *cfg,
                                               b2_dtype):
            return make_sharded_band_step(
                cfg[0], cfg[1], params.ny, interpret=not on_tpu, dev=dev,
                band2=True,
            )
        # t16_special=False: the SHARDED panel-band2 compile is probed at
        # T8 only (probe_band2_sharded_compile.py --panel); the full-grid
        # kernel's 8192^2 T16 shortcut must not leak here (ADVICE r3).
        pcfg = band_pick_panel(rows, params.nx, b2_dtype, t16_special=False)
        if pcfg is None or not band2_panel_supported(
            rows, params.nx, *pcfg, dtype=b2_dtype
        ):
            raise ValueError(
                f"local grid {rows}x{params.nx} unsupported by the band2 "
                "kernel; use --backend band/pallas or fewer shards"
            )
        return make_sharded_band_step(
            pcfg[0], pcfg[1], params.ny, interpret=not on_tpu, dev=dev,
            panel=pcfg[2], band2=True,
        )
    if backend == "band":
        # Communication-avoiding deep blocking per shard: T steps per
        # ppermute pair (make_sharded_band_step).
        from lbm_tpu.ops.pallas_band import pick_config as band_pick

        band_dtype = (
            jnp.dtype(dtype)
            if jnp.dtype(dtype) in (
                jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
                jnp.dtype(jnp.int16),
            )
            else None
        )
        if band_dtype is None or (
            jnp.dtype(dtype) == jnp.dtype(jnp.int16) and dev is None
        ):
            raise ValueError(
                "sharded band backend stores f32/bf16/c16 only; use "
                "--precision f32/bf16/c16"
            )
        from lbm_tpu.ops.pallas_band import pick_config_panel as band_pick_panel

        rows = params.ny // n_shards
        cfg = band_pick(rows, params.nx, band_dtype)
        if cfg is not None:
            block, depth = cfg
            return make_sharded_band_step(
                block, depth, params.ny, interpret=not on_tpu, dev=dev
            )
        # T8 only, as for band2 above: the sharded panel compile probes
        # never covered T16 (ADVICE r3).
        pcfg = band_pick_panel(rows, params.nx, band_dtype, t16_special=False)
        if pcfg is None:
            raise ValueError(
                f"local grid {rows}x{params.nx} unsupported by the band "
                "kernel; use --backend pallas or fewer shards"
            )
        block, depth, panel = pcfg
        return make_sharded_band_step(
            block, depth, params.ny, interpret=not on_tpu, dev=dev,
            panel=panel,
        )
    if backend not in ("auto", "pallas", "pallas-overlap"):
        return (
            make_sharded_c16_jnp_step(dev, params.ny)
            if dev is not None and backend == "reference"
            else None
        )
    from lbm_tpu.ops.pallas_step import _pick_block

    kernel_dtype = (
        jnp.dtype(dtype)
        if jnp.dtype(dtype) in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
        )
        else None
    )
    if jnp.dtype(dtype) == jnp.dtype(jnp.int16) and dev is None:
        kernel_dtype = None  # raw int16 without a companding spec is invalid
    fits = kernel_dtype is not None and (
        _pick_block(params.ny // n_shards, params.nx, kernel_dtype) is not None
    )
    if backend in ("pallas", "pallas-overlap"):
        if backend == "pallas-overlap" and dev is not None:
            raise ValueError("pallas-overlap does not support c16 storage yet")
        if kernel_dtype is None:
            raise ValueError(
                f"sharded {backend} backend stores f32/bf16/c16 only; use "
                "--precision f32/bf16/c16 or the jnp step for f64"
            )
        if not fits:
            if dev is not None:
                return make_sharded_c16_jnp_step(dev, params.ny)
            raise ValueError(
                f"local grid {params.ny // n_shards}x{params.nx} does not fit "
                "the pallas kernel's tiling constraints"
            )
        if backend == "pallas-overlap":
            # dev is always None here (the c16 combination errored above).
            return make_sharded_pallas_step_overlap(interpret=not on_tpu)
        return make_sharded_pallas_step(interpret=not on_tpu, dev=dev)
    if dev is not None:
        # c16 auto: fused kernel on TPU, jnp wrapper otherwise.
        if on_tpu and fits:
            return make_sharded_pallas_step(dev=dev)
        return make_sharded_c16_jnp_step(dev, params.ny)
    if on_tpu and fits:
        return make_sharded_pallas_step()
    return None


def run_simulation_sharded(
    params: LBMParams,
    obstacles: np.ndarray,
    *,
    n_devices: int | None = None,
    backend: str = "auto",
    dtype=jnp.float32,
    initial_cells: np.ndarray | None = None,
    start_step: int = 0,
    av_vels_prefix: np.ndarray | None = None,
    checkpoint_every: int = 0,
    checkpoint_path: str | None = None,
    checkpoint_format: str = "npz",
):
    """Run the full simulation over a device mesh. Requires ``ny`` divisible
    by the number of devices. Checkpoint/resume mirrors the single-device
    driver (chunked loop; resumable state gathered to host per snapshot).
    ``dtype="c16"`` selects companded-deviation storage (ops/devspace.py);
    checkpoints and the returned state are decoded f32."""
    dev_spec = None
    dev_tuple = None
    if isinstance(dtype, str) and dtype == "c16":
        from lbm_tpu.ops.devspace import DevSpec

        dev_spec = DevSpec.for_params(params.density, params.accel)
        dev_tuple = (*dev_spec.bg, dev_spec.h)
        dtype = jnp.int16
    mesh = make_mesh(n_devices)
    n = mesh.devices.size
    if params.ny % n != 0:
        raise ValueError(f"ny={params.ny} not divisible by {n} devices")

    step_fn = pick_shard_step(params, n, backend, dtype,
                              on_tpu=mesh.devices.flat[0].platform == "tpu",
                              dev=dev_tuple)

    cells_sharding = NamedSharding(mesh, P(None, AXIS, None))
    obst_sharding = NamedSharding(mesh, P(AXIS, None))

    if dev_spec is not None:
        from lbm_tpu.ops.devspace import encode_state

        full = (
            D2Q9.initial_state(params, dtype=jnp.float32)
            if initial_cells is None
            else jnp.asarray(initial_cells, dtype=jnp.float32)
        )
        host_cells = encode_state(full, dev_spec)
    elif initial_cells is None:
        host_cells = D2Q9.initial_state(params, dtype=dtype)
    else:
        host_cells = jnp.asarray(initial_cells, dtype=dtype)
    cells = jax.device_put(host_cells, cells_sharding)
    # 1-bit/cell upload + device-side unpack (driver.upload_obstacles):
    # the dense int32 mask upload was the per-run fixed cost on relay
    # devices (bench_r3_fixedcost.json).
    from lbm_tpu.runtime.driver import upload_obstacles

    obstacles_dev = jax.device_put(
        upload_obstacles(np.asarray(obstacles)), obst_sharding
    )
    tot_cells = int(np.sum(np.asarray(obstacles) == 0))
    inv_dtype = dtype if dtype in (jnp.float32, jnp.float64) else jnp.float32
    inv_tot_cells = jnp.asarray(1.0 / tot_cells, dtype=inv_dtype)

    from lbm_tpu.runtime.driver import SimulationResult, sync

    remaining = params.max_iters - start_step
    if remaining <= 0:
        raise ValueError("start_step is beyond max_iters")
    av_chunks = [] if av_vels_prefix is None else [np.asarray(av_vels_prefix)]

    from lbm_tpu.runtime.driver import compute_chunk_sizes

    chunk_sizes = compute_chunk_sizes(start_step, params.max_iters, checkpoint_every)

    t0 = time.perf_counter()
    compiled = {
        n: build_sharded_loop(mesh, params, step_fn=step_fn, n_iters=n)
        .lower(cells, obstacles_dev, inv_tot_cells)
        .compile()
        for n in sorted(set(chunk_sizes))
    }
    compile_time = time.perf_counter() - t0

    def as_full(state):
        if dev_spec is None:
            return state
        from lbm_tpu.ops.devspace import decode_state

        return decode_state(state, dev_spec)

    elapsed = 0.0
    step = start_step
    for n_chunk in chunk_sizes:
        t0 = time.perf_counter()
        cells, av = compiled[n_chunk](cells, obstacles_dev, inv_tot_cells)
        sync(cells)
        elapsed += time.perf_counter() - t0
        av_chunks.append(np.asarray(av))
        step += n_chunk
        if checkpoint_path is not None and checkpoint_every:
            from lbm_tpu.runtime.checkpoint import save_checkpoint_as

            save_checkpoint_as(
                checkpoint_path, params, np.asarray(as_full(cells)),
                np.concatenate(av_chunks), step, format=checkpoint_format,
            )

    return SimulationResult(
        cells=np.asarray(as_full(cells)),
        av_vels=np.concatenate(av_chunks),
        elapsed=elapsed,
        compile_time=compile_time,
    )
