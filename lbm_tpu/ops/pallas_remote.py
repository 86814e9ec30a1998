"""Overlapped cross-shard halo exchange: RDMA inside the step kernel.

The production 1-D sharded path (`parallel/sharded.py`) ppermutes the two
shard-crossing halo slots BETWEEN kernel calls — the exchange serializes
with compute. This opt-in variant moves the exchange INSIDE the fused step
kernel with ``pltpu.make_async_remote_copy`` so the 3-row sends ride ICI
while the interior blocks compute (docs/ROADMAP.md item 4; the reference
has no analogue — it is single-device, job_submit_d2q9-bgk:10):

- grid order is permuted interior-first: blocks 1..nblk-2, then nblk-1,
  then 0 (dynamic index maps);
- at grid step 0: a neighbor barrier (both ring neighbors must have entered
  this step's kernel so the remote scratch exists), then two RDMAs start —
  ``halo_dn[nblk-1]`` (my last boundary row-pack, planes 2/5/6) to the next
  shard and ``halo_up[0]`` (planes 4/7/8) to the previous shard;
- interior blocks read their neighbor halo slots locally from the carried
  arrays (which in this mode are all-local — no pre-exchange);
- block 0 (scheduled last) waits the receive semaphore and reads its
  above-halo from the RDMA landing buffer; block nblk-1 likewise for its
  below-halo; the final grid step drains the send semaphores.

Single-chip environments can only validate semantics (TPU interpret mode
simulates the remote DMAs and semaphores on a multi-device CPU mesh — see
tests/test_sharded.py); the overlap win needs a real multi-chip slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.ops.collision import av_fold, av_total, paired_default
from lbm_tpu.ops.pallas_step import _physics


def _order(g, nblk):
    """Grid-step -> block permutation: [1, .., nblk-2, nblk-1, 0]."""
    if nblk == 1:
        return g * 0
    return jnp.where(
        g < nblk - 2, g + 1, jnp.where(g == nblk - 2, nblk - 1, 0)
    )


def _kernel_overlap(cells_ref, halo_dn_ref, halo_up_ref, nobst_ref, owner_ref,
                    neigh_ref,
                    out_ref, halo_dn_out_ref, halo_up_out_ref, sums_ref,
                    recv_dn_ref, recv_up_ref,
                    send_dn_sem, recv_dn_sem, send_up_sem, recv_up_sem,
                    *, block: int, nblk: int, w1a: float, w2a: float,
                    omega: float, paired: bool = True):
    g = pl.program_id(0)
    b = _order(g, nblk)
    left = neigh_ref[0, 0]
    right = neigh_ref[0, 1]

    rdma_dn = pltpu.make_async_remote_copy(
        src_ref=halo_dn_ref.at[nblk - 1],
        dst_ref=recv_dn_ref,
        send_sem=send_dn_sem,
        recv_sem=recv_dn_sem,
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma_up = pltpu.make_async_remote_copy(
        src_ref=halo_up_ref.at[0],
        dst_ref=recv_up_ref,
        send_sem=send_up_sem,
        recv_sem=recv_up_sem,
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(g == 0)
    def _start():
        # Both neighbors must have entered this step's kernel before data
        # lands in their scratch buffers.
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 2)
        rdma_dn.start()
        rdma_up.start()

    @pl.when(b == 0)
    def _recv_dn():
        rdma_dn.wait_recv()

    @pl.when(b == nblk - 1)
    def _recv_up():
        rdma_up.wait_recv()

    @pl.when(g == nblk - 1)
    def _drain():
        rdma_dn.wait_send()
        rdma_up.wait_send()

    # Halo rows: local slots for interior blocks, the RDMA landing buffers
    # for the two boundary blocks (clamped dynamic indices keep the unused
    # local load in range; its value is discarded by the select).
    prev = jnp.maximum(b - 1, 0)
    nxt = jnp.minimum(b + 1, nblk - 1)
    hd_local = halo_dn_ref[pl.ds(prev, 1)][0].astype(jnp.float32)
    hu_local = halo_up_ref[pl.ds(nxt, 1)][0].astype(jnp.float32)
    hd = jnp.where(b == 0, recv_dn_ref[...].astype(jnp.float32), hd_local)
    hu = jnp.where(
        b == nblk - 1, recv_up_ref[...].astype(jnp.float32), hu_local
    )

    force_gate = (
        jnp.where(b == nblk - 1, 1.0, 0.0).astype(jnp.float32) * owner_ref[0, 0]
    )
    nobst = nobst_ref[...].astype(jnp.float32)
    m = [cells_ref[k].astype(jnp.float32) for k in range(9)]
    res, u_sq = _physics(
        m, hd, hu, nobst, force_gate, block=block, w1a=w1a, w2a=w2a,
        omega=omega, paired=paired,
    )
    for k in range(9):
        out_ref[k] = res[k]
    halo_dn_out_ref[0, 0:1] = res[2][block - 1 : block]
    halo_dn_out_ref[0, 1:2] = res[5][block - 1 : block]
    halo_dn_out_ref[0, 2:3] = res[6][block - 1 : block]
    halo_up_out_ref[0, 0:1] = res[4][0:1]
    halo_up_out_ref[0, 1:2] = res[7][0:1]
    halo_up_out_ref[0, 2:3] = res[8][0:1]
    sums_ref[g, 0] = av_total(av_fold(None, nobst, u_sq, paired))


@functools.lru_cache(maxsize=None)
def _make_call_overlap(ny, nx, block, w1a, w2a, omega, interpret, paired=True):
    nblk = ny // block
    kern = functools.partial(
        _kernel_overlap, block=block, nblk=nblk, w1a=w1a, w2a=w2a, omega=omega,
        paired=paired,
    )

    def bmap(g):
        return _order(g, nblk)

    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((9, block, nx), lambda g: (0, bmap(g), 0), memory_space=pltpu.VMEM),
            # Whole halo arrays (all-local slots; the shard-crossing pair
            # arrives via RDMA instead of a pre-exchange).
            pl.BlockSpec((ny // block, 3, nx), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ny // block, 3, nx), lambda g: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, nx), lambda g: (bmap(g), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, block, nx), lambda g: (0, bmap(g), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nx), lambda g: (bmap(g), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nx), lambda g: (bmap(g), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 3, nx), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 3, nx), jnp.float32),
            jax.ShapeDtypeStruct((nblk, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, nx), jnp.float32),  # RDMA landing: above-halo
            pltpu.VMEM((3, nx), jnp.float32),  # RDMA landing: below-halo
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # The neighbor barrier's get_barrier_semaphore needs a collective
            # id in both compiled and interpret modes.
            collective_id=7,
            vmem_limit_bytes=min(
                120 * 1024 * 1024,
                5 * (9 * block * nx * 4) + 2 * (ny // block) * 3 * nx * 4
                + 8 * 1024 * 1024,
            ),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )


def step_overlap(state, nobst, density, accel, omega, neighbors, owner,
                 *, interpret=False, paired=None):
    """One fused timestep with in-kernel RDMA halo exchange.

    ``state`` = (cells, halo_dn, halo_up) with ALL-LOCAL halo slots;
    ``neighbors`` = (1, 2) int32 [left, right] logical mesh coordinates;
    ``owner`` = (1, 1) f32 forcing-row gate. Returns ``(state', tot_u_local)``.
    """
    from lbm_tpu.ops.pallas_step import _pick_block

    cells, halo_dn, halo_up = state
    _, ny, nx = cells.shape
    block = _pick_block(ny, nx, cells.dtype)
    if block is None:
        raise ValueError(f"grid {ny}x{nx} unsupported by the pallas kernel")
    call = _make_call_overlap(
        ny, nx, block,
        float(density * accel / 9.0),
        float(density * accel / 36.0),
        float(omega),
        bool(interpret),
        paired=paired_default() if paired is None else paired,
    )
    new_cells, new_dn, new_up, partials = call(
        cells, halo_dn, halo_up, nobst, owner, neighbors
    )
    return (new_cells, new_dn, new_up), jnp.sum(partials)
