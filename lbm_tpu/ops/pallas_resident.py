"""VMEM-resident multi-step Pallas kernel.

For lattices whose whole state fits in VMEM (v5e: ~128 MB/core — grids up
to ~1024x1024 at f32), the fastest schedule is not streaming row blocks per
step but keeping the ENTIRE state on-chip and running many timesteps inside
one kernel invocation:

- the 9 planes live in VMEM as the ``lax.fori_loop`` carry; HBM is touched
  only once per K-step chunk (state in + state out) instead of once per
  step — a ~K-fold reduction of HBM traffic;
- with the whole grid present, BOTH periodic wraps are plain rolls
  (sublanes for y, lanes for x — kernels.cl:80-98's modulo indexing with no
  halos of any kind);
- the per-step reduction writes one scalar per step into an SMEM output
  array, so the av_vels series still materializes exactly once per step;
- planes are updated pairwise (k, opp[k]) so bounce-back sources are
  consumed before overwrite, keeping the peak VMEM live-set to ~13 planes.

The driver chunks ``max_iters`` into K-step mega-calls (outer jitted
``fori_loop``), scattering each chunk's av partials into the run-length
series. Accuracy is identical to the block kernel (same f32 arithmetic, same
operation order) — validated against the jnp oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.models.d2q9 import C_SQ, W0, W1, W2

# Whole-state VMEM budget. Measured on v5e (128 MB VMEM): the compiled
# in-loop live set is input window + output window + ~3.25x state of
# register-spill slots (1024^2 = 36 MB state demands 198.7 MB and fails),
# so states must stay under ~128/5.25 ≈ 24 MB; 20 MB leaves margin.
_MAX_STATE_BYTES = 20 * 1024 * 1024
# Steps per mega-call: HBM traffic amortizes as 2/K state-passes per step;
# K=256 makes it negligible while keeping the av SMEM output tiny.
_CHUNK_STEPS = 256


def resident_supported(ny: int, nx: int, dtype=jnp.float32) -> bool:
    if dtype != jnp.float32:
        return False  # bf16 large grids are HBM-bound; use the block kernel
    return nx % 128 == 0 and ny % 8 == 0 and 9 * ny * nx * 4 <= _MAX_STATE_BYTES


def _mega_kernel(cells_ref, nobst_ref, owner_ref, out_ref, av_ref,
                 *, steps: int, ny: int, nx: int,
                 w1a: float, w2a: float, omega: float):
    nobst = nobst_ref[...].astype(jnp.float32)
    obst = 1.0 - nobst
    rows = jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0)
    row_sel = (rows == ny - 2).astype(jnp.float32) * owner_ref[0, 0]

    def roll2(p, cy, cx):  # pull shift: value moves by (+cy, +cx), periodic
        if cy:
            p = pltpu.roll(p, cy % ny, 0)
        if cx:
            p = pltpu.roll(p, cx % nx, 1)
        return p

    cys = (0, 0, 1, 0, -1, 1, 1, -1, -1)
    cxs = (0, 1, 0, -1, 0, 1, -1, -1, 1)
    fcx = (0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0)
    fcy = (0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0)
    ws = (W0, W1, W1, W1, W1, W2, W2, W2, W2)
    opp = (0, 3, 4, 1, 2, 7, 8, 5, 6)

    def step_body(tt, c):
        # accelerate_flow (kernels.cl:21-41), joint mask on the forcing row
        ok = ((c[3] - w1a > 0.0) & (c[6] - w2a > 0.0) & (c[7] - w2a > 0.0)).astype(
            jnp.float32
        )
        amask = row_sel * ok * nobst
        c = (
            c[0],
            c[1] + w1a * amask,
            c[2],
            c[3] - w1a * amask,
            c[4],
            c[5] + w2a * amask,
            c[6] - w2a * amask,
            c[7] - w2a * amask,
            c[8] + w2a * amask,
        )
        # pull streaming — whole grid, both wraps are rolls
        t = tuple(roll2(c[k], cys[k], cxs[k]) for k in range(9))
        rho = (((t[0] + t[1]) + (t[2] + t[3])) + ((t[4] + t[5]) + (t[6] + t[7]))) + t[8]
        inv_rho = 1.0 / rho
        u_x = ((t[1] + t[5] + t[8]) - (t[3] + t[6] + t[7])) * inv_rho
        u_y = ((t[2] + t[5] + t[6]) - (t[4] + t[7] + t[8])) * inv_rho
        u_sq = u_x * u_x + u_y * u_y
        common = 1.0 - u_sq * (0.5 / C_SQ)

        def relax(k):
            if k == 0:
                feq = ws[0] * rho * common
            else:
                cu = fcx[k] * u_x + fcy[k] * u_y if fcx[k] and fcy[k] else (
                    fcx[k] * u_x if fcx[k] else fcy[k] * u_y
                )
                feq = ws[k] * rho * (
                    common + cu * (1.0 / C_SQ) + cu * cu * (0.5 / (C_SQ * C_SQ))
                )
            return nobst * (t[k] + omega * (feq - t[k])) + obst * t[opp[k]]

        new_c = tuple(relax(k) for k in range(9))
        av_ref[tt, 0] = jnp.sum(nobst * jnp.sqrt(u_sq))
        return new_c

    c0 = tuple(cells_ref[k].astype(jnp.float32) for k in range(9))
    c_final = jax.lax.fori_loop(0, steps, step_body, c0)
    for k in range(9):
        out_ref[k] = c_final[k]


@functools.lru_cache(maxsize=None)
def _make_mega_call(ny, nx, steps, w1a, w2a, omega, interpret):
    kern = functools.partial(
        _mega_kernel, steps=steps, ny=ny, nx=nx, w1a=w1a, w2a=w2a, omega=omega
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


def run_resident(cells, nobst, density, accel, omega, n_iters, *, interpret=False):
    """Run ``n_iters`` steps with the VMEM-resident mega-kernel.

    Returns ``(final_cells, tot_u_series)`` where the series is the
    UN-normalized per-step sum of |u| over unblocked cells (length n_iters).
    """
    _, ny, nx = cells.shape
    w1a = float(density * accel / 9.0)
    w2a = float(density * accel / 36.0)
    omega = float(omega)
    owner = jnp.ones((1, 1), jnp.float32)

    n_full = n_iters // _CHUNK_STEPS
    rem = n_iters - n_full * _CHUNK_STEPS
    tot_u = jnp.zeros((n_iters,), jnp.float32)

    if n_full:
        call = _make_mega_call(ny, nx, _CHUNK_STEPS, w1a, w2a, omega, interpret)

        def body(j, carry):
            cells, tot_u = carry
            cells, av = call(cells, nobst, owner)
            tot_u = jax.lax.dynamic_update_slice(tot_u, av[:, 0], (j * _CHUNK_STEPS,))
            return cells, tot_u

        cells, tot_u = jax.lax.fori_loop(0, n_full, body, (cells, tot_u))
    if rem:
        call = _make_mega_call(ny, nx, rem, w1a, w2a, omega, interpret)
        cells, av = call(cells, nobst, owner)
        tot_u = jax.lax.dynamic_update_slice(tot_u, av[:, 0], (n_full * _CHUNK_STEPS,))
    return cells, tot_u
