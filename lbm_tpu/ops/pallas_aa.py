"""In-place AA-pattern VMEM-resident kernel: single-copy on-chip state.

The ping-pong resident kernel (`pallas_resident.py`) needs TWO whole-state
VMEM windows, capping it at ~40 MB states (1024^2 f32). This kernel keeps
ONE copy of the state in a VMEM scratch buffer and advances it IN PLACE
with the AA streaming pattern (P. Bailey et al., "Accelerating Lattice
Boltzmann Fluid Flow Simulations Using Graphics Processors", ICPP 2009),
doubling the grid size that runs fully on-chip: ~1536^2 f32 and 2048^2
bf16 — grids the block/temporal kernels stream from HBM at a fraction of
the speed (BENCHMARKS.md "memory-system regimes").

Steps alternate between two arrangements of the 9 planes:

- arrangement **S** (before an even step): slot ``(x, i)`` holds the
  post-streaming arrival ``t_i(x)``;
- arrangement **C** (before an odd step): slot ``(x, opp(i))`` holds the
  post-collision value ``f*_i(x)`` (pre-stream, reversed slots).

The *even* step is fully local (zero relayouts): read the 9 slots at
``x``, BGK-relax (kernels.cl:109-177), bounce-back on obstacles
(kernels.cl:100-107), and write value-traveling-in-direction-``k`` into
slot ``opp(k)`` of the same cell — S -> C. The *odd* step gathers
``t_i(x)`` from ``(x - c_i, opp(i))``, relaxes, and scatters the results
to ``(x + c_i, i)`` — C -> S, i.e. it performs BOTH neighboring streamings
around one collision. In-place safety: for the even step every write is
cell-local; for the odd step the unique reader and the unique writer of
any ``(row, lane, slot)`` address live in the same row tile (reader of
``(w, i)`` is cell ``w - c_i``, which is also its writer), so a
reads-then-writes tile discipline is race-free for ANY tile order,
including the periodic wrap rows.

The row-(ny-2) forcing (kernels.cl:7-42) is applied once per step before
any reads: for odd steps in C space (plane ``i`` lives at slot
``opp(i)``, row ny-2, unshifted); for even steps in S space (the
pre-stream delta on plane ``i`` at row ny-2 lands post-streaming at row
``ny-2+cy_i`` lane-shifted by ``cx_i`` of slot ``i``, and the positivity
mask reads the pre-stream values of planes 3/6/7 through the same shift).
Both are row-level updates costing a handful of 1-row relayouts.

Chunk interface: the caller streams the regular pre-stream arrangement R
into S once per run (9 whole-plane rolls in jnp), runs even-length chunks
(S -> S, state stays resident-arranged across chunks), and converts back
at the end — ``unstream`` after an even total, a zero-cost plane
permutation after an odd one. HBM sees the state twice per chunk (in/out
DMA of the scratch), exactly like the ping-pong kernel, but VMEM holds it
once.

Arithmetic is f32 regardless of the storage dtype; per-step reductions
are exact (each cell counted once; the default per-tile-tree structure
keeps the same operation order as the other kernels — the alternative
``vecav``/``mxuav`` structures in collision.av_fold reorder the f32
sums, well inside the checker's 1% gate). bf16 storage rounds between steps like the block kernel's bf16
mode; c16 (int16 companded deviations, ops/devspace.py) halves the VMEM
footprint — doubling the on-chip grid area — decoding after every load
and encoding before every store (the forcing rows pay one extra encode
per step vs the streaming kernels' single post-collision encode).
Validated against the jnp oracle in tests/test_aa.py.
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

# Single-copy VMEM budget: state + mask plane + tile temporaries must fit
# in ~127 MB. 1536^2 f32 = 85 MB, 2048^2 bf16 = 75.5 MB — both OK.
_MAX_STATE_BYTES = 100 * 1024 * 1024
# Even so chunks map S -> S and the state stays resident-arranged between
# chunks; the final (possibly odd) remainder chunk handles the parity.
_CHUNK_STEPS = 254


def aa_supported(ny: int, nx: int, dtype=jnp.float32) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    # int16 is the c16 companded-deviation storage (ops/devspace.py): it
    # halves the VMEM footprint, doubling the grid area that fits on-chip.
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        return False
    return (
        nx % 128 == 0
        and ny % 8 == 0
        and ny >= 8
        and 9 * ny * nx * itemsize <= _MAX_STATE_BYTES
    )


# The relay toolchain's compile helper dies when a kernel's TOTAL VMEM
# footprint (scratches + mask window + live tile temporaries) exceeds
# ~91-107 MB (bench_r2_tpu15.json: 1408^2 f32 at ~91 MB compiles, 1536^2
# at ~107 MB does not, independent of allocation split and tile count).
# The tile picker fits the temporaries into what this target leaves.
_TOTAL_VMEM_TARGET = 90 * 1024 * 1024


def _pick_tile(ny: int, nx: int, itemsize: int = 4, fused: bool = False) -> int:
    """Tile height: ~22 live tile-planes of f32 temporaries, budgeted so
    state + mask + temporaries stay under the toolchain's total-VMEM
    ceiling (capped at ~24 MB of temporaries — bigger buys nothing).

    Unlike the ping-pong kernel's picker this does NOT require tile | ny —
    the step loops handle a ragged last tile (large unrolled tile counts
    are also compile hazards; big tiles keep ntiles in the proven range).

    ``fused``: the round-4 fused collision form keeps a couple more live
    tile-planes (the ``(1-omega) t_k`` products), which tipped the
    largest near-cliff shape over the relay compile ceiling — 1408^2 f32
    at the budgeted tile 120 fails, while 72 and 56 compile AND run
    faster (bench_r4_ladder.json FAIL; bench_r4_fusededge.json: tile 56
    at 18.3k MLUPS > tile 72's 16.7k). Near the cliff (state + mask >=
    68 MiB — also catches the unprobed 1344^2-class shapes whose
    modeled total sits at the same ~89 MB) the fused pick clamps to the
    fastest validated tile; 1280^2 (62.5 MiB) compiles at its unclamped
    budgeted tile under fused.
    """
    override = os.environ.get("LBM_AA_TILE")
    if override:
        t = int(override)
        if t < 8 or t % 8 != 0:
            # The kernel's in-place-safety argument needs sublane-aligned
            # tiles ("h is still a multiple of 8 since ny and tile are");
            # fail clearly rather than with a Mosaic error (ADVICE r2).
            raise ValueError(
                f"LBM_AA_TILE={override}: tile must be a multiple of 8 and >= 8"
            )
        return min(ny, t)
    state = 9 * ny * nx * itemsize
    # 16-bit storage modes carry the mask plane at 16 bits too (0/1 are
    # exact in bf16; run_aa converts) — it matters at the c16 sizes.
    mask = ny * nx * (2 if itemsize == 2 else 4)
    budget = min(24 * 1024 * 1024, _TOTAL_VMEM_TARGET - state - mask)
    if budget < 4 * 1024 * 1024:
        # State already beyond this toolchain's compile ceiling (reachable
        # only via forced --backend aa, e.g. on a standard libtpu build
        # with the full 128 MB VMEM): don't degenerate to tiny tiles and a
        # huge unroll — use the perf-optimal temporaries budget.
        budget = 24 * 1024 * 1024
    max_rows = max(8, budget // (22 * nx * 4) // 8 * 8)
    if fused and state + mask >= 68 * 1024 * 1024:
        max_rows = min(max_rows, 56)
    return min(ny, max_rows)


# The state scratch is one VMEM allocation PER PLANE. (Probing the relay
# compile-helper crashes went through whole-state, half-split, and
# per-plane variants before isolating TOTAL footprint — see
# _TOTAL_VMEM_TARGET — as the binding limit; per-plane is kept: it is the
# most granular, costs nothing, and the access pattern is unchanged.)


def _aa_kernel(cells_hbm, nobst_ref, owner_ref, out_hbm, av_ref,
               *scratch,
               steps: int, ny: int, nx: int, tile: int,
               w1a: float, w2a: float, omega: float, out_dtype,
               paired=True, dev=None, probe: str = ""):
    # ``probe`` is an attribution-only knob (scripts/probe_aa_small.py),
    # NOT reachable from the driver: comma tokens "noforce" (skip the
    # per-step forcing rows) and "noav" (skip the per-step |u| reduction)
    # produce PHYSICS-WRONG results whose timing isolates the fixed
    # per-step costs that dominate small grids (BENCHMARKS.md round-4
    # small-grid sections).
    probe_noforce = "noforce" in probe
    probe_noav = "noav" in probe
    # Reduction-form tokens (bench_r4_aasmall.json attributed 9-19% of the
    # step to the |u| reduction): "rawav" drops the sqrt entirely (wrong
    # series — the sqrt-cost lower bound); "vecav"/"mxuav"/"treeav" force
    # a reduction STRUCTURE (collision.av_fold — tree is the measured
    # default, vecav the bench_r4_vecav.json negative result, mxuav the
    # idle-systolic-array offload); "slowav" (the sqrt-vs-rsqrt A/B) is
    # form-neutral since bench_r4_fastav.json and accepted as a no-op.
    probe_rawav = "rawav" in probe
    probe_form = None
    for _tok, _form in (("vecav", "vec"), ("mxuavdef", "mxudef"),
                        ("mxuav", "mxu"), ("treeav", "tree")):
        if _tok in probe:
            probe_form = _form
            break  # specific-first: "mxuavdef" contains "mxuav"

    def av_accumulate(acc, nob, u_sq):
        """Fold one tile's masked |u| into the per-step accumulator
        (collision.av_fold; ``av_store`` collapses once per step)."""
        if probe_rawav:
            vec, scal = (None, None) if acc is None else acc
            part = jnp.sum(nob * u_sq)
            return vec, (part if scal is None else scal + part)
        return av_fold(acc, nob, u_sq, paired, form=probe_form)
    planes = scratch[:9]
    sem_in, sem_out = scratch[9], scratch[10]

    class _Planes:
        """state[k, rows] views dispatching to the per-plane scratches."""

        def __getitem__(self, idx):
            k, rows = idx
            return planes[k][rows]

        def __setitem__(self, idx, val):
            k, rows = idx
            planes[k][rows] = val

    state = _Planes()
    for k in range(9):
        copy_in = pltpu.make_async_copy(cells_hbm.at[k], planes[k], sem_in)
        copy_in.start()
        copy_in.wait()

    owner = owner_ref[0, 0]
    # Ragged tiling: (r0, h) pairs covering [0, ny); only the last tile may
    # be short (h is still a multiple of 8 since ny and tile are).
    tiles = [(r0, min(tile, ny - r0)) for r0 in range(0, ny, tile)]
    f32 = jnp.float32

    # Storage codec. ``dev = (bg0..bg8, h)`` selects c16 companded-deviation
    # storage (ops/devspace.py): decode right after load, encode right
    # before store, all physics at f32. The slot index is the right codec
    # key in BOTH AA arrangements: arrangement C stores f*_k at slot
    # opp(k), and D2Q9 opposite pairs share their weight (kernels.cl:100-107
    # pairs), so bg[opp(k)] == bg[k] always.
    if dev is None:
        def from_store(raw, _k):
            return raw.astype(f32)

        def to_store(val, _k):
            return val.astype(out_dtype)
    else:
        from lbm_tpu.ops.devspace import decode_value, encode_value

        def from_store(raw, k):
            return decode_value(raw.astype(f32), dev[9]) + dev[k]

        def to_store(val, k):
            return encode_value(val - dev[k], dev[9]).astype(out_dtype)

    def nob_tile(r0, h):
        """Per-tile not-obstacle plane — sliced from the ref (never the whole
        grid as a value: a full-grid mask would add ~20-32 MB of live vregs
        at the AA sizes)."""
        return nobst_ref[r0 : r0 + h].astype(f32)

    def east(p):
        return pltpu.roll(p, 1, 1)

    def west(p):
        return pltpu.roll(p, nx - 1, 1)

    def shift_x(p, cx):
        return east(p) if cx == 1 else (west(p) if cx == -1 else p)

    def read(k, lo, h):
        """state[k] rows [lo, lo+h) with periodic wrap (|lo offset| <= 1)."""
        lo_m = lo % ny
        if lo_m + h <= ny:
            return from_store(state[k, lo_m : lo_m + h], k)
        # Only +-1 offsets occur: exactly one wrapped row.
        return from_store(
            jnp.concatenate(
                [state[k, lo_m:ny], state[k, 0 : lo_m + h - ny]], axis=0
            ),
            k,
        )

    def write(k, lo, val):
        """state[k] rows [lo, lo+rows(val)) <- val, periodic wrap as above."""
        val = to_store(val, k)
        h = val.shape[0]
        lo_m = lo % ny
        if lo_m + h <= ny:
            state[k, lo_m : lo_m + h] = val
        else:
            split = ny - lo_m
            state[k, lo_m:ny] = val[:split]
            state[k, 0 : lo_m + h - ny] = val[split:]

    def row(k, r):
        r = r % ny
        return from_store(state[k, r : r + 1], k)

    def force_mask(f3_row, f6_row, f7_row):
        """Joint positivity mask (kernels.cl:29-32) x not-obstacle x owner."""
        ok = (
            (f3_row - w1a > 0.0) & (f6_row - w2a > 0.0) & (f7_row - w2a > 0.0)
        ).astype(f32)
        return ok * nobst_ref[ny - 2 : ny - 1].astype(f32) * owner

    def force_even():
        """Step forcing in S space: the pre-stream delta on plane i at row
        ny-2 appears post-streaming at row ny-2+cy_i, lane-shifted by cx_i,
        in slot i; the mask reads planes 3/6/7 through the same shift."""
        m = force_mask(
            east(row(3, ny - 2)), east(row(6, ny - 1)), east(row(7, ny - 3))
        )
        for k, w in ((1, w1a), (3, -w1a), (5, w2a), (6, -w2a), (7, -w2a), (8, w2a)):
            r = (ny - 2 + _CYS[k]) % ny
            delta = shift_x(m, _CXS[k]) * w
            state[k, r : r + 1] = to_store(row(k, r) + delta, k)

    def force_odd():
        """Step forcing in C space: plane i lives at slot opp(i), row ny-2."""
        m = force_mask(row(_OPP[3], ny - 2), row(_OPP[6], ny - 2), row(_OPP[7], ny - 2))
        for k, w in ((1, w1a), (3, -w1a), (5, w2a), (6, -w2a), (7, -w2a), (8, w2a)):
            s = _OPP[k]
            state[s, ny - 2 : ny - 1] = to_store(row(s, ny - 2) + m * w, s)

    def av_store(av_idx, total):
        # One small (8, nx) tree reduction per STEP (vs one (tile, nx)
        # tree per tile before round 4).
        av_ref[av_idx, 0] = av_total(total)

    # "avearly" probe token: fold the reduction right after bgk_relax,
    # BEFORE the 9 plane writes, so the MXU matmul issues while the VPU
    # runs the store phase (attribution for the not-fully-hidden matmul
    # latency — trace-order experiment; Mosaic may reorder either way).
    probe_avearly = "avearly" in probe

    def even_step(av_idx):
        """S -> C: local collide, write slot opp(k) <- value traveling k."""
        if not probe_noforce:
            force_even()
        total = None
        for r0, h in tiles:
            t = tuple(read(k, r0, h) for k in range(9))
            relaxed, u_sq = bgk_relax(t, omega, paired=paired)
            nob = nob_tile(r0, h)
            nob_b = nob > 0.0
            if probe_avearly and not probe_noav:
                total = av_accumulate(total, nob, u_sq)
            for k in range(9):
                write(_OPP[k], r0, jnp.where(nob_b, relaxed[k], t[_OPP[k]]))
            if not probe_avearly and not probe_noav:
                total = av_accumulate(total, nob, u_sq)
        av_store(av_idx, total)

    def odd_step(av_idx):
        """C -> S: gather t_k from (x - c_k, opp(k)), collide, scatter the
        value traveling k to (x + c_k, k)."""
        if not probe_noforce:
            force_odd()
        total = None
        for r0, h in tiles:
            t = tuple(
                shift_x(read(_OPP[k], r0 - _CYS[k], h), _CXS[k]) for k in range(9)
            )
            relaxed, u_sq = bgk_relax(t, omega, paired=paired)
            nob = nob_tile(r0, h)
            nob_b = nob > 0.0
            if probe_avearly and not probe_noav:
                total = av_accumulate(total, nob, u_sq)
            for k in range(9):
                out_k = jnp.where(nob_b, relaxed[k], t[_OPP[k]])
                write(k, r0 + _CYS[k], shift_x(out_k, _CXS[k]))
            if not probe_avearly and not probe_noav:
                total = av_accumulate(total, nob, u_sq)
        av_store(av_idx, total)

    def pair(i, _):
        even_step(2 * i)
        odd_step(2 * i + 1)
        return 0

    jax.lax.fori_loop(0, steps // 2, pair, 0)
    if steps % 2:
        even_step(steps - 1)

    for k in range(9):
        copy_out = pltpu.make_async_copy(planes[k], out_hbm.at[k], sem_out)
        copy_out.start()
        copy_out.wait()


@functools.lru_cache(maxsize=None)
def _make_aa_call(ny, nx, steps, w1a, w2a, omega, interpret, dtype_name,
                  paired=True, tile=None, dev=None, probe=""):
    dtype = jnp.dtype(dtype_name)
    if tile is None:
        tile = _pick_tile(ny, nx, dtype.itemsize)
    kern = functools.partial(
        _aa_kernel, steps=steps, ny=ny, nx=nx, tile=tile,
        w1a=w1a, w2a=w2a, omega=omega, out_dtype=dtype, paired=paired,
        dev=dev, probe=probe,
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, ny, nx), dtype),
            jax.ShapeDtypeStruct((steps, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ny, nx), dtype) for _ in range(9)]
        + [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )


def stream_planes(cells, sign: int = 1):
    """R -> S (sign=+1): slot (x, i) <- f_i(x - c_i); sign=-1 inverts."""
    return jnp.stack(
        [
            jnp.roll(cells[k], (sign * _CYS[k], sign * _CXS[k]), (0, 1))
            for k in range(9)
        ]
    )


def run_aa(cells, nobst, density, accel, omega, n_iters, *,
           interpret=False, paired=None, tile=None, dev=None, chunk=None,
           probe=""):
    """Run ``n_iters`` steps with the in-place AA-resident kernel.

    Same contract as ``pallas_resident.run_resident``: returns
    ``(final_cells, tot_u_series)`` with the UN-normalized per-step sums.
    ``tile`` overrides the row-tile height (None → ``_pick_tile``, which
    reads ``LBM_AA_TILE``); jitted callers must resolve it outside the
    trace (see driver._run_aa). ``dev = (bg0..bg8, h)`` enables c16
    companded int16 storage (ops/devspace.py) — ``cells`` then holds the
    encoded deviations and VMEM residency reaches ~2x the f32 grid area.
    ``chunk`` (even) overrides the steps-per-kernel-invocation (None →
    ``_CHUNK_STEPS``): small grids amortize the per-invocation launch
    cost over more steps (the 128^2 official config at chunk 254 pays
    ~157 launches over 40k steps — the VERDICT r3 item-6 suspect);
    jitted callers resolve ``LBM_AA_CHUNK`` outside the trace.
    ``probe`` ("noforce"/"noav" tokens) builds PHYSICS-WRONG attribution
    kernels for the small-grid overhead study — probe scripts only.
    """
    _, ny, nx = cells.shape
    if not aa_supported(ny, nx, cells.dtype):
        raise ValueError(
            f"grid {ny}x{nx} (dtype {cells.dtype.name}) unsupported by the "
            "AA-resident kernel"
        )
    if (cells.dtype == jnp.int16) != (dev is not None):
        raise ValueError("int16 (c16) AA storage requires a dev spec")
    w1a = float(density * accel / 9.0)
    w2a = float(density * accel / 36.0)
    omega = float(omega)
    owner = jnp.ones((1, 1), jnp.float32)
    # 16-bit storage carries the mask at 16 bits too (0/1 exact in bf16);
    # the kernel converts tiles to f32 on read either way.
    mask_dtype = (
        jnp.bfloat16 if jnp.dtype(cells.dtype).itemsize == 2 else jnp.float32
    )
    nobst = nobst.astype(mask_dtype)
    if paired is None:
        paired = paired_default()

    state = stream_planes(cells)  # R -> S, once per run
    if tile is None:
        tile = _pick_tile(
            ny, nx, jnp.dtype(cells.dtype).itemsize,
            fused=isinstance(paired, str) and paired.startswith("fused"),
        )
    if chunk is None:
        chunk = _CHUNK_STEPS
    elif chunk < 2 or chunk % 2:
        raise ValueError(f"AA chunk must be even and >= 2, got {chunk}")
    n_full = n_iters // chunk
    rem = n_iters - n_full * chunk
    tot_u = jnp.zeros((n_iters,), jnp.float32)

    if n_full:
        call = _make_aa_call(
            ny, nx, chunk, w1a, w2a, omega, interpret,
            cells.dtype.name, paired, tile, dev, probe,
        )

        def body(j, carry):
            state, tot_u = carry
            state, av = call(state, nobst, owner)
            tot_u = jax.lax.dynamic_update_slice(
                tot_u, av[:, 0], (j * chunk,)
            )
            return state, tot_u

        state, tot_u = jax.lax.fori_loop(0, n_full, body, (state, tot_u))
    if rem:
        call = _make_aa_call(
            ny, nx, rem, w1a, w2a, omega, interpret, cells.dtype.name, paired,
            tile, dev, probe,
        )
        state, av = call(state, nobst, owner)
        tot_u = jax.lax.dynamic_update_slice(
            tot_u, av[:, 0], (n_full * chunk,)
        )
    if rem % 2:
        cells = state[jnp.asarray(_OPP)]  # C -> R: plane permutation
    else:
        cells = stream_planes(state, sign=-1)  # S -> R
    return cells, tot_u
