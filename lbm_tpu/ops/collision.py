"""Shared BGK collision for the Pallas kernels.

Three arithmetically equivalent forms of the reference's equilibrium +
relaxation (kernels.cl:109-177), selectable per kernel build:

- ``literal``: the reference's per-direction formula, one ``feq_k`` per
  plane — the round-1 form, kept for A/B baselines and bit-for-bit
  comparison with the early benchmark numbers.
- ``paired`` (the round 1-3 default): exploits that opposite directions share weight and
  satisfy ``cu_opp = -cu`` (kernels.cl:100-107's opposite table), so each
  of the four (k, opp) pairs needs ONE quadratic term and ONE linear term:

      q = w rho (common + cu^2 / (2 c^4));  d = w rho cu / c^2
      feq_k = q + d;  feq_opp = q - d

  ~30% fewer VPU ops for the equilibrium stage. The D2Q9 step has no
  matmuls, so the VPU op count is the compute ceiling once a kernel is no
  longer HBM-bound (the VMEM-resident and temporally-blocked schedules —
  see docs/DESIGN.md "Round-2 temporal-blocking depth study").
- ``fused`` (round-4 default): the paired form with three further
  trace-time regroupings, ~14 fewer VPU ops/cell (~15% of the relax
  stage) — measured +9-12% MLUPS on the compute-bound kernels
  (bench_r4_fused.json):

  1. omega folded into the equilibrium weights —
     ``t + omega (feq - t)  ==  (1 - omega) t + (omega w) rho (...)``,
     so the per-plane relax costs one multiply-add instead of
     (sub, mul, add);
  2. the per-weight-class ``(omega w) rho`` hoisted out of the pairs
     (W1 and W2 each serve two pairs);
  3. the moment numerators CSE'd through the shared diagonal
     differences ``t5 - t7`` / ``t6 - t8`` (each appears in BOTH u_x
     and u_y with opposite/equal signs — see ``_moments_fused``).

All forms produce results within a few f32 ulps of each other; the golden
gate (1% tolerance, 40k-80k steps) and the oracle tests (atol 2-3e-7) hold
for any of them. ``LBM_COLLIDE=literal|paired|fused`` picks the form at
dispatch time (resolved OUTSIDE jit; the value keys every kernel-build
cache).
"""

from __future__ import annotations

import os

from lbm_tpu.models.d2q9 import C_SQ, W0, W1, W2

_FCX = (0.0, 1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0)
_FCY = (0.0, 0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0)
_WS = (W0, W1, W1, W1, W1, W2, W2, W2, W2)

# The four opposite-direction pairs (kernels.cl:100-107) with their shared
# weight and the linear term cu_k expressed in (u_x, u_y) coefficients.
_PAIRS = (
    (1, 3, W1, (1.0, 0.0)),
    (2, 4, W1, (0.0, 1.0)),
    (5, 7, W2, (1.0, 1.0)),
    (6, 8, W2, (-1.0, 1.0)),
)


def paired_default():
    """Kernel-build default for the collision form (env-overridable).

    Returns the value every kernel passes straight through to
    ``bgk_relax(paired=...)``: ``False`` (literal), ``True`` (paired) or
    the string ``"fused"``. The tri-valued flag keeps the historical
    ``paired`` plumbing (static jit args / lru_cache keys hash all
    three) without touching every kernel signature.

    ``fused`` is the default since round 4: measured +9-12% on the
    HBM-regime band2 kernels and +3-10% on the AA flagship, no losses
    (bench_r4_fused.json), golden-gated on TPU at all four official
    configs (bench_r4_gold_fused.json).
    """
    mode = os.environ.get("LBM_COLLIDE", "fused")
    if mode == "literal":
        return False
    if mode == "paired":
        return True
    if mode in ("fused-slowav", "fused-treeav", "fused-vecav",
                "fused-mxuav", "fused-mxuavdef"):
        return mode
    return "fused"


# AA shapes where the MXU av-reduction measured a win over the tree
# form on TPU, best-of-3 interleaved (bench_r4_mxuroute.json): 1024²
# mxu(HIGHEST) 26,493 vs tree 25,245 MLUPS (+4.9%); single-pass DEFAULT
# reached 26,852 (+6.4%) but its bf16 input rounding cost real gate
# margin (1024² av max diff 0.284% vs the tree's 0.038-0.15%,
# bench_r4_gold_mxuav.json) — auto ships HIGHEST (series err 8.5e-8,
# gate margin unchanged); DEFAULT stays opt-in via
# LBM_COLLIDE=fused-mxuavdef. At 512²/256² the per-tile matmul latency
# loses ~1%; band2 measured +2.4% at 2048² but -4.3% at 4096² and
# -1.5% at 1536² (bench_r4_mxuroute2.json) — band stays tree. The
# extension session confirmed the whole upper AA regime: 1280² +4.2%
# (24,266 vs 23,298), 1408² +4.5% (25,130 vs 24,050 — and the mxu body
# compiles at the near-cliff clamped tile). c16 AA ≥1280-wide is
# relay-compile-blocked (select_aa), so 1024² is the only probeable c16
# entry on this mount — probed round 5 (bench_r5_c16probe.json): the
# embedded dot COMPILES under int16 storage and wins +4.8% (9,604 vs
# 9,166 MLUPS), so c16 joins the route at that shape.
# (Validated-sizes invariant: every entry ran on silicon.)
_AV_MXU_AA_SHAPES = {(1024, 1024), (1280, 1280), (1408, 1408)}
_AV_MXU_AA_SHAPES_C16 = {(1024, 1024)}


def av_route(paired, ny, nx, storage="float32"):
    """Upgrade the plain default ``"fused"`` to the MXU av-reduction on
    the AA shapes where it measured a win (table above). Explicit
    ``LBM_COLLIDE`` suffixes (``fused-treeav`` etc.) are left alone, so
    a pinned form always wins. Callers: the driver's AA dispatch only —
    the band/temporal/deep kernels measured no robust win.

    ``storage`` is the AA kernel's STORAGE dtype name: f32 entries per
    the table above; c16 (int16 deviation storage) probed round 5 at its
    one relay-compilable shape and routed on the measured win
    (bench_r5_c16probe.json); bf16 storage keeps the tree form until
    probed (the bf16 AA builds barely compile on this relay at all)."""
    if paired != "fused":
        return paired
    if storage == "float32" and (ny, nx) in _AV_MXU_AA_SHAPES:
        return "fused-mxuav"
    if storage == "int16" and (ny, nx) in _AV_MXU_AA_SHAPES_C16:
        return "fused-mxuav"
    return paired


def u_mag(u_sq, paired=None):
    """|u| from ``u_sq`` for the per-step av_vels reduction.

    NEGATIVE RESULT, kept as the single place the form lives: the
    hand-written fast form ``u_sq * rsqrt(u_sq + 1e-35)`` measured
    BIT-IDENTICAL and rate-identical to ``jnp.sqrt`` on TPU
    (bench_r4_fastav.json: same best time, tot_u[-1] rel_diff exactly
    0.0 at 128² and 1024²) — Mosaic already lowers f32 sqrt through the
    same rsqrt sequence. The per-step reduction's real cost is the sum
    lowering, attacked structurally in the kernels (the (8, nx)
    row-group accumulator), not here.

    ``paired`` is the collide-form token (it rides every kernel's
    static-arg/lru cache plumbing and stays in the signature so future
    reduction forms can key on it; ``"fused-slowav"`` is accepted by
    ``paired_default`` for A/B sweeps and currently maps to the same
    sqrt).
    """
    import jax.numpy as jnp

    del paired  # form-neutral since bench_r4_fastav.json
    return jnp.sqrt(u_sq)


def av_form(paired, form=None):
    """Resolve the av-reduction structure token: "tree" | "vec" | "mxu".

    ``paired`` is the collide-form string riding every kernel's
    static-arg/lru plumbing; a ``-vecav`` / ``-mxuav`` suffix
    (``LBM_COLLIDE=fused-vecav`` etc.) selects the alternative
    structures for A/B sweeps. ``form`` overrides outright.
    """
    if form is not None:
        return form
    if isinstance(paired, str):
        if "vecav" in paired:
            return "vec"
        # longest-match first: "mxuavdef" contains "mxuav"
        if "mxuavdef" in paired:
            return "mxudef"
        if "mxuav" in paired:
            return "mxu"
    return "tree"


def av_fold(acc, nob, u_sq, paired=None, form=None):
    """Fold one tile's masked |u| into the per-step av_vels accumulator.

    ``acc`` is ``None`` or the ``(vec, scal)`` pair this returns;
    ``av_total`` collapses it to the per-step scalar. Three structures
    (A/B'd in bench_r4_vecav.json / bench_r4_mxuav.json at 1024² AA):

    - ``tree`` (default): one full ``(rows, nx) -> scalar`` ``jnp.sum``
      per tile into the scalar slot. Mosaic lowers this at ~4.3 us/step
      at 1024² (~4x the ideal 1 add/cell — bench_r4_fastav.json
      rawav-vs-noav gap), but it BEAT the hand-vectorized form below.
    - ``vec``: an (8, nx) vector partial folded with one row-group add
      per 8 rows, ONE small scalar tree per step. NEGATIVE result:
      42.74 vs tree's 41.62 us/step at 1024² (bench_r4_vecav.json) —
      the unrolled row-group adds schedule worse than Mosaic's own
      reduction despite fewer nominal ops. Kept for A/B.
    - ``mxu``: row-reduce ``nob*u`` on the OTHERWISE-IDLE MXU via
      ``ones(1, rows) @ (nob*u)``, accumulating a (1, nx) partial; ONE
      small scalar tree per step. D2Q9 has no matmuls, so the systolic
      array is free — the VPU pays only the mask multiply.

    Rows not reaching a full 8-row group under ``vec`` (band slices with
    non-sublane-aligned depth offsets) spill to the scalar slot.

    ``nob=None`` skips the mask multiply — the clean-tile fast path
    (the caller proved the tile obstacle-free at dispatch time, so
    ``nob`` would be all-ones; bench_r5_b2body.json attributes ~6% of
    the band2 step to the select+mask work this path removes).
    """
    import jax.numpy as jnp

    vec, scal = (None, None) if acc is None else acc
    u = u_mag(u_sq, paired)

    def masked(x):
        return x if nob is None else nob * x

    structure = av_form(paired, form)
    if structure == "vec":
        h = u.shape[0]
        full = h - h % 8
        for g in range(0, full, 8):
            term = (u[g : g + 8] if nob is None
                    else nob[g : g + 8] * u[g : g + 8])
            vec = term if vec is None else vec + term
        if h % 8:
            part = jnp.sum(
                u[full:] if nob is None else nob[full:] * u[full:]
            )
            scal = part if scal is None else scal + part
        return vec, scal
    if structure.startswith("mxu"):
        import jax

        # Pass count trades MXU latency for f32 exactness: HIGHEST = 6
        # bf16 passes (~f32-exact, series err 8.5e-8), DEFAULT = 1
        # (inputs rounded to bf16 — series err ~1e-5, still ~1000x inside
        # the 1% gate, and +1.3% rate over HIGHEST at 1024²:
        # bench_r4_mxuroute.json). Precision.HIGH is NOT lowered by
        # Mosaic ("Unsupported dot precision: HIGH") — no token maps here.
        prec = {
            "mxu": jax.lax.Precision.HIGHEST,
            "mxudef": jax.lax.Precision.DEFAULT,
        }[structure]
        ones = jnp.ones((1, u.shape[0]), jnp.float32)
        term = jax.lax.dot_general(
            ones, masked(u), (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )
        vec = term if vec is None else vec + term
        return vec, scal
    part = jnp.sum(masked(u))
    return vec, (part if scal is None else scal + part)


def av_total(acc):
    """Collapse an ``av_fold`` accumulator to the per-step scalar."""
    import jax.numpy as jnp

    if acc is None:
        return jnp.float32(0.0)
    vec, scal = acc
    tot = None if vec is None else jnp.sum(vec)
    if scal is not None:
        tot = scal if tot is None else tot + scal
    return jnp.float32(0.0) if tot is None else tot


def moments(t):
    """(rho, inv_rho, u_x, u_y, u_sq) from the 9 streamed planes.

    The summation groupings match the reference exactly (d2q9-bgk.c:877-892):
    an at-rest state cancels the velocity numerators to exactly 0.0, which
    the final_state writer's ``0.000000000000E+00`` fields rely on.
    """
    t0, t1, t2, t3, t4, t5, t6, t7, t8 = t
    rho = (((t0 + t1) + (t2 + t3)) + ((t4 + t5) + (t6 + t7))) + t8
    inv_rho = 1.0 / rho
    u_x = ((t1 + t5 + t8) - (t3 + t6 + t7)) * inv_rho
    u_y = ((t2 + t5 + t6) - (t4 + t7 + t8)) * inv_rho
    u_sq = u_x * u_x + u_y * u_y
    return rho, inv_rho, u_x, u_y, u_sq


def _moments_fused(t):
    """(rho, u_x, u_y, u_sq) via sum/difference CSE.

    The diagonal differences ``d57 = t5 - t7`` and ``d68 = t6 - t8`` feed
    both velocity numerators (u_x uses +d57 - d68, u_y uses +d57 + d68 —
    signs from kernels.cl:117-131's direction table), saving two adds per
    cell over the literal grouping. At-rest exactness is preserved: every
    difference of equal opposite-pair planes is exactly 0.0, so the
    velocity numerators still cancel to literal zero (the invariant the
    final_state writer's ``0.000000000000E+00`` fields rely on,
    d2q9-bgk.c:877-892)."""
    t0, t1, t2, t3, t4, t5, t6, t7, t8 = t
    s13 = t1 + t3
    s24 = t2 + t4
    s57 = t5 + t7
    s68 = t6 + t8
    rho = ((s13 + s24) + (s57 + s68)) + t0
    inv_rho = 1.0 / rho
    d57 = t5 - t7
    d68 = t6 - t8
    u_x = (((t1 - t3) + d57) - d68) * inv_rho
    u_y = (((t2 - t4) + d57) + d68) * inv_rho
    u_sq = u_x * u_x + u_y * u_y
    return rho, u_x, u_y, u_sq


def _finish_fused(t, rho, u_x, u_y, omega):
    """The fused form's relax stage given the moments — shared by the
    VPU moment path (``_bgk_fused``) and the MXU moment-offload probe
    (``bgk_relax_mxumom``)."""
    u_sq = u_x * u_x + u_y * u_y
    beta = 1.0 - omega  # trace-time python float, as are the omega*w below
    common = 1.0 - u_sq * (0.5 / C_SQ)
    wr0 = (omega * W0) * rho
    wr1 = (omega * W1) * rho
    wr2 = (omega * W2) * rho
    relaxed = [None] * 9
    relaxed[0] = beta * t[0] + wr0 * common
    for k, kb, w, (ax, ay) in _PAIRS:
        wr = wr1 if w == W1 else wr2
        if ax and ay:
            cu = u_x + u_y if ax == 1.0 else u_y - u_x
        else:
            cu = u_x if ax else u_y
        q = wr * (common + (cu * cu) * (0.5 / (C_SQ * C_SQ)))
        d = wr * (cu * (1.0 / C_SQ))
        relaxed[k] = beta * t[k] + (q + d)
        relaxed[kb] = beta * t[kb] + (q - d)
    return tuple(relaxed), u_sq


def _bgk_fused(t, omega):
    """The ``fused`` collision form (see module docstring, item list)."""
    rho, u_x, u_y, _ = _moments_fused(t)
    return _finish_fused(t, rho, u_x, u_y, omega)


# Moment-contraction matrix for the MXU offload: rows = (rho, rho u_x,
# rho u_y) numerators, columns = the 9 planes (direction table
# kernels.cl:117-131). The contraction dim is 9 — tiny for the 128x128
# systolic array, but the array is otherwise idle in D2Q9 (no matmuls),
# so the only real question is whether the dot's issue+latency beats the
# ~10 VPU adds it replaces (the av_fold analogue won +4.9% at 1024² AA).
_MOM_ROWS = (
    (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
    _FCX,
    _FCY,
)


def bgk_relax_mxumom(t, omega):
    """Fused collide with the (3, 9) x (9, h, nx) moment contraction on
    the MXU (``dot_general``, HIGHEST). Costs one ``jnp.stack`` of the 9
    pulled planes (a real VMEM copy) against ~10 VPU adds saved — a
    probe variant (pallas_band2 ``probe="mxumom"``) until measured.

    At-rest exactness note: the velocity numerators come out of the
    matmul instead of the hand-grouped sums, so the literal-zero
    cancellation invariant (``_moments_fused`` docstring) holds only if
    the MXU's 6-pass bf16 split cancels equal opposite terms exactly —
    gate-check before any promotion."""
    import jax
    import jax.numpy as jnp

    # Built from iota + selects instead of a literal array: a Pallas
    # kernel body may not capture trace-time constants, and the 19
    # selects fold away at compile time (3x9 scalars).
    kk = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 1)
    rr = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 0)
    mat = jnp.zeros((3, 9), jnp.float32)
    for r, row in enumerate(_MOM_ROWS):
        for k, c in enumerate(row):
            if c:
                mat = jnp.where((rr == r) & (kk == k), jnp.float32(c), mat)
    stacked = jnp.stack(t)  # (9, h, nx)
    mom = jax.lax.dot_general(
        mat, stacked,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    rho = mom[0]
    inv_rho = 1.0 / rho
    u_x = mom[1] * inv_rho
    u_y = mom[2] * inv_rho
    return _finish_fused(t, rho, u_x, u_y, omega)


def bgk_relax_interleaved(ts, omega):
    """Fused collide for N INDEPENDENT tiles with the chains interleaved
    at trace time: every intermediate is emitted for all lanes adjacently,
    so the VPU always has an independent FMA to issue if the single-tile
    chain is latency-bound (VERDICT r4 item 1, lever a). Per-lane
    expression trees are IDENTICAL to ``_bgk_fused`` — bit-for-bit equal
    results, only the op order differs. Returns ``[(relaxed, u_sq), ...]``.
    """
    n = len(ts)
    s13 = [t[1] + t[3] for t in ts]
    s24 = [t[2] + t[4] for t in ts]
    s57 = [t[5] + t[7] for t in ts]
    s68 = [t[6] + t[8] for t in ts]
    rho = [((a + b) + (c + d)) + t[0]
           for a, b, c, d, t in zip(s13, s24, s57, s68, ts)]
    inv_rho = [1.0 / r for r in rho]
    d57 = [t[5] - t[7] for t in ts]
    d68 = [t[6] - t[8] for t in ts]
    u_x = [(((t[1] - t[3]) + a) - b) * ir
           for t, a, b, ir in zip(ts, d57, d68, inv_rho)]
    u_y = [(((t[2] - t[4]) + a) + b) * ir
           for t, a, b, ir in zip(ts, d57, d68, inv_rho)]
    u_sq = [x * x + y * y for x, y in zip(u_x, u_y)]
    beta = 1.0 - omega
    common = [1.0 - u * (0.5 / C_SQ) for u in u_sq]
    wr0 = [(omega * W0) * r for r in rho]
    wr1 = [(omega * W1) * r for r in rho]
    wr2 = [(omega * W2) * r for r in rho]
    relaxed = [[None] * 9 for _ in range(n)]
    for i in range(n):
        relaxed[i][0] = beta * ts[i][0] + wr0[i] * common[i]
    for k, kb, w, (ax, ay) in _PAIRS:
        wr = wr1 if w == W1 else wr2
        if ax and ay:
            cu = ([x + y for x, y in zip(u_x, u_y)] if ax == 1.0
                  else [y - x for x, y in zip(u_x, u_y)])
        else:
            cu = u_x if ax else u_y
        q = [wr[i] * (common[i] + (cu[i] * cu[i]) * (0.5 / (C_SQ * C_SQ)))
             for i in range(n)]
        d = [wr[i] * (cu[i] * (1.0 / C_SQ)) for i in range(n)]
        for i in range(n):
            relaxed[i][k] = beta * ts[i][k] + (q[i] + d[i])
            relaxed[i][kb] = beta * ts[i][kb] + (q[i] - d[i])
    return [(tuple(relaxed[i]), u_sq[i]) for i in range(n)]


def bgk_relax(t, omega, *, paired=True):
    """BGK-relax the 9 streamed planes ``t``; returns ``(relaxed, u_sq)``.

    ``relaxed`` is the pre-bounce-back 9-tuple ``t_k + omega (feq_k - t_k)``
    (kernels.cl:148-177); the caller applies its own obstacle blend.
    ``paired`` is tri-valued: ``False`` literal, ``True`` paired,
    ``"fused"`` the omega-folded form (module docstring). Strings
    ``"fused-slowav"``/``"fused-treeav"`` are the fused form too — the
    suffix only keys the reduction form (A/B plumbing, see ``u_mag`` /
    ``av_fold``).
    """
    if isinstance(paired, str) and paired.startswith("fused"):
        return _bgk_fused(t, omega)
    rho, _, u_x, u_y, u_sq = moments(t)
    common = 1.0 - u_sq * (0.5 / C_SQ)
    relaxed = [None] * 9
    relaxed[0] = t[0] + omega * (W0 * rho * common - t[0])
    if paired:
        for k, kb, w, (ax, ay) in _PAIRS:
            if ax and ay:
                cu = ax * u_x + u_y if ax == 1.0 else u_y - u_x
            else:
                cu = u_x if ax else u_y
            wr = w * rho
            q = wr * (common + (cu * cu) * (0.5 / (C_SQ * C_SQ)))
            d = wr * (cu * (1.0 / C_SQ))
            relaxed[k] = t[k] + omega * ((q + d) - t[k])
            relaxed[kb] = t[kb] + omega * ((q - d) - t[kb])
    else:
        for k in range(1, 9):
            cu = _FCX[k] * u_x + _FCY[k] * u_y if _FCX[k] and _FCY[k] else (
                _FCX[k] * u_x if _FCX[k] else _FCY[k] * u_y
            )
            feq = _WS[k] * rho * (
                common + cu * (1.0 / C_SQ) + cu * cu * (0.5 / (C_SQ * C_SQ))
            )
            relaxed[k] = t[k] + omega * (feq - t[k])
    return tuple(relaxed), u_sq
