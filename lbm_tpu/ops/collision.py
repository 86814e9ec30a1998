"""Shared BGK collision for the Pallas kernels.

Two arithmetically equivalent forms of the reference's equilibrium +
relaxation (kernels.cl:109-177), selectable per kernel build:

- ``literal``: the reference's per-direction formula, one ``feq_k`` per
  plane — the round-1 form, kept for A/B baselines and bit-for-bit
  comparison with the early benchmark numbers.
- ``paired`` (default): exploits that opposite directions share weight and
  satisfy ``cu_opp = -cu`` (kernels.cl:100-107's opposite table), so each
  of the four (k, opp) pairs needs ONE quadratic term and ONE linear term:

      q = w rho (common + cu^2 / (2 c^4));  d = w rho cu / c^2
      feq_k = q + d;  feq_opp = q - d

  ~30% fewer VPU ops for the equilibrium stage. The D2Q9 step has no
  matmuls, so the VPU op count is the compute ceiling once a kernel is no
  longer HBM-bound (the VMEM-resident and temporally-blocked schedules —
  see docs/DESIGN.md "Round-2 temporal-blocking depth study").

Both forms produce results within a few f32 ulps of each other; the golden
gate (1% tolerance, 40k-80k steps) and the oracle tests (atol 2-3e-7) hold
for either. ``LBM_COLLIDE=literal`` reverts the default at dispatch time.
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


def paired_default() -> bool:
    """Kernel-build default for the collision form (env-overridable)."""
    return os.environ.get("LBM_COLLIDE", "paired") != "literal"


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


def bgk_relax(t, omega, *, paired: bool = True):
    """BGK-relax the 9 streamed planes ``t``; returns ``(relaxed, u_sq)``.

    ``relaxed`` is the pre-bounce-back 9-tuple ``t_k + omega (feq_k - t_k)``
    (kernels.cl:148-177); the caller applies its own obstacle blend.
    """
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
