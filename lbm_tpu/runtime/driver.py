"""Simulation driver.

The reference drives the simulation from the host: per step it launches two
kernels, syncs the device, reads the whole ``tot_us`` buffer back over PCIe
and sums it on the CPU (d2q9-bgk.c:206-228, 408-420). On TPU that per-step
host round-trip would dominate, so the driver here compiles the ENTIRE run
into one ``lax.fori_loop``: the carry is ``(cells, av_vels)`` with the
per-step mean-velocity scattered into an on-device ``(maxIters,)`` array;
nothing touches the host until the loop finishes. The final state written out
is the true last state (the reference reads a one-step-stale buffer for even
maxIters — d2q9-bgk.c:237-272 — a quirk this driver deliberately does not
reproduce).
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import functools
import json
import os
import signal
import threading
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.models.d2q9 import D2Q9, LBMParams
from lbm_tpu.ops.collision import paired_default
from lbm_tpu.ops.reference import lbm_step_reference


def sync(x) -> None:
    """Force completion of the computation producing ``x``.

    ``jax.block_until_ready`` is unreliable on tunneled/relay backends (it can
    return while the computation is still in flight); fetching a scalar that
    data-depends on the result is a hard synchronization point everywhere.
    """
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


@jax.jit
def _max_abs_code(q):
    """Max |companded int16 code| of a c16 state — the saturation probe."""
    return jnp.max(jnp.abs(q.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("ny", "nx"))
def _unpack_obstacles(packed, ny, nx):
    # np.packbits bit order: byte b holds cells 8b..8b+7 at bits 7..0.
    bits = (packed[:, None] >> jnp.arange(7, -1, -1, dtype=jnp.uint8)) & 1
    return bits.reshape(-1)[: ny * nx].reshape(ny, nx).astype(jnp.int32)


def upload_obstacles(obstacles: np.ndarray) -> jnp.ndarray:
    """Device int32 obstacle mask, shipped as 1 bit/cell.

    The dense int32 mask is 4 B/cell; on relay-tunneled devices H2D runs at
    ~110-145 MB/s, so the upload (completing lazily inside the first jitted
    chunk call) added ~30 ns/cell to every run — the per-run fixed cost
    isolated by bench_r3_fixedcost.json (2.3 s at 8192^2, misread as a
    footprint law for several sessions). Packing to bits on host and
    unpacking in a tiny jitted program cuts the transfer 32x; semantics are
    unchanged (nonzero = blocked, d2q9-bgk.c:596-631)."""
    ny, nx = obstacles.shape
    packed = np.packbits((obstacles != 0).reshape(-1))
    return _unpack_obstacles(jnp.asarray(packed), ny, nx)


@dataclasses.dataclass
class SimulationResult:
    cells: np.ndarray | None  # (9, ny, nx) final state (None: fetch_final=False)
    av_vels: np.ndarray  # (maxIters,) per-step mean |u| over unblocked cells
    elapsed: float  # wall-clock seconds for the compute loop (excl. compile)
    compile_time: float  # seconds spent compiling

    def mlups(self, params: LBMParams) -> float:
        return params.nx * params.ny * params.max_iters / self.elapsed / 1e6

    def reynolds(self, params: LBMParams, obstacles: np.ndarray) -> float:
        """Reynolds number from the final state (d2q9-bgk.c:815-819):
        mean |u| over unblocked cells * reynolds_dim / viscosity."""
        from lbm_tpu.ops.reference import velocity_field

        _, _, speed, _ = velocity_field(jnp.asarray(self.cells), jnp.asarray(obstacles))
        free = np.asarray(obstacles) == 0
        av = float(jnp.sum(speed * jnp.asarray(free, speed.dtype))) / int(free.sum())
        return params.reynolds(av)


def select_resident(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the VMEM-resident multi-step kernel.

    Returns None (don't), or the ``interpret`` flag to run it with.
    ``auto`` uses it on TPU for grids whose state fits VMEM (it is strictly
    faster there: HBM is touched twice per 256 steps instead of per step);
    ``resident`` forces it (interpreter off-TPU).
    """
    if backend not in ("auto", "resident"):
        return None
    from lbm_tpu.ops.pallas_resident import resident_supported

    fits = resident_supported(params.ny, params.nx, dtype)
    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "resident":
        if not fits:
            raise ValueError(
                f"grid {params.ny}x{params.nx} (dtype {jnp.dtype(dtype).name}) "
                "does not fit the VMEM-resident kernel"
            )
        return not on_tpu
    return False if (fits and on_tpu) else None


def toolchain() -> str:
    """Compile-toolchain profile for auto dispatch (``LBM_TOOLCHAIN``).

    ``relay`` (default): this mount's remote-compile helper, whose caps
    were measured the hard way — ~91-107 MB total kernel VMEM
    (bench_r2_tpu15.json), 16-bit AA compile failures at nx >= 1280,
    band2/panel widths validated shape-by-shape. Auto dispatch claims
    only the validated sizes (the tables below).

    ``standard``: a stock libtpu/Mosaic toolchain with the full 128 MB
    VMEM and no helper caps — auto dispatch lifts the relay tables to
    the DESIGN limits (each kernel's own capability check still gates).
    Routing under this profile is untested on this mount by definition;
    it exists so the framework is portable off the relay (VERDICT r3
    item 3) — the analogue of the reference adapting to whatever OpenCL
    device it finds (d2q9-bgk.c:950-1007).

    ``probe``: ROUTE like ``standard``, but treat the first compile of
    each (device, grid, dtype, backend) combination as a probe — if it
    fails, fall back to the conservative ``relay`` tables for that run
    and REMEMBER the failure in an on-disk cache
    (``$LBM_PROBE_CACHE``, default ``~/.cache/lbm_tpu/probe_cache.json``)
    so later runs skip the doomed attempt entirely. This is the
    adaptive middle ground for unknown toolchains; on THIS mount the
    relay default stays safest (a failed remote compile can poison the
    relay session — CLAUDE.md), which is why probing is opt-in.
    """
    override = _TOOLCHAIN_OVERRIDE.get()
    if override is not None:
        return override
    tc = os.environ.get("LBM_TOOLCHAIN", "relay")
    if tc not in ("relay", "standard", "probe"):
        raise ValueError(
            f"LBM_TOOLCHAIN={tc!r}: expected 'relay', 'standard' or 'probe'"
        )
    return tc


# Per-call override used by the probe profile's fallback re-entry (and by
# tests); honored ahead of the env var. A ContextVar so a fallback in one
# thread never leaks into concurrent run_simulation calls in others.
_TOOLCHAIN_OVERRIDE: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "lbm_toolchain_override", default=None
)


@contextlib.contextmanager
def _toolchain_as(profile: str):
    token = _TOOLCHAIN_OVERRIDE.set(profile)
    try:
        yield
    finally:
        _TOOLCHAIN_OVERRIDE.reset(token)


class ProbeCompileError(RuntimeError):
    """A compile failed while routing under the ``probe`` profile; the
    run_simulation wrapper catches this, records the failure, and
    re-resolves under the conservative ``relay`` tables."""


def _probe_cache_path() -> str:
    return os.environ.get(
        "LBM_PROBE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "lbm_tpu", "probe_cache.json"
        ),
    )


def _probe_cache_load() -> dict:
    try:
        with open(_probe_cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _probe_cache_record(key: str, status: str, error: str = "") -> None:
    path = _probe_cache_path()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # flock serializes the read-merge-replace against concurrent
    # probe-profile processes sharing the cache (the write itself is
    # atomic via tmp+rename; the lock protects the merge).
    with open(f"{path}.lock", "w") as lock:
        try:
            import fcntl

            fcntl.flock(lock, fcntl.LOCK_EX)
        except (ImportError, OSError):
            pass  # non-POSIX: atomic replace still holds, merges may race
        cache = _probe_cache_load()
        cache[key] = {"status": status, "error": error[:500],
                      "time": time.strftime("%Y-%m-%d %H:%M:%S")}
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, path)


def _probe_key(params: LBMParams, backend: str, dtype) -> str:
    """Cache key: the inputs that determine the standard-profile route.
    Keyed per device kind (a v5e failure says nothing about a v4) and
    jax version (a toolchain upgrade deserves a re-probe). Pinned LBM_*
    kernel knobs are deliberately NOT keyed — delete the cache file
    after changing them."""
    kind = "unknown"
    try:
        kind = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # noqa: BLE001 — cache key only, never fatal
        pass
    return (
        f"{kind}:jax{jax.__version__}:{params.ny}x{params.nx}"
        f":{jnp.dtype(dtype).name}:{backend}"
    )


def _probe_timeout() -> int:
    return int(os.environ.get("LBM_PROBE_TIMEOUT", "900"))


def _probe_compile_subprocess(
    params: LBMParams, backend: str, dtype, *, start_step: int = 0,
    checkpoint_every: int = 0, chunk_every: int = 0,
) -> tuple[str, str]:
    """Probe-compile the standard-profile route in a CHILD process.

    Returns ``(verdict, error)`` with verdict ``"ok"`` / ``"fail"`` /
    ``"hang"``. The child (``runtime/probe_worker.py``) re-lowers the
    same compile surface, compiles it, and exits; a wall timeout
    (``LBM_PROBE_TIMEOUT``, default 900 s) kills it. Interrupting a hung
    compile IN-PROCESS is the documented relay session-poison mechanism
    (an alarm fired mid-compile breaks the same process's later
    compiles — CLAUDE.md round-4 nuance), so the risky compile never
    happens in this process at all: a killed child poisons only the
    child's session, and the parent's fallback compile runs clean
    (VERDICT r4 item 3). The price is one extra compile of known-good
    routes the first time each combination is seen; the on-disk cache
    makes that once-per-(device, grid, dtype, backend)-ever."""
    import subprocess
    import sys as _sys

    spec = {
        "params": dataclasses.asdict(params),
        "backend": backend,
        "dtype": "c16" if (isinstance(dtype, str) and dtype == "c16")
        else jnp.dtype(dtype).name,
        "start_step": start_step,
        "checkpoint_every": checkpoint_every,
        "chunk_every": chunk_every,
        # The parent's jax_platforms CONFIG value, not the device's
        # ``.platform`` attribute: a plugin backend can register under a
        # different platform name than its devices report (the axon
        # relay registers "axon" but its devices say "tpu"), and pinning
        # the device name in the child selects the WRONG plugin — on the
        # relay, the native libtpu, which dies with "No jellyfish
        # device found" and turns every probe verdict into an
        # environment error instead of a compile verdict (the round-5
        # c16probe cache regression vs round 4's genuine in-process
        # verdicts). The config value is exactly what a sitecustomize or
        # conftest pinned for this process — the thing the child must
        # reproduce. None/empty -> the child inherits the env's own
        # JAX_PLATFORMS / default resolution untouched.
        "platform": jax.config.jax_platforms or None,
    }
    cmd = [_sys.executable, "-m", "lbm_tpu.runtime.probe_worker",
           json.dumps(spec)]
    timeout = _probe_timeout()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            timeout=timeout if timeout > 0 else None,
        )
    except subprocess.TimeoutExpired:
        return "hang", f"probe compile exceeded {timeout}s (child killed)"
    except OSError as e:  # e.g. fork/exec failure — not a toolchain verdict
        return "fail", f"UNAVAILABLE: probe worker could not start ({e})"
    if proc.returncode == 0 and "PROBE_COMPILE_OK" in proc.stdout:
        return "ok", ""
    err = (proc.stderr or proc.stdout or "").strip()
    return "fail", err[-500:]


def _compile_lowered(lowered):
    """Compile seam: under the probe profile a failure becomes a
    ProbeCompileError. ``LBM_PROBE_TIMEOUT`` (default 900 s; 0 disables)
    alarm-guards hanging compilers — the documented relay failure mode is
    compiles that hang >30 min, and without a timeout the advertised
    fall-back protocol would never trigger on them. Main thread only; a
    pre-existing pending alarm (e.g. ab_session's per-run watchdog) is
    re-armed with its remaining time on exit instead of being cancelled.

    LEGACY PATH: reached only under ``LBM_PROBE_ISOLATE=0``. The default
    probe protocol compiles the probe in a subprocess instead
    (``_probe_compile_subprocess``) because a SIGALRM fired mid-compile
    is itself the documented relay session-poison mechanism — the
    in-process fallback would then run on a poisoned session."""
    if toolchain() != "probe":
        return lowered.compile()
    timeout = int(os.environ.get("LBM_PROBE_TIMEOUT", "900"))
    use_alarm = (
        timeout > 0
        and threading.current_thread() is threading.main_thread()
    )
    prev_remaining = 0
    t0 = time.monotonic()
    if use_alarm:
        def _fire(*_a):
            raise TimeoutError(f"compile probe exceeded {timeout}s")

        prev_handler = signal.signal(signal.SIGALRM, _fire)
        prev_remaining = signal.alarm(timeout)
        if 0 < prev_remaining <= timeout:
            # The outer watchdog would have fired first: honor it.
            signal.alarm(prev_remaining)
    try:
        return lowered.compile()
    except Exception as e:  # noqa: BLE001 — converted for the fallback
        raise ProbeCompileError(
            f"{type(e).__name__}: {str(e)[:300]}"
        ) from e
    finally:
        if use_alarm:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev_handler)
            if prev_remaining > 0:
                left = prev_remaining - int(time.monotonic() - t0)
                signal.alarm(max(1, left))


# Auto-dispatch ceiling for the AA kernel on this relay toolchain: the
# compile helper caps the TOTAL kernel VMEM footprint at ~91-107 MB
# (bench_r2_tpu15.json), and the tile picker budgets temporaries to fit —
# 1408^2 f32 (71.3 MB state, ~91 MB total) compiles and runs; 1536^2
# (85 MB state, 94+ MB even with minimal temporaries) cannot. Explicit
# --backend aa may still try larger states (standard toolchains take them).
_AA_AUTO_MAX_STATE = 72 * 1024 * 1024
# bf16 compiles are more fragile still: 1024^2 bf16 (19 MB) compiles and
# beats the block kernel +53-64% (bench_r2_tpu9.json), but 1280^2 bf16
# (29.5 MB) crashes the helper even though the same shape compiles at f32
# — the bf16 packed-store lowering inflates whatever resource the helper
# exhausts. Auto stays at on-TPU-validated sizes.
_AA_AUTO_MAX_STATE_BF16 = 20 * 1024 * 1024


def select_aa(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the in-place AA-pattern resident kernel.

    Returns None (don't) or the ``interpret`` flag. The AA kernel keeps ONE
    copy of the state in VMEM (vs the ping-pong kernel's two). Measured
    policy for ``auto`` on TPU (bench_r2_tpu8/9/15.json): f32 states up to
    ``_AA_AUTO_MAX_STATE`` (72 MB — 1408^2, the largest relay-toolchain-
    validated compile) run AA; the ping-pong resident kernel is
    explicit-only (``--backend resident``); temporal takes over beyond the
    AA ceiling. Evidence:

    - f32 <= 72 MB: AA everywhere — 1.4x in the value-carry regime
      (256^2: 23.9k vs 17.1k MLUPS same-session), +12-17% at 512^2
      (26.0k vs 23.1k), +3% at 1024^2 full-official (24,866 vs 24,194;
      AA won 6 of 7 same-session brackets across sessions 6/8/11), and
      1.75x over temporal in the 40-60 MB gap (1280^2: 12.6k vs 7.4k);
    - bf16 <= 20 MB: AA wins +53-64% over the block kernel (1024^2 bf16:
      17.0k/15.4k vs 10.4k/10.1k); larger bf16 states crash this
      toolchain's compile helper and fall back to the block kernel.
    """
    if backend not in ("auto", "aa"):
        return None
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        if backend == "aa":
            raise ValueError("aa backend stores f32/bf16/c16 only")
        return None
    from lbm_tpu.ops.pallas_aa import aa_supported
    from lbm_tpu.ops.pallas_resident import resident_supported

    fits = aa_supported(params.ny, params.nx, dtype)
    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "aa":
        if not fits:
            raise ValueError(
                f"grid {params.ny}x{params.nx} (dtype {jnp.dtype(dtype).name}) "
                "unsupported by the AA-resident kernel"
            )
        return not on_tpu
    if not (fits and on_tpu):
        return None
    state_bytes = 9 * params.ny * params.nx * jnp.dtype(dtype).itemsize
    std = toolchain() in ("standard", "probe")
    if jnp.dtype(dtype) == jnp.dtype(jnp.int16):
        # c16 AA probed on TPU (bench_r3_aac16.json): 1024-wide compiles
        # and runs, but nx >= 1280 fails the relay compile helper exactly
        # like bf16 AA (the 16-bit packed-store width effect) — so the
        # interesting sizes (1536^2-2048^2, where c16 residency would
        # beat the band kernel) are toolchain-blocked. Below 1280 the f32
        # AA kernel is already resident and faster, so auto never prefers
        # c16 AA; explicit ``--backend aa`` remains available. A standard
        # toolchain has no 16-bit width cap: c16 AA claims its whole
        # design regime (residency extends to 2x the f32 grid area).
        return False if std else None
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        # AA beats the bf16 block kernel +53-64% where it compiles
        # (bench_r2_tpu9.json); above the relay-validated size it falls
        # back. Standard toolchain: the whole aa_supported regime.
        if std:
            return False
        return False if state_bytes <= _AA_AUTO_MAX_STATE_BF16 else None
    del resident_supported  # ping-pong remains available via --backend resident
    if std:
        return False  # aa_supported already gated the design VMEM limit
    return False if state_bytes <= _AA_AUTO_MAX_STATE else None


# bf16 block-vs-temporal crossover (bench_r2_tpu14.json): block wins at
# 2048^2 (75.5 MB bf16 state), the temporal kernel wins at 8192^2
# (1.2 GB state). The crossover sits somewhere in between (4096^2 bf16
# unmeasured); 1 GB routes only the proven-win sizes to temporal.
_TEMPORAL_BF16_MIN_STATE = 1024 * 1024 * 1024
# ... and only up to the probed width: 8192-wide temporal compiles are
# validated at T4/T6 on this toolchain but fail or hang at other depths,
# and nothing wider was ever probed — wider bf16 grids stay on the block
# kernel (the most compile-robust schedule) rather than risk an unprobed
# temporal compile (ADVICE r2: auto caps stay at validated sizes).
_TEMPORAL_BF16_MAX_NX = 8192


# Deep state-view kernel auto policy (round-3 A/Bs: bench_r3_deep.json +
# bench_r3_validation.json): deep beats the halo-carry temporal kernel by
# +26-40% at every validated width — 2048^2 6.4k vs 5.1k, 4096^2 9.9k vs
# 7.0-8.0k, 8192^2 9.9k vs 7.5k f32 (c16 within 4% of f32 everywhere:
# traffic no longer binds). Auto claims the HBM-bound regime for f32 and
# c16 at the VALIDATED widths only; narrower (1024-wide measured
# pathologically slow with B128) and wider grids keep their prior routes.
_DEEP_AUTO = True
_DEEP_MIN_NX = 1536
_DEEP_MAX_NX = 8192

# Band kernel (fixed-buffer in-kernel-loop deep blocking) auto policy
# (bench_r3_band.json): band beats deep at every width where its config
# fits VMEM — 1536^2 7,423 vs 6,701 (and vs the old temporal route's
# 4,415: +70%), 2048^2 6,825 vs 6,019, 4096^2 10,333 vs 9,943; at
# 8192-wide no band config fits (pick_config returns None) and deep
# takes over. c16 band validated at 1536^2 (7,537).
_BAND_AUTO = True
_BAND_MIN_NX = 1536
_BAND_MAX_NX = 8192


def band_config(params: LBMParams, dtype) -> tuple[int, int, int | None] | None:
    """Resolve the band kernel schedule: ``(block, depth, panel)`` with
    ``panel=None`` for the full-row kernel, a panel width for the x-split
    variant (widths whose full-row configs exceed VMEM), or None if
    neither fits."""
    import os as _os

    from lbm_tpu.ops.pallas_band import pick_config, pick_config_panel

    # 4096^2 f32: the panel shape (128, 16, 2048) compiles on this
    # toolchain and beats the best fitting full-row config (B64T16) by a
    # consistent +5.9% (bench_r3_panelwide.json: 13,478 vs 12,730, all
    # brackets + warmup) — B128T16 full-row is compile-blocked at 4096
    # lanes, so the panel's narrower buffers are the only way to run the
    # winning block height there. Validated shape only (c16 unprobed);
    # env overrides still take precedence via the pickers.
    overridden = any(
        _os.environ.get(k)
        for k in ("LBM_BAND_BLOCK", "LBM_BAND_DEPTH", "LBM_BAND_PANEL")
    )
    if (
        (params.ny, params.nx) == (4096, 4096)
        and jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        and not overridden
    ):
        return (128, 16, 2048)
    cfg = pick_config(params.ny, params.nx, dtype)
    if cfg is not None:
        return (*cfg, None)
    pcfg = pick_config_panel(params.ny, params.nx, dtype)
    return None if pcfg is None else pcfg


def slab_config(params: LBMParams, dtype) -> tuple[int, int, int, int] | None:
    """Resolve the hierarchical slab schedule ``(block, depth, kpasses,
    sblock)`` (ops/pallas_slab.py) or None. The per-pass (block, depth)
    come from the band picker (honoring its LBM_BAND_* overrides);
    ``LBM_SLAB_K`` (passes per slab visit, default 4) and ``LBM_SLAB_S``
    (slab rows; default the largest divisor of ny, multiple of block,
    keeping slab cells <= ~4.2M — the fastest measured footprint,
    bench_r3_widthctl.json) set the hierarchy."""
    from lbm_tpu.ops.pallas_band import pick_config
    from lbm_tpu.ops.pallas_slab import slab_supported

    cfg = pick_config(params.ny, params.nx, dtype)
    if cfg is None:
        return None
    block, depth = cfg
    k = int(os.environ.get("LBM_SLAB_K", "4"))
    ov_s = os.environ.get("LBM_SLAB_S")
    if ov_s:
        s = int(ov_s)
        ok = slab_supported(params.ny, params.nx, block, depth, k, s, dtype)
        return (block, depth, k, s) if ok else None
    target = 4_194_304  # cells per slab (2048^2-equivalent)
    best = None
    for s in range(block, params.ny, block):
        if params.ny % s or s * params.nx > target:
            continue
        if slab_supported(params.ny, params.nx, block, depth, k, s, dtype):
            best = s  # largest fitting sblock
    return None if best is None else (block, depth, k, best)


def select_slab(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the hierarchical slab kernel (ops/pallas_slab.py).

    QUARANTINED (VERDICT r3): the slab schedule is a documented negative
    result — compile-blocked on the relay toolchain and predicted to lose
    to band/band2 everywhere by its own affine traffic model
    (BENCHMARKS.md "hierarchical slab"). The kernel and its writeup are
    kept, but the backend is reachable only with ``LBM_ENABLE_SLAB=1`` so
    the dispatch surface contains only kernels that win somewhere."""
    if backend != "slab":
        return None
    if os.environ.get("LBM_ENABLE_SLAB") != "1":
        raise ValueError(
            "slab backend is quarantined (documented negative result — it "
            "loses to band/band2 everywhere, BENCHMARKS.md); set "
            "LBM_ENABLE_SLAB=1 to run it anyway"
        )
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        raise ValueError("slab backend stores f32/bf16/c16 only")
    if slab_config(params, dtype) is None:
        raise ValueError(
            f"grid {params.ny}x{params.nx} unsupported by the slab kernel "
            "(needs a fitting band config plus ny divisible into >1 slabs; "
            "tune LBM_SLAB_S / LBM_SLAB_K)"
        )
    return jax.devices()[0].platform != "tpu"


# band2 auto routing: f32 full-row widths with a TPU-validated compile
# (bench_r3_band2.json — 1536^2 17,986 / 2048^2 18,339 / 4096^2 17,064
# MLUPS, +26-27% over band/panel in every bracket; bench_r3_band2b.json
# adds 3072^2 17,853 and c16-2048^2 17,214). Other widths/dtypes stay
# explicit-only per the validated-sizes invariant (probe first).
# B128T16 full-row at 4096 lanes remains compile-blocked even in the
# scratch structure — B64T16 is the 4096 shape. bench_r3_band2wides.json
# validates the remaining widths: panel-band2 5120^2 15,242 / 6144^2
# 16,882 / 7168^2 15,382 f32, and c16 full-row 3072^2 17,116 / 4096^2
# 15,633. bench_r3_c16wides.json completes the c16 matrix: full-row
# 1536^2 17,634 (vs band's 7,537) / 5120^2 15,003 / 6144^2 15,125 (both
# full-row — c16's half-size buffers fit where f32 needs panels, and
# full-row beat the forced f32-shape panels in-session), panel 7168^2
# 15,050 / 8192^2 14,706 (+40% over panel-band c16's 10,534).
_BAND2_AUTO_NX = (1536, 2048, 3072, 4096)        # full-row f32
_BAND2_AUTO_NX_C16 = (1536, 2048, 3072, 4096, 5120, 6144)  # full-row c16
_BAND2_PANEL_AUTO = {                            # f32 panel shapes (TPU-validated)
    (5120, 5120): (128, 8, 1024),
    (6144, 6144): (128, 8, 2048),
    (7168, 7168): (128, 8, 1024),
    (8192, 8192): (128, 16, 2048),
}
_BAND2_PANEL_AUTO_C16 = {                        # c16 panel shapes (TPU-validated)
    (7168, 7168): (128, 8, 1024),
    (8192, 8192): (128, 8, 2048),
}


def band2_config(params: LBMParams, dtype) -> tuple[int, int, int | None] | None:
    """Resolve the band2 schedule ``(block, depth, panel)``: the full-row
    band pick when it fits band2's constraints (even depth, block >= 2T),
    else the panel pick, else None. Unlike band_config there is no
    4096^2 panel special case — band2's scratch-based structure compiles
    full-row at 4096 lanes and beats the panel there
    (bench_r3_band2.json)."""
    from lbm_tpu.ops.pallas_band import pick_config, pick_config_panel
    from lbm_tpu.ops.pallas_band2 import band2_panel_supported, band2_supported

    cfg = pick_config(params.ny, params.nx, dtype)
    if cfg is not None and band2_supported(
        params.ny, params.nx, cfg[0], cfg[1], dtype
    ):
        return (*cfg, None)
    pcfg = pick_config_panel(params.ny, params.nx, dtype)
    if pcfg is not None and band2_panel_supported(
        params.ny, params.nx, *pcfg, dtype=dtype
    ):
        return pcfg
    return None


def select_band2(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the ref-resident band kernel (ops/pallas_band2.py).
    Returns None or the ``interpret`` flag. ``auto`` claims the
    TPU-validated full-row widths (f32 ``_BAND2_AUTO_NX``, c16
    ``_BAND2_AUTO_NX_C16``) plus the exact TPU-validated panel
    (grid, config) pairs (``_BAND2_PANEL_AUTO`` / ``_BAND2_PANEL_AUTO_C16``);
    ``--backend band2`` forces it wherever ``band2_config`` resolves a
    schedule (full-row band config, else panel config). Config comes from
    the band pickers (honor LBM_BAND_* overrides)."""
    if backend not in ("auto", "band2"):
        return None
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        if backend == "band2":
            raise ValueError("band2 backend stores f32/bf16/c16 only")
        return None
    cfg = band2_config(params, dtype)
    fits = cfg is not None
    if backend == "band2":
        if not fits:
            raise ValueError(
                f"grid {params.ny}x{params.nx} unsupported by the band2 "
                "kernel (needs a fitting full-row band config with even "
                "depth and block >= 2*depth; tune LBM_BAND_BLOCK / "
                "LBM_BAND_DEPTH)"
            )
        return jax.devices()[0].platform != "tpu"
    if not fits:
        return None
    on_tpu = jax.devices()[0].platform == "tpu"
    std = toolchain() in ("standard", "probe")
    if std:
        # Standard toolchain: no per-shape compile validation needed —
        # any resolved f32/c16 schedule is claimable (bf16 stays
        # explicit-only: it cannot pass the golden gate).
        probed = jnp.dtype(dtype) in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.int16)
        )
    elif cfg[2] is None:  # full-row shapes, keyed by lane width
        probed = (
            (jnp.dtype(dtype) == jnp.dtype(jnp.float32)
             and params.nx in _BAND2_AUTO_NX)
            or (jnp.dtype(dtype) == jnp.dtype(jnp.int16)
                and params.nx in _BAND2_AUTO_NX_C16)
        )
    else:  # panel shapes: exact TPU-validated (grid, config) pairs
        if jnp.dtype(dtype) == jnp.dtype(jnp.float32):
            table = _BAND2_PANEL_AUTO
        elif jnp.dtype(dtype) == jnp.dtype(jnp.int16):
            table = _BAND2_PANEL_AUTO_C16
        else:
            table = {}
        probed = table.get((params.ny, params.nx)) == cfg
    # Defer to AA only where AA's auto policy actually claims the run
    # (relay: f32 within the validated VMEM-residency ceiling — c16 AA is
    # explicit-only there, so probed c16 widths route band2 at ANY state
    # size; standard: AA claims its whole aa_supported regime for f32 and
    # c16, mirroring select_aa).
    state_bytes = 9 * params.ny * params.nx * jnp.dtype(dtype).itemsize
    if std:
        from lbm_tpu.ops.pallas_aa import aa_supported

        aa_claims = (
            jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16)
            and aa_supported(params.ny, params.nx, dtype)
        )
    else:
        aa_claims = (
            jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and state_bytes <= _AA_AUTO_MAX_STATE
        )
    if (fits and on_tpu and probed and not aa_claims
            and not _band3_auto_claims(params, dtype)):
        return False
    return None


def band3_config(params: LBMParams, dtype) -> tuple[int, int, int | None] | None:
    """Resolve the in-place AA-pattern band schedule ``(block, depth,
    panel)`` (ops/pallas_band3.py): whichever of the full-row / panel
    picks has the lower TOTAL compute redundancy — full-row pays
    (B+2T)/B only, a panel also pays (P+2H)/P, and at 7168-8192 the
    full-row budget forces B=32 (red 1.5) where a (128,8,2048) panel
    runs at 1.266 (the regime is VPU-bound, DESIGN.md roofline: rate
    scales ~1/redundancy). Ties prefer full-row (no halo columns).
    band3's own picker honors the LBM_BAND3_* overrides;
    ``LBM_BAND3_FORCE=fullrow|panel`` pins the variant for sweeps (the
    redundancy comparison would otherwise re-pick the other one)."""
    from lbm_tpu.ops.pallas_band3 import pick_config3, pick_config3_panel

    cfg = pick_config3(params.ny, params.nx, dtype)
    pcfg = pick_config3_panel(params.ny, params.nx, dtype)
    force = os.environ.get("LBM_BAND3_FORCE")
    if force:
        if force not in ("fullrow", "panel"):
            raise ValueError(
                f"LBM_BAND3_FORCE must be 'fullrow' or 'panel', got {force!r}")
        return (*cfg, None) if (force == "fullrow" and cfg is not None) \
            else (pcfg if force == "panel" else None)
    if cfg is not None and pcfg is not None:
        red_full = (cfg[0] + 2 * cfg[1]) / cfg[0]
        b, t, p = pcfg
        red_panel = (b + 2 * t) / b * (p + 256) / p  # halo = 128 per side
        return (*cfg, None) if red_full <= red_panel else pcfg
    if cfg is not None:
        return (*cfg, None)
    return pcfg


# band3 auto routing. Under the PAIRED collision form, full-row band3
# (single-buffer scratch, redundancy 1.25) beat panel-band2 (total
# redundancy ~1.40) 15,336 vs 14,401 MLUPS at 5120^2 f32
# (bench_r4_wide_chunk2.json) — the one regime where the in-place body's
# halved VMEM cashed out. The round-4 FUSED default killed that claim:
# the (64,8) full-row kernel no longer survives the relay compile
# (bench_r4_ladder.json: HTTP 500 — the fused form's extra live planes
# tip it over the ~91 MB cliff), B48 full-row doesn't resolve a config,
# and band2-panel-fused beats band3-B64-paired 13,252 vs 10,808
# in-session (bench_r4_fusededge.json). band2 keeps every width where IT
# fits full-row (parity-or-better at 1536^2-4096^2,
# bench_r4_band3ab.json) and 8192^2 (its T16 panel won 16,393 vs band3's
# panel 15,155). Relay profile: band3 claims nothing; the standard
# profile keeps the structural rule (full VMEM fits B64 full-row where
# band2 must panel — measured +6.5% under paired).
_BAND3_AUTO_F32 = set()


def _band3_auto_claims(params: LBMParams, dtype) -> bool:
    """True where auto routes band3 over band2: band3 resolves a
    FULL-ROW schedule where band2 would panel (or not fit at all).
    Panel-band3 never claims (measured slower than panel-band2 at
    8192^2); band2 full-row never yields (measured parity-or-better)."""
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.int16)):
        return False  # bf16 is experimental/explicit-only everywhere
    cfg3 = band3_config(params, dtype)
    if cfg3 is None or cfg3[2] is not None:
        return False
    cfg2 = band2_config(params, dtype)
    if cfg2 is not None and cfg2[2] is None:
        return False
    if toolchain() in ("standard", "probe"):
        return True
    return (jnp.dtype(dtype) == jnp.dtype(jnp.float32)
            and (params.ny, params.nx) in _BAND3_AUTO_F32)


def select_band3(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the in-place AA-pattern band kernel
    (ops/pallas_band3.py). Returns None or the ``interpret`` flag.

    ``auto`` claims the band3-wins regime (``_band3_auto_claims``: full-row
    band3 where band2 panels — structural under LBM_TOOLCHAIN=standard;
    nothing on the relay toolchain since the fused default, see
    ``_BAND3_AUTO_F32``); ``--backend band3`` forces it wherever
    ``band3_config`` resolves a schedule."""
    if backend not in ("auto", "band3"):
        return None
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        if backend == "band3":
            raise ValueError("band3 backend stores f32/bf16/c16 only")
        return None
    if backend != "band3":
        if (_band3_auto_claims(params, dtype)
                and jax.devices()[0].platform == "tpu"):
            return False
        return None
    if band3_config(params, dtype) is None:
        raise ValueError(
            f"grid {params.ny}x{params.nx} unsupported by the band3 kernel "
            "(needs a fitting single-buffer band config; tune "
            "LBM_BAND3_BLOCK / LBM_BAND3_DEPTH / LBM_BAND3_PANEL)"
        )
    return jax.devices()[0].platform != "tpu"


# Panel-variant widths with a relay-validated compile. 8192^2: f32 AND
# c16 probed (bench_r3_panel8192b.json: panel 9,018/10,534 vs deep 2,871
# in-session). 5120/6144/7168 (the widths whose full-row band configs
# exceed the compile budget): clean re-probe after the override-routing
# fix (bench_r3_panelwidths2.json, ~1.4x-throttled session, best-of-2
# interleaved) — panel vs deep same-session: 5120^2 2,609 vs 2,633
# (tie), 6144^2 2,763 vs 2,589 (+7%), 7168^2 1,945 vs 1,816 (+7%); the
# T=16 8192^2 panel shape also compiles (2,949 in-session — the earlier
# "T16 panel fails" datum is fully retired). Panel >= deep at every
# probed width, so auto claims them all; other widths stay explicit-only.
_BAND_PANEL_AUTO_NX = (5120, 6144, 7168, 8192)


def select_band(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the band kernel (ops/pallas_band.py): T=8-32 steps
    per HBM pass via an in-kernel step loop. Returns None or ``interpret``.
    Auto claims full-row configs, plus panel (x-split) configs at the
    probed widths in ``_BAND_PANEL_AUTO_NX``."""
    if backend not in ("auto", "band"):
        return None
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        if backend == "band":
            raise ValueError("band backend stores f32/bf16/c16 only")
        return None
    from lbm_tpu.ops.pallas_band import pick_config, pick_config_panel
    from lbm_tpu.ops.pallas_resident import resident_supported

    std = toolchain() in ("standard", "probe")
    fits = pick_config(params.ny, params.nx, dtype) is not None or (
        (std or params.nx in _BAND_PANEL_AUTO_NX)
        and pick_config_panel(params.ny, params.nx, dtype) is not None
    )
    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "band":
        if band_config(params, dtype) is None:
            raise ValueError(
                f"grid {params.ny}x{params.nx} unsupported by the band kernel"
            )
        return not on_tpu
    if not (
        _BAND_AUTO
        and fits
        and on_tpu
        and _BAND_MIN_NX <= params.nx
        and (std or params.nx <= _BAND_MAX_NX)
    ):
        return None
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        return None  # bf16 keeps its measured routes (band-bf16 unprobed)
    if not resident_supported(params.ny, params.nx, jnp.float32):
        return False
    return None


def select_deep(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the deep state-view temporal kernel (T steps/pass,
    neighbor strips read straight from the input state — ops/pallas_deep.py).

    Returns None (don't) or the ``interpret`` flag. Storage f32/bf16/c16.
    """
    if backend not in ("auto", "deep"):
        return None
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        if backend == "deep":
            raise ValueError("deep backend stores f32/bf16/c16 only")
        return None
    from lbm_tpu.ops.pallas_deep import pick_config
    from lbm_tpu.ops.pallas_resident import resident_supported

    fits = pick_config(params.ny, params.nx, dtype) is not None
    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "deep":
        if not fits:
            raise ValueError(
                f"grid {params.ny}x{params.nx} unsupported by the deep kernel"
            )
        return not on_tpu
    if not (
        _DEEP_AUTO
        and fits
        and on_tpu
        and _DEEP_MIN_NX <= params.nx
        and (toolchain() in ("standard", "probe") or params.nx <= _DEEP_MAX_NX)
    ):
        return None
    # auto: f32 and c16 claim the whole non-resident (HBM-bound) regime at
    # the validated widths; bf16 keeps its measured block/temporal routes
    # (deep-bf16 is unprobed on this toolchain).
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        return None
    if not resident_supported(params.ny, params.nx, jnp.float32):
        return False
    return None


def select_temporal(params: LBMParams, backend: str, dtype) -> bool | None:
    """Whether to use the temporally-blocked (T-steps-per-pass) kernel.

    Returns None (don't) or the ``interpret`` flag. ``auto`` uses it on TPU
    for HBM-bound grids (too big for the resident kernel): it divides HBM
    traffic by the pass depth (measured ~1.5-2x at 2048^2-8192^2 for T=2).
    ``temporal`` forces it. Storage may be f32 or bf16 (f64 is rejected:
    the kernel computes in f32)."""
    if backend not in ("auto", "temporal"):
        return None
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
    ):
        if backend == "temporal":
            raise ValueError("temporal backend stores f32/bf16/c16 only")
        return None
    from lbm_tpu.ops.pallas_resident import resident_supported
    from lbm_tpu.ops.pallas_temporal import pick_block, pick_depth

    depth = pick_depth(params.ny, params.nx, dtype)
    fits = pick_block(params.ny, params.nx, depth, dtype) is not None
    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "temporal":
        if not fits:
            raise ValueError(
                f"grid {params.ny}x{params.nx} unsupported by the temporal kernel"
            )
        return not on_tpu
    # auto: HBM-bound grids only (the resident kernels win when the state
    # fits on-chip). For bf16 the crossover is size-dependent: the block
    # kernel's halved traffic wins at 2048^2 (7,513 vs temporal 5,774,
    # bench_r2_tpu14.json — the trapezoid's redundant compute dominates
    # there), but at 8192^2 the temporal kernel's further traffic cut wins
    # (9,277 vs 8,310) — so bf16 selects temporal only for >=1 GB states.
    state_bytes = 9 * params.ny * params.nx * jnp.dtype(dtype).itemsize
    if jnp.dtype(dtype).itemsize == 2:
        # 16-bit storage (bf16 and c16/int16): same traffic, same policy.
        if (
            fits
            and on_tpu
            and state_bytes >= _TEMPORAL_BF16_MIN_STATE
            and (toolchain() in ("standard", "probe")
                 or params.nx <= _TEMPORAL_BF16_MAX_NX)
        ):
            return False
        return None
    if fits and on_tpu and not resident_supported(
        params.ny, params.nx, jnp.float32
    ):
        return False
    return None


def select_step_fn(params: LBMParams, backend: str, dtype=jnp.float32) -> tuple[Callable, str]:
    """Resolve the per-step implementation (non-resident paths).

    ``pallas`` — the fused TPU kernel; ``reference`` — the jnp oracle;
    ``auto`` — pallas on TPU when the grid shape fits its tiling
    constraints, reference otherwise. The pallas kernel stores f32/bf16
    only, so f64 routes to the reference step (never a silent downgrade:
    an explicit ``pallas`` + f64 request errors instead).
    """
    if backend in ("resident", "temporal", "aa", "deep", "band", "slab"):
        raise ValueError(f"{backend} backend is handled by its own selector")
    if backend not in ("auto", "pallas", "reference"):
        raise ValueError(f"unknown backend {backend!r}")
    # int16 == c16 companded storage: the jnp fallback must decode/encode
    # around the step (raw companded ints through the reference step would
    # be garbage).
    if jnp.dtype(dtype) == jnp.dtype(jnp.int16):
        from lbm_tpu.ops.devspace import lbm_step_reference_c16 as ref_step

        ref_name = "reference-c16"
    else:
        ref_step, ref_name = lbm_step_reference, "reference"
    if backend == "reference":
        return ref_step, ref_name
    if jnp.dtype(dtype) == jnp.float64:
        if backend == "pallas":
            raise ValueError(
                "pallas backend stores f32/bf16 only; use --precision f32/bf16 "
                "or --backend reference for f64"
            )
        return lbm_step_reference, "reference"
    try:
        from lbm_tpu.ops.pallas_step import (
            _pick_block,
            lbm_step_pallas,
            lbm_step_pallas_interpret,
        )
    except ImportError:
        if backend == "pallas":
            raise
        return ref_step, ref_name
    fit_dtype = (
        jnp.dtype(dtype)
        if jnp.dtype(dtype) in (
            jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int16)
        )
        else jnp.float32
    )
    fits = _pick_block(params.ny, params.nx, fit_dtype) is not None
    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "pallas":
        if not fits:
            raise ValueError(
                f"grid {params.ny}x{params.nx} does not fit the pallas kernel's "
                "tiling constraints"
            )
        # Off-TPU, an explicit pallas request runs the interpreter (slow but
        # exact) rather than failing to Mosaic-compile.
        return (lbm_step_pallas, "pallas") if on_tpu else (
            lbm_step_pallas_interpret,
            "pallas-interpret",
        )
    if on_tpu and fits:
        return lbm_step_pallas, "pallas"
    return ref_step, ref_name


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "step_fn",
                     "paired", "block", "dev"),
    donate_argnums=(0,),
)
def _run_loop(cells, obstacles, inv_tot_cells, n_iters, density, accel, omega,
              step_fn, paired=True, block=None, dev=None):
    # Env-style knobs (the LBM_COLLIDE form, the LBM_PALLAS_BLOCK height)
    # must arrive as STATIC jit args: jit.lower() serves cached traces for
    # repeated identical signatures, so anything read from the environment
    # under the trace is frozen by whichever call traced first.
    if getattr(step_fn, "takes_paired", False):
        call_step = functools.partial(step_fn, paired=paired)
    else:
        call_step = step_fn
    if getattr(step_fn, "takes_block", False):
        call_step = functools.partial(call_step, block=block)
    if getattr(step_fn, "takes_dev", False):
        call_step = functools.partial(call_step, dev=dev)
    # The mean-velocity series stays f32 under the 16-bit storage modes
    # (bf16 and c16/int16).
    av_dtype = (
        cells.dtype
        if cells.dtype in (jnp.float32, jnp.float64)
        else jnp.float32
    )
    av_vels = jnp.zeros((n_iters,), dtype=av_dtype)
    # Step implementations may preprocess the obstacle mask once, outside the
    # loop (e.g. the pallas kernel wants a float "not-obstacle" plane), and
    # may carry extra state across steps (e.g. kernel-maintained halo rows).
    prepare = getattr(step_fn, "prepare", None)
    obstacles = prepare(obstacles, cells.dtype) if prepare is not None else obstacles
    init_state = getattr(step_fn, "init_state", None)
    if init_state is None:
        state = cells
    elif getattr(step_fn, "takes_block", False):
        # The carry's halo shapes depend on the block height — it must be
        # the same threaded value the step uses, not a fresh env read.
        state = init_state(cells, block)
    else:
        state = init_state(cells)

    def body(tt, carry):
        state, av_vels = carry
        state, tot_u = call_step(state, obstacles, density, accel, omega)
        av_vels = av_vels.at[tt].set(tot_u * inv_tot_cells)
        return state, av_vels

    state, av_vels = jax.lax.fori_loop(0, n_iters, body, (state, av_vels))
    extract = getattr(step_fn, "extract", None)
    cells = extract(state) if extract is not None else state
    return cells, av_vels


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret", "paired"),
    donate_argnums=(0,),
)
def _run_resident(cells, obstacles, inv_tot_cells, n_iters, density, accel, omega,
                  interpret, paired=True):
    from lbm_tpu.ops.pallas_resident import run_resident

    nobst = (obstacles == 0).astype(jnp.float32)
    cells, tot_u = run_resident(
        cells.astype(jnp.float32), nobst, density, accel, omega, n_iters,
        interpret=interpret, paired=paired,
    )
    return cells, tot_u * inv_tot_cells


def aa_chunk_default() -> int | None:
    """LBM_AA_CHUNK (even steps per AA kernel invocation), resolved
    OUTSIDE jit so the override keys the cache. None -> the kernel's
    default (_CHUNK_STEPS)."""
    v = os.environ.get("LBM_AA_CHUNK")
    return int(v) if v else None


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret",
                     "paired", "tile", "dev", "chunk"),
    donate_argnums=(0,),
)
def _run_aa(cells, obstacles, inv_tot_cells, n_iters, density, accel, omega,
            interpret, paired=True, tile=None, dev=None, chunk=None):
    # tile/chunk are resolved by the caller OUTSIDE jit (the LBM_AA_TILE /
    # LBM_AA_CHUNK overrides must key the jit cache, not be read under a
    # trace).
    from lbm_tpu.ops.pallas_aa import run_aa

    if cells.dtype not in (jnp.float32, jnp.bfloat16) and dev is None:
        cells = cells.astype(jnp.float32)
    nobst = (obstacles == 0).astype(jnp.float32)
    cells, tot_u = run_aa(
        cells, nobst, density, accel, omega, n_iters,
        interpret=interpret, paired=paired, tile=tile, dev=dev, chunk=chunk,
    )
    return cells, tot_u * inv_tot_cells


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret",
                     "block", "depth", "panel", "paired", "dev", "rowforce",
                     "unroll"),
    donate_argnums=(0,),
)
def _run_band(cells, obstacles, inv_tot_cells, n_iters, density, accel, omega,
              interpret, block, depth, panel=None, paired=True, dev=None,
              rowforce=False, unroll=1):
    # knobs resolved by the caller OUTSIDE jit.
    from lbm_tpu.ops.pallas_band import run_band

    if cells.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
        cells = cells.astype(jnp.float32)
    nobst = (obstacles == 0).astype(cells.dtype)
    cells, tot_u = run_band(
        cells, nobst, density, accel, omega, n_iters,
        block, depth, panel=panel, interpret=interpret, paired=paired,
        dev=dev, rowforce=rowforce, unroll=unroll,
    )
    return cells, tot_u * inv_tot_cells


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret",
                     "block", "depth", "panel", "paired", "dev"),
    donate_argnums=(0,),
)
def _run_band3(cells, obstacles, inv_tot_cells, n_iters, density, accel,
               omega, interpret, block, depth, panel=None, paired=True,
               dev=None):
    # knobs resolved by the caller OUTSIDE jit.
    from lbm_tpu.ops.pallas_band3 import run_band3

    if cells.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
        cells = cells.astype(jnp.float32)
    nobst = (obstacles == 0).astype(cells.dtype)
    cells, tot_u = run_band3(
        cells, nobst, density, accel, omega, n_iters,
        block, depth, panel=panel, interpret=interpret, paired=paired,
        dev=dev,
    )
    return cells, tot_u * inv_tot_cells


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret",
                     "block", "depth", "kpasses", "sblock", "paired", "dev"),
    donate_argnums=(0,),
)
def _run_slab(cells, obstacles, inv_tot_cells, n_iters, density, accel, omega,
              interpret, block, depth, kpasses, sblock, paired=True, dev=None):
    # knobs resolved by the caller OUTSIDE jit.
    from lbm_tpu.ops.pallas_slab import run_band_slab

    if cells.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
        cells = cells.astype(jnp.float32)
    nobst = (obstacles == 0).astype(cells.dtype)
    cells, tot_u = run_band_slab(
        cells, nobst, density, accel, omega, n_iters,
        block, depth, kpasses, sblock, interpret=interpret, paired=paired,
        dev=dev,
    )
    return cells, tot_u * inv_tot_cells


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret",
                     "block", "depth", "panel", "paired", "dev", "dirty"),
    donate_argnums=(0,),
)
def _run_band2(cells, obstacles, inv_tot_cells, n_iters, density, accel,
               omega, interpret, block, depth, panel=None, paired=True,
               dev=None, dirty=None):
    # knobs resolved by the caller OUTSIDE jit (dirty: the clean-tile
    # map from pallas_band2.dirty_tiles — a host-mask compile-time
    # constant, hence static).
    from lbm_tpu.ops.pallas_band2 import run_band2

    if cells.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
        cells = cells.astype(jnp.float32)
    nobst = (obstacles == 0).astype(cells.dtype)
    cells, tot_u = run_band2(
        cells, nobst, density, accel, omega, n_iters,
        block, depth, panel=panel, interpret=interpret, paired=paired,
        dev=dev, dirty=dirty,
    )
    return cells, tot_u * inv_tot_cells


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret",
                     "block", "depth", "paired", "dev"),
    donate_argnums=(0,),
)
def _run_deep(cells, obstacles, inv_tot_cells, n_iters, density, accel, omega,
              interpret, block, depth, paired=True, dev=None):
    # block/depth/paired/dev resolved by the caller OUTSIDE jit (env
    # overrides must key the jit cache).
    from lbm_tpu.ops.pallas_deep import run_deep

    if cells.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
        cells = cells.astype(jnp.float32)
    nobst = (obstacles == 0).astype(cells.dtype)
    cells, tot_u = run_deep(
        cells, nobst, density, accel, omega, n_iters,
        block, depth, interpret=interpret, paired=paired, dev=dev,
    )
    return cells, tot_u * inv_tot_cells


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "density", "accel", "omega", "interpret",
                     "block", "depth", "paired", "dev"),
    donate_argnums=(0,),
)
def _run_temporal(cells, obstacles, inv_tot_cells, n_iters, density, accel, omega,
                  interpret, block, depth, paired=True, dev=None):
    # block/depth/paired/dev are resolved by the caller OUTSIDE jit (env
    # overrides like LBM_TEMPORAL_DEPTH must key the jit cache, not be read
    # under a trace).
    from lbm_tpu.ops.pallas_temporal import run_temporal

    if cells.dtype not in (jnp.float32, jnp.bfloat16, jnp.int16):
        cells = cells.astype(jnp.float32)
    nobst = (obstacles == 0).astype(cells.dtype)
    cells, tot_u = run_temporal(
        cells, nobst, density, accel, omega, n_iters,
        block, depth, interpret=interpret, paired=paired, dev=dev,
    )
    return cells, tot_u * inv_tot_cells


def compute_chunk_sizes(
    start_step: int, max_iters: int, checkpoint_every: int = 0, chunk_every: int = 0
) -> list[int]:
    """Split ``[start_step, max_iters)`` so a boundary falls on every
    multiple of ``checkpoint_every`` and of ``chunk_every`` (each ignored
    when <= 0)."""
    strides = [s for s in (checkpoint_every, chunk_every) if s and s > 0]
    if not strides:
        return [max_iters - start_step]
    sizes = []
    step = start_step
    while step < max_iters:
        nxt = min(
            [max_iters] + [(step // s + 1) * s for s in strides]
        )
        sizes.append(nxt - step)
        step = nxt
    return sizes


def _run_simulation_impl(
    params: LBMParams,
    obstacles: np.ndarray,
    *,
    backend: str = "auto",
    dtype=jnp.float32,
    initial_cells: np.ndarray | None = None,
    start_step: int = 0,
    av_vels_prefix: np.ndarray | None = None,
    checkpoint_every: int = 0,
    checkpoint_path: str | None = None,
    checkpoint_format: str = "npz",
    chunk_every: int = 0,
    on_chunk=None,
    device=None,
    fetch_final: bool = True,
    _compile_only: bool = False,
) -> SimulationResult:
    """Run steps ``start_step .. params.max_iters`` and return the result.

    ``initial_cells`` / ``start_step`` / ``av_vels_prefix`` support resuming
    from a checkpoint (see ``runtime.checkpoint``); ``checkpoint_every`` > 0
    snapshots state every K steps by splitting the device loop into chunks.
    ``chunk_every``/``on_chunk`` split the loop for observation without
    checkpointing (e.g. per-step debug reports): ``on_chunk(step, cells,
    av_chunk)`` is called after each chunk with the completed step count.

    ``dtype="c16"`` selects companded-16-bit deviation storage
    (ops/devspace.py): half the HBM traffic of f32 with golden-gate-passing
    accuracy (unlike bf16). Runs through the block/temporal kernels;
    checkpoints, chunk callbacks, and the returned state are decoded f32.

    ``fetch_final=False`` skips materializing the final state to host
    (``result.cells`` is None): on relay-tunneled devices the D2H fetch of
    a large state runs at ~28 MB/s (21 s at 4096^2 f32 — probe_sync_cost),
    pure waste for timing sessions that only read ``elapsed``/``av_vels``.
    """
    dev_spec = None
    if isinstance(dtype, str) and dtype == "c16":
        from lbm_tpu.ops.devspace import DevSpec

        dev_spec = DevSpec.for_params(params.density, params.accel)
        dtype = jnp.int16
        if backend == "resident":
            raise ValueError(
                "resident backend does not support c16 storage "
                "(use auto/pallas/temporal/deep/band/aa)"
            )
    # AA is consulted first: its auto policy claims the value-carry regime
    # (1.4x) and the 40-60 MB single-copy gap (1.75x); the ping-pong
    # resident kernel keeps the 4-40 MB middle. c16 (int16 storage) auto
    # runs the HBM-traffic-bound kernels; c16 AA is explicit-only.
    aa_interpret = select_aa(params, backend, dtype)
    slab_interpret = select_slab(params, backend, dtype)  # explicit-only
    band2_interpret = select_band2(params, backend, dtype)
    band3_interpret = select_band3(params, backend, dtype)  # explicit-only
    resident_interpret = None
    band_interpret = None
    deep_interpret = None
    temporal_interpret = None
    claimed = (aa_interpret is not None or slab_interpret is not None
               or band2_interpret is not None or band3_interpret is not None)
    if not claimed and dev_spec is None:
        resident_interpret = select_resident(params, backend, dtype)
    if not claimed and resident_interpret is None:
        band_interpret = select_band(params, backend, dtype)
    if not claimed and resident_interpret is None and band_interpret is None:
        deep_interpret = select_deep(params, backend, dtype)
    if (not claimed and resident_interpret is None and band_interpret is None
            and deep_interpret is None):
        temporal_interpret = select_temporal(params, backend, dtype)
    if (not claimed and resident_interpret is None and band_interpret is None
            and deep_interpret is None and temporal_interpret is None):
        step_fn, _ = select_step_fn(params, backend, dtype)
    else:
        step_fn = None

    if dev_spec is not None:
        from lbm_tpu.ops.devspace import encode_state

        full = (
            D2Q9.initial_state(params, dtype=jnp.float32)
            if initial_cells is None
            else jnp.asarray(initial_cells, dtype=jnp.float32)
        )
        cells = encode_state(full, dev_spec)
    elif initial_cells is None:
        cells = D2Q9.initial_state(params, dtype=dtype)
    else:
        cells = jnp.asarray(initial_cells, dtype=dtype)
    obstacles_dev = upload_obstacles(np.asarray(obstacles))
    if device is not None:
        cells = jax.device_put(cells, device)
        obstacles_dev = jax.device_put(obstacles_dev, device)
    tot_cells = int(np.sum(np.asarray(obstacles) == 0))  # d2q9-bgk.c:146-152
    inv_dtype = dtype if dtype in (jnp.float32, jnp.float64) else jnp.float32
    inv_tot_cells = jnp.asarray(1.0 / tot_cells, dtype=inv_dtype)

    paired = paired_default()  # resolved OUTSIDE jit: it must key the cache
    # Static (hashable) form of the c16 companding spec for the kernels.
    dev_tuple = None if dev_spec is None else (*dev_spec.bg, dev_spec.h)

    def lower_chunk(cells, n_iters):
        common = dict(
            n_iters=n_iters,
            density=float(params.density),
            accel=float(params.accel),
            omega=float(params.omega),
            paired=paired,
        )
        if resident_interpret is not None:
            return _run_resident.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=resident_interpret, **common,
            )
        if aa_interpret is not None:
            from lbm_tpu.ops.collision import av_route
            from lbm_tpu.ops.pallas_aa import _pick_tile

            a_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            # MXU av-reduction on the measured-win AA shapes (+4.9% at
            # 1024² f32, +4.8% at 1024² c16 — bench_r5_c16probe.json;
            # bf16 storage keeps the tree until probed); the fused tile
            # clamp keys on the PREFIX — every fused-* suffix shares the
            # fused form's live-plane count.
            aa_paired = av_route(
                paired, params.ny, params.nx, jnp.dtype(a_dtype).name
            )
            return _run_aa.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=aa_interpret,
                tile=_pick_tile(params.ny, params.nx,
                                jnp.dtype(a_dtype).itemsize,
                                fused=isinstance(paired, str)
                                and paired.startswith("fused")),
                dev=dev_tuple, chunk=aa_chunk_default(),
                **{**common, "paired": aa_paired},
            )
        if slab_interpret is not None:
            s_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            s_block, s_depth, s_k, s_s = slab_config(params, s_dtype)
            return _run_slab.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=slab_interpret, block=s_block, depth=s_depth,
                kpasses=s_k, sblock=s_s, dev=dev_tuple, **common,
            )
        if band2_interpret is not None:
            b2_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            b2_block, b2_depth, b2_panel = band2_config(params, b2_dtype)
            b2_dirty = None
            if b2_panel is None:
                from lbm_tpu.ops.pallas_band2 import clean_env, dirty_tiles

                if clean_env():  # resolved OUTSIDE jit (keys the cache)
                    b2_dirty = dirty_tiles(
                        np.asarray(obstacles), b2_block, b2_depth
                    )
            return _run_band2.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=band2_interpret, block=b2_block, depth=b2_depth,
                panel=b2_panel, dev=dev_tuple, dirty=b2_dirty, **common,
            )
        if band3_interpret is not None:
            b3_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            b3_block, b3_depth, b3_panel = band3_config(params, b3_dtype)
            return _run_band3.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=band3_interpret, block=b3_block, depth=b3_depth,
                panel=b3_panel, dev=dev_tuple, **common,
            )
        if band_interpret is not None:
            from lbm_tpu.ops.pallas_band import (
                rowforce_default, unroll_default,
            )

            b_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            b_block, b_depth, b_panel = band_config(params, b_dtype)
            return _run_band.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=band_interpret, block=b_block, depth=b_depth,
                panel=b_panel, dev=dev_tuple,
                rowforce=rowforce_default(),  # resolved OUTSIDE jit
                unroll=unroll_default(),
                **common,
            )
        if deep_interpret is not None:
            from lbm_tpu.ops.pallas_deep import pick_config

            d_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            d_block, d_depth = pick_config(params.ny, params.nx, d_dtype)
            return _run_deep.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=deep_interpret, block=d_block, depth=d_depth,
                dev=dev_tuple, **common,
            )
        if temporal_interpret is not None:
            from lbm_tpu.ops.pallas_temporal import pick_block, pick_depth

            t_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            t_depth = pick_depth(params.ny, params.nx, t_dtype)
            return _run_temporal.lower(
                cells, obstacles_dev, inv_tot_cells,
                interpret=temporal_interpret,
                block=pick_block(params.ny, params.nx, t_depth, t_dtype),
                depth=t_depth, dev=dev_tuple, **common,
            )
        step_kw = {}
        if getattr(step_fn, "takes_block", False):
            # LBM_PALLAS_BLOCK resolved OUTSIDE jit, like the collide form.
            s_dtype = (
                dtype
                if dtype in (jnp.float32, jnp.bfloat16, jnp.int16)
                else jnp.float32
            )
            step_kw["block"] = step_fn.pick_block(params.ny, params.nx, s_dtype)
        if getattr(step_fn, "takes_dev", False):
            step_kw["dev"] = dev_tuple
        return _run_loop.lower(
            cells, obstacles_dev, inv_tot_cells, step_fn=step_fn,
            **step_kw, **common,
        )

    remaining = params.max_iters - start_step
    if remaining <= 0:
        raise ValueError("start_step is beyond max_iters")
    av_chunks = [] if av_vels_prefix is None else [np.asarray(av_vels_prefix)]

    # Chunk boundaries land on every multiple of checkpoint_every AND of
    # chunk_every (not a fixed stride: checkpoint_every=100 with
    # chunk_every=30 must still checkpoint at 100, 200, ... and an unaligned
    # resume realigns at the next multiple).
    chunk_sizes = compute_chunk_sizes(
        start_step, params.max_iters, checkpoint_every, chunk_every
    )

    # Compile up front (one compile per distinct chunk size, AOT — no
    # execution) so `elapsed` measures only the compute loop — the analogue of
    # the reference timing the loop but not the OpenCL program build
    # (d2q9-bgk.c:155-156).
    t0 = time.perf_counter()
    compiled = {
        n: _compile_lowered(lower_chunk(cells, n))
        for n in sorted(set(chunk_sizes))
    }
    compile_time = time.perf_counter() - t0
    if _compile_only:
        # Probe-worker mode (runtime/probe_worker.py): the verdict is
        # compile-or-not; nothing is executed and nothing is returned.
        return None

    def as_full(state):
        """Observer view of the state: c16 storage decodes to f32."""
        if dev_spec is None:
            return state
        from lbm_tpu.ops.devspace import decode_state

        return decode_state(state, dev_spec)

    elapsed = 0.0
    step = start_step
    for n in chunk_sizes:
        t0 = time.perf_counter()
        cells, av = compiled[n](cells, obstacles_dev, inv_tot_cells)
        sync(cells)
        elapsed += time.perf_counter() - t0
        av_chunks.append(np.asarray(av))
        step += n
        if on_chunk is not None:
            on_chunk(step, as_full(cells), av_chunks[-1])
        if (
            checkpoint_path is not None
            and checkpoint_every
            and (step % checkpoint_every == 0 or step == params.max_iters)
        ):
            from lbm_tpu.runtime.checkpoint import save_checkpoint_as

            # c16 checkpoints store the decoded f32 state (the format stays
            # storage-agnostic; resume re-encodes, an exact round-trip up to
            # possible single-quantum rint boundary flips).
            save_checkpoint_as(
                checkpoint_path, params, np.asarray(as_full(cells)),
                np.concatenate(av_chunks), step, format=checkpoint_format,
            )

    final_cells = np.asarray(as_full(cells)) if fetch_final else None
    if dev_spec is not None:
        from lbm_tpu.ops.devspace import LIM

        # Saturation check (failure detection): H leaves ~4x headroom over
        # the observed per-config maxima; a final state near the clamp means
        # the companding range was exceeded mid-run and accuracy is suspect.
        # Runs on EVERY c16 run — including fetch_final=False timing runs
        # (VERDICT r3 item 9): the companded decode is monotone in |q|, so
        # max|deviation| derives from an on-device int16 |max| reduction and
        # one scalar fetch, never a state transfer.
        maxq = float(_max_abs_code(cells))
        md = (maxq / LIM) ** 2 * dev_spec.h
        if md > 0.5 * dev_spec.h:
            import warnings

            warnings.warn(
                f"c16 deviations reached {md:.3g} (companding range "
                f"H={dev_spec.h:.3g}) — results may have saturated; rerun "
                "with f32 or a larger LBM_C16_H",
                stacklevel=2,
            )
    return SimulationResult(
        cells=final_cells,
        av_vels=np.concatenate(av_chunks),
        elapsed=elapsed,
        compile_time=compile_time,
    )


def run_simulation(
    params: LBMParams,
    obstacles: np.ndarray,
    *,
    backend: str = "auto",
    dtype=jnp.float32,
    initial_cells: np.ndarray | None = None,
    start_step: int = 0,
    av_vels_prefix: np.ndarray | None = None,
    checkpoint_every: int = 0,
    checkpoint_path: str | None = None,
    checkpoint_format: str = "npz",
    chunk_every: int = 0,
    on_chunk=None,
    device=None,
    fetch_final: bool = True,
) -> SimulationResult:
    """Public entry: ``_run_simulation_impl`` plus the ``probe``
    toolchain profile's compile-or-fall-back protocol (see
    ``toolchain``). Under ``LBM_TOOLCHAIN=probe`` the run routes like
    ``standard``; a compile failure is recorded in the on-disk probe
    cache and the run transparently re-resolves under the conservative
    ``relay`` tables — known-bad combinations skip the doomed attempt
    on later runs. The other profiles pass straight through.

    The probe compile itself runs in a SUBPROCESS by default
    (``_probe_compile_subprocess``): hung compiles are killed in the
    child and cached as a distinct ``"hang"`` verdict, and this
    process's backend session is never touched by a risky compile —
    interrupting one in-process is the documented relay session-poison
    mechanism. ``LBM_PROBE_ISOLATE=0`` restores the legacy in-process
    protocol (SIGALRM-guarded ``_compile_lowered``)."""
    # One source of truth for the pass-through: every kw-only parameter of
    # this wrapper (captured before any other local is bound).
    kw = {k: v for k, v in locals().items() if k not in ("params", "obstacles")}
    if toolchain() != "probe":
        return _run_simulation_impl(params, obstacles, **kw)
    key_dtype = jnp.int16 if isinstance(dtype, str) and dtype == "c16" else dtype
    key = _probe_key(params, backend, key_dtype)
    cached = _probe_cache_load().get(key, {}).get("status")
    if cached in ("fail", "hang"):
        with _toolchain_as("relay"):
            return _run_simulation_impl(params, obstacles, **kw)
    if os.environ.get("LBM_PROBE_ISOLATE", "1") != "0":
        if cached != "ok":
            verdict, err = _probe_compile_subprocess(
                params, backend, dtype, start_step=start_step,
                checkpoint_every=checkpoint_every, chunk_every=chunk_every,
            )
            if verdict != "ok":
                # Transient infrastructure errors (backend down
                # mid-compile, or the CHILD failing to initialize a
                # backend at all — an environment problem, not a
                # toolchain verdict) are NOT cached as permanent
                # toolchain verdicts — only this run falls back; the
                # next re-probes.
                transient = (
                    "UNAVAILABLE" in err
                    or "Unable to initialize backend" in err
                    or "No jellyfish device" in err
                )
                if verdict == "hang" and not transient:
                    # A hang is ambiguous: the toolchain (documented
                    # >30-min Mosaic compile hangs) or the ENVIRONMENT
                    # (backend down — jax.devices() hangs >10 min when
                    # the relay dies — or the child queueing behind
                    # another process's device lease). Disambiguate
                    # with a canary: probe-compile a tiny known-good
                    # surface in a second child. Canary ok -> the
                    # environment is alive, the hang is a toolchain
                    # verdict (cache it). Canary not ok -> environment
                    # trouble; treat the hang as transient so the
                    # shape is re-probed once the environment
                    # recovers. Worst case this doubles the hang
                    # path's wall cost (2x LBM_PROBE_TIMEOUT) — paid
                    # at most once per cached combination.
                    canary = LBMParams(
                        nx=128, ny=64, max_iters=2, reynolds_dim=10,
                        density=0.1, accel=0.005, omega=1.85,
                    )
                    cv, _cerr = _probe_compile_subprocess(
                        canary, "reference", jnp.float32
                    )
                    transient = cv != "ok"
                if not transient:
                    _probe_cache_record(key, verdict, err)
                print(
                    f"lbm_tpu: probe compile {verdict} for {key}; "
                    "falling back to the relay-profile route"
                    + (" (transient, not cached)" if transient
                       else " (cached)"),
                    flush=True,
                )
                with _toolchain_as("relay"):
                    return _run_simulation_impl(params, obstacles, **kw)
            _probe_cache_record(key, "ok")
        # Known-good: compile + run the standard route in THIS process
        # with no probe seam armed.
        with _toolchain_as("standard"):
            return _run_simulation_impl(params, obstacles, **kw)
    try:
        result = _run_simulation_impl(params, obstacles, **kw)
    except ProbeCompileError as e:
        transient = "UNAVAILABLE" in str(e)
        if not transient:
            _probe_cache_record(key, "fail", str(e))
        print(
            f"lbm_tpu: probe compile failed for {key} ({e}); "
            "falling back to the relay-profile route"
            + (" (transient, not cached)" if transient else " (cached)"),
            flush=True,
        )
        with _toolchain_as("relay"):
            return _run_simulation_impl(params, obstacles, **kw)
    _probe_cache_record(key, "ok")
    return result
