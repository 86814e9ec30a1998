"""Multi-host (pod-slice) initialization.

The reference is single-node by construction (job_submit_d2q9-bgk:10). For
TPU pod slices spanning hosts, JAX needs ``jax.distributed.initialize``
before first device use; the mesh in ``lbm_tpu.parallel.sharded`` then spans
all global devices and halo ppermutes ride ICI (DCN between hosts is only
touched by the startup barrier, not the per-step exchange).

Configuration comes from the standard JAX env vars (set by most launchers):
``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID`` —
or explicit arguments.
"""

from __future__ import annotations

import os


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the distributed runtime (idempotent no-op on failure to
    detect any multi-process configuration)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Single-process TPU VM: jax.distributed.initialize can still be
        # meaningful (it auto-detects TPU pod topology); try it, but a plain
        # single-host run must keep working without any distributed setup.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
