"""Subprocess probe-compile worker for the ``probe`` toolchain profile.

Run as ``python -m lbm_tpu.runtime.probe_worker '<json-spec>'`` by
``runtime.driver._probe_compile_subprocess``. The worker reconstructs the
run's compile surface (grid, dtype, backend, chunk split) in a FRESH
process, routes like ``LBM_TOOLCHAIN=standard``, and compiles every chunk
executable WITHOUT running anything — exit 0 means every compile
succeeded, exit 1 means at least one failed (error on stderr), and a
parent-side wall timeout (the child is killed) means the compiler hung.

Why a child process at all: the documented relay failure modes include
compiles that hang >30 min, and interrupting a hung compile in-process
(the legacy SIGALRM guard, ``driver._compile_lowered``) is itself the
documented session-poison mechanism — an alarm fired mid-compile leaves
the SAME process's relay session broken for the fallback run that
follows (CLAUDE.md round-4 poison nuance; VERDICT r4 item 3). Killing a
child only poisons the CHILD's session; the parent compiles the
known-good route afterwards with its own session untouched. This is the
safe analogue of the reference adapting to whatever OpenCL device it
finds at startup (d2q9-bgk.c:950-1007).

Compile-only is cheap: the initial state is built on-device by jnp ops
(no host upload), the obstacle mask is a synthetic all-clear grid (mask
CONTENT never reaches the compiler — only shapes and dtypes do), and no
chunk executable is ever launched.
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str]) -> int:
    spec = json.loads(argv[0])

    import jax

    # Pin the parent's platform BEFORE any jax use: the probe verdict must
    # be about the backend the parent will compile for (and the env var
    # alone cannot switch backends when a sitecustomize pinned the config).
    platform = spec.get("platform")
    if platform:
        jax.config.update("jax_platforms", platform)

    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.models.d2q9 import LBMParams
    from lbm_tpu.runtime import driver

    params = LBMParams(**spec["params"])
    dtype = (
        "c16" if spec["dtype"] == "c16" else jnp.dtype(spec["dtype"]).type
    )
    obstacles = np.zeros((params.ny, params.nx), dtype=np.int32)
    with driver._toolchain_as("standard"):
        driver._run_simulation_impl(
            params,
            obstacles,
            backend=spec["backend"],
            dtype=dtype,
            start_step=spec.get("start_step", 0),
            checkpoint_every=spec.get("checkpoint_every", 0),
            chunk_every=spec.get("chunk_every", 0),
            _compile_only=True,
        )
    print("PROBE_COMPILE_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
