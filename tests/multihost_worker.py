"""Worker process for the real 2-process ``jax.distributed`` test.

Spawned by tests/test_multihost.py (NOT collected by pytest): process
``argv[1]`` of ``argv[2]``, coordinator on localhost:``argv[3]``, result
written to ``argv[4]``. Each process owns 4 virtual CPU devices; the
sharded loop spans all 8 via Gloo-backed cross-process collectives —
the environment's stand-in for a real multi-host pod slice
(SURVEY.md §2.4, distributed-communication-backend row).
"""

import sys


def main() -> None:
    pid, nproc, port, out = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_enable_x64", True)

    from lbm_tpu.parallel.multihost import (
        initialize_multihost,
        run_simulation_multihost,
    )

    initialize_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.models.d2q9 import LBMParams

    p = LBMParams(
        nx=16, ny=16, max_iters=5, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    rng = np.random.RandomState(3)
    obs = np.zeros((p.ny, p.nx), dtype=np.int32)
    obs[0, :] = obs[-1, :] = 1
    obs[rng.randint(1, p.ny - 1, 6), rng.randint(0, p.nx, 6)] = 1

    res = run_simulation_multihost(p, obs, backend="reference", dtype=jnp.float64)
    np.savez(out, cells=res.cells, av_vels=res.av_vels)


if __name__ == "__main__":
    main()
