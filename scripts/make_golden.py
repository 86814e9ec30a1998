#!/usr/bin/env python
"""Generate golden reference outputs for a configuration.

The upstream golden files were produced by a double-precision serial build
(SURVEY.md §2.1 "Golden references"). This tool reproduces that role for new
configurations: it runs the float64 jnp path on CPU and writes
``<out>/<tag>.av_vels.dat`` + ``<tag>.final_state.dat`` in the exact golden
format, ready to be used with ``check.py`` / ``lbm_tpu.utils.checker``.

Usage: python scripts/make_golden.py <paramfile> <obstaclefile> <tag> [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    paramfile, obstaclefile, tag = argv[:3]
    outdir = argv[3] if len(argv) > 3 else "."

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from lbm_tpu.io import read_obstacles, read_params, write_av_vels, write_final_state
    from lbm_tpu.runtime.driver import run_simulation

    params = read_params(paramfile)
    obstacles = read_obstacles(obstaclefile, params)
    result = run_simulation(params, obstacles, backend="reference", dtype=jnp.float64)

    os.makedirs(outdir, exist_ok=True)
    write_av_vels(os.path.join(outdir, f"{tag}.av_vels.dat"), result.av_vels)
    write_final_state(
        os.path.join(outdir, f"{tag}.final_state.dat"), params, result.cells, obstacles
    )
    print(f"wrote {tag}.av_vels.dat + {tag}.final_state.dat to {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
