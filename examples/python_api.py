#!/usr/bin/env python
"""Library-usage example: run a lid-driven cavity and plot the flow."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lbm_tpu.api import Simulation
from lbm_tpu.models.d2q9 import LBMParams
from lbm_tpu.utils.geometry import box


def main():
    params = LBMParams(
        nx=128, ny=128, max_iters=2000, reynolds_dim=10,
        density=0.1, accel=0.005, omega=1.85,
    )
    sim = Simulation(params, box(params.nx, params.ny))
    result = sim.run()
    print(f"{result.mlups(params):.0f} MLUPS, Re = {sim.reynolds(result):.4f}")
    u_x, u_y, speed, pressure = sim.velocity_field(result)
    print(f"max |u| = {speed.max():.4e}, mean pressure = {pressure.mean():.4e}")
    sim.write_outputs(result, out_dir="api_example_out")


if __name__ == "__main__":
    main()
