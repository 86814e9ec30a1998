from lbm_tpu.parallel.sharded import (
    lbm_step_sharded,
    make_mesh,
    run_simulation_sharded,
)

__all__ = ["make_mesh", "lbm_step_sharded", "run_simulation_sharded"]
