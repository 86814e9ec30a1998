from lbm_tpu.runtime.driver import SimulationResult, run_simulation

__all__ = ["SimulationResult", "run_simulation"]
