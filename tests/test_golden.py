"""Golden-file end-to-end validation (the reference's acceptance gate,
SURVEY.md §4) — the full 40k-step 128x128 run on CPU. Marked slow; the
default suite covers a 200-step prefix (test_driver) and TPU runs cover all
configs (BENCHMARKS.md)."""

import numpy as np
import pytest

from lbm_tpu.io import read_obstacles, read_params, write_av_vels, write_final_state
from lbm_tpu.runtime.driver import run_simulation
from lbm_tpu.utils.checker import check_files


@pytest.mark.slow
def test_golden_128x128_full_run(tmp_path):
    params = read_params("/root/reference/input_128x128.params")
    obstacles = read_obstacles("/root/reference/obstacles_128x128.dat", params)
    result = run_simulation(params, obstacles, backend="reference")

    av = tmp_path / "av_vels.dat"
    fs = tmp_path / "final_state.dat"
    write_av_vels(av, result.av_vels)
    write_final_state(fs, params, result.cells, obstacles)

    check = check_files(
        av,
        fs,
        "/root/reference/check/128x128.av_vels.dat",
        "/root/reference/check/128x128.final_state.dat",
        tolerance=1.0,
    )
    assert check.passed, (
        f"av max {check.av_vels.max_diff_pcnt}% "
        f"fs max {check.final_state.max_diff_pcnt}%"
    )
    # f32 drift is far inside the gate in practice (~0.07%).
    assert abs(check.av_vels.max_diff_pcnt) < 0.5
    # Reynolds number close to the reference's published value (README.md:78;
    # theirs reads a one-step-stale state, hence the loose tolerance).
    re = result.reynolds(params, obstacles)
    assert re == pytest.approx(9.763598020526, rel=2e-3)
