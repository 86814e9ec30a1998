"""Differential test: the py3 checker mirror's printed transcript and exit
code must byte-match what the upstream python2 ``check/check.py`` would
print for the same inputs.

Upstream is python2-only (check.py:6-10) and no python2 exists here, so the
expected transcripts below are canned: derived line-by-line from the
upstream source — format strings check.py:107-121, fail messages
check.py:76/81/138-146, formula 100*diff/(ref-diff) check.py:87, max
location via argmax(|pcnt|) check.py:89, final-state coords from the SIM
file check.py:124-127 — with hand-computed values on exactly-representable
inputs (so py2/py3 float formatting is identical). Any drift in the
mirror's output or semantics breaks these tests.
"""

import io
from contextlib import redirect_stdout

import pytest

from lbm_tpu.utils.checker import main


def run_checker(tmp_path, av_ref, av_sim, fs_ref, fs_sim, tolerance=None):
    files = {}
    for name, content in [
        ("ref_av.dat", av_ref),
        ("sim_av.dat", av_sim),
        ("ref_fs.dat", fs_ref),
        ("sim_fs.dat", fs_sim),
    ]:
        p = tmp_path / name
        p.write_text(content)
        files[name] = str(p)
    argv = [
        "--ref-av-vels-file", files["ref_av.dat"],
        "--ref-final-state-file", files["ref_fs.dat"],
        "--av-vels-file", files["sim_av.dat"],
        "--final-state-file", files["sim_fs.dat"],
    ]
    if tolerance is not None:
        argv += ["--tolerance", str(tolerance)]
    out = io.StringIO()
    with redirect_stdout(out):
        rc = main(argv)
    return rc, out.getvalue()


def av(*vals):
    return "".join("%d:\t%.12E\n" % (i, v) for i, v in enumerate(vals))


def fs(*pressures, nx=2):
    return "".join(
        "%d %d 0.000000000000E+00 0.000000000000E+00 0.000000000000E+00 %.12E 0\n"
        % (i % nx, i // nx, p)
        for i, p in enumerate(pressures)
    )


def test_pass_transcript(tmp_path):
    rc, out = run_checker(
        tmp_path,
        av_ref=av(1.0, 2.0),
        av_sim=av(1.0, 2.0),
        fs_ref=fs(0.1, 0.2),
        fs_sim=fs(0.1, 0.2),
    )
    # Upstream transcript (check.py:107-113, 117-129, 146): zero diffs, both
    # argmaxes land on index 0, "{:.2g}".format(0.0) == "0".
    assert out == (
        "Total difference in av_vels : 0.000000000000E+00\n"
        "Biggest difference (at step 0) : 0.000000000000E+00\n"
        "  1.000000000000E+00 vs. 1.000000000000E+00 = 0%\n"
        "\n"
        "Total difference in final_state : 0.000000000000E+00\n"
        "Biggest difference (at coord (0,0)) : 0.000000000000E+00\n"
        "  1.000000000000E-01 vs. 1.000000000000E-01 = 0%\n"
        "\n"
        "Both tests passed!\n"
    )
    assert rc == 0


def test_fail_transcript(tmp_path):
    # av step 1: ref 2.0 vs sim 1.6 -> diff 0.4, pcnt = 100*0.4/(2.0-0.4)
    # = 25% (check.py:87); exceeds the 1% default -> "av_vels failed check"
    # only (final_state matches), exit 1 (check.py:139-144).
    rc, out = run_checker(
        tmp_path,
        av_ref=av(1.0, 2.0),
        av_sim=av(1.0, 1.6),
        fs_ref=fs(0.1, 0.2),
        fs_sim=fs(0.1, 0.2),
    )
    assert out == (
        "Total difference in av_vels : 4.000000000000E-01\n"
        "Biggest difference (at step 1) : 4.000000000000E-01\n"
        "  1.600000000000E+00 vs. 2.000000000000E+00 = 25%\n"
        "\n"
        "Total difference in final_state : 0.000000000000E+00\n"
        "Biggest difference (at coord (0,0)) : 0.000000000000E+00\n"
        "  1.000000000000E-01 vs. 1.000000000000E-01 = 0%\n"
        "\n"
        "av_vels failed check\n"
    )
    assert rc == 1


def test_both_fail_order_and_coord(tmp_path):
    # final_state (1,1) (= 4th row, nx=2): ref 0.5 vs sim 0.4 -> diff 0.1,
    # pcnt = 100*0.1/(0.5-0.1) = 25%. Both series fail; upstream prints
    # "final state failed check" BEFORE "av_vels failed check"
    # (check.py:137-140), and the coord comes from the sim file's columns
    # 0,1 at the argmax row (check.py:124-127).
    rc, out = run_checker(
        tmp_path,
        av_ref=av(1.0, 2.0),
        av_sim=av(1.0, 1.6),
        fs_ref=fs(0.1, 0.2, 0.3, 0.5),
        fs_sim=fs(0.1, 0.2, 0.3, 0.4),
    )
    assert "Biggest difference (at coord (1,1)) : 1.000000000000E-01" in out
    assert out.endswith("final state failed check\nav_vels failed check\n")
    assert rc == 1


def test_nan_fails_transcript(tmp_path):
    # NaN in the sim av_vels: diff/pcnt are NaN, argmax(|nan|) lands on the
    # NaN element, %.12E prints NAN and {:.2g} prints nan (identical in
    # py2/py3); non-finite pcnt fails regardless of tolerance
    # (check.py:134-135).
    rc, out = run_checker(
        tmp_path,
        av_ref=av(1.0, 2.0),
        av_sim="0:\tNAN\n1:\t2.000000000000E+00\n",
        fs_ref=fs(0.1, 0.2),
        fs_sim=fs(0.1, 0.2),
        tolerance=1e9,
    )
    assert out == (
        "Total difference in av_vels : NAN\n"
        "Biggest difference (at step 0) : NAN\n"
        "  NAN vs. 1.000000000000E+00 = nan%\n"
        "\n"
        "Total difference in final_state : 0.000000000000E+00\n"
        "Biggest difference (at coord (0,0)) : 0.000000000000E+00\n"
        "  1.000000000000E-01 vs. 1.000000000000E-01 = 0%\n"
        "\n"
        "av_vels failed check\n"
    )
    assert rc == 1


def test_coordinate_mismatch_transcript(tmp_path):
    # Swapped coordinate order: upstream prints exactly this and exits 1
    # before any diff output (check.py:75-77).
    bad_fs = (
        "1 0 0.000000000000E+00 0.000000000000E+00 0.000000000000E+00 1.000000000000E-01 0\n"
        "0 0 0.000000000000E+00 0.000000000000E+00 0.000000000000E+00 2.000000000000E-01 0\n"
    )
    rc, out = run_checker(
        tmp_path,
        av_ref=av(1.0),
        av_sim=av(1.0),
        fs_ref=fs(0.1, 0.2),
        fs_sim=bad_fs,
    )
    assert out == "Final state files coordinates were not the same\n"
    assert rc == 1


def test_step_count_mismatch_transcript(tmp_path):
    # check.py:80-82.
    rc, out = run_checker(
        tmp_path,
        av_ref=av(1.0, 2.0),
        av_sim=av(1.0, 2.0, 3.0),
        fs_ref=fs(0.1, 0.2),
        fs_sim=fs(0.1, 0.2),
    )
    assert out == "Different number of steps in av_vels files\n"
    assert rc == 1


def test_tolerance_boundary(tmp_path):
    # Failure requires strictly greater than tolerance (check.py:134-135):
    # exactly 25% passes at --tolerance 25.
    rc, _ = run_checker(
        tmp_path,
        av_ref=av(1.0, 2.0),
        av_sim=av(1.0, 1.6),
        fs_ref=fs(0.1, 0.2),
        fs_sim=fs(0.1, 0.2),
        tolerance=25.0,
    )
    assert rc == 0
    rc, _ = run_checker(
        tmp_path,
        av_ref=av(1.0, 2.0),
        av_sim=av(1.0, 1.6),
        fs_ref=fs(0.1, 0.2),
        fs_sim=fs(0.1, 0.2),
        tolerance=24.999,
    )
    assert rc == 1
