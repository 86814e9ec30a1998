"""Native C++ IO layer (native/lbm_io.cpp) vs the pure-Python fallback.

The two implementations must agree byte-for-byte on output formats and
accept/reject exactly the same inputs (ADVICE r1: the native parser used to
accept trailing junk and silently split >255-char lines). The library is
built here if missing, so these tests also stand in for the old committed
.so artifact.
"""

import subprocess

import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import LBMParams

NATIVE_DIR = "/root/repo/native"


@pytest.fixture(scope="module")
def native():
    rc = subprocess.run(["make", "-C", NATIVE_DIR, "-s"], capture_output=True)
    if rc.returncode != 0:
        pytest.skip(f"native build failed: {rc.stderr.decode()[:200]}")
    from lbm_tpu.io import native as nat

    nat._lib.cache_clear()
    if not nat.available():
        pytest.skip("liblbm_io.so not loadable")
    return nat


@pytest.fixture
def py_io(monkeypatch):
    """The files module with the native path disabled (pure-Python fallback)."""
    from lbm_tpu.io import files

    monkeypatch.setattr(files, "_native_io", lambda: None)
    return files


@pytest.fixture
def params():
    return LBMParams(
        nx=8, ny=8, max_iters=4, reynolds_dim=10, density=0.1, accel=0.005, omega=1.85
    )


def test_parser_agrees_on_good_file(native, py_io, params, tmp_path):
    f = tmp_path / "obs.dat"
    f.write_text("0 0 1\n3 4 1\n\n  7 7 1  \n3 4 1\n")  # blanks + duplicate
    got_native = native.read_obstacles(f, params.nx, params.ny)
    got_py = py_io.read_obstacles(f, params)
    np.testing.assert_array_equal(got_native, got_py)
    assert got_native.sum() == 3


@pytest.mark.parametrize(
    "content",
    [
        "1 2 1 junk\n",  # extra trailing token (exactly-3-fields rule)
        "1 2 1 4\n",  # extra numeric token
        "1 2\n",  # too few fields
        "8 0 1\n",  # x out of range
        "0 8 1\n",  # y out of range
        "0 0 2\n",  # blocked != 1
        "1.5 2 1\n",  # non-integer field
        "1 2 1" + " " * 300 + "junk\n",  # >255 chars, junk beyond the buffer
    ],
)
def test_parser_rejects_like_python(native, py_io, params, tmp_path, content):
    from lbm_tpu.io.files import InputError

    f = tmp_path / "obs.dat"
    f.write_text(content)
    with pytest.raises(ValueError):
        native.read_obstacles(f, params.nx, params.ny)
    with pytest.raises(InputError):
        py_io.read_obstacles(f, params)


def test_parser_rejects_long_line(native, params, tmp_path):
    """A single line longer than the 256-byte fgets buffer must be one
    malformed record, not silently split into two."""
    f = tmp_path / "obs.dat"
    f.write_text("0 0 1 " + "0" * 300 + "\n1 1 1\n")
    with pytest.raises(ValueError):
        native.read_obstacles(f, params.nx, params.ny)


def test_long_whitespace_line_ok(native, py_io, params, tmp_path):
    """Trailing whitespace past the buffer boundary is still a valid line
    in Python (split() ignores it); native treats the truncated read as
    malformed only when non-whitespace follows — keep them agreeing on the
    whitespace case by rejecting in neither... the simple contract: both
    accept a normal line with trailing spaces under the buffer size."""
    f = tmp_path / "obs.dat"
    f.write_text("1 2 1" + " " * 40 + "\n")
    np.testing.assert_array_equal(
        native.read_obstacles(f, params.nx, params.ny),
        py_io.read_obstacles(f, params),
    )


def test_writers_byte_identical(native, params, tmp_path, monkeypatch):
    rng = np.random.RandomState(0)
    obstacles = (rng.rand(params.ny, params.nx) < 0.2).astype(np.int32)
    cells = oracle.initial_state(params) * (1 + 0.01 * rng.rand(9, params.ny, params.nx))

    a = tmp_path / "native_fs.dat"
    b = tmp_path / "py_fs.dat"
    av = rng.rand(100) * 1e-3
    from lbm_tpu.io import files

    # Native path first (library built by the fixture) ...
    assert files._native_io() is not None
    files.write_final_state(a, params, cells, obstacles)
    files.write_av_vels(tmp_path / "native_av.dat", av)
    # ... then the pure-Python fallback on the same data.
    monkeypatch.setattr(files, "_native_io", lambda: None)
    files.write_final_state(b, params, cells, obstacles)
    files.write_av_vels(tmp_path / "py_av.dat", av)

    assert a.read_bytes() == b.read_bytes()
    assert (tmp_path / "native_av.dat").read_bytes() == (
        tmp_path / "py_av.dat"
    ).read_bytes()
