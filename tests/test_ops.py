"""Unit tests for the jnp ops against the independent NumPy float64 oracle
(SURVEY.md §4: per-op tests the reference lacks)."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from lbm_tpu.models.d2q9 import D2Q9
from lbm_tpu.ops import accelerate_flow, collide, lbm_step_reference, stream


def random_state(params, seed=0):
    rng = np.random.RandomState(seed)
    # Positive, near-equilibrium-ish distributions.
    base = oracle.initial_state(params)
    return base * (1.0 + 0.1 * rng.rand(*base.shape))


def test_initial_state_matches_reference_weights(small_params):
    state = np.asarray(D2Q9.initial_state(small_params))
    # d2q9-bgk.c:572-594: speed 0 = density*4/9, 1-4 = density/9, 5-8 = density/36.
    assert np.allclose(state[0], small_params.density * 4 / 9, rtol=1e-6)
    assert np.allclose(state[1:5], small_params.density / 9, rtol=1e-6)
    assert np.allclose(state[5:], small_params.density / 36, rtol=1e-6)


def test_stream_matches_oracle(small_params):
    state = random_state(small_params)
    got = np.asarray(stream(jnp.asarray(state)))
    want = oracle.stream(state)
    np.testing.assert_allclose(got, want, rtol=1e-11)


def test_stream_periodic_wrap(small_params):
    """A single marker streams one cell per step in its lattice direction,
    wrapping at the edges (kernels.cl:80-98)."""
    ny, nx = small_params.ny, small_params.nx
    for k in range(1, 9):
        state = np.zeros((9, ny, nx))
        state[k, ny - 1, nx - 1] = 1.0  # corner, to exercise wrap
        out = np.asarray(stream(jnp.asarray(state)))
        yy = (ny - 1 + oracle.CY[k]) % ny
        xx = (nx - 1 + oracle.CX[k]) % nx
        assert out[k, yy, xx] == pytest.approx(1.0, rel=1e-9)
        assert out.sum() == pytest.approx(1.0, rel=1e-9)


def test_accelerate_matches_oracle(small_params, small_obstacles):
    state = random_state(small_params)
    got = np.asarray(
        accelerate_flow(
            jnp.asarray(state),
            jnp.asarray(small_obstacles),
            small_params.density,
            small_params.accel,
        )
    )
    want = oracle.accelerate(state, small_obstacles, small_params.density, small_params.accel)
    np.testing.assert_allclose(got, want, rtol=1e-11)


def test_accelerate_joint_positivity_mask(small_params):
    """The obstacle test and all three positivity conditions form one joint
    mask (kernels.cl:29-32): if any would-be-decremented population would go
    non-positive, the whole cell update is skipped."""
    ny, nx = small_params.ny, small_params.nx
    obstacles = np.zeros((ny, nx), dtype=np.int32)
    state = np.asarray(oracle.initial_state(small_params))
    w2 = small_params.density * small_params.accel / 36.0
    # Make speed 6 too small at one column of the accelerated row.
    state[6, ny - 2, 3] = w2 * 0.5
    out = np.asarray(
        accelerate_flow(
            jnp.asarray(state), jnp.asarray(obstacles), small_params.density, small_params.accel
        )
    )
    # Column 3 untouched in every plane (atol far below the w2-scale update,
    # but above device-transfer ulp noise), neighbors updated.
    np.testing.assert_allclose(out[:, ny - 2, 3], state[:, ny - 2, 3], atol=1e-12)
    w1 = small_params.density * small_params.accel / 9.0
    assert out[1, ny - 2, 4] - state[1, ny - 2, 4] == pytest.approx(w1, rel=1e-6)


def test_collide_matches_oracle(small_params, small_obstacles):
    state = random_state(small_params)
    streamed = oracle.stream(state)
    got_cells, got_tot = collide(
        jnp.asarray(streamed), jnp.asarray(small_obstacles), small_params.omega
    )
    want_cells, want_tot = oracle.collide(streamed, small_obstacles, small_params.omega)
    np.testing.assert_allclose(np.asarray(got_cells), want_cells, rtol=1e-10)
    np.testing.assert_allclose(float(got_tot), want_tot, rtol=1e-10)


def test_bounce_back_on_obstacles(small_params):
    """Obstacle cells reflect the streamed-in populations into their opposite
    directions (kernels.cl:100-107, 179-196)."""
    ny, nx = small_params.ny, small_params.nx
    obstacles = np.zeros((ny, nx), dtype=np.int32)
    obstacles[5, 5] = 1
    state = random_state(small_params)
    streamed = oracle.stream(state)
    out, _ = collide(jnp.asarray(streamed), jnp.asarray(obstacles), small_params.omega)
    out = np.asarray(out)
    for k in range(9):
        assert out[k, 5, 5] == pytest.approx(streamed[oracle.OPP[k], 5, 5], rel=1e-6)


def test_full_step_matches_oracle(small_params, small_obstacles):
    state = random_state(small_params)
    got_cells, got_tot = lbm_step_reference(
        jnp.asarray(state),
        jnp.asarray(small_obstacles),
        small_params.density,
        small_params.accel,
        small_params.omega,
    )
    want_cells, want_tot = oracle.step(
        state, small_obstacles, small_params.density, small_params.accel, small_params.omega
    )
    np.testing.assert_allclose(np.asarray(got_cells), want_cells, rtol=1e-9)
    np.testing.assert_allclose(float(got_tot), want_tot, rtol=1e-9)


def test_mass_conservation(small_params, small_obstacles):
    """Total density is conserved by stream+collide; acceleration adds and
    removes equal mass (d2q9-bgk.c total_density debug check, 822-838)."""
    state = oracle.initial_state(small_params)
    cells = jnp.asarray(state)
    total0 = float(jnp.sum(cells))
    for _ in range(10):
        cells, _ = lbm_step_reference(
            cells,
            jnp.asarray(small_obstacles),
            small_params.density,
            small_params.accel,
            small_params.omega,
        )
    assert float(jnp.sum(cells)) == pytest.approx(total0, rel=1e-10)


def test_equilibrium_zero_velocity_is_weights():
    rho = jnp.full((4, 8), 0.7)
    zero = jnp.zeros_like(rho)
    feq = np.asarray(D2Q9.equilibrium(rho, zero, zero))
    for k in range(9):
        np.testing.assert_allclose(feq[k], 0.7 * oracle.W[k], rtol=1e-6)


def test_equilibrium_sums_to_density():
    rng = np.random.RandomState(1)
    rho = jnp.asarray(0.5 + rng.rand(6, 6))
    ux = jnp.asarray(0.1 * (rng.rand(6, 6) - 0.5))
    uy = jnp.asarray(0.1 * (rng.rand(6, 6) - 0.5))
    feq = D2Q9.equilibrium(rho, ux, uy)
    np.testing.assert_allclose(np.asarray(jnp.sum(feq, axis=0)), np.asarray(rho), rtol=1e-5)
