"""Integrator semantics: frame-shifted Verlet (nbody3d.js:274-290)."""

import jax.numpy as jnp
import numpy as np

from nbody3d_tpu.ops.integrate import euler_step, verlet_step
from nbody3d_tpu.state import init_state


def make_state(pos, vel, accel=None):
    return init_state(
        np.asarray(pos, np.float32), np.asarray(vel, np.float32),
        None if accel is None else np.asarray(accel, np.float32),
    )


def test_verlet_closed_form():
    """v' = v + (a_old + a_new) dt/2; x' = x + (v' + a_new dt/2) dt."""
    dt = 0.1
    pos = [[1.0, 2.0, 3.0, 7.0]]
    vel = [[0.5, -0.5, 1.0, 0.0]]
    a_old = [[0.2, 0.0, -0.1, 0.0]]
    a_new = jnp.asarray([[0.4, 0.1, 0.3, 0.0]], jnp.float32)
    s = make_state(pos, vel, a_old)
    out = verlet_step(s, a_new, dt)
    v_exp = np.array(vel) + (np.array(a_old) + np.array(a_new)) * dt / 2
    x_exp = np.array(pos) + (v_exp + np.array(a_new) * dt / 2) * dt
    np.testing.assert_allclose(np.asarray(out.vel), v_exp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.pos_mass), x_exp, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.accel), np.asarray(a_new))
    assert int(out.step) == 1


def test_mass_invariant_through_vec4_update():
    """The w-lane update is a no-op because vel.w == accel.w == 0
    (nbody3d.js:283 writes the full vec4)."""
    s = make_state([[0, 0, 0, 123.5]], [[1, 2, 3, 0]])
    out = verlet_step(s, jnp.asarray([[9.0, 9.0, 9.0, 0.0]], jnp.float32), 0.25)
    assert float(out.pos_mass[0, 3]) == 123.5
    assert float(out.vel[0, 3]) == 0.0


def test_first_step_uses_zero_accel():
    """accel buffer starts zeroed (nbody3d.js:195-199): first kick is
    (0 + a_new) dt/2."""
    dt = 0.01
    s = make_state([[0, 0, 0, 1.0]], [[0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(s.accel), np.zeros((1, 4)))
    a_new = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    out = verlet_step(s, a_new, dt)
    np.testing.assert_allclose(float(out.vel[0, 0]), dt / 2, rtol=1e-6)


def test_euler_semantics():
    """v += a dt; x += v dt (nbody3d.js:285-287, semi-implicit)."""
    dt = 0.1
    s = make_state([[0, 0, 0, 1.0]], [[1, 0, 0, 0]])
    out = euler_step(s, jnp.asarray([[2.0, 0, 0, 0]], jnp.float32), dt)
    np.testing.assert_allclose(float(out.vel[0, 0]), 1.2, rtol=1e-6)
    np.testing.assert_allclose(float(out.pos_mass[0, 0]), 0.12, rtol=1e-6)


def test_padding_mask_freezes_tail():
    pos = np.array([[0, 0, 0, 5.0], [1, 1, 1, 5.0]], np.float32)
    vel = np.ones((2, 4), np.float32) * np.array([1, 1, 1, 0], np.float32)
    s = init_state(pos, vel, n_pad=8)
    a = jnp.ones((8, 4), jnp.float32) * jnp.asarray([1, 1, 1, 0], jnp.float32)
    out = verlet_step(s, a, 0.5, n_real=2)
    # padded rows frozen at zero
    np.testing.assert_array_equal(np.asarray(out.pos_mass[2:]), np.zeros((6, 4)))
    np.testing.assert_array_equal(np.asarray(out.vel[2:]), np.zeros((6, 4)))
    np.testing.assert_array_equal(np.asarray(out.accel[2:]), np.zeros((6, 4)))
    # real rows moved
    assert float(out.pos_mass[0, 0]) != 0.0
