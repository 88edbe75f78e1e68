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


# --------------------------------------------------------------- yoshida4
# 4th-order symplectic composition (beyond reference): three force
# evaluations per step via the accum-closure interface.

import jax
import jax.numpy as jnp

from nbody3d_tpu.ops.force_jnp import accel_direct
from nbody3d_tpu.ops.integrate import (
    FORCE_EVALS,
    integrate_from_accum,
)


def _two_body():
    """Equal masses on a circular orbit about the CM: G=1, separation 2,
    orbit radius 1, speed 0.5 (v^2/r = G m / sep^2), period 4*pi."""
    pos = np.array([[1, 0, 0, 1.0], [-1, 0, 0, 1.0]], np.float32)
    vel = np.array([[0, 0.5, 0, 0], [0, -0.5, 0, 0]], np.float32)
    return pos, vel


def _rollout(kind, dt, steps, eps2=1e-12):
    pos, vel = _two_body()

    def accum(pm):
        return accel_direct(pm, 1.0, eps2=eps2)

    def body(carry, _):
        p, v, a = carry
        return integrate_from_accum(kind, accum, p, v, a, dt), None

    init = (jnp.asarray(pos), jnp.asarray(vel), jnp.zeros((2, 4), jnp.float32))
    (p, v, a), _ = jax.lax.scan(body, init, None, length=steps)
    return np.asarray(p), np.asarray(v)


def _orbit_error(kind, dt, t_total=2.0):
    """Max position error vs the analytic circular orbit after t_total."""
    steps = round(t_total / dt)
    p, _ = _rollout(kind, dt, steps)
    omega = 0.5  # v / r
    ang = omega * t_total
    exact = np.array(
        [[np.cos(ang), np.sin(ang), 0], [-np.cos(ang), -np.sin(ang), 0]]
    )
    return float(np.abs(p[:, :3] - exact).max())


def test_yoshida4_beats_verlet_and_converges_4th_order():
    """At dt=0.2 (63 steps/orbit) yoshida4's trajectory error is far below
    Verlet's, and halving dt cuts it ~2^4 (vs Verlet's 2^2)."""
    e_v2 = _orbit_error("verlet", 0.2)
    e_y2 = _orbit_error("yoshida4", 0.2)
    e_y1 = _orbit_error("yoshida4", 0.1)
    assert e_y2 < e_v2 / 20, (e_y2, e_v2)
    ratio = e_y2 / max(e_y1, 1e-12)
    assert ratio > 8, (e_y2, e_y1, ratio)  # 4th order: expect ~16


def test_yoshida4_energy_drift_below_verlet():
    """Energy drift over 5 orbits at dt=0.1: the composition holds total
    energy orders of magnitude tighter than Verlet at the same dt."""
    from nbody3d_tpu.ops import diagnostics

    pos, vel = _two_body()
    e0 = float(diagnostics.compute(
        jnp.asarray(pos), jnp.asarray(vel), 1.0, eps2=1e-12
    ).total_energy)
    drifts = {}
    for kind in ("verlet", "yoshida4"):
        p, v = _rollout(kind, 0.1, round(5 * 4 * np.pi / 0.1))
        e1 = float(diagnostics.compute(
            jnp.asarray(p), jnp.asarray(v), 1.0, eps2=1e-12
        ).total_energy)
        drifts[kind] = abs(e1 - e0) / abs(e0)
    assert drifts["yoshida4"] < drifts["verlet"] / 10, drifts


def test_yoshida4_mass_invariant_and_padding_frozen():
    pos = np.array([[1, 0, 0, 5.0], [-1, 0, 0, 5.0]], np.float32)
    vel = np.array([[0, 0.5, 0, 0], [0, -0.5, 0, 0]], np.float32)
    s = init_state(pos, vel, n_pad=8)

    def accum(pm):
        return accel_direct(pm, 1.0, eps2=1e-6)

    idx = jnp.arange(8)[:, None] < 2
    p, v, a = integrate_from_accum(
        "yoshida4", accum, jnp.asarray(s.pos_mass), jnp.asarray(s.vel),
        jnp.zeros((8, 4), jnp.float32), 0.05, valid=idx,
    )
    assert float(p[0, 3]) == 5.0  # mass rides the w lane untouched
    assert float(v[0, 3]) == 0.0
    np.testing.assert_array_equal(np.asarray(p[2:]), np.zeros((6, 4)))
    np.testing.assert_array_equal(np.asarray(v[2:]), np.zeros((6, 4)))
    np.testing.assert_array_equal(np.asarray(a[2:]), np.zeros((6, 4)))
    assert float(p[0, 0]) != 1.0  # real rows moved


def test_accum_interface_matches_one_eval_path():
    """integrate_from_accum('verlet', ...) must be bit-identical to the
    precomputed-accel verlet_step (same closure evaluated once)."""
    pos, vel = _two_body()
    s = make_state(pos, vel)

    def accum(pm):
        return accel_direct(pm, 1.0, eps2=1e-6)

    ref = verlet_step(s, accum(jnp.asarray(s.pos_mass)), 0.05)
    p, v, a = integrate_from_accum(
        "verlet", accum, jnp.asarray(s.pos_mass), jnp.asarray(s.vel),
        jnp.asarray(s.accel), 0.05,
    )
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref.pos_mass))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ref.vel))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(ref.accel))


def test_force_evals_registry():
    assert FORCE_EVALS == {"verlet": 1, "euler": 1, "yoshida4": 3}
