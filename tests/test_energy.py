"""Physics integration tests: conservation over many steps (SURVEY §4.3)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.ops import diagnostics as diag_mod
from nbody3d_tpu.ops.step import make_scan_fn, make_step_fn
from nbody3d_tpu.state import init_state

G = 1e-4
EPS2 = 1e-4


def test_two_body_circular_orbit_stable():
    """Equal masses on a circular orbit: energy drift < 1e-4 over 2000
    steps, radius stays within 1% (BASELINE drift bound, scaled down)."""
    m = 1e6
    r = 2.0  # separation
    # circular orbit speed for softened two-body: a = G m / (r^2+eps2)^1.5 * r
    # centripetal: v^2 / (r/2) = a  =>  v = sqrt(a * r / 2)
    a_mag = G * m * r / (r * r + EPS2) ** 1.5
    v = math.sqrt(a_mag * r / 2.0)
    pos = np.array([[-1.0, 0, 0, m], [1.0, 0, 0, m]], np.float32)
    vel = np.array([[0, -v, 0, 0], [0, v, 0, 0]], np.float32)
    s = init_state(pos, vel)
    cfg = SimConfig(backend="jnp")
    run = make_scan_fn(make_step_fn(cfg, 2, 2, "cpu"))

    e0 = float(diag_mod.compute(s.pos_mass, s.vel, G, eps2=EPS2).total_energy)
    out = run(s, 1e-3, G, 2000)
    e1 = float(diag_mod.compute(out.pos_mass, out.vel, G, eps2=EPS2).total_energy)
    assert abs((e1 - e0) / e0) < 1e-4
    sep = float(jnp.linalg.norm(out.pos_mass[0, :3] - out.pos_mass[1, :3]))
    assert abs(sep - r) / r < 0.01


def test_plummer_energy_and_momentum_drift():
    """N=256 Plummer, 500 steps at reference dt: |dE/E| < 1e-3 and momentum
    conserved to f32 accumulation level."""
    from nbody3d_tpu.models.plummer import plummer_sphere

    pm, vel, _ = plummer_sphere(256, G=G, total_mass=1e6, rng=np.random.default_rng(5))
    s = init_state(pm, vel)
    cfg = SimConfig(backend="jnp")
    run = make_scan_fn(make_step_fn(cfg, 256, 256, "cpu"))

    d0 = diag_mod.compute(s.pos_mass, s.vel, G, eps2=EPS2)
    # scan donates its input state: compute the scale before running
    scale = float(jnp.sum(jnp.abs(s.pos_mass[:, 3:4] * s.vel[:, :3])))
    out = run(jax.tree.map(jnp.copy, s), 1e-4, G, 500)
    d1 = diag_mod.compute(out.pos_mass, out.vel, G, eps2=EPS2)
    drift = abs(float(d1.total_energy - d0.total_energy) / float(d0.total_energy))
    assert drift < 1e-3
    p0 = np.asarray(d0.momentum)
    p1 = np.asarray(d1.momentum)
    # momentum is conserved exactly by symmetry up to f32 rounding
    assert np.abs(p1 - p0).max() / scale < 1e-5


def test_verlet_second_order_convergence():
    """Halving dt should reduce the energy drift by ~4x (2nd-order method)."""
    from nbody3d_tpu.models.plummer import plummer_sphere

    pm, vel, _ = plummer_sphere(64, G=G, total_mass=1e6, rng=np.random.default_rng(6))
    s = init_state(pm, vel)
    cfg = SimConfig(backend="jnp")
    run = make_scan_fn(make_step_fn(cfg, 64, 64, "cpu"))

    def drift(dt, steps):
        d0 = diag_mod.compute(s.pos_mass, s.vel, G, eps2=EPS2)
        out = run(jax.tree.map(jnp.copy, s), dt, G, steps)  # scan donates input
        d1 = diag_mod.compute(out.pos_mass, out.vel, G, eps2=EPS2)
        return abs(float(d1.total_energy - d0.total_energy))

    # Same simulated time horizon.
    d_coarse = drift(4e-3, 250)
    d_fine = drift(2e-3, 500)
    assert d_fine < d_coarse * 0.5  # at least ~2x; ideally ~4x


def test_diagnostics_chunked_equals_full(rng):
    n = 128
    pm = np.concatenate(
        [rng.normal(size=(n, 3)), rng.uniform(1, 50, size=(n, 1))], axis=1
    ).astype(np.float32)
    v = np.concatenate(
        [rng.normal(size=(n, 3)), np.zeros((n, 1))], axis=1
    ).astype(np.float32)
    full = diag_mod.compute(jnp.asarray(pm), jnp.asarray(v), G, eps2=EPS2)
    chunked = diag_mod.compute(jnp.asarray(pm), jnp.asarray(v), G, eps2=EPS2, chunk=32)
    np.testing.assert_allclose(float(full.potential), float(chunked.potential), rtol=1e-5)
    np.testing.assert_allclose(float(full.kinetic), float(chunked.kinetic), rtol=1e-6)
