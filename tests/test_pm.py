"""Particle-mesh solver (ops/pm.py): deposit, Poisson, gather, step
integration, and the sharded PM step — a beyond-reference capability
(SURVEY §2.2 names only the direct all-pairs algorithm,
``nbody3d.js:218-294``), so the contract here is self-defined: match the
direct solver in the far field, conserve momentum, scale linearly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.ops.force_jnp import accel_direct
from nbody3d_tpu.ops.pm import (
    _box,
    _cic_cells,
    _segment_sum_sorted,
    accel_pm,
    cic_deposit,
    solve_potential,
)
from nbody3d_tpu.ops.step import make_scan_fn, make_step_fn
from nbody3d_tpu.parallel.mesh import default_mesh
from nbody3d_tpu.parallel.sharded import make_sharded_step, shard_state
from nbody3d_tpu.state import init_state

G = 1e-4
EPS2 = 1e-4


def test_segment_sum_sorted_matches_numpy(rng):
    ncell = 257
    ids = jnp.asarray(rng.integers(0, ncell, 10_000, dtype=np.int32))
    w = jnp.asarray(rng.uniform(0, 3, 10_000).astype(np.float32))
    got = np.asarray(_segment_sum_sorted(ids, w, ncell))
    want = np.zeros(ncell, np.float64)
    np.add.at(want, np.asarray(ids), np.asarray(w, np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_deposit_conserves_mass_and_localizes(rng):
    n, grid = 500, 32
    pos = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    mass = jnp.asarray(rng.uniform(10, 50, n).astype(np.float32))
    lo, h = _box(pos, grid)
    rho = cic_deposit(pos, mass, lo, h, grid)
    np.testing.assert_allclose(float(rho.sum()), float(mass.sum()), rtol=1e-6)

    # one particle exactly at a cell center -> exactly one nonzero cell
    p1 = lo + (jnp.array([10, 11, 12], jnp.float32) + 0.5) * h
    rho1 = cic_deposit(p1[None], jnp.ones(1, jnp.float32), lo, h, grid)
    nz = np.argwhere(np.asarray(rho1) > 1e-8)
    assert nz.shape == (1, 3)
    assert tuple(nz[0]) == (10, 11, 12)
    np.testing.assert_allclose(float(rho1[10, 11, 12]), 1.0, rtol=1e-6)


def test_point_mass_potential_matches_plummer():
    """Φ of a single mass vs the analytic Plummer potential at a few cell
    distances (the PM contract: exact far field, grid-smoothed near)."""
    grid = 64
    h = jnp.float32(0.1)
    rho = jnp.zeros((grid, grid, grid), jnp.float32).at[32, 32, 32].set(1.0)
    phi = np.asarray(solve_potential(rho, h, EPS2))
    for cells in (5, 10, 20):
        r = cells * float(h)
        want = -1.0 / np.sqrt(r * r + EPS2)
        got = phi[32 + cells, 32, 32]
        np.testing.assert_allclose(got, want, rtol=2e-2)


def test_pm_matches_direct_far_field(rng):
    """Two compact, well-separated clusters: the aggregate force each
    cluster feels is a far-field quantity PM must get right."""
    n1 = n2 = 256
    p1 = np.array([-6.0, 0, 0]) + rng.standard_normal((n1, 3)) * 0.3
    p2 = np.array([6.0, 0, 0]) + rng.standard_normal((n2, 3)) * 0.3
    pos = np.concatenate([p1, p2]).astype(np.float32)
    mass = rng.uniform(10, 50, (n1 + n2, 1)).astype(np.float32)
    pm = jnp.asarray(np.concatenate([pos, mass], axis=1))
    f_pm = np.asarray(accel_pm(pm, G, grid=64, eps2=EPS2)[:, :3]) * mass
    f_dir = np.asarray(accel_direct(pm, G, eps2=EPS2)[:, :3]) * mass
    for sl in (slice(0, n1), slice(n1, None)):
        rel = np.linalg.norm(f_pm[sl].sum(0) - f_dir[sl].sum(0)) / np.linalg.norm(
            f_dir[sl].sum(0)
        )
        assert rel < 5e-3, rel


def test_pm_conserves_momentum(rng):
    """Matched CIC deposit/gather + odd-difference gradient ⇒ Σ m·a ≈ 0
    regardless of grid resolution (the PM momentum theorem)."""
    n = 1000
    pos = rng.standard_normal((n, 3)).astype(np.float32) * 2
    mass = rng.uniform(10, 50, (n, 1)).astype(np.float32)
    pm = jnp.asarray(np.concatenate([pos, mass], axis=1))
    f = np.asarray(accel_pm(pm, G, grid=32, eps2=EPS2)[:, :3]) * mass
    assert np.abs(f.sum(0)).max() < 1e-6 * np.abs(f).sum()


def test_pm_padding_neutral(rng):
    """Padded rows (mass 0 at the origin) must not perturb real forces or
    the box, and stay frozen through a step."""
    n, n_pad = 300, 384
    pos = (rng.standard_normal((n, 3)) * 2 + 5).astype(np.float32)
    mass = rng.uniform(10, 50, (n, 1)).astype(np.float32)
    pmat = np.concatenate([pos, mass], axis=1).astype(np.float32)
    vel = np.zeros_like(pmat)
    a_nopad = accel_pm(jnp.asarray(pmat), G, grid=32, eps2=EPS2, n_real=n)

    state = init_state(pmat, vel, n_pad=n_pad)
    a_pad = accel_pm(state.pos_mass, G, grid=32, eps2=EPS2, n_real=n)
    np.testing.assert_allclose(
        np.asarray(a_pad[:n]), np.asarray(a_nopad[:n]), rtol=1e-5, atol=1e-7
    )

    cfg = SimConfig(method="pm", pm_grid=32)
    step = make_step_fn(cfg, n_pad, n)
    out = jax.jit(step)(state, jnp.float32(1e-4), jnp.float32(G))
    np.testing.assert_array_equal(np.asarray(out.pos_mass[n:]), np.zeros((n_pad - n, 4)))
    np.testing.assert_array_equal(np.asarray(out.vel[n:]), np.zeros((n_pad - n, 4)))


def test_pm_step_scan_runs_and_is_deterministic(rng):
    n = 512
    pos = rng.standard_normal((n, 3)).astype(np.float32) * 2
    mass = rng.uniform(10, 50, (n, 1)).astype(np.float32)
    pmat = np.concatenate([pos, mass], axis=1).astype(np.float32)
    vel = np.zeros_like(pmat)
    cfg = SimConfig(method="pm", pm_grid=32)
    step = make_step_fn(cfg, n, n)
    run = make_scan_fn(step)
    out1 = run(init_state(pmat, vel), cfg.dt, cfg.G, 5)
    out2 = run(init_state(pmat, vel), cfg.dt, cfg.G, 5)
    np.testing.assert_array_equal(np.asarray(out1.pos_mass), np.asarray(out2.pos_mass))
    assert int(out1.step) == 5
    assert np.isfinite(np.asarray(out1.pos_mass)).all()


def test_sharded_pm_matches_single_device(rng):
    """Shard-local deposit + psum grid must reproduce the single-device PM
    step on the 8-device CPU mesh."""
    n, n_pad = 480, 512
    pos = rng.standard_normal((n, 3)).astype(np.float32) * 2
    mass = rng.uniform(10, 50, (n, 1)).astype(np.float32)
    pmat = np.concatenate([pos, mass], axis=1).astype(np.float32)
    vel = (rng.standard_normal((n, 4)) * 0.1).astype(np.float32)
    vel[:, 3] = 0

    cfg = SimConfig(method="pm", pm_grid=32)
    single = jax.jit(make_step_fn(cfg, n_pad, n))(
        init_state(pmat, vel, n_pad=n_pad), jnp.float32(cfg.dt), jnp.float32(cfg.G)
    )

    mesh = default_mesh(8)
    st = shard_state(init_state(pmat, vel, n_pad=n_pad), mesh, cfg.mesh_axis)
    sharded = jax.jit(make_sharded_step(cfg, n_pad, n, mesh))(
        st, jnp.float32(cfg.dt), jnp.float32(cfg.G)
    )
    # The sharded deposit sums per shard then psums (different f32
    # reduction order than the global sort), so the grids — and through
    # the FFT, the forces — agree only to reduction-order noise.
    np.testing.assert_allclose(
        np.asarray(sharded.pos_mass),
        np.asarray(single.pos_mass),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.accel), np.asarray(single.accel), rtol=2e-4, atol=1e-5
    )


@pytest.mark.slow
def test_pm_energy_sanity_plummer(rng):
    """Loose conservation over a short PM run (approximate forces, so the
    bound is wider than the direct gates in benchmarks/drift_check.py)."""
    from nbody3d_tpu.models.plummer import plummer_sphere
    from nbody3d_tpu.ops import diagnostics as diag_mod

    pmat, vel, _ = plummer_sphere(1024, rng=np.random.default_rng(7), G=G)
    cfg = SimConfig(method="pm", pm_grid=64)
    state = init_state(pmat, vel)
    step = make_step_fn(cfg, 1024, 1024)
    run = make_scan_fn(step)
    d0 = diag_mod.compute(state.pos_mass, state.vel, G, eps2=EPS2)
    out = run(state, cfg.dt, cfg.G, 200)
    d1 = diag_mod.compute(out.pos_mass, out.vel, G, eps2=EPS2)
    # The Plummer core spans only a few cells (truncation radius 10a across
    # a 64-cell box), so core orbits are grid-smoothed — the bound is a
    # sanity rail, not the direct solver's 1e-3 drift gate.
    assert abs(float(d1.total_energy - d0.total_energy)) < 3e-2 * abs(
        float(d0.total_energy)
    )
