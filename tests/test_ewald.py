"""Ewald oracle self-consistency (ops/ewald.py).

The oracle's own correctness tests: the Gaussian split parameter sigma
must drop out of the total, the force field must honor the lattice
symmetries, and the limits must reduce to known cases.  Everything runs
in float64 (the oracle is the ground truth for the f32 P3M solver, so it
must be an order of magnitude tighter than what it judges).
"""

import jax
import numpy as np
import pytest

from nbody3d_tpu.ops.ewald import ewald_accel_reference, k_short_periodic

L = 1.0
EPS2 = 1e-8  # tiny softening: near-pure periodic Newtonian


def _rand_state(n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    pm = np.concatenate(
        [rng.uniform(0, L, (n, 3)), rng.uniform(1.0, 3.0, (n, 1))], axis=1
    ).astype(dtype)
    return pm


def test_sigma_independence():
    """sigma is a SPLIT parameter: the total force must not depend on it.
    This cross-checks the real-space and reciprocal-space terms against
    each other (an error in either term moves with sigma)."""
    with jax.enable_x64(True):
        pm = jax.numpy.asarray(_rand_state(24))
        a1 = np.asarray(
            ewald_accel_reference(pm, L, L / 10, eps2=EPS2, n_images=3, kmax=12)
        )
        a2 = np.asarray(
            ewald_accel_reference(pm, L, L / 14, eps2=EPS2, n_images=3, kmax=14)
        )
    scale = np.abs(a1).max()
    np.testing.assert_allclose(a1 / scale, a2 / scale, atol=2e-9)


def test_momentum_conservation():
    """Total force is exactly zero (translation invariance of the
    periodic sum; the background cancels in the k != 0 restriction)."""
    with jax.enable_x64(True):
        pm = _rand_state(32, seed=3)
        a = np.asarray(
            ewald_accel_reference(jax.numpy.asarray(pm), L, L / 12, eps2=EPS2)
        )
    f = pm[:, 3:4] * a  # numpy f64: safe outside the x64 scope
    assert np.abs(f.sum(axis=0)).max() < 1e-10 * np.abs(f).sum()


def test_cubic_lattice_zero_force():
    """Equal masses on a perfect cubic sublattice: zero force on every
    body by symmetry (each body is an inversion center)."""
    with jax.enable_x64(True):
        g = np.arange(4) / 4 * L + 0.07  # offset breaks any grid alignment
        xyz = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
        pm = np.concatenate(
            [xyz, np.full((64, 1), 2.0)], axis=1
        )
        a = np.asarray(
            ewald_accel_reference(
                jax.numpy.asarray(pm), L, L / 10, eps2=EPS2, n_images=3, kmax=12
            )
        )
    # forces on a lattice cancel to the sum's convergence tolerance
    # (n_images/kmax truncation) — relative to the ~32 pair-force scale
    assert np.abs(a).max() < 1e-8 * 32.0


def test_isolated_limit():
    """Two close bodies in a huge box: the periodic force approaches the
    bare softened pair force (images ~ (r/L)^3 corrections)."""
    big = 200.0
    d = 0.1
    eps2 = 1e-4
    with jax.enable_x64(True):
        pm = np.array(
            [[100.0, 100.0, 100.0, 5.0], [100.0 + d, 100.0, 100.0, 7.0]]
        )
        a = np.asarray(
            ewald_accel_reference(
                jax.numpy.asarray(pm), big, big / 12, eps2=eps2,
                n_images=2, kmax=10,
            )
        )
    k = (d * d + eps2) ** -1.5
    expect0 = 7.0 * k * d  # toward +x
    assert a[0, 0] == pytest.approx(expect0, rel=1e-5)
    assert a[1, 0] == pytest.approx(-5.0 * k * d, rel=1e-5)
    assert np.abs(a[:, 1:]).max() < 1e-9 * abs(expect0)


def test_wrap_invariance():
    """Shifting every position by a lattice vector (and wrapping) leaves
    forces unchanged — the sum only sees positions modulo L."""
    with jax.enable_x64(True):
        pm = _rand_state(16, seed=9)
        a1 = np.asarray(
            ewald_accel_reference(jax.numpy.asarray(pm), L, L / 10, eps2=EPS2)
        )
        pm2 = pm.copy()
        pm2[:, :3] = (pm2[:, :3] + 0.37 * L) % L - 0.0
        a2 = np.asarray(
            ewald_accel_reference(jax.numpy.asarray(pm2), L, L / 10, eps2=EPS2)
        )
    # translation by 0.37L then wrap: same relative geometry
    np.testing.assert_allclose(a1, a2, rtol=0, atol=1e-9 * np.abs(a1).max())


def test_potential_energy_gradient_is_force():
    """``-∂U/∂x_i = m_i a_i``: jax.grad of the Ewald potential must equal
    the mass-weighted Ewald force — real, reciprocal, and self terms all
    cross-checked in one shot (constants drop out of the gradient)."""
    from nbody3d_tpu.ops.ewald import ewald_potential_energy

    with jax.enable_x64(True):
        pm = jax.numpy.asarray(_rand_state(20, seed=6))
        sigma = L / 12.0

        # eps2 tiny: the energy truncates the softening-tail image sum at
        # the minimum image (see ewald_potential_energy docstring), while
        # the force oracle sums n_images shells of it — a modeled ~eps2
        # difference this test sidesteps to isolate real bugs.
        def U(x):
            p = jax.numpy.concatenate([x, pm[:, 3:4]], axis=1)
            return ewald_potential_energy(
                p, L, eps2=1e-9, sigma=sigma, kmax=14
            )

        g = np.asarray(jax.grad(U)(pm[:, :3]))
        a = np.asarray(
            ewald_accel_reference(
                pm, L, sigma, eps2=1e-9, n_images=2, kmax=14
            )
        )
        f = np.asarray(pm[:, 3:4]) * a
    scale = np.abs(f).max()
    np.testing.assert_allclose(-g / scale, f / scale, atol=1e-9)


def test_potential_energy_sigma_independent():
    """Like the force, the total energy must not depend on the split
    width (self/background constants included correctly)."""
    from nbody3d_tpu.ops.ewald import ewald_potential_energy

    with jax.enable_x64(True):
        pm = jax.numpy.asarray(_rand_state(24, seed=2))
        u1 = float(
            ewald_potential_energy(pm, L, eps2=1e-4, sigma=L / 10, kmax=12)
        )
        u2 = float(
            ewald_potential_energy(pm, L, eps2=1e-4, sigma=L / 14, kmax=16)
        )
    assert u1 == pytest.approx(u2, rel=1e-6)  # kmax-truncation floor


def test_potential_energy_f64_twin():
    """The host numpy/f64 form (what the engine's periodic diagnostics
    use — the f32 evaluation carries ~1e2 of self/background
    cancellation noise, DESIGN.md periodic finding #7) matches the jnp
    form under x64 and is sigma-independent."""
    from nbody3d_tpu.ops.ewald import (
        ewald_potential_energy,
        ewald_potential_energy_f64,
    )

    pm_np = _rand_state(24, seed=2)
    with jax.enable_x64(True):
        u_jnp = float(
            ewald_potential_energy(
                jax.numpy.asarray(np.asarray(pm_np, np.float64)),
                L, eps2=1e-4, sigma=L / 12, kmax=14,
            )
        )
    u_np = ewald_potential_energy_f64(pm_np, L, eps2=1e-4, sigma=L / 12, kmax=14)
    assert u_np == pytest.approx(u_jnp, rel=1e-12)
    u_np2 = ewald_potential_energy_f64(pm_np, L, eps2=1e-4, sigma=L / 15, kmax=17)
    assert u_np == pytest.approx(u_np2, rel=1e-7)


def test_k_short_decays():
    """The short-range scalar is erfc-small past a few sigma (the cutoff
    rationale) and equals the softened exact scalar at r << sigma."""
    sigma = 0.1
    r2 = np.array([1e-4, (5 * sigma) ** 2, (8 * sigma) ** 2])
    k = np.asarray(k_short_periodic(jax.numpy.asarray(r2), 1e-6, sigma))
    exact0 = (r2[0] + 1e-6) ** -1.5
    assert k[0] == pytest.approx(exact0, rel=1e-3)
    assert abs(k[1]) < 1e-4 * exact0
    assert abs(k[2]) < 1e-9 * exact0
