"""Initial-condition generator statistics (SURVEY §4 item 1)."""

import numpy as np

from nbody3d_tpu.config import GalaxyConfig
from nbody3d_tpu.models.galaxy import (
    CENTRAL_MASS,
    generate_galaxies,
    mass_to_radius,
    random_galaxy_configs,
)
from nbody3d_tpu.models.plummer import plummer_sphere
from nbody3d_tpu.models.registry import make_preset
from nbody3d_tpu.models.sphere import fibonacci_shell, uniform_sphere

G = 1e-4


def test_galaxy_counts_and_masses(rng):
    cfg = GalaxyConfig(center=(1, 2, 3), velocity=(0.5, 0, 0), normal=(0, 0, 1),
                       radius=3.0, count=500)
    pos_mass, vel, target = generate_galaxies([cfg], G=G, rng=rng)
    assert pos_mass.shape == (501, 4)
    assert vel.shape == (501, 4)
    # Central body (nbody3d.js:62-68).
    np.testing.assert_allclose(pos_mass[0], [1, 2, 3, CENTRAL_MASS], rtol=1e-6)
    np.testing.assert_allclose(vel[0], [0.5, 0, 0, 0], rtol=1e-6)
    # Disk masses U(10, 50) (nbody3d.js:63-64,88).
    disk_m = pos_mass[1:, 3]
    assert disk_m.min() >= 10.0 and disk_m.max() <= 50.0
    # vel w-lane zero (nbody3d.js:123).
    np.testing.assert_array_equal(vel[:, 3], 0.0)


def test_galaxy_radial_profile_bounds(rng):
    radius, count = 4.0, 2000
    cfg = GalaxyConfig(radius=radius, count=count, normal=(0, 1, 0))
    pos_mass, _, _ = generate_galaxies([cfg], G=G, size_factor=1000.0, rng=rng)
    r = np.linalg.norm(pos_mass[1:, :3].astype(np.float64), axis=1)
    c_radius = (mass_to_radius(CENTRAL_MASS) + mass_to_radius(50.0)) / 1000.0
    # r(t) in [cR, cR + R*(2^2-1)/3] = [cR, cR + R] for t in [0,1]
    # (nbody3d.js:90-93), plus thickness |w| <= 0.1.
    assert r.min() >= c_radius - 0.11
    assert r.max() <= c_radius + radius + 0.11


def test_galaxy_orbital_speed(rng):
    """Disk velocity relative to bulk = sqrt(G * Mc / r) tangentially
    (nbody3d.js:114-123)."""
    cfg = GalaxyConfig(velocity=(3.0, -1.0, 2.0), radius=3.0, count=300,
                       normal=(0, 1, 0))
    pos_mass, vel, _ = generate_galaxies([cfg], G=G, rng=rng)
    rel_v = vel[1:, :3].astype(np.float64) - np.array([3.0, -1.0, 2.0])
    speed = np.linalg.norm(rel_v, axis=1)
    # planar radius ~ distance from center projected in-plane; speed uses the
    # *sampled* r (before thickness), so compare against sqrt(G Mc / r) with
    # r recovered from the speed equation bounds: just check range.
    r = G * CENTRAL_MASS / speed**2
    assert r.min() > 0.0 and r.max() <= 3.2  # r <= cR + R (+slack)
    # velocity component along disk normal is ~0
    np.testing.assert_allclose(rel_v[:, 1], 0.0, atol=1e-9)


def test_galaxy_camera_target_is_global_com(rng):
    cfgs = [
        GalaxyConfig(center=(-3, 0, 0), count=100),
        GalaxyConfig(center=(3, 0, 0), count=100),
    ]
    pos_mass, _, target = generate_galaxies(cfgs, G=G, rng=rng)
    m = pos_mass[:, 3].astype(np.float64)
    com = (pos_mass[:, :3].astype(np.float64) * m[:, None]).sum(0) / m.sum()
    np.testing.assert_allclose(target, com, rtol=1e-5, atol=1e-7)


def test_galaxy_deterministic_per_seed():
    a = generate_galaxies([GalaxyConfig(count=50)], G=G, rng=np.random.default_rng(7))
    b = generate_galaxies([GalaxyConfig(count=50)], G=G, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_random_galaxy_configs_bounds(rng):
    cfgs = random_galaxy_configs(10, 1000, 2000, rng)
    assert len(cfgs) == 10
    for c in cfgs:
        assert all(-5 <= v <= 5 for v in c.center)
        assert all(-10 <= v <= 10 for v in c.velocity)
        assert all(0 <= v <= 1 for v in c.normal)
        assert 2 <= c.radius <= 5
        assert 1000 <= c.count <= 2000


def test_plummer_statistics(rng):
    n = 4000
    pos_mass, vel, _ = plummer_sphere(n, G=G, total_mass=1e6, scale_radius=1.0, rng=rng)
    assert pos_mass.shape == (n, 4)
    np.testing.assert_allclose(pos_mass[:, 3], 1e6 / n, rtol=1e-5)
    r = np.linalg.norm(pos_mass[:, :3].astype(np.float64), axis=1)
    assert r.max() < 10.0  # truncation
    # Half-mass radius of Plummer ≈ 1.3 a.
    assert 1.0 < np.median(r) < 1.7
    # Bound: speeds below local escape velocity.
    v = np.linalg.norm(vel[:, :3].astype(np.float64), axis=1)
    v_esc = np.sqrt(2 * G * 1e6) * (r**2 + 1) ** -0.25
    assert np.all(v <= v_esc + 1e-9)


def test_uniform_sphere(rng):
    pos_mass, vel, _ = uniform_sphere(1024, radius=3.0, rng=rng)
    r = np.linalg.norm(pos_mass[:, :3].astype(np.float64), axis=1)
    assert r.max() <= 3.0
    np.testing.assert_array_equal(vel, 0.0)
    # Uniform ball: median radius = 3 * (1/2)^(1/3) ≈ 2.38.
    assert 2.2 < np.median(r) < 2.55


def test_fibonacci_shell_matches_reference_formula():
    """util.js:135-152 golden-angle shell."""
    pos_mass, vel, _ = fibonacci_shell(100, radius=2.0)
    r = np.linalg.norm(pos_mass[:, :3].astype(np.float64), axis=1)
    np.testing.assert_allclose(r, 2.0, rtol=1e-5)
    assert pos_mass[:, 3].max() <= 2000.0


def test_galaxy_radial_cdf_matches_profile(rng):
    """Statistical check of the radial law r(t) = cR + R(2^{-2(t-1)}-1)/3
    with t = sqrt(U) (nbody3d.js:90-93): empirical quantiles of the sampled
    in-plane radius must match the closed form."""
    radius, count = 3.0, 20000
    cfg = GalaxyConfig(radius=radius, count=count, normal=(0, 1, 0), center=(0, 0, 0))
    pos_mass, _, _ = generate_galaxies([cfg], G=G, size_factor=1000.0, rng=rng)
    xyz = pos_mass[1:, :3].astype(np.float64)
    # in-plane radius (normal is +y): sqrt(x^2 + z^2) ~= planar radius
    r_emp = np.hypot(xyz[:, 0], xyz[:, 2])
    c_radius = float((mass_to_radius(CENTRAL_MASS) + mass_to_radius(50.0)) / 1000.0)

    def r_of_t(t):
        return c_radius + radius * (2.0 ** (-2.0 * (t - 1.0)) - 1.0) / 3.0

    for q in [0.25, 0.5, 0.75]:
        # t = sqrt(U) => quantile_q(t) = sqrt(q); r monotic decreasing in t?
        # exponent -2(t-1): t up => exponent down => r decreasing, so the
        # q-quantile of r corresponds to the (1-q)-quantile of t.
        expected = r_of_t(np.sqrt(1.0 - q))
        got = np.quantile(r_emp, q)
        # thickness shrinks planar radius slightly; tolerance covers it
        assert abs(got - expected) / expected < 0.02, (q, got, expected)


def test_empty_galaxy_list_rejected():
    import pytest

    with pytest.raises(ValueError, match="GalaxyConfig"):
        generate_galaxies([], G=G)


def test_preset_registry():
    pos_mass, vel, target = make_preset("two-galaxy", n=202, seed=3)
    assert pos_mass.shape == (202, 4)
    pos_mass, _, _ = make_preset("plummer", n=256, seed=3)
    assert pos_mass.shape == (256, 4)
    pos_mass, _, _ = make_preset("collision", n=102, seed=3)
    assert pos_mass.shape == (102, 4)


def test_reference_random_honors_n():
    """--n must not be silently ignored: an explicit total splits across
    galaxies (num_galaxies x (per + 1 central))."""
    from nbody3d_tpu.models.registry import make_preset

    pos_mass, vel, _ = make_preset("reference-random", seed=0, G=1e-4, n=4098)
    assert pos_mass.shape[0] == 2 * (4098 // 2 - 1 + 1)  # 4098
    pos_mass, _, _ = make_preset(
        "reference-random", seed=0, G=1e-4, n=99, num_galaxies=3
    )
    assert pos_mass.shape[0] == 3 * (99 // 3 - 1 + 1)  # 99
