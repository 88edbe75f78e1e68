"""Comoving EdS integration (ops/expansion.py, cosmology="eds").

Gates: the exact kick/drift integral factors match float64 quadrature;
a zero-amplitude lattice stays exactly put; the Zel'dovich EdS growing
mode makes linear band power grow as D^2 = a^2 under the periodic PM
solver (the expanding-universe analog of test_cosmo.py's exp(2t/tau)
static-box gate); and comoving momentum is conserved.
"""

from __future__ import annotations

import numpy as np
import pytest

from nbody3d_tpu import analysis
from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.engine import Simulation
from nbody3d_tpu.models.cosmo import zeldovich_box
from nbody3d_tpu.ops.expansion import (
    drift_factor,
    eds_hubble_init,
    eds_scale_factor,
    kick_factor,
)

L = 10.0
G_N = 1e-4
MASS = 30.0


def _cfg(**kw) -> SimConfig:
    base = dict(
        method="pm", backend="jnp", boundary="periodic", box_size=L,
        pm_grid=16, G=G_N, cosmology="eds",
    )
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.parametrize(
    "t1,t2", [(2.0, 2.05), (2.0, 8.0), (5.0, 5.0005), (2.0779, 2.1)]
)
def test_factors_match_quadrature(t1, t2):
    """kick = int dt/a, drift = int dt/a^2 with a = (t/t_i)^(2/3): the
    closed expm1/log1p forms agree with fine f64 trapezoid quadrature."""
    t_i = 2.0779
    t = np.linspace(t1, t2, 200_001)
    a = (t / t_i) ** (2.0 / 3.0)
    k_ref = np.trapezoid(1.0 / a, t)
    d_ref = np.trapezoid(1.0 / a**2, t)
    dtw = np.float32(t2 - t1)  # the step passes exact window lengths
    k = float(kick_factor(np.float32(t1), dtw, np.float32(t_i)))
    d = float(drift_factor(np.float32(t1), dtw, np.float32(t_i)))
    assert abs(k - k_ref) <= 2e-6 * abs(k_ref) + 1e-12, (k, k_ref)
    assert abs(d - d_ref) <= 2e-6 * abs(d_ref) + 1e-12, (d, d_ref)


def test_eds_velocity_mode_scaling():
    """velocity="eds" rescales the static growing mode by H_i * tau =
    sqrt(2/3) (both are psi times a rate; only the rate differs)."""
    rng = lambda: np.random.default_rng(13)
    _, v_static, _ = zeldovich_box(8, L, amp=0.01, velocity="growing",
                                   G=G_N, rng=rng())
    _, v_eds, _ = zeldovich_box(8, L, amp=0.01, velocity="eds",
                                G=G_N, rng=rng())
    np.testing.assert_allclose(
        v_eds, v_static * np.sqrt(2.0 / 3.0), rtol=1e-5, atol=1e-8
    )


def test_zero_amplitude_lattice_static():
    """amp=0: a perfect cell-centered lattice deposits a uniform grid, the
    periodic solve removes DC -> zero force, zero momentum -> the comoving
    positions never move."""
    pm0, vel0, _ = zeldovich_box(16, L, amp=0.0, velocity="eds",
                                 rng=np.random.default_rng(2))
    sim = Simulation(_cfg(), pm0, vel0)
    sim.run(20, chunk=10)
    pos, vel, _ = sim.arrays()
    np.testing.assert_allclose(pos[:, :3], pm0[:, :3], atol=1e-5)
    np.testing.assert_allclose(vel, 0.0, atol=1e-6)


def test_eds_linear_growth_matches_a_squared():
    """Linear EdS growth: D = a, so band power gains a(t_end)^2.  Evolve
    from a=1 to a=2.25 (t_end/t_i = 2.25^1.5) under P3M — the mesh-only
    solver's CIC smoothing under-drives growth near the mesh scale and
    COMPOUNDS over a 5x power gain (measured: pm grid 16 reaches only
    3.5; grid 32, 4.4; p3m, 4.90 of 5.06 — the residual ~3% is mild
    nonlinearity + time discreteness), so the solver whose force is
    ~1e-3-accurate at all scales is the one that isolates the
    integrator's correctness."""
    pm0, vel0, _ = zeldovich_box(16, L, amp=0.02, velocity="eds",
                                 G=G_N, rng=np.random.default_rng(11))

    def band_power(pm):
        k, p, cnt = (np.asarray(x) for x in analysis.power_spectrum(
            pm, grid=16, box_size=L))
        sel = (cnt > 10) & (k < 0.5 * np.pi * 16 / L)
        return float(np.sum(p[sel] * cnt[sel]) / np.sum(cnt[sel]))

    rho_bar = MASS * 16**3 / L**3
    h_i = float(eds_hubble_init(np.float64(G_N), np.float64(rho_bar)))
    t_i = 2.0 / (3.0 * h_i)
    a_end = 2.25
    n_steps = 70
    dt = t_i * (a_end**1.5 - 1.0) / n_steps

    sim = Simulation(_cfg(method="p3m", dt=dt), pm0, vel0)
    p0 = band_power(pm0)
    sim.run(n_steps, chunk=70)
    pos_mass, vel, _ = sim.arrays()
    ratio = band_power(pos_mass) / p0

    t_end = t_i + n_steps * dt
    a_check = float(eds_scale_factor(t_end, t_i))
    assert abs(a_check - a_end) < 1e-6
    # Measured 4.899 vs 5.0625 (140 and 70 steps agree to 4 digits).
    assert abs(ratio / a_end**2 - 1.0) < 0.08, (ratio, a_end**2)

    # Comoving momentum: kicks sum to ~0 on the torus.
    w = (pm0[:, 3:4] * vel[:, :3]).sum(axis=0)
    scale = np.abs(pm0[:, 3:4] * vel[:, :3]).sum()
    assert np.linalg.norm(w) / max(scale, 1e-30) < 1e-4


@pytest.mark.slow
def test_cold_start_grows_slower_than_eds_mode():
    """The decaying-mode admixture of cold ICs grows strictly slower than
    the pure growing mode over the same expansion interval."""
    ratios = {}
    for mode in ("eds", "cold"):
        pm0, vel0, _ = zeldovich_box(16, L, amp=0.02, velocity=mode,
                                     G=G_N, rng=np.random.default_rng(11))

        def band_power(pm):
            k, p, cnt = (np.asarray(x) for x in analysis.power_spectrum(
                pm, grid=16, box_size=L))
            sel = (cnt > 10) & (k < 0.5 * np.pi * 16 / L)
            return float(np.sum(p[sel] * cnt[sel]) / np.sum(cnt[sel]))

        rho_bar = MASS * 16**3 / L**3
        t_i = 2.0 / (3.0 * float(eds_hubble_init(
            np.float64(G_N), np.float64(rho_bar))))
        dt = t_i * (2.25**1.5 - 1.0) / 80
        sim = Simulation(_cfg(dt=dt), pm0, vel0)
        p0 = band_power(pm0)
        sim.run(80, chunk=40)
        pos_mass, _, _ = sim.arrays()
        ratios[mode] = band_power(pos_mass) / p0
    # EdS cold start splits 3/5 growing + 2/5 decaying in displacement:
    # D_+ = a grows, D_- = a^(-3/2) dies -> power ratio well below pure.
    assert ratios["eds"] > 1.5 * ratios["cold"], ratios


def _lcdm_cfg(ol=0.7, **kw):
    return _cfg(cosmology="lcdm", omega_lambda=ol, **kw)


@pytest.mark.parametrize("ol", [0.3, 0.7])
@pytest.mark.parametrize("t1_fac,t2_fac", [(1.0, 1.02), (1.0, 3.0), (2.5, 2.5002)])
def test_lcdm_factors_match_quadrature(ol, t1_fac, t2_fac):
    """ΛCDM kick/drift (GL8 over the closed-form a(t)) vs fine f64
    trapezoid quadrature."""
    from nbody3d_tpu.ops.expansion import make_background

    bg_init, kick_fn, drift_fn = make_background(_lcdm_cfg(ol))
    G, rho = 1e-4, 100.0
    om = 1.0 - ol
    h_i = np.sqrt(8 * np.pi / 3 * G * rho / om)
    s = 1.5 * np.sqrt(ol) * h_i
    t_i = np.arcsinh(np.sqrt(ol / om)) / s
    pref = (om / ol) ** (1 / 3)

    t1, t2 = t1_fac * t_i, t2_fac * t_i
    t = np.linspace(t1, max(t2, t1 * (1 + 1e-9)), 400_001)
    a = pref * np.sinh(s * t) ** (2.0 / 3.0)
    k_ref = np.trapezoid(1.0 / a, t)
    d_ref = np.trapezoid(1.0 / a**2, t)

    bg = bg_init(np.float32(G), np.float32(rho))
    assert abs(float(bg["t_i"]) - t_i) <= 2e-6 * t_i
    k = float(kick_fn(bg, np.float32(t1), np.float32(t2 - t1)))
    d = float(drift_fn(bg, np.float32(t1), np.float32(t2 - t1)))
    assert abs(k - k_ref) <= 3e-6 * abs(k_ref) + 1e-10, (k, k_ref)
    assert abs(d - d_ref) <= 3e-6 * abs(d_ref) + 1e-10, (d, d_ref)


def test_lcdm_small_lambda_limits_to_eds():
    """Ω_Λ → 0 degenerates to EdS: factors agree to O(Ω_Λ)."""
    from nbody3d_tpu.ops.expansion import make_background

    ol = 1e-4
    bg_init, kick_fn, drift_fn = make_background(_lcdm_cfg(ol))
    G, rho = np.float32(1e-4), np.float32(100.0)
    bg = bg_init(G, rho)
    t_i_eds = 2.0 / (3.0 * float(eds_hubble_init(G, rho)))
    assert abs(float(bg["t_i"]) / t_i_eds - 1.0) < 1e-3
    t1 = np.float32(1.7 * t_i_eds)
    dtw = np.float32(0.4 * t_i_eds)
    k_l = float(kick_fn(bg, t1, dtw))
    d_l = float(drift_fn(bg, t1, dtw))
    k_e = float(kick_factor(t1, dtw, np.float32(t_i_eds)))
    d_e = float(drift_factor(t1, dtw, np.float32(t_i_eds)))
    assert abs(k_l / k_e - 1.0) < 1e-3, (k_l, k_e)
    assert abs(d_l / d_e - 1.0) < 1e-3, (d_l, d_e)


def test_lcdm_growth_factor():
    """lcdm_growth: D(1) = 1; the rate at the start matches the classic
    f ≈ Ω_m^0.55 fit (Ω_m = 0.3: f = 0.5.. class) to ~1%; EdS limit
    f → 1; D monotonic and slower than EdS's D = a."""
    from nbody3d_tpu.models.cosmo import lcdm_growth

    d1, f1 = lcdm_growth(1.0, 0.7)
    assert abs(d1 - 1.0) < 1e-6
    assert abs(f1 - 0.3**0.55) < 0.01 * 0.3**0.55, f1
    _, f_eds = lcdm_growth(1.0, 1e-6)
    assert abs(f_eds - 1.0) < 1e-3
    d225, _ = lcdm_growth(2.25, 0.7)
    assert 1.0 < d225 < 2.25  # grows, but Λ-suppressed below EdS's a


def test_lcdm_linear_growth_matches_heath():
    """End-to-end ΛCDM gate: evolve the Zel'dovich growing mode from
    a = 1 to a = 2.25 with Ω_Λ = 0.7 under periodic P3M; band power must
    gain D(a_end)^2 from the exact Heath growth integral — NOT EdS's
    a^2 = 5.06 (Λ suppresses growth to ~1.9x; the gate separates the
    backgrounds by ~2.6x, far beyond its tolerance)."""
    from nbody3d_tpu.models.cosmo import lcdm_growth

    ol = 0.7
    om = 1.0 - ol
    pm0, vel0, _ = zeldovich_box(16, L, amp=0.02, velocity="lcdm",
                                 G=G_N, omega_lambda=ol,
                                 rng=np.random.default_rng(11))

    def band_power(pm):
        k, p, cnt = (np.asarray(x) for x in analysis.power_spectrum(
            pm, grid=16, box_size=L))
        sel = (cnt > 10) & (k < 0.5 * np.pi * 16 / L)
        return float(np.sum(p[sel] * cnt[sel]) / np.sum(cnt[sel]))

    rho_bar = MASS * 16**3 / L**3
    h_i = np.sqrt(8 * np.pi / 3 * G_N * rho_bar / om)
    s = 1.5 * np.sqrt(ol) * h_i
    t_of_a = lambda a: float(np.arcsinh(np.sqrt(ol / om) * a**1.5) / s)
    a_end = 2.25
    n_steps = 70
    dt = (t_of_a(a_end) - t_of_a(1.0)) / n_steps

    sim = Simulation(_lcdm_cfg(ol, method="p3m", dt=dt), pm0, vel0)
    p0 = band_power(pm0)
    sim.run(n_steps, chunk=70)
    pos_mass, _, _ = sim.arrays()
    ratio = band_power(pos_mass) / p0

    d_end, _ = lcdm_growth(a_end, ol)
    assert abs(ratio / d_end**2 - 1.0) < 0.08, (ratio, d_end**2)
    # And it must NOT look like EdS (a^2 = 5.06 >> D^2 here).
    assert ratio < 0.6 * a_end**2


@pytest.mark.parametrize("method", ["pm", "p3m"])
def test_sharded_comoving_matches_single_chip(method):
    """The sharded mesh steps run the same comoving kick-drift: the
    background derives from a psum'd rho_bar, so an 8-shard run must
    reproduce the single-chip trajectory.  PM's sharded schedule is the
    same math (f32-roundoff agreement); sharded P3M's sorted-tile
    neighbor schedule differs from the single-chip one by its ~1e-3
    force-accuracy class, integrated here over a short window."""
    from nbody3d_tpu.parallel.mesh import default_mesh

    pm0, vel0, _ = zeldovich_box(16, L, amp=0.02, velocity="eds",
                                 G=G_N, rng=np.random.default_rng(11))
    rho_bar = MASS * 16**3 / L**3
    t_i = 2.0 / (3.0 * float(eds_hubble_init(np.float64(G_N),
                                             np.float64(rho_bar))))
    cfg = _cfg(method=method, dt=t_i * 0.02)
    sim1 = Simulation(cfg, pm0, vel0)
    sim1.run(6, chunk=3)
    p1, v1, _ = sim1.arrays()
    sim8 = Simulation(cfg, pm0, vel0, mesh=default_mesh(8, axis="x"))
    sim8.run(6, chunk=3)
    p8, v8, _ = sim8.arrays()
    tol = dict(rtol=1e-5, atol=1e-6) if method == "pm" else \
        dict(rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(p8, p1, **tol)
    np.testing.assert_allclose(v8, v1, **tol)


def test_scale_factor_observability():
    """Simulation.scale_factor mirrors the in-trace background: 1 at
    step 0, the EdS/ΛCDM closed forms after stepping, None for static
    space; log lines carry it."""
    from nbody3d_tpu.ops.expansion import cosmic_time_and_scale

    pm0, vel0, _ = zeldovich_box(8, L, amp=0.01, velocity="eds",
                                 rng=np.random.default_rng(5))
    rho_bar = float(pm0[:, 3].sum()) / L**3
    t_i = 2.0 / (3.0 * float(eds_hubble_init(np.float64(G_N),
                                             np.float64(rho_bar))))
    sim = Simulation(_cfg(dt=0.1 * t_i), pm0, vel0)
    assert abs(sim.scale_factor - 1.0) < 1e-12
    sim.run(5, chunk=5)
    # (t_i above passes through f32 jnp.sqrt; the engine mirror is f64 —
    # only dt's f32 value must match, so compare at f32 grade.)
    a_exp = ((t_i + 5 * 0.1 * t_i) / t_i) ** (2.0 / 3.0)
    assert abs(sim.scale_factor - a_exp) < 1e-5
    assert f"a={a_exp:.4f}" in next(iter(sim.log_lines()))

    t, a = cosmic_time_and_scale(
        _lcdm_cfg(0.7, dt=0.0), np.float64(G_N), rho_bar, 0, 0.0
    )
    assert abs(a - 1.0) < 1e-12  # a(t_i) = 1 by normalization

    sim_static = Simulation(
        SimConfig(method="pm", backend="jnp", boundary="periodic",
                  box_size=L, pm_grid=16, G=G_N),
        pm0, vel0,
    )
    assert sim_static.scale_factor is None


def test_sharded_cosmology_rejects_direct():
    """Comoving coordinates need the mesh solvers whatever the mesh
    shape: a direct-method sharded build must fail loudly."""
    from nbody3d_tpu.parallel.mesh import default_mesh

    pm0, vel0, _ = zeldovich_box(8, L, amp=0.01, velocity="eds",
                                 rng=np.random.default_rng(3))
    with pytest.raises(ValueError, match="mesh solver"):
        Simulation(
            _cfg(method="direct", strategy="ring"),
            pm0, vel0, mesh=default_mesh(8, axis="x"),
        )


def test_validation_errors():
    pm0, vel0, _ = zeldovich_box(8, L, amp=0.01, velocity="eds",
                                 rng=np.random.default_rng(3))
    with pytest.raises(ValueError, match="periodic"):
        Simulation(_cfg(boundary="isolated", box_size=0.0, method="direct"),
                   pm0, vel0)
    with pytest.raises(ValueError, match="mesh solver"):
        Simulation(_cfg(method="direct"), pm0, vel0)
    with pytest.raises(ValueError, match="kick-drift"):
        Simulation(_cfg(integrator="yoshida4"), pm0, vel0)
    with pytest.raises(ValueError, match="cosmology"):
        Simulation(_cfg(cosmology="wcdm"), pm0, vel0)
    with pytest.raises(ValueError, match="omega_lambda"):
        Simulation(_cfg(cosmology="lcdm", omega_lambda=1.5), pm0, vel0)
