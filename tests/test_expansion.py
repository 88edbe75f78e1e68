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
        Simulation(_cfg(cosmology="lcdm"), pm0, vel0)
