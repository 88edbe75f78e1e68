"""Zel'dovich initial conditions (models/cosmo.py).

The generator's contract is spectral: the measured mass power spectrum
of the displaced lattice (via the shipped analysis.power_spectrum — the
same estimator a user would run) must equal the requested P(k) at
linear order, and the growing-mode velocities must make structure GROW
under the periodic solver (the Jeans instability of the static box).
"""

from __future__ import annotations

import numpy as np
import pytest

from nbody3d_tpu import analysis
from nbody3d_tpu.models.cosmo import zeldovich_box
from nbody3d_tpu.models.registry import make_preset

G_DIM = 32
L = 10.0


def test_lattice_at_zero_amplitude():
    """amp=0: particles sit exactly on the cell-center lattice, cold."""
    pm, vel, target = zeldovich_box(8, L, amp=0.0, velocity="cold",
                                    rng=np.random.default_rng(1))
    q1 = (np.arange(8) + 0.5) * (L / 8)
    q = np.stack(np.meshgrid(q1, q1, q1, indexing="ij"), axis=-1).reshape(-1, 3)
    np.testing.assert_allclose(pm[:, :3], q.astype(np.float32), atol=1e-5)
    assert not vel.any()
    np.testing.assert_allclose(target, L / 2.0)


def test_seed_determinism():
    a = zeldovich_box(8, L, rng=np.random.default_rng(3))[0]
    b = zeldovich_box(8, L, rng=np.random.default_rng(3))[0]
    c = zeldovich_box(8, L, rng=np.random.default_rng(4))[0]
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_momentum_free_and_in_box():
    pm, vel, _ = zeldovich_box(16, L, amp=0.01, rng=np.random.default_rng(5))
    assert (pm[:, :3] >= 0).all() and (pm[:, :3] < L).all()
    # DC mode zeroed -> zero net displacement and zero net momentum
    p = (pm[:, 3:4] * vel[:, :3]).sum(axis=0)
    scale = np.abs(pm[:, 3:4] * vel[:, :3]).sum()
    assert np.linalg.norm(p) / max(scale, 1e-30) < 1e-4


@pytest.mark.parametrize("index", [-1.0, -2.0])
def test_measured_spectrum_matches_input(index):
    """P(k) measured by analysis.power_spectrum on the generated bodies
    equals the requested power law, band-averaged over well-populated
    bins below half-Nyquist (linear order; realization noise shrinks as
    1/sqrt(n_modes) per bin)."""
    amp = 0.02
    pm, _, _ = zeldovich_box(G_DIM, L, amp=amp, index=index,
                             rng=np.random.default_rng(7))
    k, p, cnt = (np.asarray(x) for x in analysis.power_spectrum(
        pm, grid=G_DIM, box_size=L))
    k_f = 2.0 * np.pi / L
    k_nyq = np.pi * G_DIM / L
    band = (k > 2 * k_f) & (k < 0.5 * k_nyq) & (cnt > 50)
    assert band.sum() >= 4
    expected = amp * (k[band] / k_f) ** index
    ratio = p[band] / expected
    # band-average unbiased to ~10%; each bin within a factor ~1.6
    assert abs(np.mean(ratio) - 1.0) < 0.12, ratio
    assert (ratio > 0.6).all() and (ratio < 1.7).all(), ratio


def test_growing_mode_grows_structure():
    """Seeded with the growing mode, the large-scale power must INCREASE
    under the periodic PM solver (delta ~ exp(t/tau)); cold ICs from the
    same field grow strictly slower over the same interval."""
    from nbody3d_tpu.config import SimConfig
    from nbody3d_tpu.engine import Simulation

    def band_power(pm):
        k, p, cnt = (np.asarray(x) for x in analysis.power_spectrum(
            pm, grid=16, box_size=L))
        sel = (cnt > 10) & (k < 0.5 * np.pi * 16 / L)
        return float(np.sum(p[sel] * cnt[sel]) / np.sum(cnt[sel]))

    results = {}
    for mode in ("growing", "cold"):
        pm0, vel0, _ = zeldovich_box(16, L, amp=0.02, velocity=mode,
                                     G=1e-4, rng=np.random.default_rng(11))
        cfg = SimConfig(method="pm", backend="jnp", boundary="periodic",
                        box_size=L, pm_grid=16, dt=5e-3, G=1e-4)
        sim = Simulation(cfg, pm0, vel0)
        p0 = band_power(pm0)
        sim.run(60, chunk=30)
        pos_mass, _, _ = sim.arrays()
        results[mode] = band_power(np.asarray(pos_mass)[: pm0.shape[0]]) / p0

    # Linear theory: delta ~ exp(t/tau), tau = 1/sqrt(4 pi G rho_bar)
    # (= 2.55 here: rho_bar = 30 * 16^3 / 10^3), so the growing mode's
    # band power gains exp(2t/tau) = 1.266 at t = 0.3.  Measured 1.254
    # on first run — the PM Gaussian screening trims the top of the
    # band slightly, hence the 10% tolerance.
    rho_bar = 30.0 * 16**3 / L**3
    tau = 1.0 / np.sqrt(4.0 * np.pi * 1e-4 * rho_bar)
    predicted = np.exp(2.0 * 0.3 / tau)
    assert abs(results["growing"] / predicted - 1.0) < 0.10, (
        results, predicted)
    # Cold ICs are half growing + half decaying mode: cosh^2(t/tau) =
    # 1.014 — indistinguishable from flat at this t, far below growing.
    assert results["cold"] < 1.05, results
    assert results["growing"] > 1.15 * results["cold"], results


def test_preset_rounds_to_cube():
    pm, vel, _ = make_preset("cosmo", n=5000, box_size=L)
    assert pm.shape[0] == 17**3  # round(5000^(1/3)) = 17
    assert pm.dtype == np.float32 and vel.dtype == np.float32


def test_eh98_transfer_shape():
    """EH98 no-wiggle transfer function sanity: T -> 1 at large scales,
    monotonically suppressed at small scales, and the small-scale
    asymptote falls like ~ln(q)/q^2 (VERDICT r5 #8)."""
    from nbody3d_tpu.models.cosmo import eh98_transfer

    k = np.logspace(-4, 2, 200)  # h/Mpc
    t = eh98_transfer(k, omega_m=0.3, omega_b=0.0486, h=0.674)
    assert abs(t[0] - 1.0) < 1e-2
    assert np.all(np.diff(t) <= 1e-12)  # monotone non-increasing
    assert t[-1] < 1e-3
    # higher baryon fraction suppresses power at fixed k ~ 0.1-1 h/Mpc
    t_hi_b = eh98_transfer(k, omega_m=0.3, omega_b=0.12, h=0.674)
    mid = (k > 0.1) & (k < 1.0)
    assert np.all(t_hi_b[mid] < t[mid])


def test_measured_spectrum_matches_eh98_curve():
    """--spectrum eh98: the realized P(k), measured by the shipped
    estimator, matches the input EH98 curve (amplitude pinned at the
    fundamental) over well-populated bins — the round-5 acceptance
    gate for the physical-spectrum preset."""
    from nbody3d_tpu.models.cosmo import eh98_transfer

    amp = 0.02
    box_mpc = 300.0
    ol = 0.7
    pm, _, _ = zeldovich_box(
        G_DIM, L, amp=amp, spectrum="eh98", omega_lambda=ol,
        box_mpc=box_mpc, rng=np.random.default_rng(9),
    )
    k, p, cnt = (np.asarray(x) for x in analysis.power_spectrum(
        pm, grid=G_DIM, box_size=L))
    k_f = 2.0 * np.pi / L
    k_nyq = np.pi * G_DIM / L
    band = (k > 2 * k_f) & (k < 0.5 * k_nyq) & (cnt > 50)
    assert band.sum() >= 4
    scale = L / box_mpc
    t = eh98_transfer(k[band] * scale, omega_m=1.0 - ol)
    t_f = eh98_transfer(np.asarray([k_f * scale]), omega_m=1.0 - ol)[0]
    expected = amp * (k[band] / k_f) ** 0.965 * (t / t_f) ** 2
    ratio = p[band] / expected
    assert abs(np.mean(ratio) - 1.0) < 0.12, ratio
    assert (ratio > 0.6).all() and (ratio < 1.7).all(), ratio


def test_cosmo_preset_eh98_via_registry():
    from nbody3d_tpu.models.registry import make_preset

    pm, vel, tgt = make_preset(
        "cosmo", seed=3, G=1e-4, n=512, size_factor=1000.0,
        box_size=L, spectrum="eh98", box_mpc=200.0,
    )
    assert pm.shape[0] == 512 and np.isfinite(pm).all()
