"""Named presets mapping to BASELINE.json's config ladder.

Each preset returns ``(pos_mass (N,4) f32, vel (N,4) f32, camera_target)``
given a seed and the generation-time gravitational constant (the reference
freezes orbital speeds to the G at generation time, ``nbody3d.js:115``).

- ``two-galaxy`` — the reference's default run: 2 random galaxies of
  20,000 disk bodies each (+1 central) => N = 40,002
  (``index.html:68-75``, ``nbody3d.js:163-175``).
- ``reference-random`` — fully reference-shaped randomized run with
  configurable galaxy count / body bounds.
- ``collision`` — deterministic two-galaxy collision (BASELINE config #5).
- ``plummer`` — N=16k Plummer sphere (config #2).
- ``uniform-sphere`` — N=1,024 cold uniform ball (config #1).
- ``fibonacci-shell`` — the reference's dead-code generator (util.js:135-152).
- ``cosmo`` — Zel'dovich P(k)-seeded periodic box (models/cosmo.py);
  pair with ``--boundary periodic``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from nbody3d_tpu.config import DEFAULT_G, DEFAULT_SIZE_FACTOR, GalaxyConfig
from nbody3d_tpu.models.galaxy import generate_galaxies, random_galaxy_configs
from nbody3d_tpu.models.plummer import plummer_sphere
from nbody3d_tpu.models.sphere import fibonacci_shell, uniform_sphere

MakerResult = tuple[np.ndarray, np.ndarray, np.ndarray]


def _two_galaxy(seed: int, G: float, n: int | None, size_factor: float) -> MakerResult:
    rng = np.random.default_rng(seed)
    per_galaxy = (n // 2 - 1) if n else 20000
    configs = random_galaxy_configs(2, per_galaxy, per_galaxy, rng)
    return generate_galaxies(configs, G=G, size_factor=size_factor, rng=rng)


def _reference_random(
    seed: int, G: float, n: int | None, size_factor: float, *, num_galaxies=2, min_bodies=20000, max_bodies=20000
) -> MakerResult:
    rng = np.random.default_rng(seed)
    if n is not None:
        # An explicit total body count overrides the per-galaxy bounds
        # (the reference has no N control — index.html:68-75 exposes only
        # the per-galaxy bounds — but our --n must not be silently ignored).
        per = max(n // num_galaxies - 1, 0)
        min_bodies = max_bodies = per
    configs = random_galaxy_configs(num_galaxies, min_bodies, max_bodies, rng)
    return generate_galaxies(configs, G=G, size_factor=size_factor, rng=rng)


def _collision(seed: int, G: float, n: int | None, size_factor: float) -> MakerResult:
    """Two galaxies on a closing course with skewed disk planes."""
    rng = np.random.default_rng(seed)
    per_galaxy = (n // 2 - 1) if n else 20000
    configs = [
        GalaxyConfig(center=(-4.0, 0.0, 0.0), velocity=(6.0, 1.0, 0.0),
                     normal=(0.2, 1.0, 0.1), radius=3.0, count=per_galaxy),
        GalaxyConfig(center=(4.0, 0.5, 0.0), velocity=(-6.0, -1.0, 0.0),
                     normal=(0.8, 0.5, 0.4), radius=3.0, count=per_galaxy),
    ]
    return generate_galaxies(configs, G=G, size_factor=size_factor, rng=rng)


def _plummer(seed: int, G: float, n: int | None, size_factor: float) -> MakerResult:
    return plummer_sphere(n or 16384, G=G, rng=np.random.default_rng(seed))


def _uniform(seed: int, G: float, n: int | None, size_factor: float) -> MakerResult:
    return uniform_sphere(n or 1024, rng=np.random.default_rng(seed))


def _fib(seed: int, G: float, n: int | None, size_factor: float) -> MakerResult:
    return fibonacci_shell(n or 4096, rng=np.random.default_rng(seed))


def _uniform_box(
    seed: int, G: float, n: int | None, size_factor: float,
    *, box_size: float = 10.0,
) -> MakerResult:
    """Cold uniform periodic box: the cosmological-style start for
    ``boundary="periodic"`` (gravitational instability grows structure
    from the seed noise).  Masses U(10, 50) as the reference's disk
    bodies (``nbody3d.js:63-64``); zero initial velocities."""
    rng = np.random.default_rng(seed)
    count = n or 16384
    pos = rng.uniform(0.0, box_size, (count, 3))
    pm = np.concatenate(
        [pos, rng.uniform(10.0, 50.0, (count, 1))], axis=1
    ).astype(np.float32)
    vel = np.zeros((count, 4), np.float32)
    return pm, vel, np.full((3,), box_size / 2.0)


def _cosmo(
    seed: int, G: float, n: int | None, size_factor: float,
    *, box_size: float = 10.0, amp: float = 0.005, index: float = -1.0,
    velocity: str = "growing", omega_lambda: float = 0.7,
    spectrum: str = "power-law", box_mpc: float = 100.0,
) -> MakerResult:
    """Zel'dovich-displaced lattice on the periodic box (``n`` rounds to
    the nearest perfect cube; default 32^3 = 32,768).  ``velocity``:
    "growing" = static-box Jeans mode (the default), "eds"/"lcdm" = the
    expanding-box growing modes for ``cosmology="eds"/"lcdm"`` runs
    (``omega_lambda`` only read by "lcdm").  ``spectrum``: "power-law"
    (slope ``index``) or "eh98" — the Eisenstein-Hu (1998) flat-ΛCDM
    transfer function with the box mapped to ``box_mpc`` h⁻¹Mpc."""
    from nbody3d_tpu.models.cosmo import zeldovich_box

    n_per_dim = max(2, round(float(n or 32768) ** (1.0 / 3.0)))
    return zeldovich_box(
        n_per_dim, box_size, amp=amp, index=index, G=G, velocity=velocity,
        omega_lambda=omega_lambda, spectrum=spectrum, box_mpc=box_mpc,
        rng=np.random.default_rng(seed),
    )


PRESETS: dict[str, Callable[..., MakerResult]] = {
    "two-galaxy": _two_galaxy,
    "reference-random": _reference_random,
    "collision": _collision,
    "plummer": _plummer,
    "uniform-sphere": _uniform,
    "fibonacci-shell": _fib,
    "uniform-box": _uniform_box,
    "cosmo": _cosmo,
}


def make_preset(
    name: str,
    *,
    seed: int = 0,
    G: float = DEFAULT_G,
    n: int | None = None,
    size_factor: float = DEFAULT_SIZE_FACTOR,
    **kw,
) -> MakerResult:
    """Instantiate a named preset. ``n`` overrides the preset's default body
    count where meaningful."""
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name](seed, G, n, size_factor, **kw)
