"""Comoving-coordinate integration on an expanding background (EdS).

The reference simulates Newtonian gravity in a static space
(``nbody3d.js:218-294``); the periodic solvers (round 3) made
cosmological workloads meaningful, and round 4's Zel'dovich initial
conditions (models/cosmo.py) seeded them — but growth in the static
periodic box is the Jeans instability ``delta ~ exp(t/tau)``, not the
power-law growth of an expanding universe.  This module adds the real
thing: comoving coordinates on an Einstein–de Sitter (matter-only,
``Omega_m = 1``) background, where linear perturbations grow as
``D ∝ a`` — the standard cosmological N-body formulation.

Formulation (positions ``x`` comoving on the torus, canonical momentum
``w = a^2 dx/dt`` stored in ``SimState.vel``):

- The periodic mesh solvers already compute exactly the comoving force
  ``g = -grad_x Phi`` with ``lap_x Phi = 4 pi G (rho_com - rho_bar_com)``
  (the FFT solve's zeroed DC mode IS the background subtraction), and
  the physical peculiar potential is ``phi = Phi / a``, so the peculiar
  equation of motion ``x'' + 2 H x' = -grad phi / a^2`` collapses to

      dx/dt = w / a^2          dw/dt = g(x) / a .

  No Hubble-drag term — the ``a^2`` change of variable absorbs it,
  which is what makes a symplectic leapfrog possible.

- EdS pins the whole background from quantities the run already has:
  ``H_i = sqrt(8 pi G rho_bar / 3)`` (Friedmann at the start, where
  ``a = 1`` by normalization), ``t_i = 2 / (3 H_i)``, and
  ``a(t) = (t / t_i)^(2/3)``.  There are NO new physical parameters:
  G, the box, and the masses determine everything (config adds only
  ``cosmology = "eds"``).

- The step is a staggered (leapfrog) kick-drift with EXACT integral
  factors — closed forms of ``int dt / a`` (kick) and ``int dt / a^2``
  (drift) over each half/full step window, evaluated with expm1/log1p
  so the small-``dt/t`` cancellation costs no precision.  Momentum is
  stored at half-step times ``t_{n-1/2}``; the first step's kick window
  is clamped to ``[t_i, t_i + dt/2]``, which is exactly the opening
  half-kick that converts synchronous initial momenta into the
  staggered scheme.  One force evaluation per step; ``state.accel``
  carries the last comoving ``g`` for checkpoint-schema compatibility
  (``util.js:186-190``) exactly like the frame-shifted Verlet.

Validation: linear band power must grow as ``D^2 = a^2``
(tests/test_expansion.py — the EdS analog of test_cosmo.py's
``exp(2t/tau)`` gate), the integral factors match f64 quadrature, and
a zero-amplitude lattice stays put.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.state import SimState

__all__ = [
    "eds_hubble_init",
    "eds_scale_factor",
    "kick_factor",
    "drift_factor",
    "make_cosmo_step_fn",
]


def eds_hubble_init(G, rho_bar):
    """Friedmann: ``H_i = sqrt(8 pi G rho_bar / 3)`` at ``a = 1``."""
    return jnp.sqrt(8.0 * math.pi / 3.0 * G * rho_bar)


def eds_scale_factor(t, t_i):
    """``a(t) = (t / t_i)^(2/3)`` (EdS, normalized to ``a(t_i) = 1``)."""
    return (t / t_i) ** (2.0 / 3.0)


def _cbrt_ratio_m1(t1, x):
    """``(1 + x/t1)^(1/3) - 1`` without cancellation (x << t1 regime)."""
    return jnp.expm1(jnp.log1p(x / t1) / 3.0)


def kick_factor(t1, dtw, t_i):
    """``int_{t1}^{t1+dtw} dt / a(t) = 3 t_i^(2/3) ((t1+dtw)^(1/3) -
    t1^(1/3))``, evaluated as ``3 (t1/t_i)^(-2/3) t1 * ((1+dtw/t1)^(1/3)
    - 1)``.  Taking the window LENGTH (not its end) keeps full f32
    precision at ``dtw << t1``: the length is exactly ``dt`` (or
    ``dt/2``) in the step, while an end-minus-start subtraction would
    carry ``ulp(t) / dt`` relative error."""
    return 3.0 * t1 * (t1 / t_i) ** (-2.0 / 3.0) * _cbrt_ratio_m1(t1, dtw)


def drift_factor(t1, dtw, t_i):
    """``int_{t1}^{t1+dtw} dt / a(t)^2 = 3 t_i^(4/3) (t1^(-1/3) -
    (t1+dtw)^(-1/3))``, cancellation-free via ``1 - (1+dtw/t1)^(-1/3) =
    -expm1(-log1p(dtw/t1) / 3)``."""
    return (
        3.0
        * t1
        * (t1 / t_i) ** (-4.0 / 3.0)
        * -jnp.expm1(-jnp.log1p(dtw / t1) / 3.0)
    )


def make_cosmo_step_fn(
    config: SimConfig, n_pad: int, n_real: int, backend: str, interpret: bool
):
    """Build the comoving EdS ``step(state, dt, G) -> state``.

    Requirements (validated here): ``boundary="periodic"`` with a mesh
    solver — comoving dynamics on anything but the torus has no
    homogeneous background to expand.  ``dt`` is COSMIC time; ``t_i``
    (hence the whole expansion history) is derived in-trace from the
    traced ``G`` and the state's total mass, so the G slider stays
    recompile-free just like the plain steps.
    """
    if config.cosmology != "eds":
        raise ValueError(
            f"unknown cosmology {config.cosmology!r} (supported: 'eds')"
        )
    if config.boundary != "periodic" or config.method not in ("pm", "p3m"):
        raise ValueError(
            "cosmology='eds' needs boundary='periodic' and a mesh solver "
            "(method='pm'|'p3m'): comoving coordinates expand a "
            "homogeneous background, which only the torus has"
        )
    if config.integrator != "verlet":
        raise ValueError(
            "cosmology='eds' uses its own staggered kick-drift scheme; "
            "set integrator='verlet' (the default) — yoshida4/euler do "
            "not compose with time-dependent drift factors"
        )
    from nbody3d_tpu.ops.integrate import _mask
    from nbody3d_tpu.ops.step import make_mesh_accel_fn

    accel_fn = make_mesh_accel_fn(config, n_real, backend, interpret)
    inv_vol = 1.0 / float(config.box_size) ** 3
    valid = _mask(n_pad, n_real)

    def step(state: SimState, dt, G) -> SimState:
        dt = jnp.float32(dt)
        # Padding rows carry mass 0, so the padded sum IS the real total.
        rho_bar = jnp.sum(state.pos_mass[:, 3]) * inv_vol
        t_i = 2.0 / (3.0 * eds_hubble_init(G, rho_bar))
        t_n = t_i + state.step.astype(jnp.float32) * dt

        g = accel_fn(state.pos_mass, G)
        # Kick w over [t_{n-1/2}, t_{n+1/2}]; step 0's window is clamped
        # to [t_i, t_i + dt/2] — the opening half-kick that staggers
        # synchronous initial momenta.  Window LENGTHS are passed exactly
        # (dt or dt/2), never as end-minus-start (see kick_factor).
        first = state.step == 0
        kick = kick_factor(
            jnp.where(first, t_i, t_n - 0.5 * dt),
            jnp.where(first, 0.5 * dt, dt),
            t_i,
        )
        new_w = state.vel + g * kick
        # Drift x over [t_n, t_n + dt] with the half-advanced momentum.
        drift = drift_factor(t_n, dt, t_i)
        new_p = state.pos_mass + new_w * drift
        if valid is not None:
            new_p = jnp.where(valid, new_p, state.pos_mass)
            new_w = jnp.where(valid, new_w, state.vel)
            g = jnp.where(valid, g, 0.0)
        return SimState(new_p, new_w, g, state.step + 1)

    return step
