"""Integrators: frame-shifted velocity Verlet (reference) and Euler.

The reference fuses integration into the force dispatch
(``nbody3d.js:274-290``); these standalone jnp versions define the exact
update semantics and serve as the oracle for the fused Pallas epilogue, and
as the local update of the multi-chip ring path (where integration happens
after all source shards have been accumulated).

Verlet with one-frame acceleration lag (``nbody3d.js:280-283``)::

    v' = v + (a_old + a_new) * dt/2        # fma(a_old+a_new, dt/2, v)
    x' = x + (v' + a_new * dt/2) * dt      # fma(fma(dt/2, a_new, v'), dt, x)
    a_old <- a_new                         # nbody3d.js:290

All updates are applied to the full float32 vec4 exactly as the WGSL does;
the w lanes are invariant because ``vel.w == accel.w == 0``, so mass rides
along untouched (``nbody3d.js:283`` updates ``bodies`` including ``.w``).

The first step uses ``a_old = 0`` because the reference's acceleration
buffer is created but never host-written (``nbody3d.js:195-199``).

Padded targets are frozen via ``valid`` masks — the TPU equivalent of the
``index < nBodies`` guards (``nbody3d.js:257,265``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbody3d_tpu.state import SimState

Arrays3 = tuple[jax.Array, jax.Array, jax.Array]


def apply_integrator(
    kind: str,
    pos_mass: jax.Array,
    vel: jax.Array,
    accel_old: jax.Array,
    accel_new: jax.Array,
    dt: jax.Array | float,
    valid: jax.Array | None = None,
) -> Arrays3:
    """Core update, shared by the jnp path, the Pallas epilogue oracle, and
    the sharded local update.  ``valid`` is an optional (N, 1) bool mask;
    masked rows keep their old pos/vel and get zero stored acceleration.
    Returns ``(new_pos_mass, new_vel, new_accel)``.
    """
    dt = jnp.float32(dt)
    if kind == "verlet":
        half_dt = dt * 0.5
        new_vel = vel + (accel_old + accel_new) * half_dt
        new_pos = pos_mass + (new_vel + accel_new * half_dt) * dt
    elif kind == "euler":
        # Semi-implicit Euler — the reference's commented-out variant
        # (nbody3d.js:285-287): v += a*dt; x += v*dt.
        new_vel = vel + accel_new * dt
        new_pos = pos_mass + new_vel * dt
    else:
        raise ValueError(f"unknown integrator {kind!r}")
    if valid is not None:
        new_pos = jnp.where(valid, new_pos, pos_mass)
        new_vel = jnp.where(valid, new_vel, vel)
        accel_new = jnp.where(valid, accel_new, 0.0)
    return new_pos, new_vel, accel_new


def _mask(n_pad: int, n_real: int | None) -> jax.Array | None:
    if n_real is None or n_real >= n_pad:
        return None
    idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    return idx < n_real


def verlet_step(
    state: SimState, accel_new: jax.Array, dt: jax.Array | float, *, n_real: int | None = None
) -> SimState:
    """One frame-shifted velocity-Verlet update given freshly computed
    accelerations (Jacobi: ``accel_new`` evaluated at ``state.pos_mass``)."""
    p, v, a = apply_integrator(
        "verlet", state.pos_mass, state.vel, state.accel, accel_new, dt,
        _mask(state.n_pad, n_real),
    )
    return SimState(p, v, a, state.step + 1)


def euler_step(
    state: SimState, accel_new: jax.Array, dt: jax.Array | float, *, n_real: int | None = None
) -> SimState:
    p, v, a = apply_integrator(
        "euler", state.pos_mass, state.vel, state.accel, accel_new, dt,
        _mask(state.n_pad, n_real),
    )
    return SimState(p, v, a, state.step + 1)


INTEGRATORS = {"verlet": verlet_step, "euler": euler_step}
