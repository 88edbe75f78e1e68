"""Conservation diagnostics: energy, momentum, angular momentum.

The reference has no physics diagnostics — its HUD shows only timings
(``nbody3d.js:508-514``) and full-state export is the sole inspection tool
(SURVEY §4).  These metrics are the framework's correctness instrument and
back the BASELINE acceptance bound (energy drift <= 1e-3 over 10k steps).

Potential energy uses the same Plummer softening as the force kernel
(``distSqr = |r|^2 + eps2``, ``nbody3d.js:234``), i.e.

    U = -G/2 * sum_{i != j} m_i m_j / sqrt(|r_ij|^2 + eps2)

so that E = T + U is the conserved quantity of the *softened* Hamiltonian the
integrator actually simulates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class Diagnostics(NamedTuple):
    kinetic: jax.Array  # () f32
    potential: jax.Array  # () f32
    total_energy: jax.Array  # () f32
    momentum: jax.Array  # (3,) f32  sum m v
    angular_momentum: jax.Array  # (3,) f32  sum m (x × v)
    total_mass: jax.Array  # () f32


def kinetic_energy(pos_mass: jax.Array, vel: jax.Array) -> jax.Array:
    m = pos_mass[:, 3]
    v2 = jnp.sum(vel[:, :3] * vel[:, :3], axis=1)
    return 0.5 * jnp.sum(m * v2)


def potential_energy(
    pos_mass: jax.Array, G: jax.Array | float, *, eps2: float = 1e-4, chunk: int | None = None
) -> jax.Array:
    """Softened pairwise potential. O(N^2); ``chunk`` bounds memory."""
    n = pos_mass.shape[0]
    pos = pos_mass[:, :3]
    m = pos_mass[:, 3]
    idx = jnp.arange(n, dtype=jnp.int32)

    def chunk_pot(tpos, tm, tidx):
        diff = pos[None, :, :] - tpos[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1) + eps2
        inv_d = lax.rsqrt(d2)
        src_idx = lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        pair = tm[:, None] * m[None, :] * inv_d
        pair = jnp.where(src_idx == tidx[:, None], 0.0, pair)
        return jnp.sum(pair)

    if chunk is None or chunk >= n:
        tot = chunk_pot(pos, m, idx)
    else:
        if n % chunk != 0:
            raise ValueError(f"chunk {chunk} must divide N {n}")
        k = n // chunk
        tot = jnp.sum(
            lax.map(
                lambda t: chunk_pot(t[0], t[1], t[2]),
                (pos.reshape(k, chunk, 3), m.reshape(k, chunk), idx.reshape(k, chunk)),
            )
        )
    return -0.5 * jnp.float32(G) * tot


def momentum(pos_mass: jax.Array, vel: jax.Array) -> jax.Array:
    return jnp.sum(pos_mass[:, 3:4] * vel[:, :3], axis=0)


def angular_momentum(pos_mass: jax.Array, vel: jax.Array) -> jax.Array:
    return jnp.sum(pos_mass[:, 3:4] * jnp.cross(pos_mass[:, :3], vel[:, :3]), axis=0)


def center_of_mass(pos_mass: jax.Array) -> jax.Array:
    """Mass-weighted center — what the reference points the camera at
    (``nbody3d.js:70-71,110-111,126``)."""
    m = pos_mass[:, 3:4]
    return jnp.sum(m * pos_mass[:, :3], axis=0) / jnp.maximum(jnp.sum(m), 1e-30)


def compute(
    pos_mass: jax.Array,
    vel: jax.Array,
    G: jax.Array | float,
    *,
    eps2: float = 1e-4,
    chunk: int | None = None,
) -> Diagnostics:
    ke = kinetic_energy(pos_mass, vel)
    pe = potential_energy(pos_mass, G, eps2=eps2, chunk=chunk)
    return Diagnostics(
        kinetic=ke,
        potential=pe,
        total_energy=ke + pe,
        momentum=momentum(pos_mass, vel),
        angular_momentum=angular_momentum(pos_mass, vel),
        total_mass=jnp.sum(pos_mass[:, 3]),
    )
