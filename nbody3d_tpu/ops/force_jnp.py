"""Pure-jnp direct-sum softened gravity — the P0 oracle.

Reproduces the pair function of the WGSL kernel (``nbody3d.js:232-237``):

    r        = x_j - x_i
    distSqr  = |r|^2 + eps2            # eps2 = 1e-4 hardcoded in the shader
    invD3    = rsqrt(distSqr^3)        # hardware inverseSqrt -> lax.rsqrt
    a_i     += G * m_j * invD3 * r

with self-interaction excluded by **index** test, not softening
(``nbody3d.js:265``), and always-Jacobi semantics: every acceleration is
computed from the pre-step positions (SURVEY §2.3 — the reference is only
race-free/Jacobi for N <= 256; we fix Jacobi at all N as the defined
semantic).

Padding bodies carry mass 0, which makes them exactly force-neutral as
sources (``G * 0 * finite == 0``); as targets their garbage self-forces are
masked off by the integrator / kernel epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _chunk_accel(
    tgt_pos: jax.Array,  # (B, 3) target positions
    tgt_idx: jax.Array,  # (B,) global target indices
    src_pos: jax.Array,  # (N, 3) all source positions
    src_gm: jax.Array,  # (N,) G * mass per source (0 for padding)
    eps2: float,
) -> jax.Array:
    """Accelerations of one target chunk against all sources. Returns (B, 3)."""
    # (B, N, 3) pairwise separations r = x_j - x_i  (nbody3d.js:233)
    diff = src_pos[None, :, :] - tgt_pos[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1) + eps2  # (B, N)  nbody3d.js:234
    w = src_gm[None, :] * lax.rsqrt(d2 * d2 * d2)  # (B, N)  nbody3d.js:235-236
    src_idx = lax.broadcasted_iota(jnp.int32, w.shape, 1)
    w = jnp.where(src_idx == tgt_idx[:, None], 0.0, w)  # index self-mask :265
    return jnp.einsum("bn,bnc->bc", w, diff)


def accel_direct(
    pos_mass: jax.Array,
    G: jax.Array | float,
    *,
    eps2: float = 1e-4,
    chunk: int | None = None,
) -> jax.Array:
    """Direct-sum O(N^2) accelerations. Returns (N, 4) with zero w-lane.

    ``chunk`` bounds peak memory to ``O(chunk * N)`` by mapping over target
    blocks with ``lax.map`` — the jnp analog of the workgroup tile loop at
    ``nbody3d.js:255-272``.
    """
    n = pos_mass.shape[0]
    pos = pos_mass[:, :3]
    gm = jnp.float32(G) * pos_mass[:, 3]
    idx = jnp.arange(n, dtype=jnp.int32)

    if chunk is None or chunk >= n:
        acc = _chunk_accel(pos, idx, pos, gm, eps2)
    else:
        if n % chunk != 0:
            raise ValueError(f"chunk {chunk} must divide N {n}")
        tgt_pos = pos.reshape(n // chunk, chunk, 3)
        tgt_idx = idx.reshape(n // chunk, chunk)
        acc = lax.map(
            lambda t: _chunk_accel(t[0], t[1], pos, gm, eps2), (tgt_pos, tgt_idx)
        ).reshape(n, 3)
    return jnp.concatenate([acc, jnp.zeros((n, 1), dtype=acc.dtype)], axis=1)


@functools.partial(jax.jit, static_argnames=("eps2", "chunk"))
def accel_direct_jit(pos_mass, G, eps2=1e-4, chunk=None):
    return accel_direct(pos_mass, G, eps2=eps2, chunk=chunk)


def accel_partial(
    tgt_pos_mass: jax.Array,
    srcT: jax.Array,
    diag_offset: jax.Array | int,
    *,
    eps2: float = 1e-4,
    diag_lo: jax.Array | int = 0,
    diag_hi: jax.Array | int | None = None,
) -> jax.Array:
    """jnp twin of :func:`nbody3d_tpu.ops.pallas_force.accel_pallas`:
    accelerations of local targets against one source shard given as
    ``(4, N_src)`` rows ``[x, y, z, G*m]``.  A pair is a self-pair iff
    ``target_row + diag_offset == source_col`` AND the target row lies in
    ``[diag_lo, diag_hi)`` — the range matters when the source set is a
    concatenation of non-adjacent global pieces (the 2-D grid strategy):
    only the piece matching the target segment contains true self-pairs,
    and masking the unrestricted diagonal would zero real pairs.  Used as
    the CPU fallback of the multi-chip paths and as their correctness
    oracle.  Returns ``(N_tgt, 4)`` with zero w lane.
    """
    pos = tgt_pos_mass[:, :3]
    src_pos = srcT[:3, :].T  # (Ns, 3)
    gm = srcT[3, :]
    diff = src_pos[None, :, :] - pos[:, None, :]  # (Nt, Ns, 3)
    d2 = jnp.sum(diff * diff, axis=-1) + eps2
    w = gm[None, :] * lax.rsqrt(d2 * d2 * d2)
    trows = lax.broadcasted_iota(jnp.int32, w.shape, 0)
    cols = lax.broadcasted_iota(jnp.int32, w.shape, 1)
    is_self = trows + jnp.asarray(diag_offset, jnp.int32) == cols
    is_self &= trows >= jnp.asarray(diag_lo, jnp.int32)
    if diag_hi is not None:
        is_self &= trows < jnp.asarray(diag_hi, jnp.int32)
    w = jnp.where(is_self, 0.0, w)
    acc = jnp.einsum("ts,tsc->tc", w, diff)
    return jnp.concatenate([acc, jnp.zeros((acc.shape[0], 1), acc.dtype)], axis=1)
