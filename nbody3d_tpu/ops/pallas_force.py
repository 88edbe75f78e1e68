"""Pallas TPU kernel: tiled all-pairs softened gravity with fused Verlet.

This is the TPU-native rebuild of the reference's WGSL compute pass
(``nbody3d.js:218-294``), redesigned for the VPU/VMEM rather than translated:

Reference (WebGPU)                         | This kernel (TPU)
-------------------------------------------|----------------------------------
1 thread per body, workgroup of 256        | grid over (target blocks BT,
  (``nbody3d.js:240-247``)                 |   source tiles BS); each grid step
                                           |   processes BT*BS pairs on the VPU
workgroup-shared 256-body tile, barrier-   | source tiles streamed HBM->VMEM by
  synced (``nbody3d.js:228-229,255-272``)  |   the Pallas pipeline (auto
                                           |   double-buffered); no barriers —
                                           |   SPMD grid is sequential per core
per-thread scalar accumulator              | (BT, BS) per-lane accumulators in
                                           |   VMEM scratch; one cross-lane
                                           |   reduction per target block,
                                           |   amortized over all source tiles
in-dispatch read/write race for N > 256    | pure functional: inputs immutable,
  (SURVEY §2.3)                            |   outputs separate buffers ->
                                           |   deterministic Jacobi at all N
fused velocity-Verlet tail                 | fused epilogue on the last source
  (``nbody3d.js:274-290``)                 |   step; state never leaves HBM

Pair math is bit-identical in structure to ``bodyAccel`` (``nbody3d.js:
232-237``): ``d2 = |r|^2 + eps2``, ``w = G*m_j * rsqrt(d2^3)``, with the
self-pair excluded by index (``nbody3d.js:265``) — applied only on grid
blocks that actually intersect the diagonal.  Padding bodies are
force-neutral because their ``G*m`` lane is 0, mirroring the
``index < nBodies`` source guard (``nbody3d.js:257``); padded *targets* are
frozen by the epilogue mask (the ``nbody3d.js:265`` guard).

Layouts: targets/state are AoS ``(N, 4)`` float32 exactly like the
reference's storage buffers (``nbody3d.js:132``); sources are additionally
passed transposed as ``(4, N)`` rows ``[x, y, z, G*m]`` so a source tile
broadcasts along lanes while targets broadcast along sublanes — the
(BT, BS) outer-product shape the VPU wants.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_TARGET = 256
DEFAULT_BLOCK_SOURCE = 512


def _pair_weights(tgt, srcT_ref, eps2, bt, bs, row0, col0, diag_off):
    """Compute the (BT, BS) pair weight matrix w = G*m_j / (|r|^2+eps2)^1.5
    and the separations; self-pairs masked on diagonal-intersecting blocks.

    ``diag_off`` is the traced global-index offset between targets and
    sources: a pair is a self-pair iff ``row + diag_off == col``.  Single
    chip: 0.  Multi-chip gather: the target shard's global base index.
    Multi-chip ring: ``k * shard`` on ring step k (so only k == 0 masks).
    Passing any offset with magnitude >= N disables masking entirely.
    """
    tx = tgt[:, 0:1]
    ty = tgt[:, 1:2]
    tz = tgt[:, 2:3]
    sx = srcT_ref[0:1, :]
    sy = srcT_ref[1:2, :]
    sz = srcT_ref[2:3, :]
    gm = srcT_ref[3:4, :]

    dx = sx - tx  # (BT, BS)  r = x_j - x_i  (nbody3d.js:233)
    dy = sy - ty
    dz = sz - tz
    d2 = dx * dx + dy * dy + dz * dz + eps2  # nbody3d.js:234
    w = gm * lax.rsqrt(d2 * d2 * d2)  # nbody3d.js:235-236

    # Index self-mask (nbody3d.js:265), applied only where this grid block
    # intersects the (offset) diagonal — off-diagonal blocks pay nothing.
    shifted = row0 + diag_off
    overlap = jnp.logical_and(shifted < col0 + bs, col0 < shifted + bt)

    def apply_mask(wv):
        rows = lax.broadcasted_iota(jnp.int32, (bt, bs), 0) + shifted
        cols = lax.broadcasted_iota(jnp.int32, (bt, bs), 1) + col0
        return jnp.where(rows == cols, 0.0, wv)

    return lax.cond(overlap, apply_mask, lambda wv: wv, w), (dx, dy, dz)


def _accumulate(j, acc_refs, w, diffs):
    """Accumulate w * r per lane into (BT, BS) scratch — the cross-lane
    reduction happens once per target block, not once per source tile."""
    for acc_ref, d in zip(acc_refs, diffs):
        contrib = w * d

        @pl.when(j == 0)
        def _():
            acc_ref[...] = contrib

        @pl.when(j > 0)
        def _():
            acc_ref[...] += contrib


def _reduce_accel(acc_refs, bt):
    """Final lane reduction: (BT, BS) x3 -> (BT, 4) with zero w lane."""
    ax = jnp.sum(acc_refs[0][...], axis=1, keepdims=True)
    ay = jnp.sum(acc_refs[1][...], axis=1, keepdims=True)
    az = jnp.sum(acc_refs[2][...], axis=1, keepdims=True)
    return jnp.concatenate([ax, ay, az, jnp.zeros((bt, 1), jnp.float32)], axis=1)


def _fused_step_kernel(
    # scalar-prefetch / SMEM
    dt_ref,
    diag_ref,
    # inputs
    srcT_ref,
    tgt_ref,
    vel_ref,
    acc_old_ref,
    # outputs
    npos_ref,
    nvel_ref,
    nacc_ref,
    # scratch
    accx,
    accy,
    accz,
    *,
    eps2: float,
    n_real: int,
    n_pad: int,
    bt: int,
    bs: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ns = pl.num_programs(1)
    tgt = tgt_ref[...]

    w, diffs = _pair_weights(tgt, srcT_ref, eps2, bt, bs, i * bt, j * bs, diag_ref[0])
    _accumulate(j, (accx, accy, accz), w, diffs)

    @pl.when(j == ns - 1)
    def _epilogue():
        acc_new = _reduce_accel((accx, accy, accz), bt)
        dt = dt_ref[0]
        half_dt = dt * 0.5
        vel = vel_ref[...]
        acc_old = acc_old_ref[...]
        # Frame-shifted velocity Verlet on the full vec4 (nbody3d.js:280-283);
        # w lanes ride along unchanged because vel.w == accel.w == 0.
        new_vel = vel + (acc_old + acc_new) * half_dt
        new_pos = tgt + (new_vel + acc_new * half_dt) * dt
        if n_real < n_pad:
            rows = lax.broadcasted_iota(jnp.int32, (bt, 1), 0) + i * bt
            valid = rows < n_real
            new_pos = jnp.where(valid, new_pos, tgt)
            new_vel = jnp.where(valid, new_vel, vel)
            acc_new_out = jnp.where(valid, acc_new, 0.0)
        else:
            acc_new_out = acc_new
        npos_ref[...] = new_pos
        nvel_ref[...] = new_vel
        nacc_ref[...] = acc_new_out


def _force_kernel(
    diag_ref,
    srcT_ref,
    tgt_ref,
    out_ref,
    accx,
    accy,
    accz,
    *,
    eps2: float,
    bt: int,
    bs: int,
):
    """Force-only variant used by the multi-chip ring (integration is applied
    locally after all source shards have been accumulated, SURVEY §5.7)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ns = pl.num_programs(1)
    tgt = tgt_ref[...]
    w, diffs = _pair_weights(tgt, srcT_ref, eps2, bt, bs, i * bt, j * bs, diag_ref[0])
    _accumulate(j, (accx, accy, accz), w, diffs)

    @pl.when(j == ns - 1)
    def _():
        out_ref[...] = _reduce_accel((accx, accy, accz), bt)


def _src_transposed(pos_mass: jax.Array, G) -> jax.Array:
    """(4, N) source rows [x, y, z, G*m]; G folded in so the kernel never
    sees it (the reference reads it from the uniform block each pair,
    ``nbody3d.js:236`` — folding is the XLA-friendly equivalent)."""
    gm = (jnp.float32(G) * pos_mass[:, 3])[None, :]
    return jnp.concatenate([pos_mass[:, :3].T, gm], axis=0)


def _check_blocks(n: int, bt: int, bs: int, what: str) -> None:
    if n % bt != 0 or n % bs != 0:
        raise ValueError(
            f"{what}: padded N={n} must be divisible by block_target={bt} "
            f"and block_source={bs}; pad with nbody3d_tpu.state.pad_count"
        )


@functools.partial(
    jax.jit,
    static_argnames=("eps2", "n_real", "block_target", "block_source", "interpret"),
)
def fused_step_pallas(
    pos_mass: jax.Array,
    vel: jax.Array,
    accel: jax.Array,
    dt: jax.Array | float,
    G: jax.Array | float,
    *,
    eps2: float = 1e-4,
    n_real: int,
    block_target: int = DEFAULT_BLOCK_TARGET,
    block_source: int = DEFAULT_BLOCK_SOURCE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One fused force+Verlet step. Returns (new_pos_mass, new_vel, new_accel).

    ``dt`` and ``G`` are runtime scalars (no recompile when they change —
    the reference's slider semantics, ``util.js:38-54``).
    """
    n = pos_mass.shape[0]
    bt, bs = block_target, block_source
    _check_blocks(n, bt, bs, "fused_step_pallas")
    nt, ns = n // bt, n // bs

    srcT = _src_transposed(pos_mass, G)
    dt_arr = jnp.reshape(jnp.asarray(dt, jnp.float32), (1,))
    diag_arr = jnp.zeros((1,), jnp.int32)  # single chip: true diagonal

    kernel = functools.partial(
        _fused_step_kernel, eps2=float(eps2), n_real=int(n_real), n_pad=n, bt=bt, bs=bs
    )
    out_shape = [jax.ShapeDtypeStruct((n, 4), jnp.float32)] * 3
    flops_per_pair = 16
    result = pl.pallas_call(
        kernel,
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask_self
            pl.BlockSpec((4, bs), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, bs), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n * n,
            bytes_accessed=nt * n * 16 + 7 * n * 16,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )(dt_arr, diag_arr, srcT, pos_mass, vel, accel)
    return tuple(result)


@functools.partial(
    jax.jit,
    static_argnames=("eps2", "block_target", "block_source", "interpret"),
)
def accel_pallas(
    tgt_pos_mass: jax.Array,
    srcT: jax.Array,
    diag_offset: jax.Array,
    *,
    eps2: float = 1e-4,
    block_target: int = DEFAULT_BLOCK_TARGET,
    block_source: int = DEFAULT_BLOCK_SOURCE,
    interpret: bool = False,
) -> jax.Array:
    """Partial accelerations of local targets against one source shard.

    ``srcT`` is ``(4, N_src)`` rows ``[x, y, z, G*m]`` (see
    :func:`src_transposed`); ``diag_offset`` is a traced int32 scalar: a
    pair is a self-pair iff ``local_target_row + diag_offset == source_col``
    (pass an offset >= N_src to disable self-masking entirely, e.g. for
    remote shards in the ring).  Returns ``(N_tgt, 4)`` with zero w lane.
    """
    nt_bodies = tgt_pos_mass.shape[0]
    ns_bodies = srcT.shape[1]
    bt, bs = block_target, block_source
    if nt_bodies % bt != 0:
        raise ValueError(f"target count {nt_bodies} not divisible by block_target={bt}")
    if ns_bodies % bs != 0:
        raise ValueError(f"source count {ns_bodies} not divisible by block_source={bs}")

    kernel = functools.partial(_force_kernel, eps2=float(eps2), bt=bt, bs=bs)
    diag_arr = jnp.reshape(jnp.asarray(diag_offset, jnp.int32), (1,))
    return pl.pallas_call(
        kernel,
        grid=(nt_bodies // bt, ns_bodies // bs),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, bs), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt_bodies, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, bs), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * nt_bodies * ns_bodies,
            bytes_accessed=(nt_bodies // bt) * ns_bodies * 16 + 2 * nt_bodies * 16,
            transcendentals=nt_bodies * ns_bodies,
        ),
        interpret=interpret,
    )(diag_arr, srcT, tgt_pos_mass)


def src_transposed(pos_mass: jax.Array, G) -> jax.Array:
    """Public helper: (4, N) rows [x, y, z, G*m] for :func:`accel_pallas`."""
    return _src_transposed(pos_mass, G)
