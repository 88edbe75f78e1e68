"""Decompose the sym (Newton-3) schedule's step time at N=256k.

The headline measures 400 G-int/s at N=262,144 while N=2M reaches 462 —
93% vs 99% of the serial VPU+MXU model's ~466 ceiling for 2048 blocks.
This harness times each constituent of ``accel_sym_pallas`` separately on
hardware to locate the missing ms:

  - operand prep (src_transposed + sym_operands)
  - call A  (diagonal blocks, masked dot)
  - call B  (middle hops)
  - call C  (shared half-hop)
  - the XLA combine glue (transpose/reshape/add of the reverse accumulators)
  - the full composed accel_sym_pallas, raw and combined
  - the rectangular pair kernel at the same block size (the macro-tiling
    building block that reaches 462 at 2M)

Usage: python benchmarks/sym_profile.py [N] [BLOCK]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody3d_tpu.ops import pallas_force as pf

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
EPS2 = 1e-4
G = 1e-4
K = 5  # timed reps


def timeit(label, fn, *args, pairs=None):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for _ in range(K):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    rate = f"  {pairs / med / 1e9:8.1f} G-int/s" if pairs else ""
    print(f"{label:34s} {med*1e3:9.2f} ms{rate}", flush=True)
    return med


def main():
    nt = N // BLOCK
    half = nt // 2
    print(f"N={N}  block={BLOCK}  nt={nt}  platform={jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((N, 3)).astype(np.float32) * 5.0
    mass = rng.uniform(10, 50, (N, 1)).astype(np.float32)
    pos_mass = jnp.asarray(np.concatenate([pos, mass], axis=1))

    prep = jax.jit(
        lambda pm: (
            pf.src_transposed(pm, G),
            *pf.sym_operands(pm, G, BLOCK),
        )
    )
    srcT, s16, cent = prep(pos_mass)
    t_prep = timeit("operand prep (srcT+s16+cent)", prep, pos_mass)

    # ---- call A: diagonal (resident ones-minus-eye mask operand)
    @jax.jit
    def call_a(srcT, pos_mass, s16, cent):
        mask = 1.0 - jnp.eye(BLOCK, dtype=jnp.float32)
        return pl.pallas_call(
            functools.partial(pf._sym_diag_kernel, eps2=EPS2, b=BLOCK),
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((BLOCK, BLOCK), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK, 16), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N, 16), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=pf._VMEM_LIMIT,
            ),
            interpret=False,
        )(mask, srcT, pos_mass, s16, cent)

    t_a = timeit("call A (diag, nt steps)", call_a, srcT, pos_mass, s16, cent,
                 pairs=nt * BLOCK * BLOCK)

    # ---- hops calls
    ext = (half + 1) * BLOCK
    ext_prep = jax.jit(
        lambda srcT, s16, cent: (
            jnp.concatenate([srcT, srcT[:, :ext]], axis=1),
            jnp.concatenate([s16, s16[:ext]], axis=0),
            jnp.concatenate([cent, cent[: half + 1]], axis=0),
        )
    )
    srcT_e, s16_e, cent_e = ext_prep(srcT, s16, cent)
    t_ext = timeit("wrap-extend concat", ext_prep, srcT, s16, cent)

    def make_hops(k0, nk, grid_i):
        kernel = functools.partial(
            pf._sym_hops_kernel, eps2=EPS2, b=BLOCK, nt=nt, k0=k0
        )

        @jax.jit
        def call(srcT_e, pos_mass, s16_e, s16, cent_e):
            return pl.pallas_call(
                kernel,
                grid=(grid_i, nk),
                in_specs=[
                    pl.BlockSpec((4, BLOCK), lambda i, k: (0, i + k0 + k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLOCK, 4), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLOCK, 16), lambda i, k: (i + k0 + k, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLOCK, 16), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((BLOCK, 16), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((nt, 16, BLOCK), lambda i, k: (0, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((grid_i * BLOCK, 16), jnp.float32),
                    jax.ShapeDtypeStruct((nt, 16, BLOCK), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=pf._VMEM_LIMIT,
                ),
                interpret=False,
            )(srcT_e, pos_mass, s16_e, s16, cent_e)

        return call

    nk_b = half - 1 if nt % 2 == 0 else half
    if nk_b > 0:
        call_b = make_hops(1, nk_b, nt)
        t_b = timeit(
            f"call B (hops, {nt}x{nk_b} steps)",
            call_b, srcT_e, pos_mass, s16_e, s16, cent_e,
            pairs=2 * nt * nk_b * BLOCK * BLOCK,
        )
    if nt % 2 == 0:
        call_c = make_hops(half, 1, half)
        t_c = timeit(
            f"call C (half-hop, {half}x1 steps)",
            call_c, srcT_e, pos_mass, s16_e, s16, cent_e,
            pairs=2 * half * BLOCK * BLOCK,
        )

    # ---- XLA combine glue: emulate the adds/transposes on dummy outputs
    ot_b, os_b = call_b(srcT_e, pos_mass, s16_e, s16, cent_e)
    acc_a = call_a(srcT, pos_mass, s16, cent)

    @jax.jit
    def combine(acc_a, ot_b, os_b, ot_c, os_c, pos_mass):
        acc16 = acc_a + ot_b + jnp.transpose(os_b, (0, 2, 1)).reshape(N, 16)
        acc16 = acc16.at[: half * BLOCK].add(ot_c)
        acc16 = acc16 + jnp.transpose(os_c, (0, 2, 1)).reshape(N, 16)
        return pf._combine16(acc16, pos_mass)

    ot_c, os_c = call_c(srcT_e, pos_mass, s16_e, s16, cent_e)
    t_comb = timeit("XLA combine glue", combine, acc_a, ot_b, os_b, ot_c, os_c, pos_mass)

    # ---- composed
    full = functools.partial(pf.accel_sym_pallas, eps2=EPS2, block=BLOCK)
    t_full = timeit("accel_sym_pallas (full)", full, pos_mass, G, pairs=N * N)
    raw = functools.partial(pf.accel_sym_pallas, eps2=EPS2, block=BLOCK, raw=True)
    t_raw = timeit("accel_sym_pallas (raw)", raw, pos_mass, G, pairs=N * N)

    # ---- rectangular pair kernel at the same block (macro building block)
    h = N // 2
    t_rect = timeit(
        "pair kernel (N/2 x N/2 rect)",
        functools.partial(pf.accel_pair_sym_pallas, eps2=EPS2, block=BLOCK),
        pos_mass[:h], pos_mass[h:], G,
        pairs=2 * h * h,
    )

    parts = t_prep + t_ext + t_a + t_b + t_c + t_comb
    print(f"\nsum of parts: {parts*1e3:.2f} ms  vs full {t_full*1e3:.2f} ms")
    print(f"full-step rate: {N*N/t_full/1e9:.1f} G-int/s")


if __name__ == "__main__":
    main()
