"""Fast-mode subtiling: overlap subtile B's VPU chain with subtile A's MXU
matmul inside one grid step (no cross-iteration dependency)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody3d_tpu.ops.force_jnp import accel_direct
from nbody3d_tpu.ops.pallas_force import src_limbs, src_transposed

EPS2 = 1e-4
G = 1e-4
N = 262144
K = 5


def make_fast_subtiled(n, bt, bs, subtiles):
    nt, ns = n // bt, n // bs
    sub = bs // subtiles

    def kernel(srcT_ref, src10_ref, tgt_ref, out_ref, acc_scr):
        j = pl.program_id(1)
        ns_ = pl.num_programs(1)
        tgt = tgt_ref[...]
        tx = tgt[:, 0:1]
        ty = tgt[:, 1:2]
        tz = tgt[:, 2:3]
        parts = []
        for s in range(subtiles):
            lo, hi = s * sub, (s + 1) * sub
            dx = srcT_ref[0:1, lo:hi] - tx
            dy = srcT_ref[1:2, lo:hi] - ty
            dz = srcT_ref[2:3, lo:hi] - tz
            d2 = dx * dx + (dy * dy + (dz * dz + EPS2))
            inv3 = lax.rsqrt(d2 * (d2 * d2))
            parts.append(
                jnp.dot(
                    inv3,
                    src10_ref[lo:hi, :],
                    preferred_element_type=jnp.float32,
                )
            )
        part = parts[0]
        for p in parts[1:]:
            part = part + p

        @pl.when(j == 0)
        def _():
            acc_scr[...] = part

        @pl.when(j > 0)
        def _():
            acc_scr[...] += part

        @pl.when(j == ns_ - 1)
        def _():
            a = acc_scr[...]
            s_ = a[:, 9:10]
            ax = (a[:, 0:1] + a[:, 1:2] + a[:, 2:3]) - tgt[:, 0:1] * s_
            ay = (a[:, 3:4] + a[:, 4:5] + a[:, 5:6]) - tgt[:, 1:2] * s_
            az = (a[:, 6:7] + a[:, 7:8] + a[:, 8:9]) - tgt[:, 2:3] * s_
            out_ref[...] = jnp.concatenate(
                [ax, ay, az, jnp.zeros((bt, 1), jnp.float32)], axis=1
            )

    return pl.pallas_call(
        kernel,
        grid=(nt, ns),
        in_specs=[
            pl.BlockSpec((4, bs), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 16), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, 16), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * n * n, bytes_accessed=nt * n * 16, transcendentals=n * n
        ),
    )


def accuracy_check(bt=512, bs=1024, subtiles=2):
    rng = np.random.default_rng(1)
    n = 2048
    pm = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
        ).astype(np.float32)
    )
    oracle = np.asarray(accel_direct(pm, G, eps2=EPS2))
    call = make_fast_subtiled(n, bt, bs, subtiles)
    out = np.asarray(call(src_transposed(pm, G), src_limbs(pm, G), pm))
    rel = np.abs(out - oracle).max() / np.abs(oracle).max()
    print(f"subtiled accuracy (x{subtiles}): rel={rel:.3e}", flush=True)


def timing():
    rng = np.random.default_rng(0)
    pm = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=3, size=(N, 3)), rng.uniform(1, 50, (N, 1))], axis=1
        ).astype(np.float32)
    )
    for bt, bs, st in [(2048, 2048, 2), (2048, 2048, 4), (2048, 4096, 4), (1024, 2048, 2), (2048, 2048, 8)]:
        try:
            call = make_fast_subtiled(N, bt, bs, st)

            @jax.jit
            def run(p, call=call):
                def body(c, _):
                    acc = call(src_transposed(c, G), src_limbs(c, G), c)
                    return c + acc * 1e-30, None

                out, _ = lax.scan(body, p, None, length=K)
                return out

            out = run(pm)
            jax.device_get(out[0, 0])
            t0 = time.perf_counter()
            out = run(pm)
            jax.device_get(out[0, 0])
            el = time.perf_counter() - t0
            print(
                f"fast-subtiled bt={bt} bs={bs} x{st}: {el/K*1e3:.1f} ms/step "
                f"{N*N/(el/K)/1e9:.1f} G-int/s",
                flush=True,
            )
        except Exception as e:
            print(f"bt={bt} bs={bs} x{st}: FAILED {type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    accuracy_check()
    timing()
