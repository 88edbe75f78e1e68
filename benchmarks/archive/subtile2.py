"""Subtiled fast kernel v2: subtiles arrive as SEPARATE pipelined block
inputs (no in-kernel ref slicing — suspected Mosaic miscompile trigger).

Each grid step processes `subtiles` source subtiles; subtile s+1's VPU
chain has no dependency on subtile s's accumulate matmul, so Mosaic's
in-body scheduler can overlap them.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

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


def make_call(n, bt, bs, subtiles):
    nt, ns = n // bt, n // bs
    sub = bs // subtiles

    def kernel(*refs):
        srcTs = refs[:subtiles]
        src10s = refs[subtiles : 2 * subtiles]
        tgt_ref = refs[2 * subtiles]
        out_ref = refs[2 * subtiles + 1]
        acc_scr = refs[2 * subtiles + 2]
        j = pl.program_id(1)
        ns_ = pl.num_programs(1)
        tgt = tgt_ref[...]
        tx = tgt[:, 0:1]
        ty = tgt[:, 1:2]
        tz = tgt[:, 2:3]
        part = None
        for s in range(subtiles):
            dx = srcTs[s][0:1, :] - tx
            dy = srcTs[s][1:2, :] - ty
            dz = srcTs[s][2:3, :] - tz
            d2 = dx * dx + (dy * dy + (dz * dz + EPS2))
            inv3 = lax.rsqrt(d2 * (d2 * d2))
            p = jnp.dot(inv3, src10s[s][...], preferred_element_type=jnp.float32)
            part = p if part is None else part + p

        @pl.when(j == 0)
        def _():
            acc_scr[...] = part

        @pl.when(j > 0)
        def _():
            acc_scr[...] += part

        @pl.when(j == ns_ - 1)
        def _():
            a = acc_scr[...]
            s_ = a[:, 9:10] + a[:, 10:11] + a[:, 11:12]
            ax = (a[:, 0:1] + a[:, 1:2] + a[:, 2:3]) - tgt[:, 0:1] * s_
            ay = (a[:, 3:4] + a[:, 4:5] + a[:, 5:6]) - tgt[:, 1:2] * s_
            az = (a[:, 6:7] + a[:, 7:8] + a[:, 8:9]) - tgt[:, 2:3] * s_
            out_ref[...] = jnp.concatenate(
                [ax, ay, az, jnp.zeros((bt, 1), jnp.float32)], axis=1
            )

    in_specs = []
    for s in range(subtiles):
        in_specs.append(
            pl.BlockSpec(
                (4, sub), lambda i, j, s=s: (0, j * subtiles + s), memory_space=pltpu.VMEM
            )
        )
    for s in range(subtiles):
        in_specs.append(
            pl.BlockSpec(
                (sub, 16), lambda i, j, s=s: (j * subtiles + s, 0), memory_space=pltpu.VMEM
            )
        )
    in_specs.append(pl.BlockSpec((bt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        grid=(nt, ns),
        in_specs=in_specs,
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

    def apply(pm):
        srcT = src_transposed(pm, G)
        src10 = src_limbs(pm, G)
        args = [srcT] * subtiles + [src10] * subtiles + [pm]
        return call(*args)

    return apply


def accuracy(bt=512, bs=1024, subtiles=2):
    rng = np.random.default_rng(1)
    n = 2048
    pm = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
        ).astype(np.float32)
    )
    oracle = np.asarray(accel_direct(pm, G, eps2=EPS2))
    out = np.asarray(make_call(n, bt, bs, subtiles)(pm))
    rel = np.abs(out - oracle).max() / np.abs(oracle).max()
    print(f"subtile2 accuracy (bt={bt},bs={bs},x{subtiles}): rel={rel:.3e}", flush=True)
    return rel


def timing(n=262144, k=5):
    rng = np.random.default_rng(0)
    pm = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=3, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
        ).astype(np.float32)
    )
    for bt, bs, st in [(2048, 2048, 2), (2048, 2048, 4), (2048, 4096, 4)]:
        try:
            apply = make_call(n, bt, bs, st)

            @jax.jit
            def run(p, apply=apply):
                def body(c, _):
                    return c + apply(c) * 1e-30, None

                out, _ = lax.scan(body, p, None, length=k)
                return out

            out = run(pm)
            jax.device_get(out[0, 0])
            t0 = time.perf_counter()
            out = run(pm)
            jax.device_get(out[0, 0])
            el = time.perf_counter() - t0
            print(
                f"subtile2 bt={bt} bs={bs} x{st}: {el/k*1e3:.1f} ms/step "
                f"{n*n/(el/k)/1e9:.1f} G-int/s",
                flush=True,
            )
        except Exception as e:
            print(f"bt={bt} bs={bs} x{st}: FAILED {type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    r = accuracy()
    if r < 6e-3:
        timing()
    else:
        print("accuracy failed; skipping timing", flush=True)
