"""Measure raw VPU elementwise throughput: f32 vs bf16 fma chains, and
rsqrt cost — informs whether a bf16 pair-math mode could beat `fast`.
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

BT, BS = 512, 1024
GRID = 16
REPS = 64


def make(op, dtype):
    def kernel(x_ref, out_ref):
        x = x_ref[...]
        acc = x

        def body(_, acc):
            if op == "fma":
                return acc * jnp.asarray(1.000001, dtype) + x
            return lax.rsqrt(acc + jnp.asarray(1.0, dtype))

        acc = lax.fori_loop(0, REPS, body, acc)
        out_ref[...] = acc

    return pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((BT, BS), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BT, BS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT * GRID, BS), dtype),
    )


def bench(op, dtype, k=20):
    call = make(op, dtype)

    @jax.jit
    def run(x):
        def body(c, _):
            return call(c), None

        out, _ = lax.scan(body, x, None, length=k)
        return out

    x = jnp.full((BT * GRID, BS), 0.5, dtype)
    out = run(x)
    jax.device_get(out[0, 0])
    t0 = time.perf_counter()
    out = run(x)
    jax.device_get(out[0, 0])
    el = time.perf_counter() - t0
    ops = BT * BS * GRID * REPS * k
    print(f"{op} {dtype.__name__}: {el/k*1e3:.2f} ms/iter -> {ops/el/1e12:.2f} Tops/s", flush=True)


if __name__ == "__main__":
    for op in ["fma", "rsqrt"]:
        for dtype in [jnp.float32, jnp.bfloat16]:
            try:
                bench(op, dtype)
            except Exception as e:
                print(f"{op} {dtype}: FAILED {type(e).__name__} {str(e)[:80]}", flush=True)
