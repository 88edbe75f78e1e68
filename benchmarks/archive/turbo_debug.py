"""Debug turbo-on-TPU mismatch + measure raw VPU op throughput."""

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
from nbody3d_tpu.ops.pallas_force import accel_pallas_turbo, turbo_sources

EPS2 = 1e-4
G = 1e-4


def turbo_check():
    rng = np.random.default_rng(1)
    n = 1024
    pm = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
        ).astype(np.float32)
    )
    oracle = np.asarray(accel_direct(pm, G, eps2=EPS2))
    bundle = turbo_sources(pm, G, EPS2)
    out = np.asarray(
        accel_pallas_turbo(pm, *bundle, block_target=256, block_source=256)
    )
    scale = np.abs(oracle).max()
    err = np.abs(out - oracle)
    print(f"turbo-on-TPU: max_abs={err.max():.3e} rel={err.max()/scale:.3e}", flush=True)

    # Bisect: check the ts cross-term matmul alone via a tiny pallas kernel.
    t18, s18T, tn, snT, _ = bundle

    def ts_kernel(t18_ref, s18T_ref, out_ref):
        out_ref[...] = jnp.dot(
            t18_ref[...], s18T_ref[...], preferred_element_type=jnp.float32
        )

    ts = pl.pallas_call(
        ts_kernel,
        grid=(1, 1),
        in_specs=[
            pl.BlockSpec((256, 18), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((18, 256), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, 256), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )(t18[:256], s18T[:, :256])
    pos = np.asarray(pm[:256, :3], dtype=np.float64)
    exact = pos @ pos.T
    e = np.abs(np.asarray(ts) - exact)
    print(f"ts matmul: max_abs={e.max():.3e} rel={e.max()/np.abs(exact).max():.3e}", flush=True)

    # And the broadcast d2 assembly with (bt,1)/(1,bs) blocks.
    def d2_kernel(tn_ref, snT_ref, out_ref):
        out_ref[...] = tn_ref[...] + snT_ref[...]

    d2b = pl.pallas_call(
        d2_kernel,
        grid=(1, 1),
        in_specs=[
            pl.BlockSpec((256, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, 256), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )(tn[:256], snT[:, :256])
    exp = np.asarray(tn[:256]) + np.asarray(snT[:, :256])
    e2 = np.abs(np.asarray(d2b) - exp)
    print(f"broadcast add: max_abs={e2.max():.3e}", flush=True)


def vpu_microbench():
    """Raw VPU throughput: K dependent fma chains on a (512, 1024) block."""
    bt, bs, reps = 512, 1024, 64

    def kernel(x_ref, out_ref):
        x = x_ref[...]
        acc = x
        for _ in range(reps):
            acc = acc * 1.000001 + x  # one fma per element per rep
        out_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        grid=(8, 8),
        in_specs=[
            pl.BlockSpec((bt, bs), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((bt, bs), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt * 8, bs * 8), jnp.float32),
    )

    @jax.jit
    def run(x, k):
        def body(c, _):
            return call(c), None

        out, _ = lax.scan(body, x, None, length=k)
        return out

    x = jnp.ones((bt * 8, bs * 8), jnp.float32) * 0.5
    k = 10
    out = run(x, k)
    jax.device_get(out[0, 0])
    t0 = time.perf_counter()
    out = run(x, k)
    jax.device_get(out[0, 0])
    el = time.perf_counter() - t0
    total_fmas = bt * bs * 64 * reps * k
    print(
        f"VPU fma chain: {el/k*1e3:.2f} ms/iter -> {total_fmas/el/1e12:.2f} Tfma/s "
        f"({2*total_fmas/el/1e12:.2f} TFLOP/s)",
        flush=True,
    )

    # rsqrt throughput
    def rkernel(x_ref, out_ref):
        x = x_ref[...]
        acc = x
        for _ in range(reps):
            acc = lax.rsqrt(acc + 1.0)
        out_ref[...] = acc

    rcall = pl.pallas_call(
        rkernel,
        grid=(8, 8),
        in_specs=[
            pl.BlockSpec((bt, bs), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((bt, bs), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt * 8, bs * 8), jnp.float32),
    )

    @jax.jit
    def rrun(x, k):
        def body(c, _):
            return rcall(c), None

        out, _ = lax.scan(body, x, None, length=k)
        return out

    out = rrun(x, k)
    jax.device_get(out[0, 0])
    t0 = time.perf_counter()
    out = rrun(x, k)
    jax.device_get(out[0, 0])
    el = time.perf_counter() - t0
    total = bt * bs * 64 * reps * k  # rsqrt+add pairs
    print(f"rsqrt+add chain: {el/k*1e3:.2f} ms/iter -> {total/el/1e12:.2f} T(rsqrt+add)/s", flush=True)


if __name__ == "__main__":
    turbo_check()
    vpu_microbench()
