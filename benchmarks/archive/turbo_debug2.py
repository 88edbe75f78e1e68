"""Validate + time the redesigned turbo kernel on real TPU."""

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

from nbody3d_tpu.ops.force_jnp import accel_direct
from nbody3d_tpu.ops.pallas_force import accel_pallas_turbo, turbo_sources

EPS2 = 1e-4
G = 1e-4


def accuracy(n=1024, bt=256, bs=256):
    rng = np.random.default_rng(1)
    pm = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
        ).astype(np.float32)
    )
    oracle = np.asarray(accel_direct(pm, G, eps2=EPS2))
    bundle = turbo_sources(pm, G, EPS2)
    out = np.asarray(accel_pallas_turbo(pm, *bundle, block_target=bt, block_source=bs))
    scale = np.abs(oracle).max()
    print(
        f"turbo v2 accuracy (bt={bt},bs={bs}): rel={np.abs(out-oracle).max()/scale:.3e}",
        flush=True,
    )


def timing(n=131072, k=5):
    rng = np.random.default_rng(0)
    pm = jnp.asarray(
        np.concatenate(
            [rng.normal(scale=3, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
        ).astype(np.float32)
    )
    for bt, bs in [(512, 1024), (1024, 2048), (512, 2048)]:
        @jax.jit
        def run(p, k=k, bt=bt, bs=bs):
            def body(c, _):
                bundle = turbo_sources(c, G, EPS2)
                acc = accel_pallas_turbo(c, *bundle, block_target=bt, block_source=bs)
                return c + acc * 1e-30, None

            out, _ = lax.scan(body, p, None, length=k)
            return out

        out = run(pm)
        jax.device_get(out[0, 0])
        t0 = time.perf_counter()
        out = run(pm)
        jax.device_get(out[0, 0])
        el = time.perf_counter() - t0
        print(
            f"turbo v2 bt={bt} bs={bs}: {el/k*1e3:.2f} ms/step {n*n/(el/k)/1e9:.1f} G-int/s",
            flush=True,
        )


if __name__ == "__main__":
    accuracy()
    timing()
