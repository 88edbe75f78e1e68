"""Tune fast-mode blocks at the headline N=262144."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from nbody3d_tpu.ops.pallas_force import accel_pallas, src_limbs, src_transposed

EPS2 = 1e-4
G = 1e-4
N = 262144
K = 5

rng = np.random.default_rng(0)
pm = jnp.asarray(
    np.concatenate(
        [rng.normal(scale=3, size=(N, 3)), rng.uniform(1, 50, (N, 1))], axis=1
    ).astype(np.float32)
)

import sys as _sys
mode = _sys.argv[1] if len(_sys.argv) > 1 else "fast"
shapes = [(4096, 2048), (4096, 1024), (2048, 1024), (4096, 4096)] if mode == "fast" else [(2048, 2048), (2048, 1024), (1024, 1024)]
for bt, bs in shapes:
    try:
        @jax.jit
        def run(p, bt=bt, bs=bs):
            def body(c, _):
                srcT = src_transposed(c, G)
                src10 = src_limbs(c, G) if mode == 'fast' else None
                acc = accel_pallas(
                    c, srcT, src10, eps2=EPS2,
                    block_target=bt, block_source=bs, mode=mode,
                )
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
            f"{mode} bt={bt} bs={bs}: {el/K*1e3:.1f} ms/step {N*N/(el/K)/1e9:.1f} G-int/s",
            flush=True,
        )
    except Exception as e:
        print(f"{mode} bt={bt} bs={bs}: FAILED {type(e).__name__} {str(e)[:100]}", flush=True)
