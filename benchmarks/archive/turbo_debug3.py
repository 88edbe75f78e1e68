"""Dump d2 from the compiled turbo kernel and compare with the truth."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody3d_tpu.ops.pallas_force import turbo_sources

EPS2 = 1e-4
G = 1e-4

rng = np.random.default_rng(1)
n = 256
pm = jnp.asarray(
    np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(1, 50, (n, 1))], axis=1
    ).astype(np.float32)
)
t24, s24T, src10 = turbo_sources(pm, G, EPS2)

pos = np.asarray(pm[:, :3], dtype=np.float64)
diff = pos[:, None, :] - pos[None, :, :]
exact_d2 = (diff * diff).sum(-1) + EPS2

# 1) d2 via plain XLA dot on TPU (no pallas)
d2_xla = np.asarray(jnp.dot(t24, s24T))
print("xla dot d2 err:", np.abs(d2_xla - exact_d2).max(), flush=True)


# 2) d2 via pallas kernel: dot only
def k_d2(t_ref, s_ref, o_ref):
    o_ref[...] = jnp.dot(t_ref[...], s_ref[...], preferred_element_type=jnp.float32)


d2_p = pl.pallas_call(
    k_d2,
    grid=(1, 1),
    in_specs=[
        pl.BlockSpec((n, 24), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((24, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((n, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
)(t24, s24T)
print("pallas dot d2 err:", np.abs(np.asarray(d2_p) - exact_d2).max(), flush=True)


# 3) d2 -> rsqrt chain -> second dot, output the second dot (the full turbo
#    body) with everything in one kernel
def k_full(t_ref, s_ref, w_ref, o_ref):
    d2 = jnp.dot(t_ref[...], s_ref[...], preferred_element_type=jnp.float32)
    inv3 = jax.lax.rsqrt(d2 * (d2 * d2))
    o_ref[...] = jnp.dot(inv3, w_ref[...], preferred_element_type=jnp.float32)


acc = pl.pallas_call(
    k_full,
    grid=(1, 1),
    in_specs=[
        pl.BlockSpec((n, 24), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((24, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, 16), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((n, 16), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
)(t24, s24T, src10)

inv3_exact = exact_d2 ** -1.5
acc_exact = inv3_exact @ np.asarray(src10, dtype=np.float64)
err = np.abs(np.asarray(acc) - acc_exact)
print(
    "pallas full-body acc err:",
    err.max(),
    "scale:",
    np.abs(acc_exact).max(),
    flush=True,
)

# 4) same but output inv3 instead of the second dot
def k_inv3(t_ref, s_ref, o_ref):
    d2 = jnp.dot(t_ref[...], s_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = jax.lax.rsqrt(d2 * (d2 * d2))


inv3_p = pl.pallas_call(
    k_inv3,
    grid=(1, 1),
    in_specs=[
        pl.BlockSpec((n, 24), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((24, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((n, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
)(t24, s24T)
e = np.abs(np.asarray(inv3_p) - inv3_exact)
print("pallas inv3 err:", e.max(), "rel:", (e / np.abs(inv3_exact)).max(), flush=True)
