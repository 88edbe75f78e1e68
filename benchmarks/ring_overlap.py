"""ICI/compute overlap microbench for the multi-chip ring (run on >= 2 chips).

Measures whether the ring schedule's ppermute transfers actually hide
behind the per-hop force kernels (parallel/sharded.py issues each permute
before the kernel that consumes the current buffer, so XLA's async
collectives can overlap them — asserted structurally in
tests/test_ring_overlap.py; this script measures it in wall-clock).

Method: time (a) the full ring step, (b) a transfer-free variant that
computes the same D hops against the *resident* shard only (no ppermute,
same FLOPs), and (c) a compute-free variant that only rotates the buffer
D-1 times.  Overlap efficiency = (a) vs max(b, c): 1.0 means transfers are
fully hidden; (b)+(c) means fully serialized.

Single-chip fallback: runs with D=1 (degenerate, prints a notice) so the
harness is exercised in CI; real numbers need a multi-chip TPU slice.

Usage: python benchmarks/ring_overlap.py [--n-per-chip 131072] [--steps 10]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from nbody3d_tpu.config import SimConfig
from nbody3d_tpu.models.sphere import uniform_sphere
from nbody3d_tpu.ops.pallas_force import NO_DIAG
from nbody3d_tpu.parallel.mesh import default_mesh
from nbody3d_tpu.parallel.sharded import make_sharded_step, shard_state
from nbody3d_tpu.state import init_state


def timed(fn, sync_leaf, reps):
    fn()  # warm / compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    np.asarray(jax.device_get(sync_leaf(out)))  # honest sync (relay-safe)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-per-chip", type=int, default=131072)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    d = len(jax.devices())
    if d < 2:
        print(f"NOTE: only {d} device(s) — overlap is undefined; harness run only.")
    config = SimConfig(backend="auto", force_mode="fast", strategy="ring")
    mesh = default_mesh(d, axis=config.mesh_axis)
    n_pad = args.n_per_chip * d
    pos_mass, vel, _ = uniform_sphere(n_pad, rng=np.random.default_rng(0))
    state = shard_state(init_state(pos_mass, vel, n_pad=n_pad), mesh, "x")
    dt, G = np.float32(1e-4), np.float32(1e-4)

    # (a) full ring step
    step = make_sharded_step(config, n_pad, n_pad, mesh)
    t_ring = timed(
        functools.partial(jax.jit(step), state, dt, G),
        lambda s: s.step,
        args.reps,
    )

    # (b) same compute, no transfers: D hops against the resident shard
    from nbody3d_tpu.ops.pallas_force import accel_pallas, src_limbs, src_transposed
    from nbody3d_tpu.ops.step import fit_block, resolve_backend

    backend, interpret = resolve_backend(config)
    shard = n_pad // d
    bt = fit_block(shard, config.block_target)
    bs = fit_block(shard, config.block_source)

    def compute_only(pos_mass_l):
        acc = jnp.zeros_like(pos_mass_l)
        for _ in range(d):
            srcT = src_transposed(pos_mass_l, G)
            if backend == "pallas":
                src10 = src_limbs(pos_mass_l, G)
                acc = acc + accel_pallas(
                    pos_mass_l, srcT, src10,
                    eps2=config.eps2, block_target=bt, block_source=bs,
                    mode="fast", interpret=interpret,
                    static_diag=(NO_DIAG, 0, NO_DIAG),
                )
            else:
                from nbody3d_tpu.ops.force_jnp import accel_partial

                acc = acc + accel_partial(pos_mass_l, srcT, NO_DIAG, eps2=config.eps2)
        return acc

    compute_sharded = jax.jit(
        jax.shard_map(
            compute_only, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
            check_vma=False,
        )
    )
    t_compute = timed(
        functools.partial(compute_sharded, state.pos_mass),
        lambda a: a,  # full fetch: index-free sync on sharded arrays
        args.reps,
    )

    # (c) transfers only: rotate the buffer D-1 times
    perm = [(i, (i + 1) % d) for i in range(d)]

    def rotate_only(buf):
        for _ in range(d - 1):
            buf = lax.ppermute(buf, "x", perm)
        return buf

    rot_sharded = jax.jit(
        jax.shard_map(
            rotate_only, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)
        )
    )
    t_transfer = timed(
        functools.partial(rot_sharded, state.pos_mass),
        lambda a: a,
        args.reps,
    )

    floor = max(t_compute, t_transfer)
    serial = t_compute + t_transfer
    overlap = 0.0 if serial == floor else (serial - t_ring) / (serial - floor)
    print(
        f"devices={d} n/chip={args.n_per_chip}\n"
        f"ring step      : {t_ring*1e3:9.2f} ms\n"
        f"compute only   : {t_compute*1e3:9.2f} ms\n"
        f"transfers only : {t_transfer*1e3:9.2f} ms\n"
        f"overlap efficiency: {overlap:.2f} "
        f"(1.0 = transfers fully hidden, 0.0 = fully serialized)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
