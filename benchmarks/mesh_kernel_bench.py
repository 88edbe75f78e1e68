"""Measure the round-3 MXU tile-mesh kernels end to end on the TPU.

One run records everything the mesh-kernel change touches, so BASELINE.md
can be updated from a single log:

  1. PM step at 2M and 16M (CIC tile kernels vs the XLA pipeline)
  2. P3M step at 2M and 16M (TSC tile kernels)
  3. The isolated deposit/gather stage times at 2M (tile kernel vs XLA),
     via the scan-of-K timing recipe (each device_get round trip costs
     ~30 ms through the relay, so stages are timed K-rep inside one jit)

Usage: python benchmarks/mesh_kernel_bench.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timed_scan(fn, x, k=8):
    """Median per-rep seconds of ``fn`` run ``k`` times inside one jit
    (data-dependent carry so XLA cannot CSE the loop body)."""
    from jax import lax

    @jax.jit
    def loop(x0):
        def body(c, _):
            out = fn(c)
            return c + out * 1e-30, ()

        y, _ = lax.scan(body, x0, None, length=k)
        return y[0, 0]

    jax.device_get(loop(x))  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(loop(x))
        ts.append((time.perf_counter() - t0 - 0.03) / k)
    return sorted(ts)[1]


def stage_times(n=2**21, grid=128, block=256):
    """Deposit/gather stage times: tile kernels vs the XLA pipeline."""
    from nbody3d_tpu.models.registry import make_preset
    from nbody3d_tpu.ops import mesh_pallas as mp
    from nbody3d_tpu.ops import p3m as p3
    from nbody3d_tpu.ops.morton import morton_keys

    pos_mass, _, _ = make_preset("two-galaxy", seed=0, G=1e-4, n=n)
    n_pad = -(-pos_mass.shape[0] // 2048) * 2048
    pm = np.zeros((n_pad, 4), np.float32)
    pm[: pos_mass.shape[0]] = np.asarray(pos_mass)
    ps = jnp.asarray(pm)
    n_real = pos_mass.shape[0]

    keys = morton_keys(ps, n_real)
    perm = jnp.argsort(keys, stable=True)
    ps = ps[perm]
    lo, h = p3._box(ps[:n_real, :3], grid)
    c, w, f = p3._tsc_cells(ps[:, :3], lo, h, grid)
    corners, valid, dirty = mp.tile_corners(c, block, grid)
    nt = n_pad // block
    rt = mp.default_rt(nt)
    mass = ps[:, 3]
    c, f, mass, corners = jax.device_put((c, f, mass, corners))
    dt_, iv = jax.device_get(mp.mesh_overflow(c, block, grid, rt))
    print(f"dirty tiles {int(dt_)}/{nt} (budget {rt}), invalid {int(iv)}",
          flush=True)

    t = timed_scan(
        lambda x: mp.deposit_tiles(c, f, mass + x[0, 0] * 0, corners, grid,
                                   block)[:1, :1, :1].reshape(1, 1),
        jnp.zeros((1, 1), jnp.float32),
    )
    print(f"deposit tiles   {t*1e3:8.1f} ms", flush=True)

    rho = mp.deposit_tiles(c, f, mass, corners, grid, block)
    rho = mp.repair_deposit(rho, c, w, mass, valid, dirty, rt, grid, block)
    sigma = 1.5 * h
    grids = p3.solve_accel_long(rho, h, 1e-4, sigma, order=3)

    t = timed_scan(
        lambda x: mp.gather_tiles(
            grids + x[0, 0] * 0, c, f, corners, grid, block
        )[:1, :1].reshape(1, 1),
        jnp.zeros((1, 1), jnp.float32),
    )
    print(f"gather tiles    {t*1e3:8.1f} ms", flush=True)

    t = timed_scan(
        lambda x: p3.tsc_deposit(
            ps[:, :3], mass + x[0, 0] * 0, lo, h, grid
        )[:1, :1, :1].reshape(1, 1),
        jnp.zeros((1, 1), jnp.float32),
    )
    print(f"deposit XLA     {t*1e3:8.1f} ms", flush=True)

    t = timed_scan(
        lambda x: p3.tsc_gather(grids + x[0, 0] * 0, c, w, grid)[:1, :1]
        .reshape(1, 1),
        jnp.zeros((1, 1), jnp.float32),
    )
    print(f"gather XLA      {t*1e3:8.1f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="2M only, skip 16M steps")
    ap.add_argument("--grid", type=int, default=128)
    args = ap.parse_args()

    from nbody3d_tpu.utils.devwait import wait_for_device

    wait_for_device(float(os.environ.get("NBODY_BENCH_WAIT_S", "1800")))
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    print("== stage times (N=2M, grid=%d) ==" % args.grid, flush=True)
    stage_times(grid=args.grid)

    from benchmarks.pm_bench import bench_n as pm_bench_n
    from benchmarks.p3m_bench import bench_n as p3m_bench_n

    print("== PM steps ==", flush=True)
    pm_bench_n(2**21, args.grid, steps=10)
    if not args.quick:
        pm_bench_n(2**24, args.grid, steps=5)
    print("== P3M steps ==", flush=True)
    p3m_bench_n(2**21, args.grid, 32, steps=10)
    if not args.quick:
        p3m_bench_n(2**24, args.grid, 32, steps=3)


if __name__ == "__main__":
    main()
