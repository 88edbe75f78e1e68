"""P3M operating-point sweep: mesh grid vs neighbor-tile budget.

The short-range pass costs N·nbr_k·block pairs REGARDLESS of rcut (the
block-sparse kernel computes its full neighbor set; pairs past rcut
contribute zero through the erfc cut), while rcut shrinks with the cell
size (rcut = rcut_sigmas·sigma_cells·h).  A finer mesh therefore needs
FEWER neighbor tiles for the same physics — it shifts work from the
short-range pass (the 16M bottleneck) to the FFT (G³ log G, cheap) and
the tile mesh kernels (component-split gather above grid 128,
ops/mesh_pallas.py).  This harness finds the fastest (grid, nbr_k) that
keeps the accuracy contract:

per config:
  1. ``p3m_neighbor_overflow`` — within-rcut tiles dropped by the budget
     (must be 0 or accuracy silently degrades);
  2. force accuracy on a sampled target subset vs the exact Pallas
     all-pairs kernel (median/p99/max relative error — contract ~1e-3);
  3. full-step time (``p3m_bench.bench_n``).

Usage:
  python benchmarks/p3m_grid_sweep.py --n 16777216 \
      --configs 128:32,192:16,192:8 [--steps 3] [--probe 4096]
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


def accuracy_subset(state, n_real, grid, nbr_k, probe, seed=5):
    """Relative force error of accel_p3m vs the exact Pallas all-pairs
    kernel on ``probe`` sampled real targets (subset targets × ALL
    sources — exact mode needs no self-pair mask: the d=0 contribution
    is identically zero)."""
    from nbody3d_tpu.ops.p3m import accel_p3m
    from nbody3d_tpu.ops.pallas_force import (
        NO_DIAG, accel_pallas, src_transposed,
    )
    from nbody3d_tpu.ops.step import fit_block

    G = 1e-4
    pm = state.pos_mass
    rng = np.random.default_rng(seed)
    idx = np.sort(rng.choice(n_real, size=probe, replace=False))
    tgt = pm[jnp.asarray(idx)]
    srcT = src_transposed(pm, G)
    bt = fit_block(probe, 256)
    bs = fit_block(pm.shape[0], 2048)
    interp = jax.default_backend() != "tpu"  # CPU smoke path
    ref = np.asarray(
        jax.jit(
            lambda t, s: accel_pallas(
                t, s, None, eps2=1e-4, block_target=bt, block_source=bs,
                mode="exact", static_diag=(NO_DIAG, 0, NO_DIAG),
                interpret=interp,
            )
        )(tgt, srcT)
    )[:, :3]
    got = np.asarray(
        accel_p3m(pm, G, grid=grid, n_real=n_real, nbr_k=nbr_k)
    )[idx, :3]
    rel = np.linalg.norm(got - ref, axis=1) / np.maximum(
        np.linalg.norm(ref, axis=1), 1e-20
    )
    return float(np.median(rel)), float(np.percentile(rel, 99)), float(rel.max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2**24)
    ap.add_argument("--configs", default="128:32,192:16,192:8",
                    help="comma list of grid:nbr_k")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--probe", type=int, default=4096,
                    help="sampled targets for the accuracy probe (0=skip)")
    ap.add_argument("--skip-overflow", action="store_true")
    args = ap.parse_args()

    from nbody3d_tpu.utils.devwait import wait_for_device

    wait_for_device(float(os.environ.get("NBODY_BENCH_WAIT_S", "1800")))
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    from benchmarks.p3m_bench import bench_n, galaxy_state
    from nbody3d_tpu.ops.p3m import p3m_neighbor_overflow

    state = galaxy_state(args.n)
    n_real = min(args.n + 2, state.pos_mass.shape[0])

    for spec in args.configs.split(","):
        grid, nbr_k = (int(x) for x in spec.split(":"))
        if not args.skip_overflow:
            t0 = time.perf_counter()
            ov = int(p3m_neighbor_overflow(
                state.pos_mass, grid=grid, n_real=n_real, nbr_k=nbr_k
            ))
            print(f"grid={grid} k={nbr_k}: within-rcut tiles dropped = {ov} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
        if args.probe:
            med, p99, mx = accuracy_subset(
                state, n_real, grid, nbr_k, args.probe
            )
            print(f"grid={grid} k={nbr_k}: force err median {med:.2e} "
                  f"p99 {p99:.2e} max {mx:.2e}", flush=True)
        bench_n(args.n, grid, nbr_k, steps=args.steps)


if __name__ == "__main__":
    main()
