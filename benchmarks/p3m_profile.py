"""Stage-level profile of one P3M acceleration at large N.

Times each pipeline stage of ``ops/p3m.py::accel_p3m`` in isolation
(jitted, honest device_get sync): Morton sort machinery (keys, two
argsorts, two N-row permute gathers), mesh long-range (tile deposit /
FFT / tile gather, plus the XLA mesh forms for comparison), neighbor
selection, the short-range Pallas pass, and the heavy split — so
optimization targets measured cost, not guesses.

Usage: python benchmarks/p3m_profile.py [--n 2097152] [--grid 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from nbody3d_tpu.ops import mesh_pallas as mp
from nbody3d_tpu.ops import p3m as p3m_ops
from nbody3d_tpu.ops.pm import _box


def timed(fn, args, k, label):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"  {label:<36s} {np.median(ts)*1e3:8.2f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--nbr_k", type=int, default=p3m_ops.DEFAULT_NBR_K)
    args = ap.parse_args()
    n, grid, k = args.n, args.grid, args.k

    from nbody3d_tpu.models.registry import make_preset

    pos_mass, _, _ = make_preset("two-galaxy", seed=0, G=1e-4, n=n)
    n_real = pos_mass.shape[0]
    n_pad = -(-n_real // 2048) * 2048
    pm = np.zeros((n_pad, 4), np.float32)
    pm[:n_real] = np.asarray(pos_mass)
    pmj = jnp.asarray(pm)
    block = p3m_ops.p3m_block(n_pad)
    nt = n_pad // block
    nbr_k = min(args.nbr_k, nt)
    print(
        f"N={n_pad} grid={grid} block={block} nt={nt} nbr_k={nbr_k} "
        f"platform={jax.default_backend()}",
        flush=True,
    )

    print("sort machinery:")
    keys = timed(
        jax.jit(lambda x: p3m_ops.morton_keys(x, n_real)), (pmj,), k,
        "morton keys",
    )
    perm = timed(
        jax.jit(lambda kk: jnp.argsort(kk, stable=True)), (keys,), k,
        "argsort keys",
    )
    timed(jax.jit(jnp.argsort), (perm,), k, "argsort perm (inv)")
    ps = timed(jax.jit(lambda x, p: x[p]), (pmj, perm), k, "permute rows (N,4)")

    lo, h = _box(ps[:n_real, :3], grid)
    sigma = jnp.float32(p3m_ops.DEFAULT_SIGMA_CELLS) * h
    rcut = jnp.float32(p3m_ops.DEFAULT_RCUT_SIGMAS) * sigma

    print("mesh long range:")
    c, w, f = p3m_ops._tsc_cells(ps[:, :3], lo, h, grid)
    corners, valid, dirty = mp.tile_corners(c, block, grid)
    rt = mp.default_rt(nt)
    print(
        f"  (rt={rt}, dirty={int(jnp.sum(dirty))}, "
        f"invalid={int(jnp.sum(~valid))})"
    )
    timed(
        jax.jit(
            lambda x: mp.tile_corners(
                p3m_ops._tsc_cells(x[:, :3], lo, h, grid)[0], block, grid
            )
        ),
        (ps,), k, "cells + corners prep",
    )
    rho = timed(
        jax.jit(lambda: mp.deposit_tiles(c, f, ps[:, 3], corners, grid, block)),
        (), k, "deposit tiles (pallas)",
    )
    timed(
        jax.jit(
            lambda r: mp.repair_deposit(
                r, c, w, ps[:, 3], valid, dirty, rt, grid, block
            )
        ),
        (rho,), k, "deposit repair (XLA)",
    )
    grids = timed(
        jax.jit(
            lambda r: p3m_ops.solve_accel_long(r, h, 1e-4, sigma, order=3)
        ),
        (rho,), k, "FFT gradient solve",
    )
    acc_f = timed(
        jax.jit(lambda g: mp.gather_tiles(g, c, f, corners, grid, block)),
        (grids,), k, "gather tiles (pallas)",
    )
    timed(
        jax.jit(
            lambda a, g: mp.repair_gather(
                a, g, c, w, valid, dirty, rt, grid, block
            )
        ),
        (acc_f, grids), k, "gather repair (XLA)",
    )
    timed(
        jax.jit(
            lambda: p3m_ops.tsc_deposit(ps[:, :3], ps[:, 3], lo, h, grid)
        ),
        (), k, "deposit XLA (old, for reference)",
    )
    timed(
        jax.jit(lambda g: p3m_ops.tsc_gather(g, c, w, grid)),
        (grids,), k, "gather XLA (old, for reference)",
    )

    print("short range:")
    lo_b, hi_b = p3m_ops._sorted_aabbs(ps, n_real, block)
    sel = timed(
        jax.jit(
            lambda lb, hb: p3m_ops._select_neighbors(lb, hb, 0, nt, h, nbr_k)
        ),
        (lo_b, hi_b), k, "neighbor selection",
    )
    kth, neg, nbr_idx = sel
    nbr_mask = p3m_ops.mutual_neighbor_mask(neg, nbr_idx, kth)
    timed(
        jax.jit(
            lambda p, ni, nm: p3m_ops.short_range_tiles(
                p, ni, 0, nt, 1e-4, sigma, rcut, block, nbr_mask=nm,
                backend="pallas" if jax.default_backend() == "tpu" else "jnp",
            )
        ),
        (ps, nbr_idx, nbr_mask), k, "short-range tiles",
    )

    print("heavy + full:")
    hidx, _ = p3m_ops.heavy_split(pmj, p3m_ops.DEFAULT_HEAVY_K)
    timed(
        jax.jit(lambda x, hi: p3m_ops.heavy_direct(x, hi, 1e-4)),
        (pmj, hidx), k, "heavy direct",
    )
    timed(
        jax.jit(
            lambda x: p3m_ops.accel_p3m(x, 1.0, grid=grid, nbr_k=nbr_k)
        ),
        (pmj,), k, "accel_p3m FULL",
    )


if __name__ == "__main__":
    main()
