"""Round-2 hardware validation batch: sym kernel + fast self-mask.

Runs on the real TPU (compiles are minutes each through the remote
service, so everything is batched into one process):

1. Correctness: sym and (masked) fast vs the jnp oracle on adversarial
   galaxy-like data — heavy 1e7 central body + a planted near-coincident
   pair, the dataset class that exposed both round-1 fast-mode bugs.
2. Momentum: per-step momentum-rate error |sum m*a| / sum|m*a| for
   exact / fast / sym, Morton-sorted and not.
3. Throughput: G-int/s at N=262,144 for sym (block 2048 and 1024) vs the
   round-1 fast baseline (279).

Usage: python benchmarks/sym_validate.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from nbody3d_tpu.ops.force_jnp import accel_direct
from nbody3d_tpu.ops.morton import morton_keys
from nbody3d_tpu.ops.pallas_force import (
    accel_pallas,
    accel_sym_pallas,
    src_limbs,
    src_transposed,
)


def galaxy_like(rng, n, heavy=True):
    pm = np.concatenate(
        [rng.normal(scale=2.0, size=(n, 3)), rng.uniform(10, 50, (n, 1))], axis=1
    ).astype(np.float32)
    if heavy:
        pm[0, :3] = [0.5, -0.3, 0.2]
        pm[0, 3] = 1e7
        pm[1, :3] = pm[2, :3] + 3e-4  # near-coincident disk pair
    return pm


def sync(x):
    return np.asarray(jax.device_get(x))


def rel_err(out, oracle):
    return float(np.abs(out - oracle).max() / np.abs(oracle).max())


def mom_rel(pm, acc):
    m = pm[:, 3:4].astype(np.float64)
    a = acc[:, :3].astype(np.float64)
    dp = (m * a).sum(0)
    scale = np.abs(m * a).sum(0).max()
    return float(np.abs(dp).max() / scale)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="correctness only")
    ap.add_argument("--n-bench", type=int, default=262144)
    args = ap.parse_args()

    G, EPS2 = 1e-4, 1e-4
    results = {}
    print(f"platform={jax.default_backend()}", flush=True)

    # ---------------------------------------------------- 1. correctness
    rng = np.random.default_rng(0)
    n = 16384
    pm = galaxy_like(rng, n)
    order = np.argsort(np.asarray(morton_keys(jnp.asarray(pm))))
    pm_sorted = pm[order]
    oracle = sync(accel_direct(jnp.asarray(pm_sorted), G, eps2=EPS2, chunk=2048))

    t0 = time.time()
    out_sym = sync(
        accel_sym_pallas(jnp.asarray(pm_sorted), G, eps2=EPS2, block=2048)
    )
    print(f"sym compile+run: {time.time()-t0:.1f}s", flush=True)
    results["sym_rel_err_16k"] = rel_err(out_sym, oracle)
    results["sym_central_rel"] = float(
        np.abs(out_sym[order == 0] - oracle[order == 0]).max()
        / np.abs(oracle[order == 0]).max()
    )
    results["sym_mom_rel"] = mom_rel(pm_sorted, out_sym)
    print(f"sym: rel={results['sym_rel_err_16k']:.3e} "
          f"central={results['sym_central_rel']:.3e} "
          f"mom={results['sym_mom_rel']:.3e}", flush=True)

    srcT = src_transposed(jnp.asarray(pm_sorted), G)
    src10 = src_limbs(jnp.asarray(pm_sorted), G)
    t0 = time.time()
    out_fast = sync(
        accel_pallas(
            jnp.asarray(pm_sorted), srcT, src10,
            eps2=EPS2, block_target=2048, block_source=2048, mode="fast",
        )
    )
    print(f"fast compile+run: {time.time()-t0:.1f}s", flush=True)
    results["fast_rel_err_16k"] = rel_err(out_fast, oracle)
    results["fast_central_rel"] = float(
        np.abs(out_fast[order == 0] - oracle[order == 0]).max()
        / np.abs(oracle[order == 0]).max()
    )
    results["fast_mom_rel"] = mom_rel(pm_sorted, out_fast)
    print(f"fast(masked): rel={results['fast_rel_err_16k']:.3e} "
          f"central={results['fast_central_rel']:.3e} "
          f"mom={results['fast_mom_rel']:.3e}", flush=True)

    # unsorted sym momentum for comparison (centroids less compact)
    out_sym_uns = sync(
        accel_sym_pallas(jnp.asarray(pm), G, eps2=EPS2, block=2048)
    )
    results["sym_mom_rel_unsorted"] = mom_rel(pm, out_sym_uns)
    oracle_uns = sync(accel_direct(jnp.asarray(pm), G, eps2=EPS2, chunk=2048))
    results["sym_rel_err_unsorted"] = rel_err(out_sym_uns, oracle_uns)
    print(f"sym unsorted: rel={results['sym_rel_err_unsorted']:.3e} "
          f"mom={results['sym_mom_rel_unsorted']:.3e}", flush=True)

    if args.quick:
        print(json.dumps(results))
        return 0

    # ---------------------------------------------------- 2. throughput
    nb = args.n_bench
    pmb = galaxy_like(np.random.default_rng(1), nb, heavy=False)
    orderb = np.argsort(np.asarray(morton_keys(jnp.asarray(pmb))))
    pmb = jnp.asarray(pmb[orderb])

    def bench(fn, label, reps=8):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out[0, 0])
        dt_all = time.perf_counter() - t0
        per = dt_all / reps
        gints = (nb * nb - nb) / per / 1e9
        print(f"{label}: {per*1e3:.1f} ms/step, {gints:.1f} G-int/s", flush=True)
        return gints

    for block in (2048, 1024):
        t0 = time.time()
        g = bench(
            lambda: accel_sym_pallas(pmb, G, eps2=EPS2, block=block),
            f"sym b={block} (compile {time.time()-t0:.0f}s)",
        )
        results[f"sym_gints_b{block}"] = round(g, 1)

    srcTb = src_transposed(pmb, G)
    src10b = src_limbs(pmb, G)
    g = bench(
        lambda: accel_pallas(
            pmb, srcTb, src10b,
            eps2=EPS2, block_target=2048, block_source=2048, mode="fast",
        ),
        "fast(masked) b=2048",
    )
    results["fast_gints_b2048"] = round(g, 1)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
