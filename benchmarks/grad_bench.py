"""TPU-speed gradient benchmark: jax.grad through the Pallas direct solver.

Times (a) the raw hand-written VJP kernel (ops/force_vjp.py — the
all-pairs cotangent contraction), (b) a full forward accel step, and
(c) ``jax.grad`` of a k-step rollout loss through the sym Pallas path
(custom_vjp), all at the headline N on the real chip.  Reports s/step and
the pairwise-interaction rate of each phase (one grad step does the
forward's N^2 pairs once and the VJP's N^2 pairs once).

This is the measured evidence for the "differentiable at TPU speed"
claim (VERDICT r2 #2): the jnp-oracle grad path is CPU-bound at N~1e3;
the custom-VJP path runs the same all-pairs tiling as the forward.

Usage: python benchmarks/grad_bench.py [--n 262144] [--k 5] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=0,
                    help="bodies (default: 262144 direct, 2^21 pm/p3m)")
    ap.add_argument("--k", type=int, default=5, help="rollout steps under grad")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--method", choices=("direct", "pm", "p3m"),
                    default="direct",
                    help="solver under jax.grad: the Pallas direct path "
                    "(hand-written all-pairs VJP) or the grid solvers "
                    "(Pallas primal + jnp-oracle backward custom VJPs)")
    ap.add_argument("--grid", type=int, default=128)
    args = ap.parse_args()

    from nbody3d_tpu.config import SimConfig
    from nbody3d_tpu.models.registry import make_preset
    from nbody3d_tpu.ops.force_vjp import force_vjp_pallas, force_vjp_sym_pallas
    from nbody3d_tpu.ops.step import fit_block, make_step_fn
    from nbody3d_tpu.state import SimState, init_state

    n = args.n or (262144 if args.method == "direct" else 2**21)
    cfg = SimConfig(backend="pallas", force_mode="sym", method=args.method,
                    pm_grid=args.grid)
    pos_mass, vel, _ = make_preset("uniform-sphere", seed=0, G=cfg.G, n=n)
    n_pad = -(-n // 2048) * 2048
    state = init_state(pos_mass, vel, n_pad=n_pad)
    pm = jax.device_put(state.pos_mass)
    v0 = jax.device_put(state.vel)
    abar = jnp.ones_like(pm)
    block = fit_block(n_pad, cfg.block_target)
    pairs = float(n_pad) * n_pad

    def _sync(out):
        # block_until_ready does not block through the axon relay; force a
        # real device->host readback of one element (memory: TPU timing).
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0])

    def timeit(fn, *a):
        _sync(fn(*a))  # warm/compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    # (a) raw VJP kernels: full grid and Newton-3 (direct method only —
    # the grid solvers' backwards are measured through the rollout)
    t_vjp = t_vjp_sym = None
    if args.method == "direct":
        vjp_fn = jax.jit(
            lambda p, a: force_vjp_pallas(p, cfg.G, a, eps2=cfg.eps2, block=block)
        )
        t_vjp = timeit(vjp_fn, pm, abar)
        vjp_sym_fn = jax.jit(
            lambda p, a: force_vjp_sym_pallas(
                p, cfg.G, a, eps2=cfg.eps2, block=min(block, 1024)
            )
        )
        t_vjp_sym = timeit(vjp_sym_fn, pm, abar)

    # (b) + (c): forward step and grad of a k-step rollout loss
    step = make_step_fn(cfg, n_pad, n, platform=jax.default_backend())
    k = args.k

    @jax.jit
    def rollout_loss(v):
        # SimState built inline (init_state is host-side numpy; v is traced)
        s = SimState(pm, v, jnp.zeros_like(pm), jnp.int32(0))

        def body(c, _):
            return step(c, cfg.dt, cfg.G), None

        out, _ = jax.lax.scan(body, s, None, length=k)
        return jnp.sum(out.pos_mass[:, :3] ** 2) / n

    t_fwd = timeit(rollout_loss, v0) / k
    grad_fn = jax.jit(jax.grad(rollout_loss))
    t_grad = timeit(grad_fn, v0) / k

    rec = {
        "n": n,
        "n_pad": n_pad,
        "k": k,
        "method": args.method,
        "fwd_s_per_step": round(t_fwd, 4),
        "grad_s_per_step": round(t_grad, 4),
        "grad_over_fwd": round(t_grad / t_fwd, 2),
        "platform": jax.default_backend(),
    }
    if args.method == "direct":
        rec.update(
            vjp_kernel_s=round(t_vjp, 4),
            vjp_gints=round(pairs / t_vjp / 1e9, 1),
            vjp_sym_kernel_s=round(t_vjp_sym, 4),
            vjp_sym_gints=round(pairs / t_vjp_sym / 1e9, 1),
            # one grad step = forward pairs + VJP pairs
            grad_pair_gints=round(2 * pairs / t_grad / 1e9, 1),
        )
    else:
        rec["grid"] = args.grid
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
