"""Scan-slope itemization of the sym step (round 5, VERDICT r4 #4).

``sym_profile.py``'s isolated timings carry the ~28-40 ms per-dispatch
relay constant, which swamps the ~1-5 ms glue items it was built to
expose.  This harness times every constituent with the roofline's
scan-slope method (L=1 vs L=5 executions chained in one jitted
``lax.scan`` with a carry-perturbed operand, slope = true per-exec
cost, constant cancelled) — the same footing as the shipped step, which
bench.py times as 20-step scan chunks.

Items:
  step (fused)     — sym_verlet_step_pallas under a state-carry scan
  step (unfused)   — accel_sym_pallas + XLA combine + XLA Verlet
  accel composed   — accel_sym_pallas alone
  diag+prep (A)    — sym_diag_prep_pallas alone
  hops B+C         — _sym_hops_raw on fixed prepped operands
  wrap-extend      — the three concats alone
  epilogue         — the fused epilogue pass alone (prepped inputs)

Usage: python benchmarks/step_slope.py [N] [BLOCK]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nbody3d_tpu.ops import pallas_force as pf
from nbody3d_tpu.ops.integrate import apply_integrator

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
EPS2 = 1e-4
G = 1e-4
K = 5
L1, L2 = 1, 5


def slope(label, make_run, pairs=None):
    meds = []
    for L in (L1, L2):
        run = make_run(L)
        jax.device_get(run())
        times = []
        for _ in range(K):
            t0 = time.perf_counter()
            jax.device_get(run())
            times.append(time.perf_counter() - t0)
        meds.append(sorted(times)[len(times) // 2])
    med = (meds[1] - meds[0]) / (L2 - L1)
    rate = f"  {pairs / med / 1e9:8.1f} G-int/s" if pairs else ""
    print(f"{label:24s} {med*1e3:9.3f} ms{rate}", flush=True)
    return med


def main():
    nt = N // BLOCK
    half = nt // 2
    print(f"N={N}  block={BLOCK}  nt={nt}  platform={jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((N, 3)).astype(np.float32) * 5.0
    mass = rng.uniform(10, 50, (N, 1)).astype(np.float32)
    pm = jnp.asarray(np.concatenate([pos, mass], axis=1))
    vel = jnp.zeros((N, 4), jnp.float32)
    acc = jnp.zeros((N, 4), jnp.float32)
    dt = jnp.float32(1e-6)

    # ---- full steps under a state-carry scan (the production shape)
    def make_step_scan(fused):
        def mk(L):
            @jax.jit
            def run():
                def body(c, _):
                    p, v, a = c
                    if fused:
                        out = pf.sym_verlet_step_pallas(
                            p, v, a, dt, G, eps2=EPS2, block=BLOCK
                        )
                    else:
                        an = pf.accel_sym_pallas(p, G, eps2=EPS2, block=BLOCK)
                        out = apply_integrator("verlet", p, v, a, an, dt)
                    return out, None
                c, _ = lax.scan(body, (pm, vel, acc), None, length=L)
                return c[0][0, 0]
            return run
        return mk

    t_f = slope("step (fused)", make_step_scan(True), pairs=N * N)
    t_u = slope("step (unfused)", make_step_scan(False), pairs=N * N)

    # ---- accel composed
    def mk_accel(L):
        @jax.jit
        def run():
            def body(c, _):
                a = pf.accel_sym_pallas(pm + c, G, eps2=EPS2, block=BLOCK)
                return a[0, 0] * 0.0, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=L)
            return c
        return run
    t_acc = slope("accel composed", mk_accel, pairs=N * N)

    # ---- diag + prep (call A)
    def mk_diag(L):
        @jax.jit
        def run():
            def body(c, _):
                a16, s16, cent, srcT = pf.sym_diag_prep_pallas(
                    pm + c, G, eps2=EPS2, block=BLOCK
                )
                return a16[0, 0] * 0.0, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=L)
            return c
        return run
    t_a = slope("diag+prep (A)", mk_diag, pairs=nt * BLOCK * BLOCK)

    # ---- hops on fixed prepped operands
    a16, s16, cent, srcT = jax.jit(
        functools.partial(pf.sym_diag_prep_pallas, eps2=EPS2, block=BLOCK)
    )(pm, G)

    def mk_hops(L):
        @jax.jit
        def run():
            def body(c, _):
                t_b, s_b, t_c, s_c = pf._sym_hops_raw(
                    pm, srcT + c, s16, cent,
                    eps2=EPS2, block=BLOCK, interpret=False,
                )
                o = t_b if t_b is not None else t_c
                return o[0, 0] * 0.0, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=L)
            return c
        return run
    hop_pairs = N * N - nt * BLOCK * BLOCK
    t_h = slope("hops B+C (raw)", mk_hops, pairs=hop_pairs)

    # ---- wrap-extend concats alone
    ext = (half + 1) * BLOCK

    def mk_ext(L):
        @jax.jit
        def run():
            def body(c, _):
                srcT_e = jnp.concatenate([srcT + c, (srcT + c)[:, :ext]], axis=1)
                s16_e = jnp.concatenate([s16, s16[:ext]], axis=0)
                cent_e = jnp.concatenate([cent, cent[: half + 1]], axis=0)
                return srcT_e[0, 0] * 0.0 + s16_e[0, 0] * 0.0 + cent_e[0, 0] * 0.0, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=L)
            return c
        return run
    t_e = slope("wrap-extend concat", mk_ext)

    # ---- epilogue alone (prepped inputs)
    t_b, s_b, t_c, s_c = jax.jit(
        functools.partial(pf._sym_hops_raw, eps2=EPS2, block=BLOCK, interpret=False)
    )(pm, srcT, s16, cent)

    def mk_epi(L):
        @jax.jit
        def run():
            def body(c, _):
                p, v, a = pf._sym_epilogue_call(
                    a16 + c, t_b, s_b, t_c, s_c, pm, vel, acc, dt,
                    block=BLOCK, n_real=None, interpret=False,
                )
                return p[0, 0] * 0.0, None
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=L)
            return c
        return run
    t_epi = slope("epilogue (fused pass)", mk_epi)

    print(f"\nstep(fused) - accel-composed-parts:")
    parts = t_a + t_h + t_e + t_epi
    print(f"  A {t_a*1e3:.2f} + hops {t_h*1e3:.2f} + ext {t_e*1e3:.2f} "
          f"+ epi {t_epi*1e3:.2f} = {parts*1e3:.2f} ms vs fused step {t_f*1e3:.2f} ms")
    print(f"  unfused step {t_u*1e3:.2f} ms; accel alone {t_acc*1e3:.2f} ms")
    print(f"  fused-step rate: {N*N/t_f/1e9:.1f} G-int/s")


if __name__ == "__main__":
    main()
