"""BASELINE acceptance check: conservation drift over 10k steps.

Runs the N=16k Plummer validation config (BASELINE config #2) for 10,000
steps at the reference dt/G and gates THREE conserved quantities for the
requested force mode (round-2 acceptance, VERDICT r1 #2):

- relative energy drift          <= 1e-3  (the original BASELINE bound)
- relative momentum error        <= 1e-5  (|delta P|_max / total |m v|)
- relative angular-momentum err  <= 1e-5  (|delta L|_max / total |m r x v|)

A pair-symmetric force conserves P and L to float reduction order; the
fast/sym MXU paths achieve this via the shared-weight schedule + self-pair
index mask + block-centered limb operands (Morton-ordered every 64 steps).

``pm`` / ``p3m`` run the grid solvers through the same gate (PM is
expected to hold energy but not to pair-level precision; P3M's heavy
split + matched deposit/gather should sit close to the direct modes).

Usage: python benchmarks/drift_check.py [exact|fast|sym|jnp|pm|p3m] [n] [steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

ENERGY_BOUND = 1e-3
MOMENTUM_BOUND = 1e-5
ANGULAR_BOUND = 1e-5


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "exact"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10000

    from nbody3d_tpu.config import SimConfig
    from nbody3d_tpu.engine import Simulation

    if mode == "jnp":
        config = SimConfig(backend="jnp")
    elif mode in ("pm", "p3m"):
        # grid=64 suits N=16k (the default 128 is mesh-fixed-cost bound
        # at this body count: ~250 ms/step vs 21); deliberately a HARD
        # config for P3M — at grid=64 every tile overflows the neighbor
        # budget on the Plummer core, exercising the mutual-k truncation.
        config = SimConfig(method=mode, pm_grid=64)
    else:
        config = SimConfig(backend="pallas", force_mode=mode, morton_every=64)
    sim = Simulation.from_preset("plummer", config, n=n)

    d0 = sim.diagnostics()
    e0 = float(d0.total_energy)
    p0 = np.asarray(d0.momentum)
    l0 = np.asarray(d0.angular_momentum)
    t0 = time.perf_counter()
    sim.run(steps, chunk=min(1000, steps))
    elapsed = time.perf_counter() - t0
    d1 = sim.diagnostics()
    e1 = float(d1.total_energy)
    p1 = np.asarray(d1.momentum)
    l1 = np.asarray(d1.angular_momentum)

    drift = abs((e1 - e0) / e0)
    # conservation scales: total |m v| and total |m r x v|
    pm, vel, _ = sim.arrays()
    pscale = float(np.abs(pm[:, 3:4] * vel[:, :3]).sum())
    lvec = np.cross(pm[:, :3].astype(np.float64), vel[:, :3].astype(np.float64))
    lscale = float(np.abs(pm[:, 3:4].astype(np.float64) * lvec).sum())
    mom_err = float(np.abs(p1 - p0).max() / max(pscale, 1e-30))
    ang_err = float(np.abs(l1 - l0).max() / max(lscale, 1e-30))
    out = {
        "mode": mode,
        "n": n,
        "steps": steps,
        "energy_initial": e0,
        "energy_final": e1,
        "energy_drift_rel": drift,
        "momentum_err_rel": mom_err,
        "angular_momentum_err_rel": ang_err,
        "elapsed_s": round(elapsed, 2),
        "gints_per_s": round(sim.pair_interactions_per_step * steps / elapsed / 1e9, 2),
        "pass_energy_1e-3": drift <= ENERGY_BOUND,
        "pass_momentum_1e-5": mom_err <= MOMENTUM_BOUND,
        "pass_angular_1e-5": ang_err <= ANGULAR_BOUND,
        "pass": (
            drift <= ENERGY_BOUND
            and mom_err <= MOMENTUM_BOUND
            and ang_err <= ANGULAR_BOUND
        ),
    }
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
