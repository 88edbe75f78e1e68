"""BASELINE acceptance check: energy drift over 10k steps (<= 1e-3).

Runs the N=16k Plummer validation config (BASELINE config #2) for 10,000
steps at the reference dt/G and reports relative energy drift and momentum
error for the requested force mode.

Usage: python benchmarks/drift_check.py [exact|fast|jnp] [n] [steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "exact"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10000

    from nbody3d_tpu.config import SimConfig
    from nbody3d_tpu.engine import Simulation

    if mode == "jnp":
        config = SimConfig(backend="jnp")
    else:
        config = SimConfig(backend="pallas", force_mode=mode)
    sim = Simulation.from_preset("plummer", config, n=n)

    d0 = sim.diagnostics()
    e0 = float(d0.total_energy)
    p0 = np.asarray(d0.momentum)
    t0 = time.perf_counter()
    sim.run(steps, chunk=min(1000, steps))
    elapsed = time.perf_counter() - t0
    d1 = sim.diagnostics()
    e1 = float(d1.total_energy)
    p1 = np.asarray(d1.momentum)

    drift = abs((e1 - e0) / e0)
    # momentum scale: total |m v|
    pm, vel, _ = sim.arrays()
    pscale = float(np.abs(pm[:, 3:4] * vel[:, :3]).sum())
    out = {
        "mode": mode,
        "n": n,
        "steps": steps,
        "energy_initial": e0,
        "energy_final": e1,
        "energy_drift_rel": drift,
        "momentum_err_rel": float(np.abs(p1 - p0).max() / max(pscale, 1e-30)),
        "elapsed_s": round(elapsed, 2),
        "gints_per_s": round(sim.pair_interactions_per_step * steps / elapsed / 1e9, 2),
        "pass_1e-3": drift <= 1e-3,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
