#!/bin/bash
# Round-3 TPU measurement queue — everything that stacked up while the
# relay was out.  Each item logs to $OUT/<name>.log and the queue keeps
# going past failures; the summary at the end lists per-item exit codes.
#
#   bash benchmarks/tpu_queue_r3.sh [outdir]
#
# Items (see STATUS.md round-3 queue):
#   1. bench.py            — headline sanity (N=256k sym G-int/s)
#   2. mesh_kernel_bench   — mesh tile-kernel stage times + PM/P3M steps
#   3. p3m_grid_sweep 2M   — finer-grid operating points (grid:nbr_k)
#   4. p3m_grid_sweep 16M  — same at the top-end N
#   5. drift_check pm      — re-gate with mesh kernels as default
#   5b. drift_check p3m-periodic — the new torus gate
#   6. drift_check p3m     — re-gate with mesh kernels as default
#   7. drift_check yoshida4 at 10x dt — the 4th-order integrator's pitch
#   8. grad_bench pm/p3m   — grid-solver gradients on the chip
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/tpu_queue_r3}
mkdir -p "$OUT"
declare -A RC

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  RC[$name]=$?
  tail -n 6 "$OUT/$name.log"
  echo "--- $name exit ${RC[$name]}"
}

run bench            1800 python bench.py
run mesh_kernel      3600 python benchmarks/mesh_kernel_bench.py
run sweep_2m         3600 python benchmarks/p3m_grid_sweep.py --n 2097152
run sweep_16m        5400 python benchmarks/p3m_grid_sweep.py --n 16777216
run drift_pm         3600 python benchmarks/drift_check.py pm
run drift_periodic   5400 python benchmarks/drift_check.py p3m-periodic
run drift_p3m        5400 python benchmarks/drift_check.py p3m
run drift_yoshida4   5400 python benchmarks/drift_check.py sym 16384 10000 \
                          --integrator yoshida4 --dt-scale 10
run grad_pm          2400 python benchmarks/grad_bench.py --method pm
run grad_p3m         3600 python benchmarks/grad_bench.py --method p3m

echo "=== queue summary ==="
for k in bench mesh_kernel sweep_2m sweep_16m drift_pm drift_periodic drift_p3m \
         drift_yoshida4 grad_pm grad_p3m; do
  echo "$k: exit ${RC[$k]}"
done
