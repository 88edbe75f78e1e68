#!/bin/bash
# Round-3 queue B: mesh tile kernels (fixed layouts) + periodic-gate configs.
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/tpu_queue_r3b}
mkdir -p "$OUT"
declare -A RC
run() { local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  RC[$name]=$?; tail -n 4 "$OUT/$name.log"; echo "--- $name exit ${RC[$name]}"; }

run mesh_kernel      5400 python benchmarks/mesh_kernel_bench.py
run sweep_2m         3600 python benchmarks/p3m_grid_sweep.py --n 2097152
run sweep_16m        5400 python benchmarks/p3m_grid_sweep.py --n 16777216
run drift_pm         3600 python benchmarks/drift_check.py pm
run drift_p3m        5400 python benchmarks/drift_check.py p3m
run drift_per_s30    3600 python benchmarks/drift_check.py p3m-periodic \
                          --sigma-cells 3.0 --nbr-k 64
run drift_per_g128   3600 python benchmarks/drift_check.py p3m-periodic \
                          --grid 128 --sigma-cells 2.5 --nbr-k 64
run grad_pm          2400 python benchmarks/grad_bench.py --method pm
run grad_p3m         3600 python benchmarks/grad_bench.py --method p3m
echo "=== queue summary ==="
for k in mesh_kernel sweep_2m sweep_16m drift_pm drift_p3m drift_per_s30 \
         drift_per_g128 grad_pm grad_p3m; do echo "$k: exit ${RC[$k]}"; done
