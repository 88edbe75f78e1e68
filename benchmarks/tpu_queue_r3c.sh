#!/bin/bash
# Round-3 queue C: post-(4,N)-transpose validation on real hardware.
#   1. shipped periodic drift gate (interlaced, sigma_cells=2.0)
#   2. mesh tile kernels end to end (PM/P3M 2M+16M, stage times)
#   3. grad through the grid solvers (crashed pre-fix at 13:07)
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/tpu_queue_r3c}
mkdir -p "$OUT"
declare -A RC
run() { local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  RC[$name]=$?; tail -n 4 "$OUT/$name.log"; echo "--- $name exit ${RC[$name]}"; }

run drift_periodic   3600 python benchmarks/drift_check.py p3m-periodic
run mesh_kernel      3600 python benchmarks/mesh_kernel_bench.py
run grad_pm          2400 python benchmarks/grad_bench.py --method pm
run grad_p3m         3600 python benchmarks/grad_bench.py --method p3m
echo "=== queue summary ==="
for k in drift_periodic mesh_kernel grad_pm grad_p3m; do
  echo "$k: exit ${RC[$k]}"; done
