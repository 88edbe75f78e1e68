#!/bin/bash
# Round-5 TPU measurement campaign — run SEQUENTIALLY on an otherwise
# idle host (1 vCPU: concurrent jobs corrupt wall-clock timing).
# Logs to bench_logs_r5/.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_logs_r5
log() { echo "== $1 $(date +%H:%M:%S)"; }

log "bench.py (headline)"
timeout 2400 python bench.py > bench_logs_r5/bench.json 2> bench_logs_r5/bench.err
tail -1 bench_logs_r5/bench.json

log "sym_profile (step decomposition at 256k)"
timeout 2400 python benchmarks/sym_profile.py > bench_logs_r5/sym_profile.txt 2>&1
tail -20 bench_logs_r5/sym_profile.txt

log "render_bench 16M pallas (default + close-up)"
timeout 3600 python benchmarks/render_bench.py --n 16777216 --resolve pallas --reps 2 \
  > bench_logs_r5/render16m.txt 2>&1
tail -4 bench_logs_r5/render16m.txt

log "render_bench 500k (reference UI max)"
timeout 1200 python benchmarks/render_bench.py --resolve pallas --reps 2 \
  > bench_logs_r5/render500k.txt 2>&1
tail -4 bench_logs_r5/render500k.txt

log "serve_bench N=40,002 direct sym"
timeout 2400 python benchmarks/serve_bench.py --seconds 30 \
  > bench_logs_r5/serve40k.json 2> bench_logs_r5/serve40k.err
tail -1 bench_logs_r5/serve40k.json

log "serve_bench N=2M PM (pallas resolve)"
timeout 3600 python benchmarks/serve_bench.py --method pm --n 2097152 \
  --steps-per-frame 5 --resolve pallas --seconds 45 \
  > bench_logs_r5/serve2m.json 2> bench_logs_r5/serve2m.err
tail -1 bench_logs_r5/serve2m.json

log "analyze_bench 16M"
timeout 5400 python benchmarks/analyze_bench.py \
  > bench_logs_r5/analyze16m.txt 2>&1
tail -8 bench_logs_r5/analyze16m.txt

log "p3m_bench 2M sanity (single-chip path unchanged)"
timeout 2400 python benchmarks/p3m_bench.py --ns 2097152 --steps 5 --skip-accuracy \
  > bench_logs_r5/p3m2m.txt 2>&1
tail -4 bench_logs_r5/p3m2m.txt

log "done"
