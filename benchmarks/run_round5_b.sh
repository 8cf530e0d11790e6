#!/bin/bash
# Round-5 TPU measurement campaign B (after campaign A frees the chip):
#   1. bench.py — refresh the committed last_result fallback + full
#      (engine, dtype) sweep with the round-5 code
#   2. euclid_probe int8 — sift-1M euclidean int8 rows (VERDICT #5)
#   3. pq_frontier — PQ at 1.18M with flip probes (VERDICT #8)
#   4. trainscale10m — recall vs fit scale at 10M/14-bit (VERDICT #4)
#   5. train_full cosine schedule — overtraining fix re-run (VERDICT #6)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
A=benchmarks/artifacts

echo "=== B1: bench.py $(date +%T) ==="
NLSH_BENCH_TOTAL_BUDGET=900 NLSH_BENCH_MIN_SWEEP=600 timeout 1200 \
  python bench.py > /tmp/bench_r5.json 2> /tmp/bench_r5.log
echo "rc=$?"

echo "=== B2: euclid int8 $(date +%T) ==="
NLSH_EUCLID_DTYPE=int8 timeout 3600 \
  python benchmarks/euclid_probe.py >> $A/euclid_sift_frontier.jsonl \
  2> /tmp/euclid_int8.log
echo "rc=$?"

echo "=== B3: pq frontier $(date +%T) ==="
timeout 5400 python benchmarks/pq_frontier.py > /tmp/pq_frontier.out \
  2> /tmp/pq_frontier.log
echo "rc=$?"

echo "=== B4: trainscale10m $(date +%T) ==="
timeout 14400 python benchmarks/trainscale10m.py \
  > /tmp/trainscale10m.out 2> /tmp/trainscale10m.log
echo "rc=$?"

echo "=== B5: train_full cosine $(date +%T) ==="
timeout 10800 python benchmarks/train_full.py > /tmp/train_full_cos.json \
  2> /tmp/train_full_cos.log
echo "rc=$?"

echo "=== campaign B done $(date +%T) ==="
