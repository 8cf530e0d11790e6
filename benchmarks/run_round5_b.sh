#!/bin/bash
# Round-5 TPU measurement campaign B (after campaign A frees the chip),
# ordered by judge priority vs remaining wall-clock:
#   B1. bench.py — driver-artifact fallback refresh + full sweep (r4 #1)
#   B0a. 10M L=2 bf16 ensemble re-run (r4 #2; first attempt lost to a
#        self-inflicted two-campaign HBM contention)
#   B4. trainscale10m — recall vs fit scale at 10M/14-bit (r4 #4);
#       131k:400 baseline already measured by cfg5_campaign r4
#   B5. train_full cosine schedule — overtraining fix re-run (r4 #6)
#   B3. pq_frontier — PQ at 1.18M with flip probes (r4 #8)
#   B2. euclid_probe int8 — sift-1M euclidean int8 rows (r4 #5)
#   B6. cfg5 int8 PER-ROW at 10M/14-bit — the 10M int8 row for r4 #5,
#       directly comparable to r4's global-scale row (recall 0.522)
#   B0b. 10M L=2 int8 ht=16 row (lost to the qbatch OOM; probe hardened)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
A=benchmarks/artifacts

echo "=== B1: bench.py $(date +%T) ==="
NLSH_BENCH_TOTAL_BUDGET=900 NLSH_BENCH_MIN_SWEEP=600 timeout 1200 \
  python bench.py > /tmp/bench_r5.json 2> /tmp/bench_r5.log
echo "rc=$?"

echo "=== B0a: mt10m L=2 bf16 re-run $(date +%T) ==="
NLSH_MT10M_L=2 NLSH_MT10M_DTYPE=bf16 timeout 4500 \
  python benchmarks/mt10m_probe.py >> $A/mt10m_deepimage96.jsonl \
  2> /tmp/mt10m_L2_bf16b.log
echo "rc=$?"

echo "=== B0c: mt10m L=4 bf16 (flat host stack fix) $(date +%T) ==="
NLSH_MT10M_L=4 NLSH_MT10M_DTYPE=bf16 NLSH_MT10M_HT=4,8 timeout 5400 \
  python benchmarks/mt10m_probe.py >> $A/mt10m_deepimage96.jsonl \
  2> /tmp/mt10m_L4_bf16b.log
echo "rc=$?"

echo "=== B4: trainscale10m $(date +%T) ==="
NLSH_TS_GRID=524288:1200,2097152:1200 timeout 10800 \
  python benchmarks/trainscale10m.py \
  > /tmp/trainscale10m.out 2> /tmp/trainscale10m.log
echo "rc=$?"

echo "=== B5: train_full cosine $(date +%T) ==="
timeout 7200 python benchmarks/train_full.py > /tmp/train_full_cos.json \
  2> /tmp/train_full_cos.log
echo "rc=$?"

echo "=== B3: pq frontier $(date +%T) ==="
timeout 5400 python benchmarks/pq_frontier.py > /tmp/pq_frontier.out \
  2> /tmp/pq_frontier.log
echo "rc=$?"

echo "=== B2: euclid int8 $(date +%T) ==="
NLSH_EUCLID_DTYPE=int8 timeout 3600 \
  python benchmarks/euclid_probe.py >> $A/euclid_sift_frontier.jsonl \
  2> /tmp/euclid_int8.log
echo "rc=$?"

echo "=== B6: cfg5 int8 per-row $(date +%T) ==="
NLSH_CFG5C_BITS=14 NLSH_CFG5C_DTYPE=int8 NLSH_CFG5C_PROBES=16,32 \
  timeout 3600 python benchmarks/cfg5_campaign.py \
  >> $A/cfg5_int8.jsonl 2> /tmp/cfg5_int8_perrow.log
echo "rc=$?"

echo "=== B0b: mt10m L=2 int8 ht16 $(date +%T) ==="
NLSH_MT10M_L=2 NLSH_MT10M_DTYPE=int8 NLSH_MT10M_HT=16 timeout 3600 \
  python benchmarks/mt10m_probe.py >> $A/mt10m_deepimage96.jsonl \
  2> /tmp/mt10m_L2_int8b.log
echo "rc=$?"

echo "=== B7: mthr group_q sweep at ht=4 (floor-bound probe) $(date +%T) ==="
for GQ in 16 64; do
  NLSH_GROUP_Q=$GQ NLSH_MTHR_HT=4 timeout 1800 \
    python benchmarks/mt_highrecall.py >> $A/mt_highrecall_glove100.jsonl \
    2> /tmp/mthr_gq$GQ.log
  echo "gq=$GQ rc=$?"
done

echo "=== campaign B done $(date +%T) ==="
