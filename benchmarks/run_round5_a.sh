#!/bin/bash
# Round-5 TPU measurement campaign A (VERDICT r4 tasks 2+3), run
# sequentially so only one process owns the chip at a time:
#   1-2. 10M deep-image-96 ensemble frontier, L=2, bf16 + int8 stacked
#        layouts (benchmarks/mt10m_probe.py; GT/params cached in /tmp)
#   3-4. 1.18M L=8 high-recall ensemble dtype rows, bf16 + int8
#        (benchmarks/mt_highrecall.py; params committed in bench_cache)
#   5.   10M L=4 bf16 (fresh L=4 subset fit)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
A=benchmarks/artifacts

echo "=== step 1: mt10m L=2 bf16 $(date +%T) ==="
NLSH_MT10M_L=2 NLSH_MT10M_DTYPE=bf16 timeout 5400 \
  python benchmarks/mt10m_probe.py >> $A/mt10m_deepimage96.jsonl \
  2> /tmp/mt10m_L2_bf16.log
echo "rc=$?"

echo "=== step 2: mt10m L=2 int8 $(date +%T) ==="
NLSH_MT10M_L=2 NLSH_MT10M_DTYPE=int8 timeout 5400 \
  python benchmarks/mt10m_probe.py >> $A/mt10m_deepimage96.jsonl \
  2> /tmp/mt10m_L2_int8.log
echo "rc=$?"

echo "=== step 3: mthr bf16 $(date +%T) ==="
NLSH_MTHR_DTYPE=bfloat16 timeout 5400 \
  python benchmarks/mt_highrecall.py >> $A/mt_highrecall_glove100.jsonl \
  2> /tmp/mthr_bf16.log
echo "rc=$?"

echo "=== step 4: mthr int8 $(date +%T) ==="
NLSH_MTHR_DTYPE=int8 timeout 5400 \
  python benchmarks/mt_highrecall.py >> $A/mt_highrecall_glove100.jsonl \
  2> /tmp/mthr_int8.log
echo "rc=$?"

echo "=== step 5: mt10m L=4 bf16 $(date +%T) ==="
NLSH_MT10M_L=4 NLSH_MT10M_DTYPE=bf16 timeout 7200 \
  python benchmarks/mt10m_probe.py >> $A/mt10m_deepimage96.jsonl \
  2> /tmp/mt10m_L4_bf16.log
echo "rc=$?"

echo "=== campaign A done $(date +%T) ==="
