#!/bin/bash
# Round-3 measurement campaign: run every BASELINE config + the exact
# brute-force baseline sequentially on the real chip, appending one
# JSON line each to benchmarks/artifacts/round3_runs.jsonl.
# Usage: bash benchmarks/run_round3.sh [keys...]   (default: all)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=benchmarks/artifacts/round3_runs.jsonl
# headline (3) and the round-2 gap (4) first: if the chip window is
# short, the highest-stakes numbers are already recorded
KEYS=${@:-"3 4 1 2 pq exact skew highrecall hnsw 5"}
for key in $KEYS; do
  echo "=== config $key $(date +%H:%M:%S) ===" >&2
  if [ "$key" = exact ]; then
    timeout 1500 python benchmarks/baseline_exact.py >> "$OUT" 2> >(tail -5 >&2)
  elif [ "$key" = highrecall ]; then
    # the headline index at 32/64/96 probes: matched-recall comparison
    # points against the HNSW/exact baselines
    timeout 1500 python benchmarks/highrecall_probe.py >> "$OUT" 2> >(tail -3 >&2)
  elif [ "$key" = hnsw ]; then
    # VERDICT #8: the reference's non-learned yardstick at full scale
    # (in-repo native backend; ~19 min single-core build at 1.18M)
    timeout 2400 python benchmarks/baseline_hnsw.py >> "$OUT" 2> >(tail -3 >&2)
  elif [ "$key" = skew ]; then
    # high-skew engine comparison (the measurement that retired the
    # compact engine: grouped won its design point 6x)
    timeout 1500 python benchmarks/perf_probe.py pallas pallas-grouped \
      --dtype bf16 --skew high >> "$OUT" 2> >(tail -5 >&2)
  elif [ "$key" = 5 ]; then
    # 2M single-chip point first (bounded), then full 10M
    NLSH_CONFIG5_N=2000000 timeout 2400 python benchmarks/configs.py 5 >> "$OUT" 2> >(tail -5 >&2)
    timeout 3600 python benchmarks/configs.py 5 >> "$OUT" 2> >(tail -5 >&2)
  else
    timeout 2400 python benchmarks/configs.py "$key" >> "$OUT" 2> >(tail -5 >&2)
  fi
  echo "=== done $key rc=$? $(date +%H:%M:%S) ===" >&2
done
