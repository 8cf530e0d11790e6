#!/usr/bin/env python
"""Format benchmarks/artifacts/round3_runs.jsonl as RESULTS.md rows.

Each campaign line (from run_round3.sh) becomes one markdown table row;
later lines for the same config supersede earlier ones (reruns win).
"""

from __future__ import annotations

import json
import sys

LABELS = {
    "1_glove25_100k": ("1", "glove-25-shape 100k, MLP 256x256, 8-bit"),
    "2_sift_1M": ("2", "sift-128-shape 1M, euclidean, 12-bit SIREN"),
    "3_glove100_1.18M": ("3", "glove-100-shape 1.18M, 12-bit SIREN (bench.py)"),
    "4_multitable_L8": ("4", "glove-100-shape 200k, L=8 jointly-trained ensemble"),
    "5_deepimage96_10M_sharded": ("5", "deep-image-96-shape, corpus-sharded"),
    "pq_glove100_200k": ("pq", "glove-100-shape 200k, ProductQuantization 12-bit"),
    "baseline_exact_bruteforce_1.18M": (
        "exact", "non-learned baseline: exact MXU brute force, 1.18M"),
    "baseline_hnsw_native_1CPUcore": (
        "hnsw", "non-learned baseline: native HNSW (M=10, efC=500), 1 CPU core"),
    "highrecall_glove100_1.18M": (
        "3+", "headline index at a higher probe count"),
}


def _fmt_qps(r):
    qps = r.get("qps", r.get("value"))  # bench.py lines use "value"
    per_call = r.get("qps_unpipelined")
    if qps is None:
        return "—"
    s = f"**{qps / 1000:.1f}k**"
    if per_call:
        s += f" ({per_call / 1000:.1f}k/call)"
    return s


def main(path="benchmarks/artifacts/round3_runs.jsonl"):
    rows: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue  # child stdout noise (trainer step logs, waits)
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            key = r.get("config")
            if key is None:
                continue  # probe rows (perf_probe etc.) are not configs
            # config 5 runs twice (2M then 10M): key by size too
            if key == "5_deepimage96_10M_sharded":
                n = r.get("n_corpus") or r.get("n_rows")
                key = f"{key}@{n or len(rows)}"
            # ef / probe sweeps emit one row per operating point
            if "ef" in r:
                key = f"{key}@ef{r['ef']}"
            if "probes" in r:
                key = f"{key}@p{r['probes']}"
            rows[key] = r
    for key, r in rows.items():
        cfg = r.get("config", "?")
        num, label = LABELS.get(cfg, ("?", cfg))
        recall = r.get("recall_at_10", r.get("recall"))
        qsize = r.get("query_size")
        build = r.get("build_s")
        notes = []
        if r.get("engine"):
            notes.append(r["engine"])
        if r.get("ef"):
            notes.append(f"ef={r['ef']}")
        if r.get("probes"):
            notes.append(f"{r['probes']} probes")
        if r.get("train_s"):
            notes.append(f"train {r['train_s']}s")
        if r.get("n_shards"):
            notes.append(f"{r['n_shards']} shard(s)")
        print(f"| {num} | {label} | {recall} | "
              f"{qsize if qsize is not None else '—'} | {_fmt_qps(r)} | "
              f"{build if build is not None else '—'} | "
              f"{', '.join(notes)} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
