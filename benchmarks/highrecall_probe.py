#!/usr/bin/env python
"""High-recall operating points of the headline index (round 3).

The bench headline runs at 16 flip probes (recall ~0.74).  This
measures the SAME trained index at 32/64/96 probes — the operating
points that compare against high-recall baselines (native HNSW,
exact MXU scan) at matched recall rather than matched probe count.
One JSON line per point, same timing methodology as bench.py
(fused one-dispatch program, min over reps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/highrecall_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    HASH_SIZE,
    HASH_TIMES,
    K,
    N_CORPUS,
    SEED,
    TRAIN_CFG,
    TRAIN_SUBSET,
    _BenchData,
    _load_or_compute_gt,
    _load_or_train_params,
    _wait_for_backend,
    glove100_workload,
)
from benchmarks.configs import _one_dispatch_qps


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer
    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.utils.metrics import calculate_recall

    _wait_for_backend(float(os.environ.get("NLSH_BENCH_INIT_WAIT", 240)))
    rng = np.random.default_rng(SEED)
    corpus_np, queries_np = glove100_workload(rng)
    sub_idx = rng.choice(N_CORPUS, TRAIN_SUBSET, replace=False)
    gt, sub_knn, _, _ = _load_or_compute_gt(corpus_np, queries_np, sub_idx)

    enc = get_encoder(TRAIN_CFG["encoder"], corpus_np.shape[1],
                      list(TRAIN_CFG["hidden"]))
    hashing = get_hashing("MultivariateBernoulli", enc, HASH_SIZE)
    data = _BenchData(corpus_np[sub_idx], queries_np[:256], gt[:256],
                      sub_knn, "cosine")
    params, _ = _load_or_train_params(hashing, data)

    corpus = jnp.asarray(corpus_np)
    queries = jnp.asarray(queries_np)
    qkey = jax.random.PRNGKey(SEED + 1)
    mean_bucket = N_CORPUS / hashing.n_buckets
    cap = 1 << int(np.ceil(np.log2(1.2 * mean_bucket)))
    idx = Indexer(hashing, params, corpus, metric="cosine",
                  serving_dtype=jnp.float32, engine="pallas-grouped")
    idx.probe_budget = int(cap)

    last_recall = 0.0
    for probes in (HASH_TIMES, 32, 64, 96):
        t0 = time.perf_counter()
        top, n_cand = idx.query(queries, k=K, hash_times=probes,
                                key=qkey, probe_mode="flip")
        call_s = time.perf_counter() - t0  # includes compile on first
        t0 = time.perf_counter()
        top, n_cand = idx.query(queries, k=K, hash_times=probes,
                                key=qkey, probe_mode="flip")
        call_s = time.perf_counter() - t0
        qps = _one_dispatch_qps(idx, queries, k=K, hash_times=probes,
                                key=qkey, probe_mode="flip")
        recall = float(calculate_recall(gt, top, np.mean))
        print(json.dumps({
            "config": "highrecall_glove100_1.18M",
            "probes": probes,
            "engine": "pallas-grouped",
            "recall_at_10": round(recall, 4),
            "query_size": round(float(np.mean(n_cand)), 1),
            "qps": qps,
            "qps_unpipelined": round(queries.shape[0] / call_s, 1),
        }), flush=True)
        # flip probes at n are a strict superset of n' < n: recall MUST
        # be non-decreasing.  The round-4 2-D-gather miscompile (see
        # serving.py) showed as 0.907 -> 0.355 here — fail loudly.
        if recall < last_recall - 0.005:
            raise AssertionError(
                f"recall fell {last_recall:.4f} -> {recall:.4f} at "
                f"{probes} probes: superset probing cannot lose recall; "
                "suspect an engine miscompile at this batch shape"
            )
        last_recall = recall


if __name__ == "__main__":
    main()
