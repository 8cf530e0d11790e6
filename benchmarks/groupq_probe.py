#!/usr/bin/env python
"""GROUP_Q sweep at high probe counts (round 4).

The grouped engine's group count is ~ E/G + probed_blocks.  G=32 won
the bench point (events/bucket ~39), but at 64/96 probes events/bucket
reaches ~150-230, where doubling G halves the group table — and serve
time is ~linear in it.  One JSON line per (probes, G) point.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/groupq_probe.py
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


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer
    from nlsh_tpu.index.serving import serving_query_grouped
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
    key = jax.random.PRNGKey(SEED + 1)
    idx = Indexer(hashing, params, corpus, metric="cosine",
                  serving_dtype=jnp.float32, engine="pallas-grouped")
    idx.probe_budget = 512
    lay = idx.layout

    for probes in (16, 64, 96):
        pid, pv = hashing.hash(params, queries, n_probes=probes,
                               probe_mode="flip")
        for G in (32, 64, 128):
            def serve():
                return serving_query_grouped(
                    lay, queries, pid, pv, idx.table.counts, k=K,
                    group_q=G,
                )
            ids, _, n_cand = serve()  # compile + warm
            ids = np.asarray(ids)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                r = serve()
                np.asarray(r[0])
                times.append(time.perf_counter() - t0)
            print(json.dumps({
                "config": "groupq_glove100_1.18M",
                "probes": probes, "group_q": G,
                "recall_at_10": round(
                    float(calculate_recall(gt, ids, np.mean)), 4),
                "qps_unpipelined": round(
                    queries.shape[0] / min(times), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
