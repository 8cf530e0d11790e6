#!/usr/bin/env python
"""Non-learned baseline: exact MXU brute-force scan (VERDICT #8).

The reference's recall/QPS yardstick is hnswlib
(``/root/reference/nlsh/trainers/hnsw.py:36-63``); this image has no
hnswlib and no way to install it (no pip, no network egress), so the
honest non-learned baseline on this hardware is the thing a TPU is
actually good at: the exact tiled brute-force kNN on the MXU
(:mod:`nlsh_tpu.ops.knn` — the same kernel that produces ground
truth).  It answers every query at recall 1.0; the learned index's
value is the throughput multiple it buys at its recall operating
point.  Run on the real chip; prints one JSON line.

Scale note: brute force is O(n) per query, the learned index is
O(candidates): at the bench operating point (1.18M rows) the learned
index serves ~4.6k candidates/query — a ~250x compute reduction — so
the gap widens linearly with corpus size (the 10M config cannot be
brute-forced at interactive rates at all).
"""

from __future__ import annotations

import json
import time

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.ops.knn import knn

    rng = np.random.default_rng(bench.SEED)
    corpus_np, queries_np = bench.glove100_workload(rng)
    corpus = jnp.asarray(corpus_np)
    queries = jnp.asarray(queries_np)
    nq = queries.shape[0]

    # same tiling as the GT precompute; one warm-up for compile
    t_compile = time.perf_counter()
    _, ids = knn(queries, corpus, k=bench.K, metric="cosine",
                 query_tile=1024, corpus_chunk=131_072)
    ids = np.asarray(ids)
    compile_s = time.perf_counter() - t_compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, ids = knn(queries, corpus, k=bench.K, metric="cosine",
                     query_tile=1024, corpus_chunk=131_072)
        ids = np.asarray(ids)  # host fetch = the honest timing fence
        times.append(time.perf_counter() - t0)

    qps = nq / min(times)
    print(json.dumps({
        "config": "baseline_exact_bruteforce_1.18M",
        "qps": round(qps, 1),
        "recall_at_10": 1.0,
        "scan_rows_per_query": corpus.shape[0],
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "note": "hnswlib unavailable in image (no pip/network); "
                "exact MXU scan is the non-learned yardstick",
    }))


if __name__ == "__main__":
    main()
