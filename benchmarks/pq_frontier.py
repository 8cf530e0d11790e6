#!/usr/bin/env python
"""ProductQuantization frontier at headline scale (round-4 VERDICT #8).

The r3 PQ row (0.822 recall @ 5351 candidates on a 200k corpus)
out-recalled the MVB headline at comparable budget but never got the
round-4 playbook: deterministic flip probes, bucket balance, f32
serving, or a frontier at the 1.18M headline corpus.  This script
closes that: train a PQ head (default 12 bits = 3 bands x 4) on the
bench workload protocol (131k subset, cached exact GT), then sweep
per-probe counts through the grouped engine for BOTH probe modes —
the new deterministic band-rank flip probes (models/hashings.py
``ProductQuantization._hash_flip``) and the r3-era band sampling —
producing rows directly comparable to frontier_glove100_*.jsonl.

Reference anchor: the empty stub ``nlsh/hashings.py:142-145`` and the
eval sweep frame ``eval.py:148,196``.

Env: NLSH_PQ_BITS (12), NLSH_PQ_STEPS (1000), NLSH_PQ_HT
("1,2,4,8,16,32,64"), NLSH_PQ_BALANCE (1.5), NLSH_PQ_DTYPE (f32).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/pq_frontier.py
Writes: benchmarks/artifacts/pq_frontier_glove100.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    HASH_TIMES,
    K,
    N_CORPUS,
    SEED,
    TRAIN_CFG,
    TRAIN_SUBSET,
    _BenchData,
    _load_or_compute_gt,
    _wait_for_backend,
    glove100_fresh_pool,
    glove100_workload,
)
from benchmarks.configs import _measure, _train


def main():
    _wait_for_backend(float(os.environ.get("NLSH_BENCH_INIT_WAIT", 7200)))
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer
    from nlsh_tpu.index.indexer import _fused_serve_batched
    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.utils.metrics import calculate_recall

    bits = int(os.environ.get("NLSH_PQ_BITS", 12))
    steps = int(os.environ.get("NLSH_PQ_STEPS", 1000))
    ht_sweep = tuple(int(s) for s in os.environ.get(
        "NLSH_PQ_HT", "1,2,4,8,16,32,64").split(","))
    balance = float(os.environ.get("NLSH_PQ_BALANCE", 1.5))
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
             "int8": jnp.int8}[os.environ.get("NLSH_PQ_DTYPE", "f32")]

    rng = np.random.default_rng(SEED)
    corpus_np, queries_np = glove100_workload(rng)
    sub_idx = rng.choice(N_CORPUS, TRAIN_SUBSET, replace=False)
    gt, sub_knn, _, _ = _load_or_compute_gt(corpus_np, queries_np, sub_idx)

    enc = get_encoder(TRAIN_CFG["encoder"], corpus_np.shape[1],
                      list(TRAIN_CFG["hidden"]))
    hashing = get_hashing("ProductQuantization", enc, bits)
    data = _BenchData(corpus_np[sub_idx], queries_np[:256], gt[:256],
                      sub_knn, "cosine")
    state, train_s = _train(
        hashing, data, steps=steps, batch_size=TRAIN_CFG["batch_size"],
        lr=TRAIN_CFG["learning_rate"],
        cache_tag=f"pqfront_glove100_b{bits}",
        balance_lambda=balance, hash_times=HASH_TIMES,
    )
    params = state.params["hashing"]
    print(f"# trained PQ {bits}-bit ({hashing.n_bands}x"
          f"{hashing.bits_per_band}) in {train_s:.1f}s",
          file=sys.stderr, flush=True)

    corpus = jnp.asarray(corpus_np)
    queries = jnp.asarray(queries_np)
    t0 = time.perf_counter()
    mean_bucket = N_CORPUS / hashing.n_buckets
    cap = 1 << int(np.ceil(np.log2(1.2 * mean_bucket)))
    idx = Indexer(hashing, params, corpus, metric="cosine",
                  engine="pallas-grouped", serving_dtype=dtype,
                  probe_budget=int(cap))
    jax.block_until_ready(idx.layout.data)
    build_s = time.perf_counter() - t0
    print(f"# built in {build_s:.1f}s (cap {cap}, "
          f"{idx.n_buckets_used()} buckets used, "
          f"occ std {idx.occupancy_std():.1f})", file=sys.stderr, flush=True)

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "pq_frontier_glove100.jsonl")
    key = jax.random.PRNGKey(SEED + 1)
    R = int(os.environ.get("NLSH_PQ_R", 8))
    qpool = jnp.asarray(glove100_fresh_pool(R))
    base = {"config": f"pq_glove100_1.18M_b{bits}",
            "n_bands": hashing.n_bands, "bits": bits, "cap": int(cap),
            "balance_lambda": balance,
            "serving_dtype": jnp.dtype(dtype).name,
            "train_s": round(train_s, 1), "build_s": round(build_s, 1)}
    with open(art, "a") as f:
        for mode in ("flip", "sample"):
            for ht in ht_sweep:
                if mode == "flip" and ht > hashing.n_buckets:
                    continue
                m = _measure(
                    idx,
                    lambda q, h=ht, md=mode: idx.query_async(
                        q, k=K, hash_times=h, key=key, probe_mode=md),
                    queries, gt,
                )
                # one-dispatch pipelined number over fresh batches
                bb = lambda: _fused_serve_batched(  # noqa: E731
                    hashing, params, idx.layout, idx.table.counts, qpool,
                    key, k=K, hash_times=ht, probe_mode=mode,
                    grouped="grouped", repeats=R)
                np.asarray(bb())  # compile + warm
                times = []
                for _ in range(6):
                    t1 = time.perf_counter()
                    np.asarray(bb())
                    times.append((time.perf_counter() - t1) / R)
                m["qps_one_dispatch"] = round(
                    queries.shape[0] / min(times), 1)
                m["qps"] = max(m["qps"], m["qps_one_dispatch"])
                row = {**base, "probe_mode": mode, "hash_times": ht, **m}
                f.write(json.dumps(row) + "\n")
                f.flush()
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
