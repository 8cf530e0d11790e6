#!/usr/bin/env python
"""Benchmark harness — run on one real TPU chip, print ONE JSON line.

Headline metric (BASELINE.json): query throughput (QPS) on a
glove-100-angular-shaped workload at the reference operating point
(12-bit MultivariateBernoulli + SIREN trunk, multi-probe 10,
exact cosine rerank, k=10), with recall@10 and index build time
reported alongside.  ``vs_baseline`` is QPS / 100_000 — the
north-star ≥100k QPS/chip target (the reference itself publishes no
numbers; see BASELINE.md).

Dataset: ann-benchmarks files are not shipped in this image, so the
workload is synthetic clustered data with the exact glove-100 shape
(1.18M corpus x 100 dims, 10k queries, cosine), with ground truth from
the exact MXU brute-force search.  A short triplet fit on a corpus
subset stands in for the full training run (training quality is
covered by tests; this file measures the serving path).
"""

from __future__ import annotations

import json
import os
import time

# NLSH_EVENT_BLOCK tunes events/program in the serving kernel; the
# default 8 compiles fastest and matches 16 on this workload

import numpy as np

N_CORPUS = 1_183_514  # glove-100-angular training-set size
DIM = 100
N_QUERIES = 10_000
K = 10
HASH_SIZE = 12
HASH_TIMES = 16
TRAIN_SUBSET = 131_072
TRAIN_STEPS = 1000
SEED = 0


class _BenchData:
    """Minimal Dataset-duck for the trainer: a corpus subset with
    self-kNN GT."""

    def __init__(self, training, testing, ground_truth, train_knn, metric):
        self.training = training
        self.testing = testing
        self.ground_truth = ground_truth
        self.training_self_knn = train_knn
        self.metric = metric
        self.prepared = True
        self.dim = training.shape[1]

    def load(self):
        return self


def glove100_workload(rng, n_corpus=N_CORPUS, n_queries=N_QUERIES, dim=DIM):
    """The bench workload: synthetic clustered unit-sphere data with the
    exact glove-100-angular shape (shared with benchmarks/frontier.py
    and benchmarks/train_full.py)."""
    n_clusters = 4096
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n_corpus + n_queries)
    pts = centers[assign] + 0.35 * rng.normal(
        size=(n_corpus + n_queries, dim)
    ).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts[:n_corpus], pts[n_corpus:]


def _relay_roundtrip_ms() -> float:
    """Dispatch+fetch latency of a tiny pre-warmed op (relay health)."""
    import jax.numpy as jnp

    x = jnp.ones((8, 128))
    np.asarray((x + 0.0).sum())  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray((x + 0.0).sum())
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer
    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.ops.knn import knn, self_knn
    from nlsh_tpu.train import TripletTrainer
    from nlsh_tpu.utils.metrics import calculate_recall

    t_start = time.perf_counter()
    rng = np.random.default_rng(SEED)

    corpus_np, queries_np = glove100_workload(rng)
    corpus = jnp.asarray(corpus_np)
    queries = jnp.asarray(queries_np)

    # -- exact ground truth on the MXU ----------------------------------
    # GT and subset self-kNN are deterministic in SEED; cache them on
    # disk — the remote compile helper has multi-minute latency windows
    # (a GT compile was observed at 592 s) and the driver's bench budget
    # is ~8 min.  NLSH_BENCH_GT_CACHE= disables.
    import os

    cache = os.environ.get("NLSH_BENCH_GT_CACHE",
                           "/tmp/nlsh_bench_gt_cache.npz")
    sub_idx = rng.choice(N_CORPUS, TRAIN_SUBSET, replace=False)
    if cache and os.path.exists(cache):
        z = np.load(cache)
        gt, sub_knn = z["gt"], z["sub_knn"]
        subset = corpus_np[sub_idx]
        gt_s = knn_s = 0.0
    else:
        t0 = time.perf_counter()
        _, gt = knn(queries, corpus, k=K, metric="cosine",
                    query_tile=1024, corpus_chunk=131_072)
        gt = np.asarray(jax.block_until_ready(gt))
        gt_s = time.perf_counter() - t0

        subset = corpus_np[sub_idx]
        t0 = time.perf_counter()
        sub_knn = np.asarray(self_knn(jnp.asarray(subset), k=20,
                                      metric="cosine",
                                      query_tile=1024, corpus_chunk=131_072))
        knn_s = time.perf_counter() - t0
        if cache:
            np.savez(cache, gt=gt, sub_knn=sub_knn)

    data = _BenchData(subset, queries_np[:256], gt[:256], sub_knn, "cosine")
    enc = get_encoder("siren", DIM, [256, 256])
    hashing = get_hashing("MultivariateBernoulli", enc, HASH_SIZE)
    trainer = TripletTrainer(hashing, data, "/tmp", margin=0.5, positive_k=20,
                            balance_lambda=1.5)
    t0 = time.perf_counter()
    state = trainer.fit(K=K, batch_size=2048, learning_rate=1e-3,
                        epochs=100, test_every_updates=100_000,
                        max_steps=TRAIN_STEPS, hash_times=HASH_TIMES,
                        seed=SEED)
    train_s = time.perf_counter() - t0
    params = state.params["hashing"]

    # -- index build on the FULL corpus (the build-time metric) ---------
    # bf16 layout: halves streamed bytes; grouped engine runs native
    # bf16 MXU matmuls (recall impact < 1e-3 at this operating point)
    t0 = time.perf_counter()
    indexer = Indexer(hashing, params, corpus, metric="cosine",
                      serving_dtype=jnp.bfloat16)
    jax.block_until_ready(indexer.table.row_ids)
    build_s = time.perf_counter() - t0
    max_bucket = indexer.probe_budget

    # Serving operating point: cap = 1.2x the mean bucket (the sweep
    # showed recall at this cap matches the exact cap to 3 decimals on
    # balance-regularised tables), measured on both serving engines.
    qkey = jax.random.PRNGKey(SEED + 1)
    mean_bucket = N_CORPUS / hashing.n_buckets
    cap = 1 << int(np.ceil(np.log2(1.2 * mean_bucket)))
    sweep = []
    for engine in ("pallas-grouped", "pallas"):
        try:
            indexer.engine = engine
            indexer.probe_budget = int(cap)
            indexer._layout = None  # rebuild serving layout at this cap
            top, n_cand = indexer.query(queries, k=K, hash_times=HASH_TIMES,
                                        key=qkey, probe_mode="flip")  # warm
            # throughput timing: R back-to-back async dispatches with all
            # fetches at the END of the timed region, so the relay's
            # ~5-6 ms per-dispatch/fetch cost overlaps device execution
            # the way a pipelined serving loop would run (per-call-fetch
            # timing is a floor estimate — CLAUDE.md); the per-call
            # number is reported alongside as qps_unpipelined
            from nlsh_tpu.index.indexer import _fused_serve
            grouped = engine == "pallas-grouped"
            R = 4
            times, times1 = [], []
            # 3 reps: the relay has multi-second latency windows and the
            # recorded number is min-of-reps
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [
                    _fused_serve(
                        indexer.hashing, indexer.params, indexer.layout,
                        indexer.table.counts, queries, qkey, k=K,
                        hash_times=HASH_TIMES, probe_mode="flip",
                        grouped=grouped,
                    )
                    for _ in range(R)
                ]
                for o in outs:
                    np.asarray(o)
                times.append((time.perf_counter() - t0) / R)
                t0 = time.perf_counter()
                top, n_cand = indexer.query(
                    queries, k=K, hash_times=HASH_TIMES, key=qkey,
                    probe_mode="flip")
                times1.append(time.perf_counter() - t0)
            sweep.append({
                "engine": engine,
                "cap": int(indexer.layout.cap),
                "qps": N_QUERIES / min(times),
                "qps_unpipelined": N_QUERIES / min(times1),
                "recall": float(calculate_recall(gt, top, np.mean)),
                "query_size": float(np.mean(n_cand)),
            })
        except Exception as e:  # never lose the bench line to one engine
            print(f"{engine} skipped: {e!r}", flush=True)

    if not sweep:
        # both Pallas engines failed: fall back to the XLA gather path
        # so the bench line is degraded, never lost
        indexer.engine = "xla"
        top, n_cand = indexer.query(queries, k=K, hash_times=HASH_TIMES,
                                    key=qkey, probe_mode="flip")
        t0 = time.perf_counter()
        top, n_cand = indexer.query(queries, k=K, hash_times=HASH_TIMES,
                                    key=qkey, probe_mode="flip")
        sweep.append({
            "engine": "xla-fallback",
            "cap": int(indexer.probe_budget),
            "qps": N_QUERIES / (time.perf_counter() - t0),
            "recall": float(calculate_recall(gt, top, np.mean)),
            "query_size": float(np.mean(n_cand)),
        })
    exact_recall = max(s["recall"] for s in sweep)
    eligible = [s for s in sweep if s["recall"] >= exact_recall - 0.01]
    best = max(eligible, key=lambda s: s["qps"])

    result = {
        "metric": "qps_glove100_shape_1.18M_recall_constrained",
        "value": round(best["qps"], 1),
        "unit": "queries/s",
        "vs_baseline": round(best["qps"] / 100_000, 4),
        "recall_at_10": round(best["recall"], 4),
        "query_size": round(best["query_size"], 1),
        "cap": best["cap"],
        "max_bucket": int(max_bucket),
        "cap_sweep": [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in s.items()} for s in sweep
        ],
        "build_s": round(build_s, 2),
        "train_s": round(train_s, 1),
        "gt_s": round(gt_s, 1),
        "subset_knn_s": round(knn_s, 1),
        "total_s": round(time.perf_counter() - t_start, 1),
        "backend": jax.default_backend(),
        # dispatch+fetch round-trip of a pre-compiled trivial op: the
        # environment's relay has degraded windows (measured 2 ms to
        # >200 s for the same op) that directly inflate every timed
        # region — read QPS against this
        "relay_roundtrip_ms": _relay_roundtrip_ms(),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
