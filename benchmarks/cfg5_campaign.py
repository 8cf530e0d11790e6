#!/usr/bin/env python
"""Config-5 (10M sharded) bits x probes x batch-size campaign.

Round-3 VERDICT #2: the 10M roofline said single-chip headroom is
recall-priced (query_size) and named hash bits the untried knob.  This
campaign measures that claim with ONE corpus + ONE cached ground truth,
sweeping:

* hash bits (``NLSH_CFG5C_BITS``, default "14,16") — +2 bits = 4x
  smaller mean bucket = 4x fewer candidates at equal probes;
* probe count (``NLSH_CFG5C_PROBES``, default "8,16,32") — the
  recall/candidates frontier at each partition granularity;
* serving batch size (``NLSH_CFG5C_QBATCH``, default 16384, 0 = skip)
  — the grouped engine pays ~4.5 us per distinct probed (bucket,
  block) cell, so query multiplicity amortises the group floor
  linearly; production serving batches are the other single-chip
  lever.

One JSON line per measured point.  Reuses the config-5 workload
protocol byte-for-byte (``configs.config_5``: seed-0 clustered
deep-image-96 shape, 131k subset fit, balance lambda 1.5) so rows are
comparable with RESULTS.md's round-3 5b row.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/cfg5_campaign.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CACHE_DIR, _wait_for_backend
from benchmarks.configs import (_measure, _train, deepimage96_workload,
                                measure_qps_batch)


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    _wait_for_backend(float(os.environ.get("NLSH_BENCH_INIT_WAIT", 7200)))
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.ops.knn import knn, self_knn
    from nlsh_tpu.parallel import ShardedIndexer, make_mesh

    n_corpus = int(os.environ.get("NLSH_CFG5C_N", 10_000_000))
    bits_list = [int(b) for b in
                 os.environ.get("NLSH_CFG5C_BITS", "14,16").split(",")]
    probes_list = [int(p) for p in
                   os.environ.get("NLSH_CFG5C_PROBES", "8,16,32").split(",")]
    qbatch = int(os.environ.get("NLSH_CFG5C_QBATCH", 16_384))
    qbatch_probes = int(os.environ.get("NLSH_CFG5C_QBATCH_PROBES", 16))
    engine = os.environ.get("NLSH_CFG5C_ENGINE", "pallas-grouped")
    # byte-sensitivity probe: f32 doubles streamed bytes vs bf16 and
    # int8 halves them — if qps_batch holds across dtypes, the
    # big-batch regime is still group-floor-bound and narrower layouts
    # buy only HBM footprint (bf16@10M = 2.7 GB, int8 = 1.35 GB)
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32,
             "int8": jnp.int8}[
        os.environ.get("NLSH_CFG5C_DTYPE", "bf16")]

    dim, n_test = 96, 2000
    rng = np.random.default_rng(0)
    _log(f"generating {n_corpus} x {dim} corpus")
    # the config-5 protocol's cluster model, shared with configs.py so
    # campaign rows stay comparable with the RESULTS.md config-5 rows
    centers, corpus, queries_np = deepimage96_workload(rng, n_corpus,
                                                       n_test=n_test,
                                                       dim=dim)
    queries = jnp.asarray(queries_np)

    # ---- cached exact GT (the expensive device pass at 10M) ----------
    os.makedirs(CACHE_DIR, exist_ok=True)
    gt_path = os.path.join(CACHE_DIR, f"cfg5_gt_n{n_corpus}_d{dim}.npz")
    meta = np.array([0, n_corpus, dim, n_test, 10], np.int64)
    gt = None
    if os.path.exists(gt_path):
        z = np.load(gt_path)
        if np.array_equal(z["meta"], meta):
            gt = z["gt"]
    if gt is None:
        _log("exact GT")
        t0 = time.perf_counter()
        _, gt = knn(queries, jnp.asarray(corpus), k=10, metric="cosine",
                    query_tile=1024, corpus_chunk=131_072)
        gt = np.asarray(jax.block_until_ready(gt))
        _log(f"GT {time.perf_counter() - t0:.0f}s")
        np.savez(gt_path, gt=gt, meta=meta)

    # ---- shared subset-fit data (same rng draw order as config_5) ----
    n_sub = int(os.environ.get("NLSH_CONFIG5_SUB", 131_072))
    sub = rng.choice(n_corpus, n_sub, replace=False)
    subset = corpus[sub]
    knn_path = os.path.join(CACHE_DIR,
                            f"cfg5_subknn_n{n_corpus}_s{n_sub}.npz")
    sub_knn = None
    if os.path.exists(knn_path):
        z = np.load(knn_path)
        if np.array_equal(z["meta"], meta):
            sub_knn = z["knn"]
    if sub_knn is None:
        _log("subset self-kNN")
        sub_knn = np.asarray(self_knn(jnp.asarray(subset), k=20,
                                      metric="cosine"))
        np.savez(knn_path, knn=sub_knn, meta=meta)
    d0 = dim

    class _Sub:
        training = subset
        testing = np.asarray(queries[:256])
        ground_truth = gt[:256]
        training_self_knn = sub_knn
        metric = "cosine"
        prepared = True
        dim = d0

        def load(self):
            return self

    mesh = make_mesh(axis="shard")
    steps = int(os.environ.get("NLSH_CONFIG5_STEPS", 400))
    for bits in bits_list:
        hashing = get_hashing(
            "MultivariateBernoulli", get_encoder("siren", dim, [256, 256]),
            bits)
        state, train_s = _train(hashing, _Sub(), steps=steps,
                                batch_size=2048,
                                cache_tag=f"cfg5c_h{bits}_n{n_corpus}",
                                balance_lambda=1.5, hash_times=10)
        params = state.params["hashing"]
        _log(f"bits={bits}: building sharded index "
             f"({mesh.devices.size} device(s))")
        t0 = time.perf_counter()
        idx = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                             engine=engine, serving_dtype=dtype)
        build_s = time.perf_counter() - t0
        base = {"config": "cfg5_campaign", "n_corpus": int(n_corpus),
                "bits": bits, "engine": engine,
                "dtype": jnp.dtype(dtype).name,
                "n_shards": int(mesh.devices.size),
                "build_s": round(build_s, 1), "train_s": round(train_s, 1)}
        for probes in probes_list:
            m = _measure(
                idx,
                lambda q, p=probes: idx.query_async(
                    q, k=10, hash_times=p, key=jax.random.PRNGKey(1),
                    probe_mode="flip"),
                queries, gt)
            print(json.dumps({**base, "probes": probes, **m}), flush=True)
        if qbatch > n_test:
            # fresh queries from the same cluster model: big-batch
            # serving throughput with no hot-working-set advantage
            mb = measure_qps_batch(idx, centers, rng, qbatch,
                                   qbatch_probes, dim=dim)
            print(json.dumps({**base, "probes": qbatch_probes, **mb}),
                  flush=True)
        del idx
        gc.collect()


if __name__ == "__main__":
    main()
