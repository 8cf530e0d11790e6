#!/usr/bin/env python
"""10M-scale ensemble probe (round 4).

The 10M single-table frontier tops out at recall 0.693 @ 52.7k QPS
(32 probes, 16k batches — RESULTS.md cfg5 campaign).  The 1.18M
ensemble measurement showed L independent learned partitions beat one
table's flip probes at every matched candidate budget (6x fewer
candidates at recall 0.95), so this probes the same lever at 10M:
an L=2 jointly-trained ensemble, bf16 stacked layout (L=8 f32 would
be 40 GB; L=2 bf16 is 5.1 GB + the 3.8 GB device corpus), per-table
flip probes, config-5 workload protocol byte-for-byte (same cluster
model, same cached exact GT, same 131k subset fit).

Env: NLSH_MT10M_L (default 2), NLSH_MT10M_BITS (14), NLSH_MT10M_HT
("4,8,16"), NLSH_MT10M_DTYPE (bf16), NLSH_MT10M_QBATCH (16384, 0=off),
NLSH_MT10M_N (10_000_000), NLSH_MT10M_ENGINE (pallas-windowed).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mt10m_probe.py
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
from benchmarks.configs import _measure, _train, deepimage96_workload


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    _wait_for_backend(float(os.environ.get("NLSH_BENCH_INIT_WAIT", 7200)))
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.ops.knn import knn, self_knn
    from nlsh_tpu.parallel import MultiTableIndexer
    from nlsh_tpu.parallel.multitable import _fused_mt_serve_batched

    n_corpus = int(os.environ.get("NLSH_MT10M_N", 10_000_000))
    L = int(os.environ.get("NLSH_MT10M_L", 2))
    bits = int(os.environ.get("NLSH_MT10M_BITS", 14))
    ht_sweep = tuple(int(s) for s in
                     os.environ.get("NLSH_MT10M_HT", "4,8,16").split(","))
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32,
             "int8": jnp.int8}[os.environ.get("NLSH_MT10M_DTYPE", "bf16")]
    qbatch = int(os.environ.get("NLSH_MT10M_QBATCH", 16_384))
    engine = os.environ.get("NLSH_MT10M_ENGINE", "pallas-windowed")

    dim, n_test = 96, 2000
    rng = np.random.default_rng(0)
    _log(f"generating {n_corpus} x {dim} corpus")
    centers, corpus, queries_np = deepimage96_workload(rng, n_corpus,
                                                       n_test=n_test,
                                                       dim=dim)
    queries = jnp.asarray(queries_np)

    # cached exact GT / subset self-kNN — same keys as cfg5_campaign so
    # the two probes share the expensive 10M device passes
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

    steps = int(os.environ.get("NLSH_CONFIG5_STEPS", 400))
    hashing = get_hashing(
        "MultivariateBernoulli", get_encoder("siren", dim, [256, 256]),
        bits)
    state, train_s = _train(hashing, _Sub(), steps=steps, batch_size=2048,
                            cache_tag=f"mt10m_h{bits}_n{n_corpus}",
                            balance_lambda=1.5, hash_times=10, n_tables=L)
    params = state.params["hashing"]
    del subset, sub_knn
    gc.collect()

    _log(f"building L={L} x {n_corpus} ensemble ({jnp.dtype(dtype).name})")
    t0 = time.perf_counter()
    idx = MultiTableIndexer(hashing, params, corpus, metric="cosine",
                            engine=engine, serving_dtype=dtype)
    jax.block_until_ready(idx.row_ids)
    build_s = time.perf_counter() - t0
    lay = idx._serving_layout()
    jax.block_until_ready(lay.data)
    _log(f"built in {time.perf_counter() - t0:.1f}s "
         f"(layout {lay.data.nbytes / 2**30:.2f} GiB)")

    key = jax.random.PRNGKey(1)
    base = {"config": f"mt10m_L{L}_b{bits}", "n_corpus": int(n_corpus),
            "n_tables": L, "hash_size": bits, "probe_mode": "flip",
            "engine": engine, "serving_dtype": jnp.dtype(dtype).name,
            "train_s": round(train_s, 1), "build_s": round(build_s, 1)}
    for ht in ht_sweep:
        if engine == "pallas-windowed":
            g_cal = idx.calibrate(queries, hash_times=ht,
                                  probe_mode="flip")
            _log(f"ht={ht}: calibrated group bound {g_cal}")
        m = _measure(
            idx,
            lambda q, h=ht: idx.query_async(q, k=10, hash_times=h, key=key,
                                            probe_mode="flip"),
            queries, gt,
        )
        m["query_size"] = round(float(np.mean(
            idx.exact_query_size(queries, hash_times=ht, key=key,
                                 probe_mode="flip")
        )), 1)
        # the big-batch block can OOM at high ht x L (observed: ht=16
        # L=2 windowed at 16k x 4 repeats) — never lose the already-
        # measured small-batch row to it
        try:
            _qbatch_block = qbatch > n_test and \
                jax.default_backend() == "tpu"
        except Exception:
            _qbatch_block = False
        if _qbatch_block:
          try:  # noqa: E999 indent — guarded big-batch block
            # fresh 16k-query batches from the same cluster model: the
            # production-batch lever (cfg5 finding) on the ensemble
            R2 = int(os.environ.get("NLSH_MT10M_QBATCH_R", 4))
            from benchmarks.configs import deepimage96_points

            pool = jnp.asarray(np.stack([
                deepimage96_points(centers, rng, qbatch, dim=dim)
                for _ in range(R2)
            ]))
            if engine == "pallas-windowed":
                g_cal = idx.calibrate(pool[0], hash_times=ht,
                                      probe_mode="flip")
                _log(f"ht={ht} qbatch={qbatch}: group bound {g_cal}")
            bb = lambda: _fused_mt_serve_batched(  # noqa: E731
                idx.hashing, idx.params, idx._serving_layout(), pool,
                key, k=10, hash_times=ht, engine=engine,
                n_rows=idx.corpus.shape[0], repeats=R2,
                g_override=idx._g_cal, probe_mode="flip",
            )
            np.asarray(bb())  # compile + warm
            times = []
            for _ in range(6):
                t1 = time.perf_counter()
                np.asarray(bb())
                times.append((time.perf_counter() - t1) / R2)
            m["qbatch"] = qbatch
            m["qps_batch"] = round(qbatch / min(times), 1)
            m["qps"] = max(m["qps"], m["qps_batch"])
          except Exception as e:  # OOM etc: keep the small-batch row
            _log(f"ht={ht}: big-batch block failed: {e!r}")
        print(json.dumps({**base, "hash_times": ht, **m}), flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
