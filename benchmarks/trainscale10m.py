#!/usr/bin/env python
"""Recall vs TRAINING SCALE at 10M, 14 bits (round-4 VERDICT #4).

The cfg5 operating point (recall 0.556 @ 14 bits) is fit on a 131k
subset x 400 steps — 1.3% of the corpus.  The r4 16-bit control
(524k x 1200) was never run at the operative 14 bits, so whether the
10M recall ceiling is training-bound is unmeasured.  This campaign
holds the serving protocol fixed (config-5 workload byte-for-byte:
seed-0 clustered deep-image-96 shape, cached exact GT, balance 1.5,
flip probes, bf16 grouped engine) and sweeps ONLY the fit scale:

    subset rows x train steps, default 131072:400, 524288:1200,
    2097152:1200   (NLSH_TS_GRID="rows:steps,...")

Self-kNN for the big subsets runs through train_full's resumable
sliced helper (one ~1-min device call per 131k slice, checkpointed to
disk) so a mid-campaign crash resumes instead of restarting.

Reference anchor: the training loop ``nlsh/trainers/base.py:36-115``;
scale axis ``nlsh/data.py:204-209``.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/trainscale10m.py
Writes: benchmarks/artifacts/trainscale10m.jsonl (+ stdout rows)
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
from benchmarks.train_full import _self_knn_sliced


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    _wait_for_backend(float(os.environ.get("NLSH_BENCH_INIT_WAIT", 7200)))
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.ops.knn import knn
    from nlsh_tpu.parallel import ShardedIndexer, make_mesh

    n_corpus = int(os.environ.get("NLSH_TS_N", 10_000_000))
    bits = int(os.environ.get("NLSH_TS_BITS", 14))
    grid = [tuple(int(x) for x in cell.split(":")) for cell in
            os.environ.get("NLSH_TS_GRID",
                           "131072:400,524288:1200,2097152:1200"
                           ).split(",")]
    probes_list = [int(p) for p in
                   os.environ.get("NLSH_TS_PROBES", "16,32").split(",")]
    qbatch = int(os.environ.get("NLSH_TS_QBATCH", 16_384))
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32,
             "int8": jnp.int8}[os.environ.get("NLSH_TS_DTYPE", "bf16")]

    dim, n_test = 96, 2000
    rng = np.random.default_rng(0)
    _log(f"generating {n_corpus} x {dim} corpus")
    centers, corpus, queries_np = deepimage96_workload(rng, n_corpus,
                                                       n_test=n_test,
                                                       dim=dim)
    queries = jnp.asarray(queries_np)

    # cached exact GT — same key as cfg5_campaign / mt10m_probe
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
        _, gt = knn(queries, jnp.asarray(corpus), k=10, metric="cosine",
                    query_tile=1024, corpus_chunk=131_072)
        gt = np.asarray(jax.block_until_ready(gt))
        np.savez(gt_path, gt=gt, meta=meta)

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "trainscale10m.jsonl")
    mesh = make_mesh(axis="shard")
    d0 = dim
    # subsets drawn sequentially from the post-workload rng: the FIRST
    # (131k) draw replays cfg5_campaign's, sharing its cached self-kNN
    for n_sub, steps in grid:
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
            _log(f"subset self-kNN ({n_sub} rows, sliced/resumable)")
            t0 = time.perf_counter()
            sub_knn = _self_knn_sliced(
                subset, k=20, metric="cosine",
                cache_tag=f"ts10m_s{n_sub}")
            _log(f"self-kNN {time.perf_counter() - t0:.0f}s")
            np.savez(knn_path, knn=sub_knn, meta=meta)

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

        hashing = get_hashing(
            "MultivariateBernoulli",
            get_encoder("siren", dim, [256, 256]), bits)
        state, train_s = _train(
            hashing, _Sub(), steps=steps, batch_size=2048,
            cache_tag=f"ts10m_h{bits}_n{n_corpus}_sub{n_sub}",
            balance_lambda=1.5, hash_times=10)
        params = state.params["hashing"]
        del subset, sub_knn
        gc.collect()

        _log(f"sub={n_sub} steps={steps}: building index")
        t0 = time.perf_counter()
        idx = ShardedIndexer(hashing, params, corpus, mesh,
                             metric="cosine", engine="pallas-grouped",
                             serving_dtype=dtype)
        build_s = time.perf_counter() - t0
        base = {"config": "trainscale10m", "n_corpus": int(n_corpus),
                "bits": bits, "n_sub": int(n_sub), "steps": int(steps),
                "dtype": jnp.dtype(dtype).name,
                "build_s": round(build_s, 1), "train_s": round(train_s, 1)}
        with open(art, "a") as f:
            for probes in probes_list:
                m = _measure(
                    idx,
                    lambda q, p=probes: idx.query_async(
                        q, k=10, hash_times=p, key=jax.random.PRNGKey(1),
                        probe_mode="flip"),
                    queries, gt)
                row = {**base, "probes": probes, **m}
                f.write(json.dumps(row) + "\n")
                f.flush()
                print(json.dumps(row), flush=True)
            if qbatch > n_test:
                mb = measure_qps_batch(idx, centers, rng, qbatch, 16,
                                       dim=dim)
                row = {**base, "probes": 16, **mb}
                f.write(json.dumps(row) + "\n")
                f.flush()
                print(json.dumps(row), flush=True)
        del idx
        gc.collect()


if __name__ == "__main__":
    main()
