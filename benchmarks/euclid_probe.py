#!/usr/bin/env python
"""Euclidean (config 2) recall/candidates frontier — round-4 VERDICT #3.

Round 3 left sift-128-shape at recall@10 0.575 (query_size 3450) with
NONE of the quality work the cosine headline got.  This trains the
config-2 model WITH the cosine playbook (balance regulariser, flip-
probe training draws) and sweeps deterministic flip probes over the
trained index, printing one JSON line per operating point — the
matched-candidate comparison against the round-3 row.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/euclid_probe.py
Env: NLSH_CONFIG2_BITS / NLSH_CONFIG2_BL forwarded to the shared
trainer; NLSH_EUCLID_PROBES overrides the sweep list.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.configs import _data, _one_dispatch_qps, _train


def main():
    import jax
    import jax.numpy as jnp

    from bench import _wait_for_backend
    from nlsh_tpu.index import Indexer
    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.ops.knn import self_knn
    from nlsh_tpu.utils.metrics import calculate_recall

    _wait_for_backend(float(os.environ.get("NLSH_BENCH_INIT_WAIT", 240)))
    data = _data("sift", 1_000_000, 10_000, 128, "euclidean")
    rng = np.random.default_rng(0)
    sub = rng.choice(data.training.shape[0], 131_072, replace=False)
    subset = data.training[sub]
    sub_knn = np.asarray(self_knn(jnp.asarray(subset), k=20,
                                  metric="euclidean"))
    d0 = data.dim

    class _Sub:
        training = subset
        testing = data.testing[:256]
        ground_truth = data.ground_truth[:256]
        training_self_knn = sub_knn
        metric = "euclidean"
        prepared = True
        dim = d0

        def load(self):
            return self

    bits = int(os.environ.get("NLSH_CONFIG2_BITS", 12))
    bl = float(os.environ.get("NLSH_CONFIG2_BL", 1.5))
    hashing = get_hashing(
        "MultivariateBernoulli",
        get_encoder("siren", data.dim, [256, 256]), bits
    )
    state, train_s = _train(hashing, _Sub(), steps=400, batch_size=2048,
                            cache_tag=f"cfg2_sift_h{bits}" if bits != 12
                            else "cfg2_sift",
                            balance_lambda=bl, hash_times=16)
    print(f"train_s {train_s:.1f} bits {bits} bl {bl}",
          file=sys.stderr, flush=True)

    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    gt = np.asarray(data.ground_truth)
    key = jax.random.PRNGKey(1)
    # round 5: int8 euclidean layouts exist (per-row scales by default)
    # — NLSH_EUCLID_DTYPE=int8 measures the capacity knob on sift-shape
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
             "int8": jnp.int8}[os.environ.get("NLSH_EUCLID_DTYPE", "f32")]
    i8scale = os.environ.get("NLSH_EUCLID_I8SCALE", "per_row")
    idx = Indexer(hashing, state.params["hashing"], corpus,
                  metric="euclidean", serving_dtype=dtype,
                  engine="pallas-grouped", int8_scale=i8scale)
    probe_list = [int(p) for p in os.environ.get(
        "NLSH_EUCLID_PROBES", "4,8,16,32").split(",")]
    for probes in probe_list:
        top, n_cand = idx.query(queries, k=10, hash_times=probes,
                                key=key, probe_mode="flip")  # compile+warm
        t0 = time.perf_counter()
        top, n_cand = idx.query(queries, k=10, hash_times=probes,
                                key=key, probe_mode="flip")
        call_s = time.perf_counter() - t0
        qps = _one_dispatch_qps(idx, queries, k=10, hash_times=probes,
                                key=key, probe_mode="flip")
        print(json.dumps({
            "config": "euclid_sift_1M",
            "bits": bits, "balance_lambda": bl, "probes": probes,
            "serving_dtype": jnp.dtype(dtype).name,
            "int8_scale": i8scale if jnp.dtype(dtype) == jnp.int8
            else None,
            "recall_at_10": round(
                float(calculate_recall(gt[:, :10], top, np.mean)), 4),
            "query_size": round(float(np.mean(n_cand)), 1),
            "qps": qps,
            "qps_unpipelined": round(queries.shape[0] / call_s, 1),
            "train_s": round(train_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
