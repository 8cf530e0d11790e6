#!/usr/bin/env python
"""Stage-timed config-5 probe: find where the sharded build spends time
at multi-million rows on the real chip.

Usage: python benchmarks/cfg5_probe.py [n_corpus]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _t(msg, t0):
    print(f"[{time.perf_counter() - t0:8.1f}s] {msg}", flush=True)


def main():
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.parallel import ShardedIndexer, make_mesh

    dim, n_test = 96, 2000
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8192, dim)).astype(np.float32)
    assign = rng.integers(0, 8192, size=n_corpus + n_test)
    pts = centers[assign] + 0.3 * rng.normal(
        size=(n_corpus + n_test, dim)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    corpus, queries = pts[:n_corpus], jnp.asarray(pts[n_corpus:])
    _t("workload generated", t0)

    hashing = get_hashing(
        "MultivariateBernoulli", get_encoder("siren", dim, [256, 256]), 14
    )
    params = hashing.init(jax.random.PRNGKey(0))
    mesh = make_mesh(axis="shard")

    # stage the ShardedIndexer constructor by hand
    dev = jnp.asarray(corpus)
    jax.block_until_ready(dev)
    _t("corpus upload", t0)

    idx = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                         engine="pallas-grouped",
                         serving_dtype=jnp.bfloat16)
    jax.block_until_ready(idx.row_ids)
    _t(f"bucket tables (budget {idx.probe_budget})", t0)

    idx._build_layouts()
    _t("serving layouts", t0)

    key = jax.random.PRNGKey(1)
    r = idx.query_async(queries, k=10, hash_times=10, key=key)
    top, ncand = idx.fetch(r)
    _t("first query (compile)", t0)

    times = []
    for _ in range(3):
        s = time.perf_counter()
        outs = [idx.query_async(queries, k=10, hash_times=10, key=key)
                for _ in range(4)]
        for o in outs:
            idx.fetch(o)
        times.append((time.perf_counter() - s) / 4)
    print(f"qps {n_test / min(times):,.0f}  mean_cand {ncand.mean():.0f}",
          flush=True)
    _t("done", t0)


if __name__ == "__main__":
    main()
