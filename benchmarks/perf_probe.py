#!/usr/bin/env python
"""Serving-path perf probe — kernel iteration WITHOUT retraining.

Synthesizes the bench.py operating point directly (bucket occupancy +
probe multiplicity distributions of the trained, balance-regularised
table) so serving-engine changes can be measured on the real chip in
~1 min instead of re-running the 4-min training bench.

Workload: 1.18M x 100 cosine corpus, 4096 buckets with Dirichlet-sized
occupancies (max/mean ~2, like the trained table), 10k queries x 16
distinct probes.  Prints one JSON line per (engine, dtype) combination:
QPS, streamed-bytes estimate, achieved GB/s.

Usage:
    python benchmarks/perf_probe.py [engines...] [--dtype bf16|f32|both]
    python benchmarks/perf_probe.py pallas pallas-grouped --dtype bf16
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_CORPUS = 1_183_514
DIM = 100
N_QUERIES = 10_000
N_BUCKETS = 4096
N_PROBES = 16
K = 10
SEED = 0


def make_workload(rng, skew: str = "trained", n_corpus: int = N_CORPUS):
    import jax.numpy as jnp

    corpus = rng.normal(size=(n_corpus, DIM)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(N_QUERIES, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # bucket sizes ~ Dirichlet(20): std/mean ~0.22, max/mean ~2 — the
    # shape of the balance-regularised trained table (bench r1: mean
    # 289, max 589).  --skew high: Dirichlet(0.3) — max/mean ~15-30,
    # an UNregularised trained table, where every uniform-cap engine
    # pays the giant buckets' cap on every probe — the workload that
    # retired the byte-proportional "compact" engine: the grouped
    # engine's exact host bound + event grouping won it 6.3x, because
    # serve time is per-group overhead, not streamed bytes
    alpha = {"trained": 20.0, "high": 0.3}[skew]
    probs = rng.dirichlet(np.full(N_BUCKETS, alpha))
    codes = rng.choice(N_BUCKETS, size=n_corpus, p=probs).astype(np.int32)

    # probes: a query's probe set is biased toward populous buckets the
    # same way flip-probing around a hard code is (popular regions get
    # probed more): sample WITH the occupancy distribution, dedupe
    pid = rng.choice(N_BUCKETS, size=(N_QUERIES, N_PROBES), p=probs)
    pid = np.sort(pid, axis=1).astype(np.int32)
    pvalid = np.concatenate(
        [np.ones((N_QUERIES, 1), bool), pid[:, 1:] != pid[:, :-1]], axis=1
    )
    return (jnp.asarray(corpus), jnp.asarray(queries),
            jnp.asarray(codes), jnp.asarray(pid), jnp.asarray(pvalid))


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index.bucket_table import build_bucket_table
    from nlsh_tpu.ops.pallas.query_kernel import serving_layout
    from nlsh_tpu.index import serving

    args = sys.argv[1:]
    dtype_arg = "both"
    if "--dtype" in args:
        i = args.index("--dtype")
        dtype_arg = args[i + 1]
        args = args[:i] + args[i + 2:]
    skew = "trained"
    if "--skew" in args:
        i = args.index("--skew")
        skew = args[i + 1]
        args = args[:i] + args[i + 2:]
    engines = args or ["pallas", "pallas-grouped"]
    dtypes = {"bf16": [jnp.bfloat16], "f32": [jnp.float32],
              "both": [jnp.float32, jnp.bfloat16]}[dtype_arg]

    rng = np.random.default_rng(SEED)
    # high skew: cap-aligned layouts cost n_buckets*cap rows (every
    # bucket consumes a whole max-bucket-sized slot) — at 1.18M rows
    # that is ~17 GB > HBM, so the skew probe runs at 400k where the
    # same engine comparison fits the chip
    n_corpus = 400_000 if skew == "high" else N_CORPUS
    corpus, queries, codes, pid, pvalid = make_workload(
        rng, skew, n_corpus=n_corpus)
    table = build_bucket_table(codes, N_BUCKETS)
    counts_np = np.asarray(table.counts)
    mean_bucket = n_corpus / N_BUCKETS
    if skew == "high":
        # exact reference semantics on a skewed table: cap = max bucket
        # — the operating point where uniform-cap engines bleed padding
        cap = 1 << int(np.ceil(np.log2(max(counts_np.max(), 2))))
    else:
        cap = 1 << int(np.ceil(np.log2(1.2 * mean_bucket)))
    print(f"# max bucket {counts_np.max()}, mean {mean_bucket:.0f}, "
          f"cap {cap}", file=sys.stderr, flush=True)

    # candidates actually probed (for the achieved-GB/s estimate)
    probed = np.where(np.asarray(pvalid),
                      np.minimum(counts_np[np.asarray(pid)], cap), 0)
    total_rows = int(probed.sum())

    fns = {
        "pallas": serving.serving_query,
        "pallas-grouped": serving.serving_query_grouped,
    }

    for dtype in dtypes:
        t0 = time.perf_counter()
        layout = serving_layout(table, corpus, metric="cosine", cap=cap,
                                dtype=dtype)
        jax.block_until_ready(layout.data)
        layout_s = time.perf_counter() - t0
        dname = "bf16" if dtype == jnp.bfloat16 else "f32"
        bpe = 2 if dtype == jnp.bfloat16 else 4

        for engine in engines:
            fn = fns[engine]
            try:
                ids, scores, ncand = fn(layout, queries, pid, pvalid,
                                        table.counts, k=K)
                np.asarray(ids)  # force fetch (block_until_ready lies here)
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    ids, scores, ncand = fn(layout, queries, pid, pvalid,
                                            table.counts, k=K)
                    np.asarray(ids)
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                # bytes actually needed (occupancy-proportional, layout
                # dtype); fixed-cap engines stream more
                gb = total_rows * layout.d_pad * bpe / 1e9
                print(json.dumps({
                    "engine": engine, "dtype": dname, "cap": int(layout.cap),
                    "skew": skew,
                    "qps": round(N_QUERIES / dt, 1),
                    "ms": round(dt * 1e3, 1),
                    "useful_gb": round(gb, 2),
                    "useful_gbps": round(gb / dt, 1),
                    "mean_cand": round(float(np.asarray(ncand).mean()), 1),
                    "layout_s": round(layout_s, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"engine": engine, "dtype": dname,
                                  "error": repr(e)}), flush=True)


def indexer_mode():
    """Time the full Indexer.query surface (hash + serve fused) the way
    bench.py measures it."""
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer
    from nlsh_tpu.models import get_encoder, get_hashing

    rng = np.random.default_rng(SEED)
    corpus, queries, codes, pid, pvalid = make_workload(rng)
    enc = get_encoder("siren", DIM, [256, 256])
    hashing = get_hashing("MultivariateBernoulli", enc, 12)
    params = hashing.init(jax.random.PRNGKey(0))
    for dtype in (jnp.bfloat16,):
        idx = Indexer(hashing, params, corpus, metric="cosine",
                      serving_dtype=dtype)
        cap = 1 << int(np.ceil(np.log2(1.2 * N_CORPUS / 4096)))
        for engine in ("pallas-grouped", "pallas"):
            idx.engine = engine
            idx.probe_budget = cap
            idx._layout = None
            key = jax.random.PRNGKey(1)
            top, ncand = idx.query(queries, k=K, hash_times=N_PROBES,
                                   key=key, probe_mode="flip")
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                top, ncand = idx.query(queries, k=K, hash_times=N_PROBES,
                                       key=key, probe_mode="flip")
                times.append(time.perf_counter() - t0)
            print(json.dumps({
                "mode": "indexer", "engine": engine,
                "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
                "cap": cap, "qps": round(N_QUERIES / min(times), 1),
                "ms": round(min(times) * 1e3, 1),
                "mean_cand": round(float(ncand.mean()), 1),
            }), flush=True)


if __name__ == "__main__":
    if "indexer" in sys.argv[1:]:
        indexer_mode()
    else:
        main()
