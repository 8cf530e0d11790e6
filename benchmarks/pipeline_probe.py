#!/usr/bin/env python
"""Measure how much of the fused serving call is relay overhead.

Compares (a) per-call fetch timing — what bench.py r1 did — against
(b) pipelined timing: R back-to-back dispatches, one fetch per result
at the END of the timed region, total/R per call.  Async dispatch lets
the relay's ~5-6 ms per-call cost overlap device execution, so (b) is
the truer device throughput (CLAUDE.md: per-call QPS numbers are floor
estimates).
"""

from __future__ import annotations

import json
import time

import numpy as np

from benchmarks.perf_probe import make_workload, N_QUERIES, DIM, N_CORPUS, K, N_PROBES


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer
    from nlsh_tpu.index.indexer import _fused_serve
    from nlsh_tpu.models import get_encoder, get_hashing

    rng = np.random.default_rng(0)
    corpus, queries, codes, pid, pvalid = make_workload(rng)
    enc = get_encoder("siren", DIM, [256, 256])
    hashing = get_hashing("MultivariateBernoulli", enc, 12)
    params = hashing.init(jax.random.PRNGKey(0))
    idx = Indexer(hashing, params, corpus, metric="cosine",
                  serving_dtype=jnp.bfloat16)
    cap = 1 << int(np.ceil(np.log2(1.2 * N_CORPUS / 4096)))
    idx.probe_budget = cap
    idx._layout = None
    layout = idx.layout
    key = jax.random.PRNGKey(1)

    def call():
        return _fused_serve(hashing, params, layout, idx.table.counts,
                            queries, key, k=K, hash_times=N_PROBES,
                            probe_mode="flip", grouped=True)

    np.asarray(call())  # compile + warm

    # (a) per-call fetch
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(call())
        times.append(time.perf_counter() - t0)
    per_call = min(times)

    # (b) pipelined: R dispatches, fetch all at the end
    for R in (2, 4, 8):
        t0 = time.perf_counter()
        outs = [call() for _ in range(R)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / R
        print(json.dumps({"mode": f"pipelined_R{R}",
                          "ms_per_call": round(dt * 1e3, 1),
                          "qps": round(N_QUERIES / dt, 1)}), flush=True)

    print(json.dumps({"mode": "per_call_fetch",
                      "ms_per_call": round(per_call * 1e3, 1),
                      "qps": round(N_QUERIES / per_call, 1)}), flush=True)


if __name__ == "__main__":
    main()
