#!/usr/bin/env python
"""Phase-timed breakdown of the large-corpus (config 5) index build.

The 10M single-chip build measured 257 s (RESULTS.md round 3); this
separates its phases — synthetic gen (untimed), chunked host-corpus
hashing (uploads the corpus once), host CSR, host layout permute
(numpy), and the device upload of the finished layout — so the next
optimisation targets the real bottleneck instead of a guess.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
         NLSH_BUILD_PROBE_N=4000000 python benchmarks/build_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _wait_for_backend
    from nlsh_tpu.index.indexer import hash_corpus_host
    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.native import build_csr as build_csr_host
    from nlsh_tpu.ops.pallas.query_kernel import (
        _br,
        aligned_rows,
        layout_arrays_host,
        round_cap,
    )

    _wait_for_backend(float(os.environ.get("NLSH_BENCH_INIT_WAIT", 240)))
    n = int(os.environ.get("NLSH_BUILD_PROBE_N", 4_000_000))
    dim, bits = 96, 14
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8192, dim)).astype(np.float32)
    corpus = centers[rng.integers(0, 8192, n)] + 0.3 * rng.normal(
        size=(n, dim)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)

    hashing = get_hashing(
        "MultivariateBernoulli", get_encoder("siren", dim, [256, 256]), bits
    )
    params = hashing.init(jax.random.PRNGKey(0))

    t = {}
    t0 = time.perf_counter()
    codes = hash_corpus_host(hashing, params, corpus)
    t["hash_s"] = time.perf_counter() - t0  # corpus upload + SIREN fwd

    t0 = time.perf_counter()
    row_ids, starts, counts = build_csr_host(codes, hashing.n_buckets)
    t["csr_s"] = time.perf_counter() - t0

    br = _br(128)
    cap = round_cap(int(counts.max()), br)
    n_aligned = -(-aligned_rows(counts, cap, align=br) // br) * br
    t0 = time.perf_counter()
    data, row_map, astarts, norms = layout_arrays_host(
        row_ids, starts, counts, corpus, cap=cap, n_aligned=n_aligned,
        metric="cosine", dtype=jnp.bfloat16, align=br,
    )
    t["layout_np_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    dev = jnp.asarray(data)
    jax.block_until_ready(dev)
    t["layout_upload_s"] = time.perf_counter() - t0
    gb = data.nbytes / 1e9

    print(json.dumps({
        "config": "build_probe", "n": n, "dim": dim, "bits": bits,
        **{k: round(v, 1) for k, v in t.items()},
        "corpus_gb": round(corpus.nbytes / 1e9, 2),
        "layout_gb": round(gb, 2),
        "upload_gbps": round(gb / t["layout_upload_s"], 2),
    }))


if __name__ == "__main__":
    main()
