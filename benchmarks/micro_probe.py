#!/usr/bin/env python
"""Micro-benchmarks of the XLA ops inside the grouped serving path.

Each op timed with outputs reduced to one scalar on device (the relay
fetch would otherwise dominate).  Dispatch costs ~5-6 ms/call — listed
times include it once.
"""

from __future__ import annotations

import json
import time

import numpy as np

E = 160_000        # probe events (10k queries x 16 probes)
G = 64
G_TOTAL = 21_272   # groups (static bound at the bench point)
BR = 128
D_PAD = 128
NQ = 10_000


def t(fn, *args, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reduced(*a):
        out = fn(*a)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    float(reduced(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(reduced(*args))
        ts.append(time.perf_counter() - t0)
    return round(min(ts) * 1e3, 1)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 4096, E).astype(np.int32))
    scores = jnp.asarray(rng.normal(size=(G_TOTAL * G, BR)).astype(np.float32))
    qtab = jnp.asarray(rng.normal(size=(NQ, D_PAD)).astype(np.float32))
    qidx = jnp.asarray(rng.integers(0, NQ, (G_TOTAL, G)).astype(np.int32))
    ev_rows = jnp.asarray(
        rng.integers(0, G_TOTAL * G, (NQ, 64)).astype(np.int32))

    out = {
        "argsort_160k_ms": t(lambda k: jnp.argsort(k), keys),
        "sort_160k_ms": t(lambda k: jnp.sort(k), keys),
        "argsort_10k_ms": t(lambda k: jnp.argsort(k[:10_000]), keys),
        "hist_scatter_ms": t(
            lambda k: jnp.zeros((4096,), jnp.int32).at[k].add(1), keys),
        "assoc_scan_ms": t(
            lambda k: jax.lax.associative_scan(jnp.maximum, k), keys),
        "qvec_gather_f32_ms": t(lambda q, i: q[i], qtab, qidx),
        "qvec_gather_bf16_ms": t(
            lambda q, i: q.astype(jnp.bfloat16)[i], qtab, qidx),
        "rowtop_k10_ms": t(lambda s: jax.lax.top_k(s, 10), scores),
        "rowtop_max_ms": t(lambda s: jnp.max(s, axis=1), scores),
        "rowtop_approx_ms": t(
            lambda s: jax.lax.approx_max_k(s, 10), scores),
        "regroup_gather_ms": t(
            lambda s, r: s.reshape(-1, BR)[r], scores, ev_rows),
        "final_topk_ms": t(
            lambda s, r: jax.lax.top_k(
                s.reshape(-1, BR)[r][..., :10].reshape(NQ, -1), 10),
            scores, ev_rows),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
