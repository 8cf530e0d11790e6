#!/usr/bin/env python
"""Stage-level profile of the multi-table serving path (config 4).

Fabricates an L=8 ensemble over a 200k x 100 corpus with near-uniform
buckets (what balance-regularised training produces — mean ~195 rows,
multinomial std) so the serving structure matches config 4 without the
~150 s training run, then times each stage of the windowed/grouped
engines on the real chip: probe-to-prep, kernel, postlude, end-to-end.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mt_probe.py
Env: NLSH_GROUP_Q, NLSH_MT_SYNC_BOUND, NLSH_BLOCK_ROWS as usual.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N, D, L, NB, NQ, K = 200_000, 100, 8, 1024, 10_000, 10


def fence(x):
    return np.asarray(x)


def timeit(fn, reps=5):
    fence(fn())  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index.bucket_table import build_bucket_table
    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.parallel.multitable import MultiTableIndexer, init_multi_table

    rng = np.random.default_rng(0)
    corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    queries = jnp.asarray(rng.normal(size=(NQ, D)).astype(np.float32))

    hashing = get_hashing(
        "MultivariateBernoulli", get_encoder("siren", D, [128, 128]), 10
    )
    params = init_multi_table(hashing, L, jax.random.PRNGKey(0))
    # fabricate near-uniform tables (balance-trained shape) in place;
    # one indexer per engine — layout alignment is engine-specific
    bids = rng.integers(0, NB, size=(L, N)).astype(np.int32)
    tabs = [build_bucket_table(jnp.asarray(b), NB) for b in bids]

    def make(engine):
        m = MultiTableIndexer(hashing, params, corpus, metric="cosine",
                              serving_dtype=jnp.bfloat16, engine=engine)
        m.row_ids = jnp.stack([t.row_ids for t in tabs])
        m.starts = jnp.stack([t.starts for t in tabs])
        m.counts = jnp.stack([t.counts for t in tabs])
        m.probe_budget = int(np.asarray(m.counts).max())
        m._stacked = None
        return m

    mt = make("pallas-windowed")
    mt_g = make("pallas-grouped")

    # size-matched probes: one bucket per table per query (hash_times=1)
    pids = jnp.asarray(rng.integers(0, NB, size=(L, NQ, 1)).astype(np.int32))
    pvalid = jnp.ones((L, NQ, 1), bool)

    out = {"group_q": os.environ.get("NLSH_GROUP_Q", "32"),
           "sync": os.environ.get("NLSH_MT_SYNC_BOUND", "1")}

    # -- end-to-end serving dispatch (windowed vs grouped) ---------------
    for engine, m in (("pallas-windowed", mt), ("pallas-grouped", mt_g)):
        t = timeit(lambda m=m, e=engine: m._query_serving(
            queries, pids, pvalid, K, e)[0])
        out[f"e2e_{engine}_ms"] = round(t * 1e3, 1)
        out[f"e2e_{engine}_qps"] = round(NQ / t, -2)

    # -- stage split for the windowed engine -----------------------------
    from nlsh_tpu.index.serving import extend_queries
    from nlsh_tpu.ops.pallas.query_kernel import (
        _GROUP_EB, GROUP_W, _br, _windowed_prep, _windowed_scores_topk,
        windowed_exact_bound, windowed_static_bound,
    )

    data, row_map, astarts, norms, cap, align, n_aligned, total_blocks = (
        mt._build_stacked()
    )
    br = _br(mt.block_rows)
    layout = mt._flat_layout(data, row_map, astarts, norms, mt.counts, cap,
                             align, n_aligned, total_blocks, mt.metric,
                             block_rows=br)
    nq = NQ
    gp = (jnp.moveaxis(pids, 0, 1)
          + (jnp.arange(L, dtype=jnp.int32) * NB)[None, :, None])
    gv = jnp.moveaxis(pvalid, 0, 1)
    gp = gp.reshape(nq, L)
    gv = gv.reshape(nq, L)
    G = int(os.environ.get("NLSH_GROUP_Q", GROUP_W))
    max_sub = layout.cap // br + 1
    g_static = windowed_static_bound(nq * L, max_sub, layout.n_rows // br, G)
    g_exact = windowed_exact_bound(
        np.asarray(layout.starts), np.asarray(layout.counts),
        np.asarray(gp), np.asarray(gv), layout.cap, G, block_rows=br,
    )
    out.update(cap=int(layout.cap), max_sub=int(max_sub),
               windows=int(layout.n_rows // br),
               g_static=int(g_static), g_exact=int(g_exact))

    # queries stay f32 regardless of layout dtype — same as the shipped
    # serving path (single-row dynamic VMEM loads only lower for f32)
    qe = extend_queries(layout, queries)
    for name, g_tot in (("static", g_static), ("exact", g_exact)):
        g_total = -(-max(g_tot, 1) // _GROUP_EB) * _GROUP_EB

        def prep():
            r = _windowed_prep(layout.starts, layout.counts, gp, gv, qe,
                               jnp.asarray(layout.cap, jnp.int32),
                               g_total=g_total, max_sub=max_sub, group_q=G,
                               block_rows=br)
            return r[0]

        out[f"prep_{name}_ms"] = round(timeit(prep) * 1e3, 1)
        pr = _windowed_prep(layout.starts, layout.counts, gp, gv, qe,
                            jnp.asarray(layout.cap, jnp.int32),
                            g_total=g_total, max_sub=max_sub, group_q=G,
                            block_rows=br)
        grp_window, grp_qvecs, grp_lo, grp_hi = pr[0], pr[1], pr[2], pr[3]

        def kern():
            # r4: returns ONE packed (g, G, PACK_W) panel (scores+lanes)
            return _windowed_scores_topk(
                layout.data, layout.norms, grp_qvecs, grp_window, grp_lo,
                grp_hi, has_norms=layout.norms is not None, interpret=False,
                kk=K, block_rows=br,
            )

        out[f"kernel_{name}_ms"] = round(timeit(kern) * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
