#!/usr/bin/env python
"""Stage-level timing of the grouped serving path on the real chip.

Times each jitted stage separately (prep / kernel / row-topk / regroup)
so optimisation effort lands on the actual bottleneck.  Relay dispatch
costs ~5-6 ms per call here, so stage times are upper bounds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from perf_probe import (DIM, N_BUCKETS, N_CORPUS, N_PROBES, N_QUERIES,
                        SEED, make_workload)


def timeit(fn, *args, reps=3):
    """Time fn with outputs reduced to ONE scalar on device before the
    host fetch — fetching big intermediates through the relay (~15 MB/s)
    would otherwise dominate the stage time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reduced(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32) if l.dtype != bool else l)
                   for l in leaves)

    float(reduced(*args))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = reduced(*args)
        float(s)
        ts.append(time.perf_counter() - t0)
    return min(ts), fn(*args)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from functools import partial

    from nlsh_tpu.index.bucket_table import build_bucket_table
    from nlsh_tpu.index.serving import _grouped_query_jit
    from nlsh_tpu.ops.pallas.query_kernel import (
        _GROUP_EB, _grouped_prep_v2, _grouped_scores_v3, extend_queries,
        grouped_static_bound, serving_layout, BLOCK_ROWS,
    )

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    dtype = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") \
        else jnp.float32

    rng = np.random.default_rng(SEED)
    corpus, queries, codes, pid, pvalid = make_workload(rng)
    table = build_bucket_table(codes, N_BUCKETS)
    cap = 512
    layout = serving_layout(table, corpus, metric="cosine", cap=cap,
                            dtype=dtype)
    jax.block_until_ready(layout.data)
    max_blocks = cap // BLOCK_ROWS
    E = N_QUERIES * N_PROBES
    g_bound = grouped_static_bound(E, max_blocks, layout.total_blocks, G)
    g_total = -(-g_bound // _GROUP_EB) * _GROUP_EB
    print(f"# G={G} dtype={dtype.__name__} g_total={g_total} "
          f"total_blocks={layout.total_blocks}", file=sys.stderr)

    qe = extend_queries(layout, queries).astype(layout.data.dtype)
    capj = jnp.asarray(cap, jnp.int32)

    prep = jax.jit(partial(_grouped_prep_v2, g_total=g_total,
                           max_blocks=max_blocks, group_q=G))
    t_prep, prep_out = timeit(
        prep, layout.starts, layout.counts, pid, pvalid, qe, capj
    )
    grp_block, grp_qvecs, grp_cnt, ev_row, ev_block, ev_valid = prep_out

    t_kernel, scores = timeit(
        lambda a, b, c: _grouped_scores_v3(a, b, c, interpret=False),
        layout.data, grp_qvecs, grp_block,
    )

    @jax.jit
    def row_topk(scores, grp_cnt):
        lane = jnp.arange(BLOCK_ROWS, dtype=jnp.int32)
        s = jnp.where(lane[None, None, :] < grp_cnt[:, :, None],
                      scores, -jnp.inf)
        return jax.lax.top_k(s.reshape(-1, BLOCK_ROWS), 10)

    t_rowtop, (row_top, row_lane) = timeit(row_topk, scores, grp_cnt)

    @jax.jit
    def regroup(row_top, row_lane, ev_row, ev_valid, ev_block, row_map):
        kk = row_top.shape[1]
        nq = N_QUERIES
        ev_row3 = ev_row.reshape(nq, -1)
        ev_valid2 = ev_valid.reshape(nq, -1)
        safe_rows = jnp.clip(ev_row3, 0, row_top.shape[0] - 1)
        ev_top = jnp.where(ev_valid2[:, :, None], row_top[safe_rows],
                           -jnp.inf)
        flat_top = ev_top.reshape(nq, -1)
        top_scores, arg = jax.lax.top_k(flat_top, 10)
        lane_sel = jnp.take_along_axis(
            row_lane[safe_rows].reshape(nq, -1), arg, axis=1)
        block_sel = jnp.take_along_axis(
            ev_block.reshape(nq, -1), arg // kk, axis=1)
        pos = jnp.clip(block_sel * BLOCK_ROWS + lane_sel,
                       0, row_map.shape[0] - 1)
        return row_map[pos]

    t_regroup, ids = timeit(regroup, row_top, row_lane, ev_row, ev_valid,
                            ev_block, layout.row_map)

    # end-to-end fused for reference
    t_e2e, _ = timeit(
        lambda qs, pi, pv, fc: _grouped_query_jit(
            layout, qs, pi, pv, fc, k=10, g_total=g_total,
            max_blocks=max_blocks, group_q=G, interpret=False),
        queries, pid, pvalid, table.counts,
    )

    print(json.dumps({
        "G": G, "dtype": dtype.__name__, "g_total": int(g_total),
        "prep_ms": round(t_prep * 1e3, 1),
        "kernel_ms": round(t_kernel * 1e3, 1),
        "rowtop_ms": round(t_rowtop * 1e3, 1),
        "regroup_ms": round(t_regroup * 1e3, 1),
        "e2e_ms": round(t_e2e * 1e3, 1),
        "e2e_qps": round(N_QUERIES / t_e2e, 1),
    }), flush=True)
