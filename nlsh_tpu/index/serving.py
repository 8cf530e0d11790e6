"""Serving query path: Pallas streaming scores + XLA top-k.

Glue over :mod:`nlsh_tpu.ops.pallas.query_kernel`: extend queries for
the layout's metric, run the fused scoring kernel, select top-k in XLA,
and map sorted positions back to original corpus row ids.  Score order
is exactly the exact-rerank distance order (build-time metric
extension makes score monotone in distance), so results match the
reference semantics whenever ``cap`` covers the largest probed bucket.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nlsh_tpu.ops.pallas.query_kernel import (
    ServingLayout,
    bucket_scores,
    extend_queries,
)

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("k", "interpret"))
def serving_query(
    layout: ServingLayout,
    queries: Array,
    probe_ids: Array,
    probe_valid: Array,
    full_counts: Array,
    k: int,
    interpret: bool | None = None,
) -> tuple[Array, Array, Array]:
    """Answer queries through the Pallas path.

    Args:
      layout: bucket-contiguous serving layout.
      queries: ``(nq, d)`` raw queries.
      probe_ids/probe_valid: deduped multi-probe bucket ids ``(nq, P)``.
      full_counts: ``(n_buckets,)`` UNclamped occupancy (for the
        ``query_size`` metric; the kernel itself clamps at ``cap``).
      k: neighbours.

    Returns ``(topk_ids, topk_scores, n_candidates)`` — ids are original
    corpus rows, ``-1``-padded; scores descend (higher = nearer).
    """
    qe = extend_queries(layout, queries)
    scores, start_pos = bucket_scores(
        layout, qe, probe_ids, probe_valid, interpret=interpret
    )
    nq, n_probes, cap = scores.shape

    flat = scores.reshape(nq, n_probes * cap)
    top_scores, arg = jax.lax.top_k(flat, k)
    probe_of = arg // cap
    lane_of = arg % cap
    pos = jnp.take_along_axis(start_pos, probe_of, axis=1) + lane_of
    pos = jnp.clip(pos, 0, layout.n_rows - 1)
    ids = layout.row_map[pos]  # -1 on alignment padding
    ids = jnp.where(jnp.isfinite(top_scores), ids, -1).astype(jnp.int32)

    safe = jnp.clip(probe_ids, 0, full_counts.shape[0] - 1)
    n_cand = jnp.sum(
        jnp.where(probe_valid, full_counts[safe], 0), axis=1, dtype=jnp.int32
    )
    return ids, top_scores, n_cand
