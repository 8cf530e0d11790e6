"""Fused multi-probe scoring kernel (Pallas, TPU).

The XLA row-gather that dominates the pure-jnp query path runs ~25x
below HBM bandwidth: candidate rows are scattered 400-byte reads.  This
kernel removes the scatter at its source:

* **Build time** (:func:`serving_layout`): corpus rows are *physically
  permuted into bucket order* and metric-extended, so every bucket is
  one contiguous block of HBM.  Cosine rows are L2-normalised (score =
  q.c ranks by cosine distance); euclidean rows gain a ||c||^2 feature
  with query feature -1 scaled by 2 elsewhere (score = 2q.c - ||c||^2
  ranks by negative squared L2).  Higher score == nearer, uniformly.
* **Query time** (:func:`bucket_scores`): one Pallas program per query
  streams its probed buckets' blocks HBM->VMEM with double-buffered
  async DMA (256 KB contiguous copies at full bandwidth, next probe's
  DMA in flight while the current block is on the MXU) and emits masked
  scores ``(nq, n_probes, cap)``.  Bucket starts/counts ride in SMEM via
  scalar prefetch.

Top-k selection and id mapping stay in XLA (cheap on dense arrays):
see ``nlsh_tpu.index.serving``.

Falls back to interpreter mode off-TPU so the same code path is
testable on the CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANE = 128  # TPU lane width; feature dim padded to a multiple


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_pytree_node_class
class ServingLayout(NamedTuple):
    """Bucket-contiguous, metric-extended corpus for the serving path.

    Every bucket's block starts at a tile-aligned offset (``align``
    rows) so the kernel's DMA starts are provably aligned; ``row_map``
    maps aligned positions back to original corpus rows (-1 on the
    alignment padding).  A pytree: array leaves (data, row_map, starts,
    counts); ``cap``/``d_pad``/``align``/``metric`` are static aux.
    """

    data: Array        # (n_aligned, d_pad) — bucket-major, aligned
    row_map: Array     # (n_aligned,) i32 — aligned pos -> corpus row, -1 pad
    starts: Array      # (n_buckets,) i32 — ALIGNED bucket offsets
    counts: Array      # (n_buckets,) i32
    cap: int           # static per-probe block size (rows per DMA)
    d_pad: int         # padded feature width
    align: int         # start alignment in rows (sublane tile)
    metric: str

    @property
    def n_rows(self) -> int:
        return self.row_map.shape[0]

    def tree_flatten(self):
        return (
            (self.data, self.row_map, self.starts, self.counts),
            (self.cap, self.d_pad, self.align, self.metric),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def serving_layout(table, corpus: Array, metric: str = "cosine",
                   cap: int | None = None,
                   dtype=jnp.float32) -> ServingLayout:
    """Build the serving layout from a CSR bucket table.

    ``cap`` is the per-probe DMA block size: buckets larger than ``cap``
    are truncated at query time (the recall/bandwidth knob); default is
    the max bucket size rounded up to the f32 sublane multiple (exact).

    ``dtype=jnp.bfloat16`` halves the streamed bytes (≈2x QPS) at the
    cost of bf16 rerank precision — rank flips only among candidates
    whose distances differ below bf16 resolution.
    """
    n, d = corpus.shape
    if cap is None:
        cap = int(table.max_count())
    sublane = 16 if dtype == jnp.bfloat16 else 8
    cap = max(_round_up(cap, sublane), sublane)
    # Buckets are aligned to whole cap-sized blocks so the auto-pipelined
    # kernel can fetch bucket blocks through BlockSpec index maps
    # (block index = start / cap); costs <= cap-1 pad rows per bucket.
    align = cap

    if metric == "cosine":
        norms = jnp.linalg.norm(corpus, axis=1, keepdims=True)
        ext = corpus / jnp.maximum(norms, 1e-12)
    elif metric in ("euclidean", "sq_euclidean"):
        sq = jnp.sum(corpus * corpus, axis=1, keepdims=True)
        ext = jnp.concatenate([corpus, sq], axis=1)
    else:
        raise ValueError(f"unsupported serving metric {metric!r}")

    d_ext = ext.shape[1]
    d_pad = _round_up(d_ext, LANE)

    # Aligned bucket offsets: each bucket block rounded up to `align`
    # rows so every DMA start is provably tile-aligned (≤ align-1 pad
    # rows per bucket; padding rows map to -1 and score -inf via counts).
    counts = table.counts
    aligned_sizes = ((counts + align - 1) // align) * align
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(aligned_sizes, dtype=jnp.int32)[:-1]]
    )
    n_aligned = int(jnp.sum(aligned_sizes)) + cap  # + cap: clamp slack

    # aligned position of each bucket-sorted row
    i = jnp.arange(n, dtype=jnp.int32)
    bucket_of = (
        jnp.searchsorted(table.starts, i, side="right").astype(jnp.int32) - 1
    )
    aligned_pos = aligned_starts[bucket_of] + (i - table.starts[bucket_of])

    sorted_ext = jnp.take(ext, table.row_ids, axis=0)
    data = jnp.zeros((n_aligned, d_pad), dtype)
    data = data.at[aligned_pos, :d_ext].set(sorted_ext.astype(dtype))
    row_map = jnp.full((n_aligned,), -1, jnp.int32)
    row_map = row_map.at[aligned_pos].set(table.row_ids)
    return ServingLayout(
        data=data, row_map=row_map, starts=aligned_starts,
        counts=counts, cap=cap, d_pad=d_pad, align=align, metric=metric,
    )


def extend_queries(layout: ServingLayout, queries: Array) -> Array:
    """Metric-extend and pad queries to match :func:`serving_layout`."""
    nq, d = queries.shape
    if layout.metric == "cosine":
        norms = jnp.linalg.norm(queries, axis=1, keepdims=True)
        ext = queries / jnp.maximum(norms, 1e-12)
    else:
        ext = jnp.concatenate(
            [2.0 * queries, -jnp.ones((nq, 1), queries.dtype)], axis=1
        )
    # queries stay f32 regardless of layout dtype: single-row dynamic
    # loads in the kernel require f32, and the streamed (big) side is
    # the corpus — bf16 there is where the bandwidth win lives
    out = jnp.zeros((nq, layout.d_pad), jnp.float32)
    return out.at[:, : ext.shape[1]].set(ext.astype(jnp.float32))


def _score_kernel(starts_ref, counts_ref, q_ref, corpus_ref, out_ref,
                  scratch, sems, *, n_probes: int, cap: int, align: int,
                  q_block: int):
    """One program per ``q_block`` queries: double-buffered probe-block
    streaming.  Batching queries per program amortises the fixed
    per-program cost (grid bookkeeping, output pipeline) that dominates
    when every program is a single tiny matvec.

    starts/counts: (nq*P,) flat SMEM scalar-prefetch (1-D avoids the
    lane padding that blows the SMEM budget on 2-D operands);
    q (nq, d_pad) VMEM (whole chunk resident — callers chunk queries to
    a few MB); corpus (n_aligned, d_pad) HBM; out (q_block, P, cap) VMEM;
    scratch (n_buf, cap, d_pad) VMEM; sems DMA x n_buf.
    """
    i = pl.program_id(0)
    n_buf = scratch.shape[0]
    n_steps = q_block * n_probes  # probe slots handled by this program

    def block_dma(slot, step):
        start = pl.multiple_of(starts_ref[i * n_steps + step], align)
        return pltpu.make_async_copy(
            corpus_ref.at[pl.ds(start, cap)],
            scratch.at[slot],
            sems.at[slot],
        )

    # warm the pipeline n_buf deep
    for w in range(min(n_buf, n_steps)):
        block_dma(w, w).start()

    def body(step, _):
        slot = step % n_buf
        qb = step // n_probes
        p = step % n_probes
        block_dma(slot, step).wait()
        # (cap, d_pad) x (d_pad, 1) -> (cap,) on the MXU (2-D rhs: Mosaic
        # has no matvec lowering; block upcast to f32 keeps HBM traffic
        # at the layout dtype while the MXU runs a uniform-dtype matmul)
        q_col = q_ref[i * q_block + qb, :].reshape(q_ref.shape[1], 1)
        scores = jnp.dot(
            scratch[slot].astype(jnp.float32), q_col,
            preferred_element_type=jnp.float32,
        )[:, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
        masked = jnp.where(
            lane < counts_ref[i * n_steps + step], scores, -jnp.inf
        )
        out_ref[qb, p, :] = masked

        # refill this slot only after its block has been consumed
        # (n_buf - 1 other DMAs stay in flight during the compute)
        @pl.when(step + n_buf < n_steps)
        def _():
            block_dma(slot, step + n_buf).start()

        return 0

    jax.lax.fori_loop(0, n_steps, body, 0, unroll=False)


_N_BUF = 4   # DMA pipeline depth
_Q_BLOCK = 8  # queries per program (amortises per-program fixed cost)


@partial(jax.jit, static_argnames=("cap", "n_probes", "align", "interpret"))
def _bucket_scores_impl(data, queries_ext, starts, counts,
                        cap: int, n_probes: int, align: int, interpret: bool):
    nq = queries_ext.shape[0]
    d_pad = queries_ext.shape[1]

    q_block = _Q_BLOCK
    pad = (-nq) % q_block
    if pad:
        queries_ext = jnp.pad(queries_ext, ((0, pad), (0, 0)))
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        counts = jnp.pad(counts, ((0, pad), (0, 0)))
    nq_pad = nq + pad

    kernel = partial(_score_kernel, n_probes=n_probes, cap=cap, align=align,
                     q_block=q_block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq_pad // q_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole query chunk
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((q_block, n_probes, cap),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_N_BUF, cap, d_pad), data.dtype),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq_pad, n_probes, cap), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(starts.reshape(-1), counts.reshape(-1), queries_ext, data)
    return out[:nq]


_EVENT_BLOCK = 8  # probe events per program in the auto-pipelined kernel


def _make_auto_kernel(n_probes: int, cap: int, d_pad: int):
    def kernel(blkidx_ref, counts_ref, q_ref, *refs):
        # refs = _EVENT_BLOCK corpus-block refs, then out_ref (EB, cap)
        out_ref = refs[-1]
        i = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
        for j in range(_EVENT_BLOCK):
            ev = i * _EVENT_BLOCK + j
            q_col = q_ref[ev // n_probes, :].reshape(d_pad, 1)
            scores = jnp.dot(
                refs[j][...].astype(jnp.float32), q_col,
                preferred_element_type=jnp.float32,
            )[:, 0]
            out_ref[j, :] = jnp.where(lane < counts_ref[ev], scores, -jnp.inf)

    return kernel


@partial(jax.jit, static_argnames=("cap", "n_probes", "interpret"))
def _bucket_scores_auto(data, queries_ext, block_idx, counts,
                        cap: int, n_probes: int, interpret: bool):
    """Auto-pipelined variant: Mosaic's block pipeline fetches each
    probe's bucket block via a scalar-prefetch-driven BlockSpec index
    map (requires the cap-aligned layout), removing the per-step manual
    DMA/semaphore overhead that limits :func:`_score_kernel`.
    Measured ~1.5x the manual kernel on v5e."""
    nq = queries_ext.shape[0]
    d_pad = queries_ext.shape[1]
    eb = _EVENT_BLOCK

    # pad queries so n_events divides the event block
    ev_per_q = n_probes
    q_mult = eb // np.gcd(eb, ev_per_q)
    pad = (-nq) % q_mult
    if pad:
        queries_ext = jnp.pad(queries_ext, ((0, pad), (0, 0)))
        block_idx = jnp.pad(block_idx, ((0, pad), (0, 0)))
        counts = jnp.pad(counts, ((0, pad), (0, 0)))
    nq_pad = nq + pad
    n_events = nq_pad * n_probes

    def corpus_spec(j):
        return pl.BlockSpec(
            (cap, d_pad),
            lambda i, blk, cnt: (blk[i * eb + j], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_events // eb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [corpus_spec(j) for j in range(eb)],
        out_specs=pl.BlockSpec((eb, cap), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_auto_kernel(n_probes, cap, d_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_events, cap), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(block_idx.reshape(-1), counts.reshape(-1), queries_ext,
      *([data] * eb))
    return out.reshape(nq_pad, n_probes, cap)[:nq]


def bucket_scores(layout: ServingLayout, queries_ext: Array,
                  probe_ids: Array, probe_valid: Array,
                  interpret: bool | None = None) -> tuple[Array, Array]:
    """Scores for every (query, probe, lane) candidate slot.

    Args:
      layout: serving layout.
      queries_ext: ``(nq, d_pad)`` from :func:`extend_queries`.
      probe_ids: ``(nq, P)`` int32 deduped bucket ids.
      probe_valid: ``(nq, P)`` dedupe mask.
      interpret: force interpreter mode (defaults to off-TPU autodetect).

    Returns:
      ``scores (nq, P, cap)`` — higher is nearer, ``-inf`` on masked
      lanes; and ``positions (nq, P)`` — each probe's start offset into
      the sorted order (lane ``l`` of probe ``p`` is sorted position
      ``positions[:, p] + l``, original row ``row_ids[position]``).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cap = layout.cap
    n_pad = layout.data.shape[0]
    safe_ids = jnp.clip(probe_ids, 0, layout.starts.shape[0] - 1)
    starts = jnp.minimum(layout.starts[safe_ids], n_pad - cap).astype(jnp.int32)
    counts = jnp.where(
        probe_valid, jnp.minimum(layout.counts[safe_ids], cap), 0
    ).astype(jnp.int32)
    block_idx = starts // cap  # cap-aligned layout: starts are block-exact

    # The query chunk lives whole in VMEM; cap chunk size at a few MB.
    nq = queries_ext.shape[0]
    chunk = max(1, (4 * 1024 * 1024) // (layout.d_pad * 4))

    def run(qs, bi, cn):
        return _bucket_scores_auto(
            layout.data, qs, bi, cn, cap=cap,
            n_probes=probe_ids.shape[1], interpret=interpret,
        )

    if nq <= chunk:
        scores = run(queries_ext, block_idx, counts)
    else:
        parts = []
        for s in range(0, nq, chunk):
            e = min(s + chunk, nq)
            parts.append(run(queries_ext[s:e], block_idx[s:e], counts[s:e]))
        scores = jnp.concatenate(parts, axis=0)
    return scores, starts
