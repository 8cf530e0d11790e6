"""Multi-table (L hashings) ensembles — classic LSH boosting, learned.

No reference counterpart (the reference trains exactly one hashing);
this is the idiomatic multi-table extension: ``L`` independently
initialised hashings share one architecture, their parameters stacked
on a leading table axis so every per-table computation is a ``vmap``.
A query probes all tables, the candidate union is deduped by row id
(sort + neighbour mask — no host sets), reranked exactly once, and
top-k'd.

With a mesh, tables are sharded across devices (axis ``"table"``):
each device reranks its local tables' candidates and per-device top-k
lists are merged over ICI with duplicate-id suppression.  The merged
*ids* are exact (equal to the unsharded ensemble); the reported
``n_candidates`` is the psum of per-device distinct counts and is
therefore an upper bound when the same corpus row is a candidate on
several devices — exchanging full candidate sets to dedupe across
chips would cost more ICI traffic than the rerank it measures.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nlsh_tpu.index.bucket_table import build_bucket_table
from nlsh_tpu.index.indexer import hash_corpus
from nlsh_tpu.ops import distances as D

shard_map = jax.shard_map

Array = jnp.ndarray

_GATHER_BUDGET_BYTES = 256 * 1024 * 1024


def init_multi_table(hashing, n_tables: int, key) -> dict:
    """Stacked params for ``n_tables`` independent hashings:
    every leaf gains a leading ``(L, ...)`` axis."""
    keys = jax.random.split(key, n_tables)
    return jax.vmap(hashing.init)(keys)


def _mt_query_chunk(L: int, n_probes: int, budget: int, dim: int) -> int:
    per_query = max(L * n_probes * budget * dim * 4, 1)
    return int(max(4, min(512, _GATHER_BUDGET_BYTES // per_query)))


class MultiTableIndexer:
    """L learned hash tables over one corpus (BASELINE config 4).

    Args:
      hashing: the shared hashing architecture.
      stacked_params: pytree with leading table axis (L, ...), e.g. from
        :func:`init_multi_table` or a multi-table trainer.
      corpus: ``(n, d)``.
      mesh: optional 1-D mesh to shard the table axis across devices
        (requires L divisible by the mesh size).
    """

    def __init__(self, hashing, stacked_params, corpus, metric="cosine",
                 probe_budget: int | None = None, mesh: Mesh | None = None,
                 engine: str = "auto"):
        if engine not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown engine {engine!r}")
        self.hashing = hashing
        self.params = stacked_params
        self.corpus = jnp.asarray(corpus)
        self.metric = metric
        self.mesh = mesh
        self.engine = engine
        self._query_cache: dict = {}
        self._layouts = None
        self.n_tables = jax.tree.leaves(stacked_params)[0].shape[0]
        if mesh is not None:
            (self.axis,) = mesh.axis_names
            if self.n_tables % mesh.devices.size != 0:
                raise ValueError(
                    f"n_tables {self.n_tables} not divisible by mesh size "
                    f"{mesh.devices.size}"
                )

        # (L, n) hard codes -> L CSR tables, stacked
        codes = jax.vmap(lambda p: hash_corpus(hashing, p, self.corpus))(
            stacked_params
        )
        tables = jax.vmap(lambda c: build_bucket_table(c, hashing.n_buckets))(codes)
        self.row_ids, self.starts, self.counts = (
            tables.row_ids, tables.starts, tables.counts,
        )  # (L, n), (L, nb), (L, nb)
        if mesh is not None:
            spec = NamedSharding(mesh, P(self.axis, None))
            self.row_ids = jax.device_put(self.row_ids, spec)
            self.starts = jax.device_put(self.starts, spec)
            self.counts = jax.device_put(self.counts, spec)
            self.params = jax.device_put(
                stacked_params,
                NamedSharding(mesh, P(self.axis)),
            )
        if probe_budget is None:
            probe_budget = int(jnp.max(self.counts))
        self.probe_budget = max(int(probe_budget), 1)

    # -- core rerank over the union of all tables' candidates ---------------

    @staticmethod
    def _gather_rerank(row_ids, starts, counts, corpus, q, pids, pvalid,
                       k, budget, metric, n_rows):
        """One query chunk against a stack of tables.

        row_ids (Lc, n), starts/counts (Lc, nb); q (c, d);
        pids/pvalid (Lc, c, P).  Returns (top_ids, top_d, n_distinct).
        """
        rowwise = D.get_metric(metric)["rowwise"]
        Lc, c, n_probes = pids.shape
        offs = jnp.arange(budget, dtype=jnp.int32)

        def per_table(rids, st, ct, pid, pv):
            safe = jnp.clip(pid, 0, st.shape[0] - 1)
            cnt = jnp.where(pv, ct[safe], 0)  # (c, P)
            pos = st[safe][:, :, None] + offs  # (c, P, B)
            valid = offs[None, None, :] < cnt[:, :, None]
            rows = rids[jnp.clip(pos, 0, n_rows - 1)]
            return rows.reshape(c, -1), valid.reshape(c, -1)

        rows, valid = jax.vmap(per_table)(row_ids, starts, counts, pids, pvalid)
        rows = jnp.moveaxis(rows, 0, 1).reshape(c, -1)  # (c, Lc*P*B)
        valid = jnp.moveaxis(valid, 0, 1).reshape(c, -1)

        # dedupe the union by row id: invalid -> sentinel, sort, mask dups
        sentinel = jnp.int32(n_rows)
        keyed = jnp.where(valid, rows, sentinel)
        keyed = jnp.sort(keyed, axis=1)
        first = jnp.ones_like(keyed[:, :1], dtype=bool)
        uniq = jnp.concatenate([first, keyed[:, 1:] != keyed[:, :-1]], axis=1)
        uniq &= keyed < sentinel
        n_distinct = jnp.sum(uniq, axis=1, dtype=jnp.int32)

        cand = jnp.clip(keyed, 0, n_rows - 1)
        vecs = jnp.take(corpus, cand, axis=0)  # (c, C, d)
        dist = rowwise(q[:, None, :], vecs)
        dist = jnp.where(uniq, dist, jnp.inf)
        neg_top, arg = jax.lax.top_k(-dist, k)
        top = jnp.take_along_axis(cand, arg, axis=1)
        top = jnp.where(jnp.isfinite(neg_top), top, -1).astype(jnp.int32)
        return top, -neg_top, n_distinct

    def _query_fn(self, k: int, hash_times: int, query_chunk: int):
        cache_key = (k, hash_times, query_chunk)
        if cache_key in self._query_cache:
            return self._query_cache[cache_key]

        hashing, metric, budget = self.hashing, self.metric, self.probe_budget
        n_rows = self.corpus.shape[0]
        gather_rerank = self._gather_rerank

        def chunked(row_ids, starts, counts, corpus, queries, pids, pvalid,
                    merge_axis=None):
            nq, dim = queries.shape
            n_chunks = -(-nq // query_chunk)
            pad = n_chunks * query_chunk - nq
            q_p = jnp.pad(queries, ((0, pad), (0, 0)))
            pid_p = jnp.pad(pids, ((0, 0), (0, pad), (0, 0)))
            pv_p = jnp.pad(pvalid, ((0, 0), (0, pad), (0, 0)))

            def f(args):
                q, pid, pv = args
                top, topd, nd = gather_rerank(
                    row_ids, starts, counts, corpus, q, pid, pv,
                    k, budget, metric, n_rows,
                )
                if merge_axis is not None:
                    # tables sharded: merge per-device top-k with dup-id
                    # suppression (same row can win on several devices)
                    all_d = jax.lax.all_gather(topd, merge_axis)
                    all_i = jax.lax.all_gather(top, merge_axis)
                    c = q.shape[0]
                    all_d = jnp.moveaxis(all_d, 0, 1).reshape(c, -1)
                    all_i = jnp.moveaxis(all_i, 0, 1).reshape(c, -1)
                    order = jnp.argsort(
                        jnp.where(all_i < 0, jnp.int32(n_rows), all_i), axis=1
                    )
                    si = jnp.take_along_axis(all_i, order, axis=1)
                    sd = jnp.take_along_axis(all_d, order, axis=1)
                    dup = jnp.concatenate(
                        [jnp.zeros_like(si[:, :1], bool),
                         si[:, 1:] == si[:, :-1]], axis=1,
                    )
                    sd = jnp.where(dup | (si < 0), jnp.inf, sd)
                    neg, arg = jax.lax.top_k(-sd, k)
                    top = jnp.where(
                        jnp.isfinite(neg),
                        jnp.take_along_axis(si, arg, axis=1), -1,
                    ).astype(jnp.int32)
                    topd = -neg
                    nd = jax.lax.psum(nd, merge_axis)
                return top, topd, nd

            L = pid_p.shape[0]
            n_pr = pid_p.shape[-1]
            top, topd, nd = jax.lax.map(
                f,
                (q_p.reshape(n_chunks, query_chunk, dim),
                 pid_p.reshape(L, n_chunks, query_chunk, n_pr).transpose(1, 0, 2, 3),
                 pv_p.reshape(L, n_chunks, query_chunk, n_pr).transpose(1, 0, 2, 3)),
            )
            return (
                top.reshape(-1, k)[:nq],
                topd.reshape(-1, k)[:nq],
                nd.reshape(-1)[:nq],
            )

        if self.mesh is None:
            def q_fn(row_ids, starts, counts, corpus, queries, pids, pvalid):
                return chunked(row_ids, starts, counts, corpus, queries,
                               pids, pvalid)
            fn = jax.jit(q_fn)
        else:
            axis = self.axis

            @jax.jit
            @partial(
                shard_map,
                mesh=self.mesh,
                in_specs=(P(axis), P(axis, None), P(axis, None), P(),
                          P(), P(axis), P(axis)),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
            def fn(row_ids, starts, counts, corpus, queries, pids, pvalid):
                return chunked(row_ids, starts, counts, corpus, queries,
                               pids, pvalid, merge_axis=axis)

        self._query_cache[cache_key] = fn
        return fn

    # -- Pallas serving path (one bucket-contiguous layout per table) -------
    def _build_layouts(self):
        """Per-table serving layouts.  Memory note: each layout holds a
        bucket-ordered copy of the corpus — L copies total — so this
        path suits serving deployments where HBM admits L x corpus."""
        if self._layouts is not None:
            return self._layouts
        from nlsh_tpu.index.bucket_table import BucketTable
        from nlsh_tpu.ops.pallas.query_kernel import serving_layout

        cap = int(jnp.max(self.counts))
        layouts = []
        for t in range(self.n_tables):
            table = BucketTable(self.row_ids[t], self.starts[t], self.counts[t])
            layouts.append(
                serving_layout(table, self.corpus, metric=self.metric, cap=cap)
            )
        self._layouts = layouts
        return layouts

    def _query_serving(self, queries, pids, pvalid, k: int):
        """Per-table Pallas scoring + cross-table merge with duplicate-id
        suppression.  ``n_candidates`` is the summed probed occupancy
        across tables (an upper bound on distinct candidates; the XLA
        engine reports the exact distinct count)."""
        from nlsh_tpu.index.serving import serving_query

        layouts = self._build_layouts()
        per_ids, per_scores, per_cand = [], [], []
        for t, layout in enumerate(layouts):
            ids, scores, n_cand = serving_query(
                layout, queries, pids[t], pvalid[t], self.counts[t], k=k
            )
            per_ids.append(ids)
            per_scores.append(scores)
            per_cand.append(n_cand)

        all_i = jnp.concatenate(per_ids, axis=1)      # (nq, L*k)
        all_s = jnp.concatenate(per_scores, axis=1)
        n = self.corpus.shape[0]
        # dedupe by id: sort by id, mask repeats, re-top-k by score
        order = jnp.argsort(jnp.where(all_i < 0, jnp.int32(n), all_i), axis=1)
        si = jnp.take_along_axis(all_i, order, axis=1)
        ss = jnp.take_along_axis(all_s, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros_like(si[:, :1], bool), si[:, 1:] == si[:, :-1]], axis=1
        )
        ss = jnp.where(dup | (si < 0), -jnp.inf, ss)
        top, arg = jax.lax.top_k(ss, k)
        merged = jnp.where(
            jnp.isfinite(top), jnp.take_along_axis(si, arg, axis=1), -1
        ).astype(jnp.int32)
        return np.asarray(merged), np.asarray(sum(per_cand))

    def query(self, queries, k: int = 10, hash_times: int = 1, key=None):
        """Query the ensemble.  ``hash_times=1`` (hard probe per table)
        is the typical multi-table operating point — the ensemble
        provides the recall that multi-probe provides a single table.

        Returns ``(topk_ids (nq, k), n_candidates (nq,))`` —
        ``n_candidates`` is the exact distinct-candidate count on the
        XLA engine and the summed per-table occupancy (upper bound) on
        the Pallas engine.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        queries = jnp.asarray(queries)
        keys = jax.random.split(key, self.n_tables)

        def per_table_hash(p, k_):
            return self.hashing.hash(p, queries, n_probes=hash_times, key=k_)

        if hash_times == 1:
            pids, pvalid = jax.vmap(
                lambda p: self.hashing.hash(p, queries, n_probes=1)
            )(self.params)
        else:
            pids, pvalid = jax.vmap(per_table_hash)(self.params, keys)

        engine = self.engine
        if engine == "auto":
            engine = "pallas" if jax.default_backend() == "tpu" else "xla"
        if (engine == "pallas" and self.mesh is None
                and self.metric in ("cosine", "euclidean", "sq_euclidean")):
            return self._query_serving(queries, pids, pvalid, k)

        chunk = _mt_query_chunk(
            self.n_tables, hash_times, self.probe_budget, queries.shape[1]
        )
        fn = self._query_fn(k, hash_times, chunk)
        top, _, nd = fn(self.row_ids, self.starts, self.counts, self.corpus,
                        queries, pids, pvalid)
        return np.asarray(top), np.asarray(nd)
