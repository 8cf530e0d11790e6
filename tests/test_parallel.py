"""Multi-chip tests on the 8-virtual-device CPU mesh: data-parallel
training, corpus-sharded index (exactness vs single chip), and
multi-table ensembles (plain and table-sharded)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlsh_tpu.data import SyntheticDataset
from nlsh_tpu.index import Indexer
from nlsh_tpu.models.encoders import MLPEncoder
from nlsh_tpu.models.hashings import MultivariateBernoulli
from nlsh_tpu.parallel import MultiTableIndexer, ShardedIndexer, make_mesh
from nlsh_tpu.parallel.multitable import init_multi_table
from nlsh_tpu.train import TripletTrainer
from nlsh_tpu.utils.metrics import calculate_recall


@pytest.fixture(scope="module")
def data():
    return SyntheticDataset(n_train=1024, n_test=128, dim=8, n_clusters=32,
                            metric="cosine", k_ground_truth=10, seed=0).load()


def _hashing(bits=5, dim=8):
    return MultivariateBernoulli(MLPEncoder(dim, (16,)), bits)


def test_mesh_has_8_devices():
    mesh = make_mesh(axis="data")
    assert mesh.devices.size == 8


def test_dp_training_runs_and_stays_replicated(data, tmp_path):
    mesh = make_mesh(axis="data")
    hashing = _hashing()
    tr = TripletTrainer(hashing, data, str(tmp_path), positive_k=5, margin=0.5)
    state = tr.fit(K=5, batch_size=128, epochs=1, test_every_updates=4,
                   max_steps=8, hash_times=3, mesh=mesh)
    assert int(state.step) == 8
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dp_loss_decreases(data, tmp_path):
    import json
    from nlsh_tpu.utils.loggers import JSONLLogger

    mesh = make_mesh(axis="data")
    hashing = _hashing(bits=5)
    log = tmp_path / "dp.jsonl"
    tr = TripletTrainer(hashing, data, str(tmp_path), JSONLLogger(str(log)),
                        positive_k=5, margin=0.5)
    tr.fit(K=5, batch_size=128, learning_rate=3e-3, epochs=20,
           test_every_updates=64, max_steps=120, hash_times=3, mesh=mesh)
    losses = [json.loads(l)["value"] for l in log.read_text().splitlines()
              if json.loads(l).get("name") == "training/loss"]
    assert len(losses) == 120
    assert np.mean(losses[:15]) > np.mean(losses[-15:])


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_index_matches_single_chip(data, n_shards):
    """Merged per-shard top-k must equal the single-chip result:
    identical candidate counts and identical top-k distance profiles."""
    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)

    single = Indexer(hashing, params, corpus, metric="cosine")
    s_top, s_cand = single.query(queries, k=5, hash_times=4, key=key)

    mesh = make_mesh(n_shards, axis="shard")
    sharded = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine")
    m_top, m_cand = sharded.query(queries, k=5, hash_times=4, key=key)

    np.testing.assert_array_equal(m_cand, s_cand)

    def dists(top):
        c = np.asarray(corpus)
        q = np.asarray(queries)
        out = np.full(top.shape, np.inf, np.float64)
        for i in range(top.shape[0]):
            for j in range(top.shape[1]):
                if top[i, j] >= 0:
                    a, b = q[i], c[top[i, j]]
                    out[i, j] = 1 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        return out

    np.testing.assert_allclose(dists(m_top), dists(s_top), rtol=1e-4, atol=1e-5)
    # id sets match where distances are untied
    same = (np.sort(m_top, 1) == np.sort(s_top, 1)).mean()
    assert same > 0.99


def test_sharded_pallas_serving_matches_xla(data):
    """The per-shard Pallas serving path (interpret mode on CPU) must
    reproduce the sharded XLA path exactly."""
    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(4, axis="shard")

    sx = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="xla")
    x_top, x_cand = sx.query(queries, k=5, hash_times=4, key=key)
    sp = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="pallas")
    p_top, p_cand = sp.query(queries, k=5, hash_times=4, key=key)
    np.testing.assert_array_equal(p_cand, x_cand)
    assert (np.sort(p_top, 1) == np.sort(x_top, 1)).mean() > 0.99


def test_sharded_int8_matches_single_table_int8(data):
    """int8 sharded serving: the global dequant scale must make the
    cross-shard score merge rank like the single-table int8 engine (one
    scale everywhere -> same units), and track the f32 result closely."""
    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)
    k = 5

    single8 = Indexer(hashing, params, corpus, metric="cosine",
                      engine="pallas-grouped", serving_dtype=jnp.int8)
    s_top, s_cand = single8.query(queries, k=k, hash_times=4, key=key)

    mesh = make_mesh(4, axis="shard")
    sharded8 = ShardedIndexer(hashing, params, corpus, mesh,
                              metric="cosine", engine="pallas-grouped",
                              serving_dtype=jnp.int8)
    m_top, m_cand = sharded8.query(queries, k=k, hash_times=4, key=key)
    np.testing.assert_array_equal(np.asarray(m_cand), np.asarray(s_cand))
    same = np.mean([
        len(set(np.asarray(s_top)[i]) & set(np.asarray(m_top)[i])) / k
        for i in range(s_top.shape[0])
    ])
    assert same > 0.99, f"sharded int8 vs single int8 agreement {same:.3f}"

    # quality vs f32: id agreement is the wrong measure on this
    # tightly-clustered 8-dim fixture (quantisation flips near-ties
    # freely) — assert bounded SCORE regret instead: int8's top-1 must
    # cosine-score within the quantisation error bound of f32's top-1
    f32 = Indexer(hashing, params, corpus, metric="cosine",
                  engine="pallas-grouped")
    f_top, _ = f32.query(queries, k=k, hash_times=4, key=key)
    c = np.asarray(corpus)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    q = np.asarray(queries)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    bound = c.shape[1] * float(np.max(np.asarray(
        single8.layout.scale))) + 1e-5
    f_np, m_np = np.asarray(f_top), np.asarray(m_top)
    for i in range(q.shape[0]):
        if f_np[i, 0] < 0 or m_np[i, 0] < 0:
            continue
        regret = float(q[i] @ c[f_np[i, 0]] - q[i] @ c[m_np[i, 0]])
        assert regret <= bound, f"query {i}: top-1 regret {regret:.4f}"


def test_sharded_index_nondivisible_corpus():
    """Corpus size not divisible by shard count: padding rows must never
    be returned."""
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(101, 8)).astype(np.float32)
    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(1))
    mesh = make_mesh(8, axis="shard")
    sharded = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine")
    top, ncand = sharded.query(jnp.asarray(corpus[:16]), k=3, hash_times=2,
                               key=jax.random.PRNGKey(2))
    assert (top < 101).all()
    assert (ncand <= 101).all()
    # self-retrieval still holds
    assert (top[:, 0] == np.arange(16)).all()


def test_multitable_single_table_equals_indexer(data):
    hashing = _hashing()
    params1 = hashing.init(jax.random.PRNGKey(0))
    stacked = jax.tree.map(lambda x: x[None], params1)
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)

    single = Indexer(hashing, params1, corpus, metric="cosine")
    s_top, s_cand = single.query(queries, k=5, hash_times=1)

    mt = MultiTableIndexer(hashing, stacked, corpus, metric="cosine")
    m_top, m_cand = mt.query(queries, k=5, hash_times=1)

    np.testing.assert_array_equal(m_cand, s_cand)  # distinct == occupancy here
    assert (np.sort(m_top, 1) == np.sort(s_top, 1)).mean() > 0.99


def test_multitable_more_tables_more_candidates(data):
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    p1 = init_multi_table(hashing, 1, jax.random.PRNGKey(3))
    p4 = init_multi_table(hashing, 4, jax.random.PRNGKey(3))
    mt1 = MultiTableIndexer(hashing, p1, corpus, metric="cosine")
    mt4 = MultiTableIndexer(hashing, p4, corpus, metric="cosine")
    _, c1 = mt1.query(queries, k=5)
    top4, c4 = mt4.query(queries, k=5)
    assert c4.mean() > c1.mean()

    gt = np.asarray(data.ground_truth)[:, :5]
    r1 = calculate_recall(gt, mt1.query(queries, k=5)[0], np.mean)
    r4 = calculate_recall(gt, top4, np.mean)
    assert r4 >= r1  # ensemble can only widen the candidate union


def test_multitable_pallas_engine_matches_xla(data):
    """The per-table serving path must return the same top-k ids as the
    XLA union-dedupe path (n_candidates is documented as an upper bound
    on the Pallas engine)."""
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    stacked = init_multi_table(hashing, 4, jax.random.PRNGKey(9))

    mt_x = MultiTableIndexer(hashing, stacked, corpus, metric="cosine",
                             engine="xla")
    x_top, x_cand = mt_x.query(queries, k=5)
    mt_p = MultiTableIndexer(hashing, stacked, corpus, metric="cosine",
                             engine="pallas")
    p_top, p_cand = mt_p.query(queries, k=5)
    assert (np.sort(p_top, 1) == np.sort(x_top, 1)).mean() > 0.99
    assert (p_cand >= x_cand).all()


def test_multitable_sharded_matches_unsharded(data):
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    stacked = init_multi_table(hashing, 8, jax.random.PRNGKey(4))

    plain = MultiTableIndexer(hashing, stacked, corpus, metric="cosine")
    p_top, p_cand = plain.query(queries, k=5)

    mesh = make_mesh(4, axis="table")
    sharded = MultiTableIndexer(hashing, stacked, corpus, metric="cosine",
                                mesh=mesh)
    s_top, s_cand = sharded.query(queries, k=5)

    # merged ids are exact; the sharded candidate count is a documented
    # upper bound (cross-device duplicates are not globally deduped)
    assert (s_cand >= p_cand).all()
    assert (np.sort(p_top, 1) == np.sort(s_top, 1)).mean() > 0.99


def test_multitable_int8_matches_f32(data):
    """int8 stacked layouts: one global scale over the shared corpus, so
    plain AND table-sharded ensembles must rank candidates by the exact
    quantised dot (faithful int8 max-selection), with dequantised scores
    merging correctly across devices.  At dim=8 quantisation legitimately
    reorders near-ties vs f32 (brute-force int8 agreement here is 0.764),
    so the assertion is against the host int8 reference, not a fixed
    f32-agreement threshold."""
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    stacked = init_multi_table(hashing, 4, jax.random.PRNGKey(9))
    k = 5

    f32 = MultiTableIndexer(hashing, stacked, corpus, metric="cosine",
                            engine="pallas-grouped")
    f_top, f_cand = f32.query(queries, k=k, hash_times=1)
    i8 = MultiTableIndexer(hashing, stacked, corpus, metric="cosine",
                           engine="pallas-grouped",
                           serving_dtype=jnp.int8, int8_scale="global")
    i_top, i_cand = i8.query(queries, k=k, hash_times=1)
    np.testing.assert_array_equal(np.asarray(i_cand), np.asarray(f_cand))

    # Host int8 reference scoring: same quantisation as the layout
    # (one global scale over the unit-normalised shared corpus).
    C = np.asarray(corpus, np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    scl = np.abs(Cn).max() / 127.0
    C8 = np.clip(np.round(Cn / scl), -127, 127)
    Qf = np.asarray(queries, np.float64)
    s8 = Qf @ C8.T  # per-query monotone in the dequantised score

    # Both indexers probed identical candidate sets (cand counts equal,
    # same tables/probes), and f_top is a subset of those candidates —
    # so a faithful int8 engine must select ids whose int8 score is >=
    # the int8 score of every f32 pick it dropped (near-ties aside).
    it, ft = np.asarray(i_top), np.asarray(f_top)
    eps = 1e-5
    for q in range(it.shape[0]):
        picked = it[q][it[q] >= 0]
        dropped = [r for r in ft[q] if r >= 0 and r not in set(picked)]
        if not dropped or len(picked) == 0:
            continue
        assert s8[q, picked].min() >= s8[q, dropped].max() - eps, (
            f"query {q}: int8 engine kept a worse id than an f32 pick "
            f"under int8 scoring"
        )

    mesh = make_mesh(4, axis="table")
    sh8 = MultiTableIndexer(hashing, stacked, corpus, metric="cosine",
                            engine="pallas-grouped", mesh=mesh,
                            serving_dtype=jnp.int8, int8_scale="global")
    s_top, _ = sh8.query(queries, k=k, hash_times=1)
    same = np.mean([
        len(set(np.asarray(i_top)[i]) & set(np.asarray(s_top)[i])) / k
        for i in range(i_top.shape[0])
    ])
    assert same > 0.99, f"sharded int8 vs plain int8 agreement {same:.3f}"


def test_multitable_int8_per_row_and_euclidean(data):
    """Round 5: int8 ensembles serve euclidean and per-row scales (the
    new default).  Plain and table-sharded per-row int8 must agree with
    each other (scales are per corpus row — identical on both sides)
    and track f32 ids closely; euclidean int8 must run end-to-end."""
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    stacked = init_multi_table(hashing, 4, jax.random.PRNGKey(9))
    k = 5

    for metric in ("cosine", "euclidean"):
        f32 = MultiTableIndexer(hashing, stacked, corpus, metric=metric,
                                engine="pallas-grouped")
        f_top, f_cand = f32.query(queries, k=k, hash_times=1)
        i8 = MultiTableIndexer(hashing, stacked, corpus, metric=metric,
                               engine="pallas-grouped",
                               serving_dtype=jnp.int8)  # per_row default
        assert i8._serving_layout().scale.ndim == 1
        i_top, i_cand = i8.query(queries, k=k, hash_times=1)
        np.testing.assert_array_equal(np.asarray(i_cand),
                                      np.asarray(f_cand))
        agree = np.mean([
            len(set(np.asarray(f_top)[i]) & set(np.asarray(i_top)[i])) / k
            for i in range(f_top.shape[0])
        ])
        # per-row scales on unit-norm 8-dim data still flip near-ties,
        # but should track f32 at least as well as global did (~0.76
        # brute-force agreement on this fixture)
        assert agree >= 0.75, f"{metric}: per-row int8 agreement {agree}"

        mesh = make_mesh(4, axis="table")
        sh8 = MultiTableIndexer(hashing, stacked, corpus, metric=metric,
                                engine="pallas-grouped", mesh=mesh,
                                serving_dtype=jnp.int8)
        s_top, _ = sh8.query(queries, k=k, hash_times=1)
        same = np.mean([
            len(set(np.asarray(i_top)[i]) & set(np.asarray(s_top)[i])) / k
            for i in range(i_top.shape[0])
        ])
        assert same > 0.99, (
            f"{metric}: sharded per-row int8 vs plain {same:.3f}")


def test_sharded_grouped_and_host_layout_match_xla(data):
    """New round-2 engine surface: pallas-grouped under shard_map and
    the host-built layout must both reproduce the sharded XLA path."""
    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = np.asarray(data.training)  # numpy: exercises _corpus_host
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(4, axis="shard")

    sx = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="xla")
    x_top, x_cand = sx.query(queries, k=5, hash_times=4, key=key)

    sg = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="pallas-grouped", layout_mode="host")
    g_top, g_cand = sg.query(queries, k=5, hash_times=4, key=key)
    np.testing.assert_array_equal(g_cand, x_cand)
    assert (np.sort(g_top, 1) == np.sort(x_top, 1)).mean() > 0.99


@pytest.mark.parametrize("engine", ["pallas", "pallas-grouped", "pallas-windowed"])
def test_multitable_stacked_engines_match_xla(data, engine):
    """Round-2 stacked single-layout serving (one call for all L
    tables) must reproduce the XLA union-rerank path."""
    from nlsh_tpu.parallel.multitable import MultiTableIndexer, init_multi_table

    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    params = init_multi_table(hashing, 4, jax.random.PRNGKey(3))

    mx = MultiTableIndexer(hashing, params, corpus, engine="xla")
    x_top, _ = mx.query(queries, k=5, hash_times=2,
                        key=jax.random.PRNGKey(5))
    mp = MultiTableIndexer(hashing, params, corpus, engine=engine)
    p_top, p_cand = mp.query(queries, k=5, hash_times=2,
                             key=jax.random.PRNGKey(5))
    assert (np.sort(p_top, 1) == np.sort(x_top, 1)).mean() > 0.99


def test_multitable_flip_probes(data):
    """`probe_mode="flip"` on the ensemble: deterministic (same ids for
    any key), monotone in hash_times (flip probes are supersets), and
    engine-consistent (Pallas stacked serve == XLA union-rerank)."""
    from nlsh_tpu.parallel.multitable import (
        MultiTableIndexer, init_multi_table,
    )

    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    params = init_multi_table(hashing, 4, jax.random.PRNGKey(3))
    gt = np.asarray(data.ground_truth)[:, :5]

    mx = MultiTableIndexer(hashing, params, corpus, engine="xla")
    t_a, c_a = mx.query(queries, k=5, hash_times=4,
                        key=jax.random.PRNGKey(1), probe_mode="flip")
    t_b, c_b = mx.query(queries, k=5, hash_times=4,
                        key=jax.random.PRNGKey(999), probe_mode="flip")
    np.testing.assert_array_equal(t_a, t_b)  # key-independent
    np.testing.assert_array_equal(c_a, c_b)

    t1, c1 = mx.query(queries, k=5, hash_times=1)
    # flip probes widen (or at tiny fixture scale, saturate) the union
    assert (c_a >= c1).all()
    r_flip = calculate_recall(gt, t_a, np.mean)
    r_hard = calculate_recall(gt, t1, np.mean)
    assert r_flip >= r_hard  # superset probing can only help

    mp = MultiTableIndexer(hashing, params, corpus,
                           engine="pallas-windowed")
    p_top, _ = mp.query(queries, k=5, hash_times=4, probe_mode="flip")
    assert (np.sort(p_top, 1) == np.sort(t_a, 1)).mean() > 0.99

    # exact_query_size sees the same flip buckets as the query path
    qs = mx.exact_query_size(queries, hash_times=4, probe_mode="flip")
    np.testing.assert_array_equal(qs, c_a)


def test_multitable_fused_batched_fresh_pool(data):
    """A (repeats, nq, d) fresh-query pool serves each repeat's own
    queries — repeat i must equal a single fused serve of pool[i]."""
    from nlsh_tpu.parallel.multitable import (
        MultiTableIndexer, _fused_mt_serve, _fused_mt_serve_batched,
        init_multi_table,
    )

    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    params = init_multi_table(hashing, 2, jax.random.PRNGKey(3))
    idx = MultiTableIndexer(hashing, params, corpus,
                            engine="pallas-windowed")
    layout = idx._serving_layout()
    pool = jnp.stack([queries, jnp.flip(queries, axis=0)])
    key = jax.random.PRNGKey(4)

    out = np.asarray(_fused_mt_serve_batched(
        hashing, params, layout, pool, key, k=5, hash_times=2,
        engine="pallas-windowed", n_rows=corpus.shape[0], repeats=2,
        probe_mode="flip",
    ))
    for i in range(2):
        one = np.asarray(_fused_mt_serve(
            hashing, params, layout, pool[i], jax.random.fold_in(key, i),
            k=5, hash_times=2, engine="pallas-windowed",
            n_rows=corpus.shape[0], probe_mode="flip",
        ))
        np.testing.assert_array_equal(out[i], one)

    with pytest.raises(ValueError):
        _fused_mt_serve_batched(
            hashing, params, layout, pool, key, k=5, hash_times=2,
            engine="pallas-windowed", n_rows=corpus.shape[0], repeats=3,
            probe_mode="flip",
        )


@pytest.mark.parametrize("engine", ["pallas", "pallas-grouped", "pallas-windowed"])
def test_multitable_sharded_stacked_matches_unsharded(data, engine):
    """Table-sharded stacked serving (mesh) == unsharded stacked."""
    from nlsh_tpu.parallel.multitable import MultiTableIndexer, init_multi_table
    from nlsh_tpu.parallel import make_mesh

    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    params = init_multi_table(hashing, 4, jax.random.PRNGKey(3))

    m1 = MultiTableIndexer(hashing, params, corpus, engine=engine)
    t1, c1 = m1.query(queries, k=5, hash_times=2, key=jax.random.PRNGKey(5))
    mesh = make_mesh(4, axis="table")
    m2 = MultiTableIndexer(hashing, params, corpus, mesh=mesh, engine=engine)
    t2, c2 = m2.query(queries, k=5, hash_times=2, key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.sort(t1, 1), np.sort(t2, 1))
    np.testing.assert_array_equal(c1, c2)


def test_sharded_lazy_host_corpus_matches_indexer(data):
    """At host-layout scale on a 1-device mesh, the corpus never lands
    on the device (the 10M-run OOM fix) — results must still match the
    single-chip Indexer exactly."""
    from nlsh_tpu.index import Indexer

    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = np.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(1, axis="shard")

    old = ShardedIndexer.HOST_LAYOUT_ROWS
    ShardedIndexer.HOST_LAYOUT_ROWS = corpus.shape[0] // 2
    try:
        si = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                            engine="pallas-grouped")
        assert si.corpus is None
        s_top, s_cand = si.query(queries, k=5, hash_times=4, key=key)
    finally:
        ShardedIndexer.HOST_LAYOUT_ROWS = old

    ix = Indexer(hashing, params, jnp.asarray(corpus), metric="cosine",
                 engine="xla")
    x_top, x_cand = ix.query(queries, k=5, hash_times=4, key=key)
    np.testing.assert_array_equal(s_cand, np.asarray(x_cand))
    assert (np.sort(s_top, 1) == np.sort(np.asarray(x_top), 1)).mean() > 0.99


def test_multitable_exact_query_size_matches_xla(data):
    """`exact_query_size` must equal the XLA union path's distinct
    count for the same key, for both unsharded and table-sharded
    indexers (VERDICT weak #7: engine-independent query_size)."""
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    stacked = init_multi_table(hashing, 8, jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(9)

    mx = MultiTableIndexer(hashing, stacked, corpus, engine="xla")
    _, x_cand = mx.query(queries, k=5, hash_times=2, key=key)
    np.testing.assert_array_equal(
        mx.exact_query_size(queries, hash_times=2, key=key), x_cand
    )

    mp = MultiTableIndexer(hashing, stacked, corpus, engine="pallas-grouped")
    np.testing.assert_array_equal(
        mp.exact_query_size(queries, hash_times=2, key=key), x_cand
    )

    mesh = make_mesh(4, axis="table")
    ms = MultiTableIndexer(hashing, stacked, corpus, mesh=mesh,
                           engine="pallas-windowed")
    np.testing.assert_array_equal(
        ms.exact_query_size(queries, hash_times=2, key=key), x_cand
    )


def test_multitable_engine_switch_rebuilds_stack(data):
    """Switching engines post-init must drop the stacked layout (its
    start alignment is engine-specific) and the windowed calibration
    bound — results must match the XLA reference after the switch."""
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(3)
    stacked = init_multi_table(hashing, 4, jax.random.PRNGKey(0))

    ref = MultiTableIndexer(hashing, stacked, corpus, engine="xla")
    x_top, _ = ref.query(queries, k=5, hash_times=2, key=key)

    idx = MultiTableIndexer(hashing, stacked, corpus,
                            engine="pallas-windowed")
    idx.calibrate(queries[:8], hash_times=2)
    assert idx._g_cal is not None
    w_top, _ = idx.query(queries, k=5, hash_times=2, key=key)
    assert (np.asarray(w_top) == np.asarray(x_top)).mean() > 0.98

    idx.engine = "pallas-grouped"  # stale windowed stack would misalign
    assert idx._stacked is None and idx._g_cal is None
    g_top, _ = idx.query(queries, k=5, hash_times=2, key=key)
    assert (np.asarray(g_top) == np.asarray(x_top)).mean() > 0.98

    with pytest.raises(ValueError, match="unknown engine"):
        idx.engine = "nope"


def test_sharded_engine_switch_rebuilds_layouts(data):
    """Switching a ShardedIndexer's engine post-init must drop the
    per-shard layouts (engine-specific start alignment) and still
    reproduce the XLA reference results after the switch."""
    from nlsh_tpu.index import Indexer

    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)

    ref = Indexer(hashing, params, corpus, metric="cosine", engine="xla")
    x_top, x_cand = ref.query(queries, k=5, hash_times=4, key=key)

    mesh = make_mesh(2, axis="shard")
    si = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="pallas-grouped")
    si.query(queries, k=5, hash_times=4, key=key)
    assert si._layouts is not None
    si.engine = "pallas-windowed"
    assert si._layouts is None
    w_top, w_cand = si.query(queries, k=5, hash_times=4, key=key)
    np.testing.assert_array_equal(w_cand, np.asarray(x_cand))
    assert (np.sort(w_top, 1) == np.sort(np.asarray(x_top), 1)).mean() > 0.99

    with pytest.raises(ValueError, match="unknown engine"):
        si.engine = "nope"


def test_multitable_save_load_roundtrip(data, tmp_path):
    """MultiTableIndexer persistence: identical answers after load,
    wrong-params/corpus refused."""
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    stacked = init_multi_table(hashing, 4, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    mi = MultiTableIndexer(hashing, stacked, corpus,
                           engine="pallas-windowed")
    top, cand = mi.query(queries, k=5, hash_times=2, key=key)
    path = str(tmp_path / "mt.npz")
    mi.save(path)

    mi2 = MultiTableIndexer.load(path, hashing, stacked, corpus)
    assert mi2.engine == "pallas-windowed"
    top2, cand2 = mi2.query(queries, k=5, hash_times=2, key=key)
    np.testing.assert_array_equal(np.asarray(top), np.asarray(top2))
    np.testing.assert_array_equal(np.asarray(cand), np.asarray(cand2))

    # table-sharded load onto a mesh still matches
    mesh = make_mesh(4, axis="table")
    mi3 = MultiTableIndexer.load(path, hashing, stacked, corpus, mesh=mesh)
    top3, _ = mi3.query(queries, k=5, hash_times=2, key=key)
    np.testing.assert_array_equal(np.asarray(top), np.asarray(top3))

    with pytest.raises(ValueError, match="tables"):
        MultiTableIndexer.load(
            path, hashing, init_multi_table(hashing, 2, key), corpus)
    rng = np.random.default_rng(6)
    other = jnp.asarray(rng.normal(size=corpus.shape).astype(np.float32))
    with pytest.raises(ValueError, match="different corpus"):
        MultiTableIndexer.load(path, hashing, stacked, other)
    tail_edited = np.asarray(corpus).copy()
    tail_edited[-1, 0] += 1.0  # same shape: only the strided digest sees it
    with pytest.raises(ValueError, match="different corpus"):
        MultiTableIndexer.load(path, hashing, stacked,
                               jnp.asarray(tail_edited))


def test_sharded_save_load_roundtrip(data, tmp_path):
    """ShardedIndexer persistence: load() must skip the per-shard
    build, restore knobs, answer identically — and refuse a wrong mesh
    size or different corpus."""
    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(2, axis="shard")
    si = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="pallas-grouped")
    top, cand = si.query(queries, k=5, hash_times=4, key=key)
    path = str(tmp_path / "sharded.npz")
    si.save(path)

    si2 = ShardedIndexer.load(path, hashing, params, corpus, mesh)
    assert si2.engine == "pallas-grouped"
    top2, cand2 = si2.query(queries, k=5, hash_times=4, key=key)
    np.testing.assert_array_equal(np.asarray(top), np.asarray(top2))
    np.testing.assert_array_equal(np.asarray(cand), np.asarray(cand2))

    with pytest.raises(ValueError, match="sharded 2-way"):
        ShardedIndexer.load(path, hashing, params, corpus,
                            make_mesh(4, axis="shard"))
    rng = np.random.default_rng(5)
    other = jnp.asarray(
        rng.normal(size=corpus.shape).astype(np.float32))
    with pytest.raises(ValueError, match="different corpus"):
        ShardedIndexer.load(path, hashing, params, other, mesh)
    # SAME-shape tail edit: caught only by the head+tail+strided
    # fingerprint (a head-only digest silently served wrong ids, r3)
    tail_edited = np.asarray(corpus).copy()
    tail_edited[-1, 0] += 1.0
    with pytest.raises(ValueError, match="different corpus"):
        ShardedIndexer.load(path, hashing, params,
                            jnp.asarray(tail_edited), mesh)


def test_multitable_windowed_sync_bound_matches_xla(data, monkeypatch):
    """The windowed exact-group-bound host sync (opt-in via
    NLSH_MT_SYNC_BOUND_WINDOWED) must not change windowed-engine
    results, only the dispatch size."""
    from nlsh_tpu.ops.pallas import query_kernel as qk

    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    params = init_multi_table(hashing, 4, jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(5)

    mx = MultiTableIndexer(hashing, params, corpus, engine="xla")
    x_top, _ = mx.query(queries, k=5, hash_times=2, key=key)

    monkeypatch.setenv("NLSH_MT_SYNC_BOUND_WINDOWED", "0")
    m_off = MultiTableIndexer(hashing, params, corpus,
                              engine="pallas-windowed")
    off_top, _ = m_off.query(queries, k=5, hash_times=2, key=key)
    monkeypatch.setenv("NLSH_MT_SYNC_BOUND_WINDOWED", "1")
    m_on = MultiTableIndexer(hashing, params, corpus,
                             engine="pallas-windowed")
    on_top, _ = m_on.query(queries, k=5, hash_times=2, key=key)
    assert (np.sort(off_top, 1) == np.sort(x_top, 1)).mean() > 0.99
    np.testing.assert_array_equal(np.sort(on_top, 1), np.sort(off_top, 1))


@pytest.mark.parametrize("layout_mode", ["device", "host"])
def test_sharded_windowed_matches_xla(data, layout_mode):
    """Corpus-sharded dense-window serving (multi-device mesh, both
    layout builders) must reproduce the sharded XLA path — config 5b's
    low-occupancy operating point (VERDICT weak #6)."""
    hashing = _hashing()
    params = hashing.init(jax.random.PRNGKey(0))
    corpus = np.asarray(data.training)
    queries = jnp.asarray(data.testing)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(4, axis="shard")

    sx = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="xla")
    x_top, x_cand = sx.query(queries, k=5, hash_times=4, key=key)

    sw = ShardedIndexer(hashing, params, corpus, mesh, metric="cosine",
                        engine="pallas-windowed", layout_mode=layout_mode)
    w_top, w_cand = sw.query(queries, k=5, hash_times=4, key=key)
    np.testing.assert_array_equal(w_cand, x_cand)
    assert (np.sort(w_top, 1) == np.sort(x_top, 1)).mean() > 0.99


def test_fused_mt_serve_batched_matches_single(data, monkeypatch):
    """Repeat i of the one-dispatch batched program must equal a direct
    fused call on the same rolled queries + folded key."""
    from nlsh_tpu.parallel.multitable import (
        _fused_mt_serve, _fused_mt_serve_batched,
    )

    monkeypatch.setenv("NLSH_MT_SYNC_BOUND", "0")
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    params = init_multi_table(hashing, 4, jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(11)
    m = MultiTableIndexer(hashing, params, corpus, engine="pallas-windowed")
    layout = m._serving_layout()
    R = 3
    batched = np.asarray(_fused_mt_serve_batched(
        hashing, params, layout, queries, key, k=5, hash_times=2,
        engine="pallas-windowed", n_rows=corpus.shape[0], repeats=R,
    ))
    assert batched.shape == (R, queries.shape[0], 6)
    for i in (0, R - 1):
        qs = jnp.roll(queries, shift=i * 1009, axis=0)
        single = np.asarray(_fused_mt_serve(
            hashing, params, layout, qs, jax.random.fold_in(key, i),
            k=5, hash_times=2, engine="pallas-windowed",
            n_rows=corpus.shape[0],
        ))
        np.testing.assert_array_equal(batched[i], single)


def test_multitable_calibrated_windowed_matches_uncalibrated(data, monkeypatch):
    """The calibrated group bound (guarded by the device-side needed
    count + cond fallback) must never change results — including when a
    batch EXCEEDS the calibration sample (overflow falls back to the
    static-bound program instead of dropping candidates)."""
    monkeypatch.setenv("NLSH_MT_SYNC_BOUND", "0")
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    params = init_multi_table(hashing, 4, jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(5)

    ref = MultiTableIndexer(hashing, params, corpus,
                            engine="pallas-windowed")
    r_top, r_cand = ref.query(queries, k=5, hash_times=2, key=key)

    cal = MultiTableIndexer(hashing, params, corpus,
                            engine="pallas-windowed")
    g = cal.calibrate(queries, hash_times=2, key=key)
    assert g >= 1
    c_top, c_cand = cal.query(queries, k=5, hash_times=2, key=key)
    np.testing.assert_array_equal(c_cand, r_cand)
    np.testing.assert_array_equal(np.sort(c_top, 1), np.sort(r_top, 1))

    # starve the calibration: a 4-query sample, then a full batch with
    # more probes — the guard must route to the static-bound program
    starved = MultiTableIndexer(hashing, params, corpus,
                                engine="pallas-windowed")
    starved.calibrate(queries[:4], hash_times=1)
    s_top, s_cand = starved.query(queries, k=5, hash_times=4, key=key)
    f_top, f_cand = ref.query(queries, k=5, hash_times=4, key=key)
    np.testing.assert_array_equal(s_cand, f_cand)
    np.testing.assert_array_equal(np.sort(s_top, 1), np.sort(f_top, 1))


def test_multitable_host_stacked_build_matches_traced(data, monkeypatch):
    """The >=2M-row ensembles build their stacked layout on the HOST
    (round 5: the traced builder's scatter transients OOM HBM at 10M —
    measured 18.01G of 15.75G).  Shrink the threshold and require the
    host-built stack to serve identically to the traced one, for f32
    AND per-row int8."""
    hashing = _hashing()
    corpus = jnp.asarray(data.training)
    queries = jnp.asarray(data.testing)
    stacked = init_multi_table(hashing, 3, jax.random.PRNGKey(2))
    k = 5

    for dtype in (jnp.float32, jnp.int8):
        traced = MultiTableIndexer(hashing, stacked, corpus,
                                   metric="cosine", engine="pallas-grouped",
                                   serving_dtype=dtype)
        t_lay = traced._serving_layout()
        t_top, t_cand = traced.query(queries, k=k, hash_times=2,
                                     key=jax.random.PRNGKey(3),
                                     probe_mode="flip")
        monkeypatch.setattr(MultiTableIndexer, "HOST_LAYOUT_ROWS", 1)
        hosted = MultiTableIndexer(hashing, stacked,
                                   np.asarray(data.training),
                                   metric="cosine", engine="pallas-grouped",
                                   serving_dtype=dtype)
        h_lay = hosted._serving_layout()
        # placement bitwise; values to last-ulp normalisation rounding
        # (independent f32 reduction orders, like the single-table
        # host-vs-device test)
        np.testing.assert_array_equal(np.asarray(t_lay.row_map),
                                      np.asarray(h_lay.row_map))
        np.testing.assert_allclose(
            np.asarray(t_lay.data, np.float32),
            np.asarray(h_lay.data, np.float32),
            rtol=1e-6, atol=1 if dtype == jnp.int8 else 1e-7)
        if t_lay.scale is not None:
            np.testing.assert_allclose(np.asarray(t_lay.scale),
                                       np.asarray(h_lay.scale), rtol=1e-6)
        h_top, h_cand = hosted.query(queries, k=k, hash_times=2,
                                     key=jax.random.PRNGKey(3),
                                     probe_mode="flip")
        np.testing.assert_array_equal(np.asarray(t_cand),
                                      np.asarray(h_cand))
        agree = np.mean([
            len(set(np.asarray(t_top)[i]) & set(np.asarray(h_top)[i])) / k
            for i in range(t_top.shape[0])
        ])
        assert agree >= 0.98, f"host vs traced stack agreement {agree}"
        monkeypatch.setattr(MultiTableIndexer, "HOST_LAYOUT_ROWS",
                            2_000_000)
