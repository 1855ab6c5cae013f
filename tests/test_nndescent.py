"""NN-descent k-NN graph construction (`operators/nndescent.py`).

Covers the claims the registry 'nnd' stage leans on: graph shape
invariants (k out-edges per node, no self edges, deterministic
rebuild), the paper's monotone-improvement property (each local-join
round can only improve a node's neighborhood under the kept-k
ordering), convergence to the EXACT k-NN graph on a small corpus
(where enough rounds must reach it), and the member-query top-k
adapter.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.nndescent import (
    nnd_graph, nnd_topk,
)


def _toy(spark, n=40, seed=3, dim=8):
    rng = np.random.RandomState(seed)
    pts = rng.standard_normal((n, dim))
    return spark.createDataFrame(
        [(i, [float(x) for x in np.round(p, 6)]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )


def _exact_graph(df, k):
    rows = df.collect()
    X = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
         for r in rows}

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))),
                     6)

    out = {}
    for s in X:
        sims = {d: cos(X[s], X[d]) for d in X if d != s}
        out[s] = set(sorted(sims, key=lambda d: (-sims[d], d))[:k])
    return out


def test_graph_shape_and_determinism(spark):
    df = _toy(spark)
    g1 = nnd_graph(df, k=5, iters=2)
    rows = g1.collect()
    assert len(rows) == 40 * 5
    assert all(r["src"] != r["dst"] for r in rows)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], set()).add(r["dst"])
    assert all(len(v) == 5 for v in per_src.values())
    # deterministic: a rebuild yields the identical edge set
    g2 = nnd_graph(df, k=5, iters=2)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, g2.collect()))


def test_monotone_improvement_and_convergence(spark):
    """Each round's kept-k neighborhoods only improve (the paper's
    monotonicity), and on a 40-point corpus the graph converges to
    NEAR-exact within a few rounds. It plateaus at a LOCAL optimum
    (measured: 0.985 here, stable from iters=4 to 6) — NN-descent is
    approximate by construction: an edge whose endpoints share no
    path of current neighbors is never proposed. The plateau, not
    1.0, is the honest published contract (Dong et al. 2011 report
    ~0.95–1.0 recall at convergence depending on data)."""
    df = _toy(spark)
    exact = _exact_graph(df, 5)

    def quality(g):
        return sum(r["cos"] for r in g.collect())

    def match(g):
        got = {}
        for r in g.collect():
            got.setdefault(r["src"], set()).add(r["dst"])
        return sum(len(got[s] & exact[s]) for s in exact) / (40 * 5)

    q_prev = m_prev = None
    for it in (0, 1, 2, 4):
        g = nnd_graph(df, k=5, iters=it)
        q, m = quality(g), match(g)
        if q_prev is not None:
            assert q >= q_prev - 1e-9, (it, q, q_prev)
            assert m >= m_prev - 1e-9, (it, m, m_prev)
        q_prev, m_prev = q, m
    assert m_prev >= 0.97  # near-exact plateau (measured 0.985)


def test_topk_member_queries(spark):
    df = _toy(spark)
    g = nnd_graph(df, k=6, iters=4)
    exact = _exact_graph(df, 3)
    q = spark.createDataFrame([(0,), (7,)], "query_id long")
    top = nnd_topk(g, q, 3).collect()
    assert {r["query_id"] for r in top} == {0, 7}
    for qid in (0, 7):
        mine = sorted((r for r in top if r["query_id"] == qid),
                      key=lambda r: r["rank"])
        assert [r["rank"] for r in mine] == [1, 2, 3]
        # ranks ordered by similarity, ties by id (the contract)
        assert all(a["cos"] >= b["cos"] for a, b in zip(mine, mine[1:]))
        # near-exact plateau: at least 2 of 3 true neighbors surface
        assert len({r["neighbor_id"] for r in mine} & exact[qid]) >= 2


def test_rejects_degenerate_corpus(spark):
    df = _toy(spark, n=5)
    with pytest.raises(ValueError, match="need more than k"):
        nnd_graph(df, k=8, iters=1)
    with pytest.raises(TypeError):
        nnd_topk(df, [0, 1], 3)


def test_checkpoints_released_on_failure(spark):
    """The iteration loop's error path releases its checkpoints (the
    wordpiece discipline) — force a failure by passing a frame whose
    vector column breaks scoring lazily."""
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    # fail LAZILY at evaluation time (the first eager checkpoint's
    # job), not at plan construction
    bad = _toy(spark, n=20).withColumn(
        "embedding",
        F.when(F.assert_true(F.col("vec_id") < 5).isNull(),
               F.col("embedding")),
    )
    with pytest.raises(Exception):
        nnd_graph(bad, k=3, iters=1).collect()
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert after <= before + 1  # at most the in-flight frame, no pile-up


def test_incremental_flag_is_result_identical(spark):
    """The paper's Algorithm-2 incremental flag (default on) must be
    RESULT-IDENTICAL to the full local join: a pair of co-neighbors of
    some center is generated exactly once — in the round its later
    entrant is still flagged new — so skipping settled (old, old)
    pairs discards only re-evaluations."""
    df = _toy(spark, n=60, seed=11)
    for iters in (1, 3):
        full = sorted(map(tuple, nnd_graph(
            df, k=5, iters=iters, incremental=False).collect()))
        inc = sorted(map(tuple, nnd_graph(
            df, k=5, iters=iters, incremental=True).collect()))
        assert full == inc, iters


def test_sampling_knob_bounds_fanout_and_keeps_recall(spark):
    """The sample-rate knob (deterministic md5-least per center) is an
    APPROXIMATION and this test prices it: capping the general
    neighborhood at 1.6k entries per center costs real recall on the
    toy corpus (measured 0.54 vs 0.83 full at the same rounds — the
    recall/cost dial the paper's ρ turns), degrades gracefully rather
    than collapsing, and stays deterministic (md5 order, not RNG)."""
    df = _toy(spark, n=60, seed=11)
    exact = _exact_graph(df, 5)

    def match(g):
        got = {}
        for r in g.collect():
            got.setdefault(r["src"], set()).add(r["dst"])
        return sum(len(got[s] & exact[s]) for s in exact) / (60 * 5)

    m_full = match(nnd_graph(df, k=5, iters=4))
    g_samp = nnd_graph(df, k=5, iters=4, sample=8)
    m_samp = match(g_samp)
    assert m_full >= 0.8
    assert 0.35 <= m_samp < m_full   # priced, graceful, not free
    # deterministic: the sampled build reproduces exactly
    again = nnd_graph(df, k=5, iters=4, sample=8)
    assert sorted(map(tuple, g_samp.collect())) \
        == sorted(map(tuple, again.collect()))


def test_beam_search_non_member_queries(spark):
    """`nnd_search` — the serving path for queries OUTSIDE the corpus:
    held-out points must find (most of) their true neighbors by
    descending the graph from the fixed entry set, deterministically."""
    from training_datawarehouse_spark.operators.nndescent import nnd_search

    rng = np.random.RandomState(21)
    pts = rng.standard_normal((50, 8))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in np.round(p, 6)])
         for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    # held-out queries: perturbations of corpus points (realistic ANN
    # load) plus one far-out random point
    qpts = [pts[3] + 0.05 * rng.standard_normal(8),
            pts[17] + 0.05 * rng.standard_normal(8),
            rng.standard_normal(8) * 2]
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in np.round(p, 6)])
         for i, p in enumerate(qpts)],
        "query_id long, embedding array<double>",
    )
    g = nnd_graph(corpus, k=6, iters=4)
    got = nnd_search(g, corpus, queries, k=5, beam=10, hops=3)
    rows = got.collect()

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))),
                     6)

    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {100, 101, 102}
    total_hits = 0
    for i, qp in enumerate(qpts):
        sims = {j: cos(qp, pts[j]) for j in range(50)}
        exact = set(sorted(sims, key=lambda j: (-sims[j], j))[:5])
        mine = sorted(per_q[100 + i], key=lambda r: r["rank"])
        assert [r["rank"] for r in mine] == [1, 2, 3, 4, 5]
        assert all(a["cos"] >= b["cos"] for a, b in zip(mine, mine[1:]))
        total_hits += len({r["neighbor_id"] for r in mine} & exact)
    assert total_hits >= 12   # >= 0.8 mean recall@5 across the queries
    # deterministic serve: identical rerun
    again = nnd_search(g, corpus, queries, k=5, beam=10, hops=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_beam_search_clustered_needs_navigation_entries(spark):
    """The clustered-regime serving gate, with the failure mode pinned
    FIRST: a converged k-NN graph over clustered vectors is
    near-disconnected across clusters, so the global entry set leaves
    whole clusters unreachable (recall per cluster is binary). The
    production composition — per-query entries from the coarse
    quantizer's probed lists (IVF-entry + graph-refine) — must
    recover recall 1.0 on the same graph."""
    from pyspark.sql import functions as F

    from training_datawarehouse_spark.operators import similarity as sim
    from training_datawarehouse_spark.operators.nndescent import nnd_search
    from training_datawarehouse_spark.sources.tables import load_table

    base = (load_table(spark, "/root/testdata/sf0.001", "embeddings")
            .filter(F.col("vec_id") < 8).orderBy("vec_id").collect())
    centers = np.array([r["embedding"] for r in base], dtype="float64")
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True) * 6.0
    rng = np.random.RandomState(97)
    rows, pts = [], {}
    for c in range(8):
        p8 = centers[c] + 0.3 * rng.standard_normal((12, 64))
        for i, p in enumerate(p8):
            vid = c if i == 0 else 8 + c * 11 + (i - 1)
            rows.append((vid, [float(x) for x in np.round(p, 6)]))
            pts[vid] = p
    mog = spark.createDataFrame(
        sorted(rows), "vec_id long, embedding array<double>")
    qrows, qpts = [], {}
    for c in range(8):
        qp = centers[c] + 0.3 * rng.standard_normal(64)
        qrows.append((200 + c, [float(x) for x in np.round(qp, 6)]))
        qpts[200 + c] = qp
    qdf = spark.createDataFrame(
        qrows, "query_id long, embedding array<double>")
    g = nnd_graph(mog, k=8, iters=3)

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    def mean_recall(result_rows):
        got = {}
        for r in result_rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recs = []
        for qid, qp in qpts.items():
            sims = {v: round(cos(qp, pts[v]), 6) for v in pts}
            exact = set(sorted(sims, key=lambda v: (-sims[v], v))[:5])
            recs.append(len(got.get(qid, set()) & exact) / 5)
        return sum(recs) / len(recs)

    # (1) the pinned failure: global entries strand most clusters
    m_global = mean_recall(
        nnd_search(g, mog, qdf, k=5, beam=10, hops=3).collect())
    assert m_global <= 0.8, m_global   # measured 0.375 — stuck by design

    # (2) navigation entries: train the coarse quantizer (the registry
    # init discipline: ids 0..7 as init vectors), probe 2 lists per
    # query, enter at each probed list's lowest-id member
    init = [r["embedding"] for r in base]
    cents, _ = sim.kmeans_fit(
        mog, "embedding", k=8, iters=4, init_vectors=init, round_dp=6)
    cassign = mog.select(
        F.col("vec_id").alias("nid"),
        sim.nearest_centroid_lists(
            sim._as_double(F.col("embedding")), cents, 1
        )[0]["list_id"].alias("list_id"),
    )
    reps = cassign.groupBy("list_id").agg(F.min("nid").alias("nid"))
    qassign = qdf.select(
        "query_id",
        F.explode(F.transform(
            sim.nearest_centroid_lists(
                sim._as_double(F.col("embedding")), cents, 2),
            lambda s: s["list_id"],
        )).alias("list_id"),
    )
    entries = qassign.join(reps, "list_id").select("query_id", "nid")
    m_nav = mean_recall(
        nnd_search(g, mog, qdf, k=5, beam=10, hops=3,
                   entry_df=entries).collect())
    assert m_nav == 1.0, m_nav


def test_search_covers_queries_with_repless_entry_cells(spark):
    """r16 (the r15 verdict's empty-rep seam): an IVF cell with no
    layer member yields no representative, so a query assigned only
    to rep-less cells used to get ZERO frontier rows and silently
    vanish from ``nnd_search``'s result. The library now provides the
    safe default (``cover_missing=True``): uncovered queries fall
    back to the global md5-least entries — bit-identical to the
    no-``entry_df`` descent for those queries — while covered queries
    are untouched. The cell is PLANTED: reps for one query's nearest
    list are deleted before entry derivation."""
    from pyspark.sql import functions as F

    from training_datawarehouse_spark.operators import similarity as sim
    from training_datawarehouse_spark.operators.nndescent import nnd_search
    from training_datawarehouse_spark.sources.tables import load_table

    base = (load_table(spark, "/root/testdata/sf0.001", "embeddings")
            .filter(F.col("vec_id") < 8).orderBy("vec_id").collect())
    centers = np.array([r["embedding"] for r in base], dtype="float64")
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True) * 6.0
    rng = np.random.RandomState(41)
    rows = []
    for c in range(8):
        p8 = centers[c] + 0.3 * rng.standard_normal((12, 64))
        for i, p in enumerate(p8):
            vid = c if i == 0 else 8 + c * 11 + (i - 1)
            rows.append((vid, [float(x) for x in np.round(p, 6)]))
    mog = spark.createDataFrame(
        sorted(rows), "vec_id long, embedding array<double>")
    qrows = []
    for c in range(8):
        qp = centers[c] + 0.3 * rng.standard_normal(64)
        qrows.append((200 + c, [float(x) for x in np.round(qp, 6)]))
    qdf = spark.createDataFrame(
        qrows, "query_id long, embedding array<double>")
    g = nnd_graph(mog, k=8, iters=3)

    init = [r["embedding"] for r in base]
    cents, _ = sim.kmeans_fit(
        mog, "embedding", k=8, iters=4, init_vectors=init, round_dp=6)
    cassign = mog.select(
        F.col("vec_id").alias("nid"),
        sim.nearest_centroid_lists(
            sim._as_double(F.col("embedding")), cents, 1
        )[0]["list_id"].alias("list_id"),
    )
    reps = cassign.groupBy("list_id").agg(F.min("nid").alias("nid"))
    # 1-probe assignment so a single planted empty cell strands its
    # queries outright (2-probe would need two adjacent empty cells)
    qassign = qdf.select(
        "query_id",
        sim.nearest_centroid_lists(
            sim._as_double(F.col("embedding")), cents, 1
        )[0]["list_id"].alias("list_id"),
    )
    victim = qassign.filter(F.col("query_id") == 200) \
        .select("list_id").first()["list_id"]
    reps_f = reps.filter(F.col("list_id") != victim)
    entries = qassign.join(reps_f, "list_id").select("query_id", "nid")
    stranded = {r["query_id"] for r in qassign
                .join(reps_f.select("list_id"), "list_id", "left_anti")
                .select("query_id").collect()}
    assert 200 in stranded

    # the seam, pinned: without the safe default the stranded queries
    # are simply ABSENT from the result
    legacy = nnd_search(g, mog, qdf, k=5, beam=10, hops=3,
                        entry_df=entries, cover_missing=False).collect()
    assert {r["query_id"] for r in legacy}.isdisjoint(stranded)

    covered_rows = nnd_search(g, mog, qdf, k=5, beam=10, hops=3,
                              entry_df=entries).collect()
    got = {}
    for r in covered_rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos"]))
    # every query present with exactly k rows
    assert set(got) == {200 + c for c in range(8)}
    assert all(len(v) == 5 for v in got.values())
    # stranded queries' results are bit-identical to the global
    # default-entry descent (same rule, same rounding, same ties)
    fallback = nnd_search(
        g, mog,
        qdf.filter(F.col("query_id").isin(*stranded)),
        k=5, beam=10, hops=3).collect()
    want = {}
    for r in fallback:
        want.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos"]))
    for qid in stranded:
        assert sorted(got[qid]) == sorted(want[qid])
    # covered queries untouched by the fallback arm
    legacy_by_q = {}
    for r in legacy:
        legacy_by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos"]))
    for qid, v in legacy_by_q.items():
        assert sorted(got[qid]) == sorted(v)


def test_returned_frames_are_releasable(spark):
    """r11 review regression gate: the frames nnd_graph/nnd_search
    RETURN must have the checkpoint as their plan root — a projection
    on top makes the caller's release_local_checkpoint a silent no-op
    and leaks the RDD for the session (the defect the review caught:
    similarity_ann 'released' a projection)."""
    from training_datawarehouse_spark.functions.caching import (
        release_local_checkpoint,
    )
    from training_datawarehouse_spark.operators.nndescent import nnd_search

    df = _toy(spark, n=30)
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    for g in (nnd_graph(df, k=4, iters=2), nnd_graph(df, k=4, iters=0)):
        assert g.columns == ["src", "dst", "cos"]
        assert release_local_checkpoint(g) is True, "projection root"
    g = nnd_graph(df, k=4, iters=2)
    qvec = df.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    q = spark.createDataFrame(
        [(900, qvec)], "query_id long, embedding array<double>")
    res = nnd_search(g, df, q, k=3, beam=6, hops=2)
    assert release_local_checkpoint(res) is True
    assert release_local_checkpoint(g) is True
    after = sc._jsc.sc().getPersistentRDDs().size()
    assert after <= before  # everything created here was released


def test_search_rejects_k_wider_than_beam(spark):
    from training_datawarehouse_spark.operators.nndescent import nnd_search

    df = _toy(spark, n=30)
    g = nnd_graph(df, k=4, iters=1)
    qvec = df.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    q = spark.createDataFrame(
        [(900, qvec)], "query_id long, embedding array<double>")
    with pytest.raises(ValueError, match="exceeds beam"):
        nnd_search(g, df, q, k=10, beam=8)
    release = __import__(
        "training_datawarehouse_spark.functions.caching",
        fromlist=["release_local_checkpoint"]).release_local_checkpoint
    release(g)


def test_insert_recall_parity_vs_rebuild(spark):
    """r12 incremental maintenance: build on 80, insert 20, compare
    recall@k of the merged graph's adjacency (vs the exact brute-force
    lists over all 100) against a FULL REBUILD on 100 — the insert
    path must not cost recall. Also: untouched old nodes' lists must
    be byte-identical to the pre-insert graph (splice locality)."""
    from training_datawarehouse_spark.operators.nndescent import nnd_insert

    k = 5
    full = _toy(spark, n=100, seed=7)
    old = full.filter(F.col("vec_id") < 80)
    new = full.filter(F.col("vec_id") >= 80)
    g_old = nnd_graph(old, k=k, iters=3)
    g_ins = nnd_insert(g_old, old, new, k=k, iters=2)
    g_reb = nnd_graph(full, k=k, iters=3)
    exact = _exact_graph(full, k)

    def adjacency(g):
        adj = {}
        for r in g.collect():
            adj.setdefault(r["src"], set()).add(r["dst"])
        return adj

    def recall(adj, ids):
        return sum(
            len(adj[i] & exact[i]) / k for i in ids
        ) / len(ids)

    a_ins, a_reb = adjacency(g_ins), adjacency(g_reb)
    assert set(a_ins) == set(range(100))
    assert all(len(v) == k for v in a_ins.values())
    new_ids = range(80, 100)
    r_ins, r_reb = recall(a_ins, new_ids), recall(a_reb, new_ids)
    # parity: within 10% of rebuild recall on the inserted nodes,
    # and good in absolute terms
    assert r_ins >= r_reb - 0.1, (r_ins, r_reb)
    assert r_ins >= 0.75, r_ins
    # whole-graph recall parity too
    all_ids = range(100)
    assert recall(a_ins, all_ids) >= recall(a_reb, all_ids) - 0.1


def test_insert_untouched_nodes_unchanged(spark):
    """Splice locality: an old node never touched by a seed edge and
    not reached by refine keeps its exact pre-insert list. With
    iters=0 (splice only), EVERY non-touched node is untouched."""
    from training_datawarehouse_spark.operators.nndescent import nnd_insert

    k = 4
    full = _toy(spark, n=60, seed=11)
    old = full.filter(F.col("vec_id") < 50)
    new = full.filter(F.col("vec_id") >= 50)
    g_old = nnd_graph(old, k=k, iters=2)
    before = {}
    for r in g_old.collect():
        before.setdefault(r["src"], set()).add((r["dst"], r["cos"]))
    g0 = nnd_insert(g_old, old, new, k=k, iters=0)
    rows = g0.collect()
    after = {}
    for r in rows:
        after.setdefault(r["src"], set()).add((r["dst"], r["cos"]))
    # new nodes present with k seeds each
    assert all(len(after[i]) == k for i in range(50, 60))
    # old nodes: either untouched-identical, or re-ranked top-k of
    # (old list ∪ reversed seeds) — verify the untouched ones exactly
    touched = {d for i in range(50, 60) for (d, _) in after[i]}
    for s in range(50):
        if s not in touched:
            assert after[s] == before[s], s


def test_insert_touched_only_refine_is_result_identical(spark):
    """The batch-sized refine restriction (touched centers only,
    changed srcs only) must be a pure optimization: edge-for-edge
    identical to the unrestricted incremental loop."""
    from training_datawarehouse_spark.operators.nndescent import nnd_insert

    full = _toy(spark, n=90, seed=5)
    old = full.filter(F.col("vec_id") < 70)
    new = full.filter(F.col("vec_id") >= 70)
    g_old = nnd_graph(old, k=5, iters=2)
    a = nnd_insert(g_old, old, new, k=5, iters=2,
                   refine_touched_only=True)
    b = nnd_insert(g_old, old, new, k=5, iters=2,
                   refine_touched_only=False)
    ea = sorted(map(tuple, a.collect()))
    eb = sorted(map(tuple, b.collect()))
    assert ea == eb


def test_hier_search_beats_flat_on_manifold(spark):
    """The graph-diameter wall, pinned at test scale (the 200k probe's
    finding): on a 1-D ring manifold a flat beam search from global
    entries cannot walk to the target in a few hops; the 2-layer
    hierarchical descent (sampled coarse graph -> per-query entries)
    recovers the neighbors. Graphs here are the EXACT adjacency (the
    test isolates SEARCH from build quality)."""
    import math as m

    from training_datawarehouse_spark.operators.nndescent import (
        nnd_search, nnd_search_hier,
    )

    n = 400
    def vec(i):
        th = 2 * m.pi * i / n
        return [round(m.cos(th), 6), round(m.sin(th), 6)] + [0.0] * 6

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    def ring_edges(ids, step):
        rows = []
        for i in ids:
            for d in (-2, -1, 1, 2):
                j = (i + d * step) % n
                if j in set(ids):
                    c = round(m.cos(2 * m.pi * d * step / n), 6)
                    rows.append((i, j, c))
        return rows

    g0 = spark.createDataFrame(ring_edges(list(range(n)), 1),
                               "src long, dst long, cos double")
    layer_ids = list(range(0, n, 10))
    emb1 = emb.filter(F.col("vec_id") % 10 == 0)
    g1 = spark.createDataFrame(ring_edges(layer_ids, 10),
                               "src long, dst long, cos double")
    queries = spark.createDataFrame(
        [(i, vec(i)) for i in range(3, n, 40)],   # spread over the ring
        "query_id long, embedding array<double>",
    )
    exact = {
        i: {(i + d) % n for d in (-2, -1, 1, 2)} | {i}
        for i in range(3, n, 40)
    }

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(i, set()) & exact[i]) / 5
                   for i in exact) / len(exact)

    flat = recall(nnd_search(g0, emb, queries, k=5, beam=8, hops=4)
                  .collect())
    hier = recall(nnd_search_hier(
        g0, emb, g1, emb1, queries, k=5, beam=8, hops0=6, hops1=6,
        n_entry=4,
    ).collect())
    assert flat <= 0.5, flat     # the wall: 4 hops from 4 fixed entries
    assert hier >= 0.9, hier     # the hierarchy walks the manifold
    assert hier > flat


def _clustered(spark, n_clusters=12, members=40, dim=16, seed=5,
               spread=0.3):
    """Well-separated gaussian clusters — the regime where ring-init
    descent is round-hungry (in-cluster candidate rate =
    members/n per round 1) and IVF seeding starts converged-adjacent."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 5.0
    rows = []
    for c in range(n_clusters):
        for m in range(members):
            v = centers[c] + spread * rng.standard_normal(dim)
            rows.append((c * 1000 + m,
                         [float(x) for x in np.round(v, 6)]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_ivf_seeded_build_converges_where_ring_init_lags(spark):
    """The r13 IVF-seeded init, pinned at test scale: on a clustered
    corpus the seeded build (nnd_graph_ivf — coarse-cell rings as
    init) is several times closer to the exact graph than the same
    round budget from the random hash-ring init (the 200 k probe's
    two-phase finding: seeding converts every coarse-navigation round
    into fine descent). Measured here: ivf 0.64 vs ring 0.14 at 3
    rounds — seeding helps every round but random IN-cell seeds still
    start a cluster-diameter away, which is why the recursive build
    (test below) is the full convergence recipe. Also: shape
    invariants and deterministic rebuild hold for the seeded path."""
    from training_datawarehouse_spark.operators.nndescent import (
        nnd_graph_ivf,
    )

    df = _clustered(spark)
    exact = _exact_graph(df, 6)

    def match(g):
        got = {}
        for r in g.collect():
            got.setdefault(r["src"], set()).add(r["dst"])
        return sum(len(got.get(s, set()) & exact[s])
                   for s in exact) / (len(exact) * 6)

    ring = nnd_graph(df, k=6, iters=3)
    g_ivf, cents = nnd_graph_ivf(df, k=6, iters=3, n_lists=12,
                                 kmeans_iters=3)
    assert len(cents) == 12
    m_ring, m_ivf = match(ring), match(g_ivf)
    assert m_ivf > 2 * m_ring, (m_ivf, m_ring)  # seeding buys rounds
    assert m_ivf >= 0.5, m_ivf    # measured 0.64 (ring: 0.14)
    # shape invariants on the seeded path
    rows = g_ivf.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], set()).add(r["dst"])
    assert all(len(v) == 6 for v in per_src.values())
    # deterministic rebuild (trained centroids + md5 order, no RNG)
    g2, _ = nnd_graph_ivf(df, k=6, iters=3, n_lists=12, kmeans_iters=3)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, g2.collect()))


def test_recursive_build_reaches_near_exact_graph(spark):
    """The r13 convergence recipe (verdict lead task): the recursive
    build — converge a core sample IVF-seeded, then insert the rest
    in doubling waves with beam-seeded lists — reaches the near-EXACT
    graph on a clustered corpus (measured 0.999 here) where both flat
    inits plateau far lower at comparable budgets (ring 0.08@2it,
    ivf-seeded 0.37@2it). Beam seeds are approximate top-k already,
    so per-wave refine is genuine polish, not navigation."""
    from training_datawarehouse_spark.operators.nndescent import (
        nnd_graph_recursive,
    )

    df = _clustered(spark, n_clusters=8, members=30)
    exact = _exact_graph(df, 6)
    g, cents = nnd_graph_recursive(
        df, k=6, core_frac=4, core_iters=3, refine_iters=2,
        hops_core=3, hops=2, n_lists=8, kmeans_iters=3)
    assert len(cents) == 8
    got = {}
    for r in g.collect():
        got.setdefault(r["src"], set()).add(r["dst"])
    m = sum(len(got.get(s, set()) & exact[s])
            for s in exact) / (len(exact) * 6)
    assert m >= 0.95, m           # measured 0.999
    # every node has exactly k out-edges, none to itself
    assert len(got) == 240
    rows = g.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    assert all(len(v) == 6 for v in got.values())
    # power-of-two contract
    with pytest.raises(ValueError, match="power of two"):
        nnd_graph_recursive(df, k=6, core_frac=6)


def test_ivf_init_edges_shape_and_in_cell_bias(spark):
    """ivf_init_edges contract: no self-loops, distinct pairs, every
    node present as a src, and the seed edges are dominated by
    same-cluster pairs (the whole point — round 1 starts in-cluster);
    the ring_mix global edges keep the init connected across cells."""
    from training_datawarehouse_spark.operators.nndescent import (
        ivf_init_edges, nnd_graph_ivf,
    )
    from training_datawarehouse_spark.operators.similarity import (
        kmeans_fit,
    )

    df = _clustered(spark, n_clusters=6, members=30)
    init = [r[1] for r in
            df.select("vec_id", "embedding").orderBy("vec_id")
            .limit(6).collect()]
    cents, _ = kmeans_fit(df, "embedding", k=6, iters=3,
                          init_vectors=init, round_dp=6)
    edges = ivf_init_edges(df, cents, k=6, nprobe=2, ring_mix=2)
    rows = edges.collect()
    assert all(r["src"] != r["dst"] for r in rows)
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
    srcs = {r["src"] for r in rows}
    assert len(srcs) == 180                  # every node seeds
    # nprobe=2 spends half the seed budget on the 2nd-nearest cell
    # (straddle insurance — mostly cross-cluster on a well-separated
    # corpus), so the default mix is ~1/3 in-cluster...
    in_cluster = [r["src"] // 1000 == r["dst"] // 1000 for r in rows]
    assert sum(in_cluster) / len(in_cluster) >= 0.25
    # ...while pure own-cell seeding (nprobe=1, no global ring) with an
    # OVERSEGMENTED quantizer (2x lists — cells subdivide clusters
    # instead of merging them under an unlucky sample init, the
    # production sizing guidance) is dominated by same-cluster pairs
    init12 = [r[1] for r in
              df.select("vec_id", "embedding")
              .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
              .limit(12).collect()]
    cents12, _ = kmeans_fit(df, "embedding", k=12, iters=3,
                            init_vectors=init12, round_dp=6)
    own = ivf_init_edges(df, cents12, k=6, nprobe=1,
                         ring_mix=0).collect()
    own_in = [r["src"] // 1000 == r["dst"] // 1000 for r in own]
    assert sum(own_in) / len(own_in) >= 0.7
    # ring_mix=0 drops the global ring; edges shrink, still no loops
    bare = ivf_init_edges(df, cents, k=6, nprobe=2, ring_mix=0)
    assert bare.count() < len(rows)
    # nprobe must be >= 1
    with pytest.raises(ValueError):
        nnd_graph_ivf(df, k=6, n_lists=500)  # fewer vectors than lists
