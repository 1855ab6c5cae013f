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
