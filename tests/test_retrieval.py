"""BM25 / top-k / RRF retrieval operator tests (operators/retrieval.py)."""

import math

import pytest
from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_scores,
    mlt_query_terms,
    rrf_fuse,
    topk_per_query,
)


def _bm25_py(corpus: dict, queries: dict, k1=BM25_K1, b=BM25_B) -> dict:
    """Plain-Python BM25 reference (Robertson / Lucene-default)."""
    toks = {d: t.lower().split(" ") for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, terms in queries.items():
        for d, t in toks.items():
            s = 0.0
            matched = False
            for term in terms:  # unique per query in these fixtures
                tfv = t.count(term)
                if tfv == 0:
                    continue
                matched = True
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                sat = tfv * (k1 + 1.0) / (
                    tfv + k1 * ((1.0 - b) + b * len(t) / avgdl)
                )
                s += idf * sat
            if matched:
                out[(qid, d)] = round(s, 6)
    return out


def test_bm25_matches_python_reference(spark):
    corpus = {
        1: "the cat sat on the mat",
        2: "the dog sat on the log",
        3: "cat cat cat everywhere",
        4: "nothing relevant here at all",
        5: "dog and cat together on mat",
    }
    queries = {10: ["cat", "mat"], 11: ["dog"]}
    docs = spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string"
    )
    qmap = spark.createDataFrame(
        [(q, t) for q, ts in queries.items() for t in ts],
        "query_id long, term string",
    )
    got = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in bm25_scores(docs, qmap).collect()
    }
    want = _bm25_py(corpus, queries)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-6), key


def test_bm25_rare_term_outranks_common(spark):
    """idf discrimination: a doc matching the corpus-rare query term
    must outrank docs matching only the ubiquitous one."""
    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((100, "common rareword filler"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qmap = spark.createDataFrame(
        [(1, "rareword"), (1, "common")], "query_id long, term string"
    )
    top = topk_per_query(bm25_scores(docs, qmap), k=1).collect()
    assert top[0]["neighbor_id"] == 100


def test_topk_two_level_equals_global(spark):
    """The sharded partial top-k must return EXACTLY the global top-k
    (same rows, same ranks) for any shard count — including shards
    that receive no rows and ties broken by neighbor id."""
    rows = [(1, n, float(n % 7)) for n in range(200)]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, score double"
    )
    want = [
        (r["rank"], r["neighbor_id"])
        for r in topk_per_query(scored, k=9, n_shards=1).collect()
    ]
    for shards in (4, 32, 256):
        got = [
            (r["rank"], r["neighbor_id"])
            for r in topk_per_query(scored, k=9, n_shards=shards)
            .orderBy("rank").collect()
        ]
        assert got == sorted(want), shards


def test_rrf_fuse_both_and_single_list_membership(spark):
    """RRF: a doc on BOTH lists at middling ranks must beat a doc that
    tops only one list iff 1/(60+ra)+1/(60+rb) > 1/61; docs absent
    from both never appear; two addends are order-exact."""
    a = spark.createDataFrame(
        [(1, 1, 101), (1, 2, 102), (1, 3, 103)],
        "query_id long, rank long, neighbor_id long",
    )
    b = spark.createDataFrame(
        [(1, 1, 102), (1, 2, 104)],
        "query_id long, rank long, neighbor_id long",
    )
    out = {r["neighbor_id"]: r for r in rrf_fuse(a, b, k=10).collect()}
    # 102: 1/62 + 1/61; 101: 1/61; 104: 1/62; 103: 1/63
    assert out[102]["rank"] == 1
    assert out[101]["rank"] == 2
    assert out[104]["rank"] == 3
    assert out[103]["rank"] == 4
    assert out[102]["score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9
    )
    assert set(out) == {101, 102, 103, 104}


def test_mlt_query_terms_deterministic_rule(spark):
    docs = spark.createDataFrame(
        [(7, "zeta alpha beta alpha gamma")], "doc_id long, text string"
    )
    got = sorted(
        r["term"] for r in mlt_query_terms(docs, max_terms=3).collect()
    )
    assert got == ["alpha", "beta", "gamma"]  # sorted distinct, first 3


def test_bm25_plan_broadcasts_and_stays_jvm(spark):
    """100 TB gates: the query-term prune and the df/stats joins are
    broadcasts (no shuffle of the corpus for the tiny sides), and no
    Python row crossing anywhere."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)],
        "doc_id long, text string",
    )
    qmap = spark.createDataFrame(
        [(1, "alpha"), (1, "beta")], "query_id long, term string"
    )
    out = topk_per_query(bm25_scores(docs, qmap), k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # terms, df_t, qmap
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats cross join
    assert out.count() == 3
