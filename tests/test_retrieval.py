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


def _bm25_plan(spark, prune):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)],
        "doc_id long, text string",
    )
    qmap = spark.createDataFrame(
        [(1, "alpha"), (1, "beta")], "query_id long, term string"
    )
    out = topk_per_query(bm25_scores(docs, qmap, prune=prune), k=3)
    return out, out._jdf.queryExecution().executedPlan().toString()


def test_bm25_inlist_plan_prunes_before_explode(spark):
    """100 TB gates, inlist path: the query-term prune sits INSIDE the
    token array BEFORE the explode (the Generate node explodes the
    filtered array — no full-token explode feeds a join), the df/qmap
    joins broadcast, the 1-row stats frame rides a BNLJ cross join,
    and no Python row crossing anywhere."""
    out, plan = _bm25_plan(spark, "inlist")
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # df_t, qmap
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats cross join
    # the Generate's child is the filtered array: explode(filter(...))
    assert "Generate explode(filter(" in plan
    assert out.count() == 3


def test_bm25_semijoin_plan_broadcast_probes_exploded_stream(spark):
    """100 TB gates, semijoin path (unbounded query sets): the explode
    is corpus-wide but its output is pruned by a broadcast LEFT-SEMI
    probe before any shuffle — no driver collect of the vocabulary, no
    literal IN-list in the plan, no Python row crossing."""
    out, plan = _bm25_plan(spark, "semijoin")
    assert "BatchEvalPython" not in plan
    assert "LeftSemi" in plan  # broadcast semi-join term prune
    assert plan.count("BroadcastHashJoin") >= 3  # semi-prune, df_t, qmap
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats cross join
    assert "Generate explode(filter(" not in plan  # no IN-list prune
    assert out.count() == 3


def test_bm25_prune_paths_byte_identical(spark):
    """Parity gate: inlist and semijoin pruning produce byte-identical
    (query_id, neighbor_id, score) rows, and auto picks inlist under
    the threshold / semijoin above it."""
    import training_datawarehouse_spark.operators.retrieval as rtr

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "cat cat cat everywhere"),
            (4, "nothing relevant here at all"),
            (5, "dog and cat together on mat"),
        ],
        "doc_id long, text string",
    )
    qmap = spark.createDataFrame(
        [(10, "cat"), (10, "mat"), (11, "dog"), (11, "sat")],
        "query_id long, term string",
    )
    rows = {}
    for prune in ("inlist", "semijoin"):
        rows[prune] = sorted(
            (r["query_id"], r["neighbor_id"], r["score"])
            for r in bm25_scores(docs, qmap, prune=prune).collect()
        )
    assert rows["inlist"] == rows["semijoin"]
    assert len(rows["inlist"]) > 0
    with pytest.raises(ValueError):
        bm25_scores(docs, qmap, prune="nope")
    # auto flips to the semi-join above the vocabulary threshold
    big_qmap = spark.createDataFrame(
        [(10, f"term{i}") for i in range(rtr.BM25_INLIST_MAX_TERMS + 1)]
        + [(10, "cat")],
        "query_id long, term string",
    )
    auto_plan = (
        bm25_scores(docs, big_qmap)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in auto_plan
    small_plan = (
        bm25_scores(docs, qmap)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate explode(filter(" in small_plan


def test_topk_shard_hash_non_numeric_ids(spark):
    """The xxhash64 shard key makes two-level top-k valid for ANY
    orderable id type — string ids here, exact vs the global window."""
    rows = [(1, f"doc-{n:03d}", float(n % 7)) for n in range(60)]
    scored = spark.createDataFrame(
        rows, "query_id long, neighbor_id string, score double"
    )
    want = [
        (r["rank"], r["neighbor_id"])
        for r in topk_per_query(scored, k=5, n_shards=1)
        .orderBy("rank").collect()
    ]
    got = [
        (r["rank"], r["neighbor_id"])
        for r in topk_per_query(scored, k=5, n_shards=16)
        .orderBy("rank").collect()
    ]
    assert got == want and len(got) == 5


def test_bm25_query_term_contract_null_case_dups(spark):
    """r8 review contract gates: NULL terms drop in BOTH prune paths
    (the inlist collect used to crash while semijoin silently
    dropped), uppercase query terms match the lowercased token stream,
    and duplicated (query_id, term) rows do NOT double a term's
    contribution (the docstring pins the no-qtf Lucene-default
    formula)."""
    docs = spark.createDataFrame(
        [(1, "the Cat sat"), (2, "dog runs fast")],
        "doc_id long, text string",
    )
    clean = spark.createDataFrame(
        [(1, "cat")], "query_id long, term string"
    )
    messy = spark.createDataFrame(
        [(1, "Cat"), (1, "cat"), (1, None)],
        "query_id long, term string",
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in bm25_scores(docs, clean).collect()
    )
    assert len(want) == 1  # doc 1 matches 'cat'
    for prune in ("inlist", "semijoin"):
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["score"])
            for r in bm25_scores(docs, messy, prune=prune).collect()
        )
        assert got == want, prune


def test_bm25_self_retrieval_mrr_on_documents(spark):
    """Retrieval-quality gate on the real corpus (the ANN recall-row
    discipline, pytest-side): querying each sample document by its own
    more-like-this terms should surface the document itself. The
    synthetic corpus shares a ~31-word vocabulary across all docs —
    every document is topically identical, so self-retrieval is
    genuinely hard (measured MRR ≈ 0.39, 5/8 probes in the top-10;
    rank-2-behind-a-denser-doc is CORRECT BM25 behavior here) — the
    thresholds are set well under the measured values to catch
    CATASTROPHIC relevance breaks (a broken idf sign, a dropped tf
    join) that row-level parity tests cannot see because the oracle
    would drift identically, while surviving driver testdata
    regeneration."""
    from training_datawarehouse_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    probes = docs.filter(F.col("doc_id") % 61 == 0).limit(8)
    qmap = mlt_query_terms(probes, max_terms=8)
    ranked = topk_per_query(bm25_scores(docs, qmap), k=10).collect()
    rank_of_self = {}
    for r in ranked:
        if r["neighbor_id"] == r["query_id"]:
            rank_of_self[r["query_id"]] = r["rank"]
    n_probes = probes.count()
    assert n_probes == 8
    mrr = sum(1.0 / rank_of_self.get(q, 1e9) for q in
              [row["doc_id"] for row in probes.collect()]) / n_probes
    assert mrr >= 0.15, (mrr, rank_of_self)
    assert len(rank_of_self) >= 3, rank_of_self  # self in top-10
