"""Product quantization (operators/quantization.py): fused training
parity, ADC semantics, encode determinism, plan gates."""

import pytest
from pyspark.sql import functions as F

from training_datawarehouse_spark.operators import quantization as pq
from training_datawarehouse_spark.operators.similarity import (
    _as_double, kmeans_fit,
)


def _emb(spark, n=40, dim=8, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim)).round(3).tolist()
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_pq_train_fused_equals_per_subspace_kmeans(spark):
    """The fused one-job-per-iteration trainer must produce byte-equal
    codebooks to m independent kmeans_fit calls with the same init —
    the fusion is a job-count optimization, never a semantics one."""
    df = _emb(spark, n=40, dim=8)
    m, ksub, iters, dsub = 2, 4, 2, 4
    fused = pq.pq_train(df, "embedding", dim=8, m=m, ksub=ksub,
                        iters=iters)
    init_rows = (
        df.filter(F.col("vec_id") < ksub).orderBy("vec_id")
        .select("embedding").collect()
    )
    for j in range(m):
        sub = df.select(
            pq._sub(_as_double(F.col("embedding")), j, dsub).alias("__sv")
        )
        init = [
            [float(x) for x in r[0][j * dsub:(j + 1) * dsub]]
            for r in init_rows
        ]
        cents, _ = kmeans_fit(sub, "__sv", k=ksub, iters=iters,
                              init_vectors=init, round_dp=6)
        assert fused[j] == cents, f"subspace {j} diverged"


def test_pq_encode_zero_error_on_centroid_vectors(spark):
    """A vector that IS the concatenation of per-subspace centroids
    must encode to those exact codes with recon_err == 0, and ADC to
    it from itself-as-query must be 0 for every codebook entry it
    hits."""
    books = [
        [[1.0, 0.0], [0.0, 1.0]],   # subspace 0: 2 codes, 2 dims
        [[2.0, 2.0], [-1.0, 3.0]],  # subspace 1
    ]
    df = spark.createDataFrame(
        [(0, [1.0, 0.0, -1.0, 3.0]),   # codes (0, 1)
         (1, [0.0, 1.0, 2.0, 2.0])],   # codes (1, 0)
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in
            pq.pq_encode(df, "embedding", books).collect()}
    assert list(rows[0]["codes"]) == [0, 1]
    assert list(rows[1]["codes"]) == [1, 0]
    assert rows[0]["recon_err"] == 0.0
    assert rows[1]["recon_err"] == 0.0
    # ADC: query 0 vs neighbor 1 — distance is exact (both vectors
    # are representable), so adc_d2 equals the true squared L2
    codes = pq.pq_encode(df, "embedding", books)
    adc = {
        (r["query_id"], r["neighbor_id"]): r["adc_d2"]
        for r in pq.pq_adc_scores(codes, df, books).collect()
    }
    true_d2 = sum(
        (a - b) ** 2
        for a, b in zip([1.0, 0.0, -1.0, 3.0], [0.0, 1.0, 2.0, 2.0])
    )
    assert adc[(0, 1)] == pytest.approx(true_d2, abs=1e-9)
    assert adc[(1, 0)] == pytest.approx(true_d2, abs=1e-9)
    assert (0, 0) not in adc  # self excluded


def test_pq_code_tie_breaks_lowest_cid(spark):
    """Equidistant codes pick the LOWEST code id (the argmin-struct
    sort contract the oracle mirrors)."""
    books = [[[1.0], [-1.0]]]  # both at distance 1 from 0.0
    df = spark.createDataFrame(
        [(0, [0.0])], "vec_id long, embedding array<double>"
    )
    r = pq.pq_encode(df, "embedding", books).collect()[0]
    assert list(r["codes"]) == [0]


def test_pq_stays_jvm_and_bounded_storage(spark):
    """No Python row crossing in encode/ADC plans; training releases
    its cached projection (work.unpersist in the finally)."""
    def pids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    df = _emb(spark, n=30, dim=8)
    before = pids()
    books = pq.pq_train(df, "embedding", dim=8, m=2, ksub=4, iters=2)
    assert pids() - before == set(), "training persist leaked"
    codes = pq.pq_encode(df, "embedding", books)
    adc = pq.pq_adc_scores(codes, df.filter(F.col("vec_id") < 2), books)
    plan = adc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert adc.count() == 2 * 29


def test_pq_adc_duplicate_pairs_deduplicated(spark):
    """r8 ADVICE: a candidate generator that emits the same
    (query, neighbor) pair twice must not produce duplicate ADC rows
    (they would corrupt downstream row_number rankings)."""
    df = _emb(spark, n=12, dim=4)
    books = pq.pq_train(df, "embedding", dim=4, m=2, ksub=4, iters=2)
    codes = pq.pq_encode(df, "embedding", books)
    queries = df.filter(F.col("vec_id") < 2)
    pairs_unique = spark.createDataFrame(
        [(0, 5), (0, 7), (1, 5)], "query_id long, neighbor_id long"
    )
    pairs_dup = pairs_unique.unionAll(pairs_unique).unionAll(
        spark.createDataFrame([(0, 5)], "query_id long, neighbor_id long")
    )
    want = sorted(
        map(tuple, pq.pq_adc_scores(codes, queries, books,
                                    pairs=pairs_unique).collect())
    )
    got = sorted(
        map(tuple, pq.pq_adc_scores(codes, queries, books,
                                    pairs=pairs_dup).collect())
    )
    assert got == want
    assert len(got) == 3


# ----------------------------------------------- scalar quantization

def test_sq_train_bounds_and_ragged_refusal(spark):
    df = spark.createDataFrame(
        [(0, [0.0, -2.0]), (1, [1.0, 2.0]), (2, [0.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    mins, maxs = pq.sq_train(df, "embedding", 2)
    assert mins == [0.0, -2.0] and maxs == [1.0, 2.0]
    ragged = df.union(spark.createDataFrame(
        [(3, [1.0])], "vec_id long, embedding array<double>"))
    with pytest.raises(ValueError, match="ragged"):
        pq.sq_train(ragged, "embedding", 2)


def test_sq_encode_known_codes_and_constant_dim(spark):
    """code = round((x-mn)*255/(mx-mn)) clamped; a constant dimension
    (mx == mn) codes to 0 instead of dividing by zero."""
    df = spark.createDataFrame(
        [(0, [0.0, 7.0]), (1, [0.5, 7.0]), (2, [1.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    mins, maxs = pq.sq_train(df, "embedding", 2)
    got = {r["vec_id"]: r["codes"]
           for r in pq.sq_encode(df, "embedding", mins, maxs).collect()}
    assert got[0] == [0, 0]
    assert got[1] == [128, 0]   # 0.5*255 = 127.5 -> half-up 128
    assert got[2] == [255, 0]


def test_sq_adc_matches_python_reference(spark):
    """Micro-exact ADC distances equal an independent Python loop over
    the same reconstruction arithmetic."""
    df = _emb(spark, n=20, dim=4)
    mins, maxs = pq.sq_train(df, "embedding", 4)
    codes = pq.sq_encode(df, "embedding", mins, maxs)
    queries = df.filter(F.col("vec_id") < 2)
    got = {(r["query_id"], r["neighbor_id"]): r["sq_d2"]
           for r in pq.sq_adc_scores(codes, queries, mins, maxs).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    cmap = {r["vec_id"]: r["codes"] for r in codes.collect()}
    for q in (0, 1):
        for n, v in vecs.items():
            if n == q:
                assert (q, n) not in got
                continue
            micro = 0
            for j in range(4):
                rec = mins[j] + cmap[n][j] * (maxs[j] - mins[j]) / 255.0
                d = vecs[q][j] - rec
                micro += round(d * d * 1e6)
            assert got[(q, n)] == micro / 1e6, (q, n)


def test_sq_roundtrip_error_bounded(spark):
    """Reconstruction error per dim is bounded by half a quantization
    step — the property that makes SQ8 near-exact."""
    df = _emb(spark, n=50, dim=8)
    mins, maxs = pq.sq_train(df, "embedding", 8)
    codes = pq.sq_encode(df, "embedding", mins, maxs)
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for r in codes.collect():
        for j, c in enumerate(r["codes"]):
            rec = mins[j] + c * (maxs[j] - mins[j]) / 255.0
            step = (maxs[j] - mins[j]) / 255.0
            assert abs(vecs[r["vec_id"]][j] - rec) <= step / 2 + 1e-12


def test_normalized_embeddings_zero_vector_guard(spark):
    """A zero vector must normalize to the zero vector, not NaN —
    Spark's max ranks NaN greatest while DuckDB's ignores it, so an
    unguarded 0/0 would silently diverge the sq8n trained bounds
    between engines."""
    import math

    from training_datawarehouse_spark.plans.northstar import (
        normalized_embeddings,
    )

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["embedding"]
           for r in normalized_embeddings(df).collect()}
    assert got[0] == [0.6, 0.8]
    assert got[1] == [0.0, 0.0]
    assert not any(math.isnan(x) for v in got.values() for x in v)
    # and the downstream sq pipeline stays NaN-free on such a corpus
    mins, maxs = pq.sq_train(normalized_embeddings(df), "embedding", 2)
    assert mins == [0.0, 0.0] and maxs == [0.6, 0.8]
