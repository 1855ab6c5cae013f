"""Domain-mixture sampling: exact quotas, nested selections, scan-only
threshold plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.sampling import (
    mixture_sample_exact,
    mixture_sample_threshold,
)


def _corpus(spark, n=400, domains=("web", "code", "books", "wiki")):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), (F.col("id") % len(domains)).cast("string")).alias("tag"),
        F.element_at(
            F.array(*[F.lit(d) for d in domains]), (F.col("id") % len(domains) + 1).cast("int")
        ).alias("source"),
    )


FR = {"web": 0.5, "code": 0.25, "books": 0.125, "wiki": 0.0}


def test_exact_quota_lands_precisely(spark):
    df = _corpus(spark)
    n_per = {r["source"]: r["n"] for r in
             df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["source"]: r["n"] for r in
           mixture_sample_exact(df, "source", "doc_id", FR)
           .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {d: math.floor(f * n_per[d] + 0.5) for d, f in FR.items() if f > 0}
    assert got == want


def test_exact_selection_is_nested_and_layout_stable(spark):
    df = _corpus(spark)
    lo = {r["doc_id"] for r in
          mixture_sample_exact(df, "source", "doc_id", {"web": 0.2}).collect()}
    hi = {r["doc_id"] for r in
          mixture_sample_exact(df, "source", "doc_id", {"web": 0.6}).collect()}
    assert lo < hi
    # same selection regardless of partition layout (df.sample would not be)
    re = {r["doc_id"] for r in
          mixture_sample_exact(df.repartition(7), "source", "doc_id",
                               {"web": 0.6}).collect()}
    assert re == hi


def test_threshold_membership_stable_under_growth(spark):
    small = _corpus(spark, n=200)
    big = _corpus(spark, n=400)
    s = {r["doc_id"] for r in
         mixture_sample_threshold(small, "source", "doc_id", FR).collect()}
    b = {r["doc_id"] for r in
         mixture_sample_threshold(big, "source", "doc_id", FR).collect()}
    # growing the corpus never evicts previously selected documents
    assert s == {d for d in b if d < 200}


def test_threshold_plan_is_scan_only(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = mixture_sample_threshold(df, "source", "doc_id", {"src1": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Sort" not in plan


def test_default_fraction_excludes_unlisted_domains(spark):
    df = _corpus(spark)
    out = mixture_sample_exact(df, "source", "doc_id", {"web": 0.5})
    assert out.select("source").distinct().collect()[0]["source"] == "web"


def test_empty_input_yields_empty_everywhere(spark):
    from training_datawarehouse_spark.operators.dedup import (
        connected_components,
        resolve_near_duplicates,
    )
    from training_datawarehouse_spark.operators.sharding import training_order

    docs = spark.createDataFrame([], "doc_id long, text string")
    edges = spark.createDataFrame([], "id_a long, id_b long, jaccard double")
    assert mixture_sample_exact(docs, "text", "doc_id", {"x": 0.5}).count() == 0
    assert mixture_sample_threshold(docs, "text", "doc_id", {"x": 0.5}).count() == 0
    assert training_order(docs, "doc_id").count() == 0
    assert connected_components(edges).count() == 0
    assert resolve_near_duplicates(docs, edges).count() == 0
