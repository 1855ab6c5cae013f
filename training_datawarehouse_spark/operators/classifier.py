"""Distributed trained quality classifier (charter extension; no
reference implementation — SURVEY §2.2 training-pipeline surface).

The fasttext-style corpus-filtering step real LLM pipelines run: train
a linear classifier on weak provenance labels (curated domains = 1,
everything else = 0) over hashing-trick n-gram features, then score
every document — all in DataFrame ops, no MLlib, no UDFs, so the
whole fit is expressible in the DuckDB oracle and hash-checkable.

Shape (100 TB): the feature frame is (doc, bucket, count) — one
explode + one map-side-combinable groupBy, persisted once and rescanned
per epoch (the k-means pattern: cache the slim projection, never the
corpus). Each full-batch gradient-descent epoch is ONE distributed
pass: margins via a ≤(buckets+1)-literal array lookup, residuals, a
groupBy(bucket) gradient — and only buckets+1 floats return to the
driver to become the next epoch's literals (scalar-only driver
traffic, like Lloyd's). The bias rides as a synthetic always-on
feature row per document, so one aggregation trains weights AND bias,
and featureless documents still score.

Cross-engine determinism: weights round to 8 dp per epoch in BOTH
engines (driver-side ``round`` here, ``round(x, 8)`` in the oracle —
the k-means centroid discipline), so each epoch's inputs are identical
doubles and float-sum ordering can't drift the fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import doc_bigrams, hash_bucket


def logreg_quality(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_flag: Column,
    n_buckets: int = 256,
    epochs: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Train + score a logistic-regression quality classifier on
    hashed-bigram counts with ``epochs`` unrolled full-batch GD steps
    (w ← round(w + lr/N · Σᵢ xᵢ(yᵢ − σ(w·xᵢ)), 8), starting from 0).

    Returns (id_col, lrq_score, lrq_pred): σ(w·x) rounded 1e-6 and the
    ≥0.5 decision ON THE ROUNDED SCORE (so the threshold compares
    identical values in both engines). md5 feature buckets keep the
    oracle in DuckDB; production swaps xxhash64.
    """
    bias_bkt = n_buckets  # one extra slot: the always-on bias feature

    def build_feats() -> DataFrame:
        x = (
            doc_bigrams(docs, id_col, text_col)
            .select("__id", hash_bucket(F.col("bg"), n_buckets).alias("bkt"))
            .groupBy("__id", "bkt")
            .agg(F.count(F.lit(1)).cast("double").alias("x"))
        )
        return x.unionByName(
            docs.select(
                F.col(id_col).alias("__id"),
                F.lit(bias_bkt).alias("bkt"), F.lit(1.0).alias("x"),
            )
        )

    def margins(feats: DataFrame, weights: list[float]) -> DataFrame:
        warr = F.array(*[F.lit(v) for v in weights])
        return (
            feats.withColumn(
                "wx", F.element_at(warr, F.col("bkt") + 1) * F.col("x")
            )
            .groupBy("__id")
            .agg(F.sum("wx").alias("m"))
        )

    labels = docs.select(
        F.col(id_col).alias("__id"), label_flag.cast("int").alias("y")
    )
    # Training rescans a cached slim frame per epoch (the k-means
    # pattern); the RETURNED scoring plan is built on fresh lineage so
    # the cache can be released here without the caller's execution
    # silently recomputing through a dropped persist.
    feats_c = build_feats().persist()
    labels_c = labels.persist()
    try:
        n_docs = labels_c.count()
        w = [0.0] * (n_buckets + 1)
        for _ in range(epochs):
            resid = labels_c.join(margins(feats_c, w), "__id").select(
                "__id",
                (
                    F.col("y")
                    - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
                ).alias("r"),
            )
            grads = (
                feats_c.join(resid, "__id")
                .groupBy("bkt")
                .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
                .collect()
            )
            for row in grads:
                w[row["bkt"]] = round(
                    w[row["bkt"]] + lr / n_docs * row["g"], 8
                )
    finally:
        feats_c.unpersist()
        labels_c.unpersist()

    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), 6
    )
    return (
        labels.join(margins(build_feats(), w), "__id")
        .select(
            F.col("__id").alias(id_col),
            score.alias("lrq_score"),
            (score >= 0.5).alias("lrq_pred"),
        )
    )


def logreg_oracle_ctes(
    label_sql: str,
    bucket_rows_sql: str,
    n_buckets: int = 256,
    epochs: int = 3,
    lr: float = 0.5,
) -> str:
    """DuckDB CTE chain that RETRAINS the identical classifier: the
    same feature stream, the same unrolled epochs, the same 8-dp
    per-epoch weight rounding — emitting ``lrq(doc_id, lrq_score,
    lrq_pred)``. ``label_sql`` is the boolean weak-label expression
    over ``documents d``; ``bucket_rows_sql`` a query yielding one
    (doc_id, bkt) row per n-gram occurrence (callers typically reuse
    the DSIR bucket stream — same hashing trick, written once).
    CTEs referenced once per epoch are MATERIALIZED — inlined CTE
    chains re-evaluate exponentially (the BPE-oracle lesson).
    """
    bias = n_buckets
    parts = [
        f"""lrx AS MATERIALIZED (
  SELECT doc_id, bkt, count(*)::DOUBLE AS x
  FROM ({bucket_rows_sql}) GROUP BY doc_id, bkt
  UNION ALL
  SELECT doc_id, {bias} AS bkt, 1.0 AS x FROM documents
),
lry AS MATERIALIZED (
  SELECT d.doc_id, (CASE WHEN {label_sql} THEN 1 ELSE 0 END)::INT AS y
  FROM documents d
),
lrn AS (SELECT count(*)::DOUBLE AS n FROM documents),
lrw0 AS MATERIALIZED (
  SELECT unnest(range(0, {n_buckets + 1})) AS bkt, 0.0::DOUBLE AS w
)"""
    ]
    for e in range(1, epochs + 1):
        parts.append(f"""lrm{e} AS MATERIALIZED (
  SELECT f.doc_id, sum(w.w * f.x) AS m
  FROM lrx f JOIN lrw{e - 1} w USING (bkt) GROUP BY f.doc_id
),
lrr{e} AS MATERIALIZED (
  SELECT y.doc_id, y.y - 1.0 / (1.0 + exp(-m.m)) AS r
  FROM lry y JOIN lrm{e} m USING (doc_id)
),
lrg{e} AS MATERIALIZED (
  SELECT f.bkt, sum(f.x * r.r) AS g
  FROM lrx f JOIN lrr{e} r USING (doc_id) GROUP BY f.bkt
),
lrw{e} AS MATERIALIZED (
  SELECT w.bkt, round(w.w + {lr} / lrn.n * coalesce(g.g, 0.0), 8) AS w
  FROM lrw{e - 1} w LEFT JOIN lrg{e} g USING (bkt) CROSS JOIN lrn
)""")
    parts.append(f"""lrq AS MATERIALIZED (
  SELECT m.doc_id,
         round(1.0 / (1.0 + exp(-m.m)), 6) AS lrq_score,
         round(1.0 / (1.0 + exp(-m.m)), 6) >= 0.5 AS lrq_pred
  FROM (SELECT f.doc_id, sum(w.w * f.x) AS m
        FROM lrx f JOIN lrw{epochs} w USING (bkt) GROUP BY f.doc_id) m
)""")
    return ",\n".join(parts)
