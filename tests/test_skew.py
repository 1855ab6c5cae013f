"""Skewed fact⋈fact join stress: proves the two mitigation paths this
engine relies on at 100 TB actually engage and stay correct.

Dataset: lineitem with ~2/3 of all rows remapped onto ONE join key —
the one-hot-key shape (one hot order-month / power-law user) that makes
an unmitigated shuffled join put most of the data on a single reducer.

Path 1 — AQE skew-join splitting (on in session.py): the skewed shuffle
partition is split into parallel sub-reads at runtime; asserted from
the final adaptive plan (``skew=true`` on the sort-merge join), not
hand-waved.

Path 2 — ``skew_split_join``: hot keys never shuffle (broadcast of the
right hot slice), cold keys take the ordinary SMJ; asserted for plan
shape AND exact result parity against the plain join.

Wall-clock numbers from this test populate the SCALE.md skew row; the
test itself asserts plan facts and correctness only (time assertions
on a shared VM are flakes waiting to happen).
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.skew import (
    detect_hot_keys, skew_split_join,
)
from training_datawarehouse_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
HOT_KEY = 0


@pytest.fixture(scope="module")
def skewed_sides(spark, tmp_path_factory):
    """(left, right): left = lineitem rows with ~2/3 remapped to key 0,
    right = per-key attributes built from orders (every key present).

    The right aggregate is MATERIALIZED to parquet and re-read: AQE's
    OptimizeSkewedJoin only matches a sort-merge join whose children
    are shuffle stages directly (an interposed HashAggregate defeats
    the pattern), and a real pipeline's dimension side would be a table
    scan anyway."""
    li = load_table(spark, SF_DIR, "lineitem")
    # The 16-way spread matters: AQE splits a skewed reduce partition
    # along MAP-output boundaries, and the one-file sf0.01 scan is a
    # single map task (nothing to split along — a shape that cannot
    # occur on a many-executor cluster, where every fact scan has
    # thousands of mappers). The repartition recreates the cluster
    # shape at test scale.
    left = li.select(
        F.when(F.col("l_orderkey") % 3 != 0, F.lit(HOT_KEY))
        .otherwise(F.col("l_orderkey")).alias("k"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    ).repartition(16)
    od = load_table(spark, SF_DIR, "orders")
    right_path = str(tmp_path_factory.mktemp("skew") / "right.parquet")
    od.select(
        F.when(F.col("o_orderkey") % 3 != 0, F.lit(HOT_KEY))
        .otherwise(F.col("o_orderkey")).alias("k"),
        F.col("o_totalprice").alias("total"),
    ).groupBy("k").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("total"), 4).alias("avg_total"),
    ).write.mode("overwrite").parquet(right_path)
    right = spark.read.parquet(right_path)
    return left, right


def _checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("qty") * F.col("n_orders")), 2).alias("x"),
        F.round(F.sum("avg_total"), 2).alias("y"),
    ).collect()[0]
    return (r["n"], r["x"], r["y"])


def test_hot_key_detection(spark, skewed_sides):
    left, _ = skewed_sides
    hot = detect_hot_keys(left, "k", threshold_frac=0.05)
    assert hot == [HOT_KEY]


def test_aqe_splits_the_skewed_partition(spark, skewed_sides):
    """With broadcast off (forcing the shuffled SMJ an unmitigated plan
    would use) and test-scale skew thresholds, AQE must mark the join
    skewed and split the hot partition."""
    left, right = skewed_sides
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # the split target is clamped UP to minPartitionSize (1MB
        # default) — at MB-scale test data that clamp alone suppresses
        # the split, so scale it down with everything else
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = left.join(right, "k")
        # drive THIS plan object (count() would build a different one
        # whose adaptive state never finalizes)
        assert len(j.collect()) == left.count()   # right: 1 row per key
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_skew_split_join_matches_plain_join(spark, skewed_sides):
    left, right = skewed_sides
    plain = left.join(right, "k")
    split = skew_split_join(left, right, "k", hot_keys=[HOT_KEY])
    assert _checksum(split) == _checksum(plain)


def test_skew_split_join_plan_shape(spark, skewed_sides):
    """Hot branch broadcasts (no shuffle of the hot left rows), cold
    branch keeps an exchange-based join."""
    left, right = skewed_sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        split = skew_split_join(left, right, "k", hot_keys=[HOT_KEY])
        plan = split._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_skew_split_join_detects_when_not_given(spark, skewed_sides):
    left, right = skewed_sides
    split = skew_split_join(left, right, "k")   # auto-detection path
    plain = left.join(right, "k")
    assert _checksum(split) == _checksum(plain)


def test_empty_hot_list_degrades_to_plain_join(spark, skewed_sides):
    _, right = skewed_sides
    uniform = right.select("k", F.lit(1.0).alias("qty"),
                           F.lit(1.0).alias("price"))
    out = skew_split_join(uniform, right, "k", threshold_frac=0.5)
    assert out.count() == right.count()


def test_skew_timing_comparison(spark, skewed_sides, capsys):
    """Measured, printed, recorded in SCALE.md — not asserted (VM
    timing assertions flake); the plan-fact tests above are the gate."""
    left, right = skewed_sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def timed(label, df):
        t0 = time.time()
        df.count()
        dt = time.time() - t0
        print(f"SKEW-TIMING {label}: {dt:.3f}s")
        return dt

    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timed("smj_no_mitigation", left.join(right, "k"))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        timed("smj_aqe_skew_split", left.join(right, "k"))
        timed("skew_split_join",
              skew_split_join(left, right, "k", hot_keys=[HOT_KEY]))
    finally:
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        ):
            spark.conf.unset(k)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
