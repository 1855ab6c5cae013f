"""Training-shard layout: determinism, seed sensitivity, sorted shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.sharding import (
    training_order,
    write_training_shards,
)


def _docs(spark, n=300):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("payload")
    )


def test_training_order_is_deterministic_and_layout_stable(spark):
    df = _docs(spark)
    a = {(r["doc_id"], r["tshard"], r["tshard_pos"])
         for r in training_order(df, "doc_id", seed="s1").collect()}
    b = {(r["doc_id"], r["tshard"], r["tshard_pos"])
         for r in training_order(df.repartition(7), "doc_id", seed="s1").collect()}
    assert a == b


def test_different_seed_reshuffles(spark):
    df = _docs(spark)
    a = {r["doc_id"]: (r["tshard"], r["tshard_pos"])
         for r in training_order(df, "doc_id", seed="s1").collect()}
    b = {r["doc_id"]: (r["tshard"], r["tshard_pos"])
         for r in training_order(df, "doc_id", seed="s2").collect()}
    assert sum(a[d] != b[d] for d in a) > len(a) // 2


def test_positions_are_dense_per_shard(spark):
    out = training_order(_docs(spark), "doc_id", seed="s1", n_shards=4).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["tshard"], []).append(r["tshard_pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for pos in by_shard.values():
        assert sorted(pos) == list(range(len(pos)))


def test_write_training_shards_sorted_within_each_shard(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", seed="s9", n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert {r["tshard"] for r in back.select("tshard").distinct().collect()} == {0, 1, 2, 3}
    # per shard-file row order equals seeded-hash order
    key = F.md5(F.concat_ws(":", F.lit("s9"), F.col("doc_id").cast("string")))
    for shard in range(4):
        rows = [
            r["k"]
            for r in spark.read.parquet(f"{path}/tshard={shard}")
            .select(key.alias("k")).collect()
        ]
        assert rows == sorted(rows)
