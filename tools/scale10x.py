"""Measured-scaling harness: build a 10× replica of the sf0.1 tables
(multi-row-group files, so scans parallelize as they would on a real
cluster) and time a representative query per operator family at sf0.1
and at 10×. Produces the SCALE.md scaling table.

Replica construction: union of 10 copies with shifted/disambiguated
keys where identity matters (orderkey/custkey/doc_id/vec_id/user_id),
so joins and dedup don't degenerate into all-duplicates. Text is left
identical across copies EXCEPT a per-copy suffix on a 9-of-10 slice —
near-dup density stays realistic instead of exploding quadratically.

Usage: python tools/scale10x.py [queries...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1x"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# key columns to shift per copy so identity-sensitive ops stay realistic
KEY_SHIFT = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}

DEFAULT_QUERIES = [
    "tpch_q1_pricing_summary",
    "op_agg_1_cube_lattice",
    "op_win_1_ewma_dual",
    "op_dd_1_dedup_first",
    "op_jn_asof",
    "ns_text_profile",
    "ns_dedup_lsh_cross_modal",
    "op_jn_range",
    "op_stream_session_batch",
    "op_agg_event_profile",
]


def build_replica(spark) -> None:
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    from training_datawarehouse_spark.sources.tables import load_table

    for t in TABLES:
        df = load_table(spark, SRC, t)
        if t in ("region", "nation", "supplier", "part"):
            df.write.parquet(f"{DST}/{t}.parquet")
            continue
        n = df.count()
        copies = []
        for i in range(10):
            c = df
            for k in KEY_SHIFT.get(t, []):
                c = c.withColumn(k, (F.col(k) + F.lit(i * (n + 1))).cast("long"))
            if t == "documents" and i > 0:
                # 9-of-10 slice gets a per-copy suffix: keeps near-dup
                # pair density linear-ish instead of quadratic blow-up
                c = c.withColumn(
                    "text",
                    F.when(F.col("doc_id") % 10 != 0,
                           F.concat("text", F.lit(f" copymark{i}")))
                    .otherwise(F.col("text")),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(32).write.parquet(f"{DST}/{t}.parquet")
    print("replica built at", DST, flush=True)


def time_query(q, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        rows = q.builder(spark, sf_dir).collect()
        best = min(best, time.time() - t0)
        assert len(rows) >= 0
    return round(best, 2)


def main() -> None:
    from training_datawarehouse_spark.plans import QUERIES
    from training_datawarehouse_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("scale10x")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        build_replica(spark)

    # warm up JVM + Arrow workers off-benchmark
    QUERIES["op_agg_3_weighted_mean"].builder(spark, SRC).collect()
    spark.range(1).groupBy("id").applyInPandas(lambda p: p, schema="id long").collect()

    print(f"{'query':35s} {'sf0.1':>8s} {'10x':>8s} {'ratio':>6s}")
    for name in names:
        q = QUERIES[name]
        a = time_query(q, spark, SRC)
        b = time_query(q, spark, DST)
        print(f"{name:35s} {a:8.2f} {b:8.2f} {b / a:6.1f}", flush=True)


if __name__ == "__main__":
    main()
