"""100× measured-scaling spot-check (round-5 verdict task 6).

Extends tools/scale10x.py's replica method by another decade for the
three cheapest-to-replicate operator families — scan-agg (tpch_q1),
exact dedup (ns_dedup_exact), as-of join (op_jn_asof) — and, new
here, SPLITS COMPUTE FROM DRIVER TRANSFER: each query is timed both
as ``collect()`` (what bench.py reports — includes transfer + Python
Row materialization of the full result on the driver) and as a
``noop``-format write (full executor-side materialization of every
output column, zero driver transfer). At 10× the as-of row's 4.3×
growth was suspected to be mostly result transfer (its OUTPUT grows
linearly with input); the noop column decides that.

Replica: one crossJoin with a 100-row copy index (a single codegen'd
plan, not a 100-way union), identity keys shifted per copy exactly as
scale10x does, documents' text suffixed per copy on a 9-of-10 slice so
exact-dup density stays ~10 % instead of collapsing 100 copies to 1.

Usage: python tools/scale100x.py [--rebuild]
Output: one table; paste into SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf100x"
N_COPIES = 100

# only the tables the three spot-check queries touch
TABLES = ["lineitem", "documents", "events"]
KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "events": ["user_id", "event_id"],
    "documents": ["doc_id"],
}
QUERIES_UNDER_TEST = ["tpch_q1_pricing_summary", "ns_dedup_exact", "op_jn_asof"]


def build_replica(spark) -> None:
    from training_datawarehouse_spark.sources.tables import load_table

    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    copies = F.col("__copy")
    for t in TABLES:
        df = load_table(spark, SRC, t)
        n = df.count()
        out = df.crossJoin(
            spark.range(N_COPIES).select(F.col("id").alias("__copy"))
        )
        for k in KEY_SHIFT[t]:
            out = out.withColumn(
                k, (F.col(k) + copies * F.lit(n + 1)).cast("long")
            )
        if t == "documents":
            out = out.withColumn(
                "text",
                F.when(
                    (copies > 0) & (F.col("doc_id") % 10 != 0),
                    F.concat(
                        "text", F.lit(" copymark"), copies.cast("string")
                    ),
                ).otherwise(F.col("text")),
            )
        out.drop("__copy").repartition(64).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(f"replica {t}: {n} -> {n * N_COPIES} rows", flush=True)


def time_both(q, spark, sf_dir: str) -> tuple[float, float, int]:
    """(collect_sec, noop_sec, n_rows) — best of 2 each, collect first.

    The compute-only probe is a ``noop``-format write, NOT ``count()``:
    count lets Catalyst prune every unused output expression (a
    grouped count keeps only the grouping keys), so it under-measures
    compute; a noop write must materialize every output column on the
    executors while transferring nothing to the driver."""
    coll = noop = float("inf")
    n_rows = 0
    for _ in range(2):
        t0 = time.time()
        rows = q.builder(spark, sf_dir).collect()
        coll = min(coll, time.time() - t0)
        n_rows = len(rows)
        del rows
        t0 = time.time()
        q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        noop = min(noop, time.time() - t0)
    return round(coll, 2), round(noop, 2), n_rows


def main() -> None:
    from training_datawarehouse_spark.plans import QUERIES
    from training_datawarehouse_spark.session import get_spark

    spark = get_spark("scale100x")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(
        f"{DST}/lineitem.parquet"
    ):
        build_replica(spark)

    QUERIES["op_agg_3_weighted_mean"].builder(spark, SRC).collect()
    spark.range(1).groupBy("id").applyInPandas(
        lambda p: p, schema="id long"
    ).collect()

    hdr = (f"{'query':28s} {'0.1 coll':>9s} {'0.1 noop':>8s} "
           f"{'100x coll':>10s} {'100x noop':>9s} {'coll x':>7s} "
           f"{'noop x':>6s} {'rows@100x':>10s}")
    print(hdr)
    for name in QUERIES_UNDER_TEST:
        q = QUERIES[name]
        a_coll, a_cnt, _ = time_both(q, spark, SRC)
        b_coll, b_cnt, b_rows = time_both(q, spark, DST)
        print(
            f"{name:28s} {a_coll:9.2f} {a_cnt:8.2f} {b_coll:10.2f} "
            f"{b_cnt:9.2f} {b_coll / a_coll:7.1f} {b_cnt / a_cnt:6.1f} "
            f"{b_rows:10d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
