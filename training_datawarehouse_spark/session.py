"""SparkSession construction with scale-appropriate defaults.

The driver hands us a session in ``__spark_entry__.entry``; this module is
for tests / bench / standalone use. Config choices are the ones we would
ship on a 1000-executor cluster, scaled down for local[N]:

- AQE on (runtime partition coalescing + skew-join splitting) — at 100 TB
  static shuffle-partition counts are always wrong somewhere.
- Arrow transfer on — every Pandas UDF crossing is Arrow-batched.
- UTC session timezone — deterministic calendar math regardless of host.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "training-datawarehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_for_queries(spark: SparkSession) -> SparkSession:
    """Runtime-settable knobs applied to an externally-provided session."""
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Size the initial shuffle-partition count to the actual cores —
    # an externally-built session may carry the 200 default, which is
    # pure task overhead under local[N] (AQE coalesces, but cheaper to
    # start right).
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )
    return spark
