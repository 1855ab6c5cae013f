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

import contextlib
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


def tune_for_iterative(spark: SparkSession) -> SparkSession:
    """Session knobs for the ITERATIVE operator family (NN-descent,
    PageRank, connected components, tokenizer training) — the three
    measured r13 settings, promoted out of docstring prose so library
    users don't transcribe them by hand (r13 verdict #5 / ADVICE).

    These operators checkpoint one generation per round through
    ``functions.caching.eager_checkpoint``, whose stat-less LogicalRDD
    leaves stop Catalyst's size-estimate compounding (the per-
    generation squaring that ground the driver in BigInteger.multiply
    at the r13 200 k NN-descent probe). Stat-less leaves then need:

    1. ``spark.sql.defaultSizeInBytes`` at a realistic value (64 MB —
       safely above the 10 MB autoBroadcast line, so no spurious
       broadcasts): otherwise every leaf estimates Long.MaxValue and
       size PRODUCTS through a 40-join/50-union wave plan are
       BigIntegers with thousands of digits — the OPTIMIZER, not the
       job, burns driver-minutes (jstack-diagnosed, r13).
    2. A small AQE ``minPartitionSize`` (64k): the family's shuffles
       carry slim (id, id, cos) rows whose map work is a 64-dim
       cosine; byte-based coalescing sees ~2 MB and squeezes stages
       to 1-3 tasks, serializing the scoring (measured: same-plan hop
       checkpoints growing 1.5 s -> 23 s across waves).
    3. Runtime bloom-filter injection OFF: InjectRuntimeFilter
       re-walks size stats for every join of every freshly-copied
       plan tree and can never fire on these plans anyway (runtime
       bloom filters push into FILE scans; every leaf here is an
       in-memory RDD). Both observed driver grinds bottomed out in
       this rule.

    Measured cost-neutral at bench scale for mixed sessions on the
    JOIN side (AQE re-plans joins from REAL shuffle sizes at runtime,
    so relational plans keep their broadcasts) — but knob 3 is a
    PERMANENT loss for a long-lived session: runtime bloom-filter
    injection materially cuts fact-table scans on selective dim
    joins (tests/test_plan_quality.py pins the effect), and this
    function switches it off with no restore. Prefer the scoped
    ``iterative_tuning`` context manager for sessions that mix
    iterative builds with relational queries (r14 verdict #3); this
    unscoped form remains for dedicated iterative jobs where the
    session ends with the build."""
    for key, value in ITERATIVE_CONFS.items():
        spark.conf.set(key, value)
    return spark


#: The three measured r13 iterative-family settings (rationale in
#: ``tune_for_iterative``'s docstring) as data, so the scoped and
#: unscoped forms can never drift apart.
ITERATIVE_CONFS = {
    "spark.sql.defaultSizeInBytes": str(64 * 1024 * 1024),
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
}


@contextlib.contextmanager
def iterative_tuning(spark: SparkSession):
    """Scoped ``tune_for_iterative``: applies the three iterative-
    family confs on entry and RESTORES the prior values on exit
    (r14 verdict #3).

    The unscoped function permanently disables runtime bloom-filter
    injection — a feature that measurably cuts fact-table scans
    (tests/test_plan_quality.py) — so a long-lived 100 TB session
    that once built an ANN graph would pay on every subsequent
    relational query. This form snapshots the EFFECTIVE value of each
    knob (Spark-default or user-set — restoring the effective default
    explicitly is behavior-identical to never having touched it) and
    puts it back even if the build raises::

        with iterative_tuning(spark):
            graph = nnd_graph_recursive(emb, ...)
        # relational queries here keep their runtime bloom filters
    """
    prior: dict[str, str | None] = {}
    for key in ITERATIVE_CONFS:
        try:
            prior[key] = spark.conf.get(key)
        except Exception:
            prior[key] = None  # unset and no Spark-side default
    tune_for_iterative(spark)
    try:
        yield spark
    finally:
        for key, value in prior.items():
            if value is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, value)
