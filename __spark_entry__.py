"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 pricing-summary shape) at
sf0.001. ``queries()`` — one entry per implemented operator from
SURVEY §2 (keys are operator IDs). ``oracle_sql()`` — DuckDB-equivalent
ANSI SQL for every oracle-expressible query; omitted keys get the
driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from training_datawarehouse_spark.plans import QUERIES
from training_datawarehouse_spark.session import tune_for_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's core semantic (SURVEY §7 phase 1):
    the 8-set aggregation lattice with 'All' roll-ups, per-set Not-Set
    filtering, and post-aggregation mapper recompute."""
    tune_for_queries(spark)
    return QUERIES["op_agg_1_cube_lattice"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
