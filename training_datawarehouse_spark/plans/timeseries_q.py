"""Time-series queries: densification, interpolation, rolling stats,
EWMA (OP-TS-*, OP-WIN-*, OP-JN-1/2).

Role mapping (FIXTURES.md §B.1): the ``events`` table provides a 30-day
daily series (rolling monotony/strain and a sparse series for
interpolation); ``orders`` provides a multi-year daily series for the
CTL/ATL/TSB EWMA (recursive-CTE oracle — the closed exp-window form is
precision-unsafe, SURVEY §2.3.5).

The daily series handed to sequential recurrences is rounded once at
the handoff (6 dp) so Spark and DuckDB iterate bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import (
    densify,
    ewma,
    ewma_alpha,
    interpolate_linear,
    rolling_monotony_strain,
    tsb,
)
from ..sources.tables import load_table
from .base import Query


# ------------------------------------------------- monotony / strain

def monotony_strain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-WIN-2: 7-row rolling mean/std/sum → monotony & strain with the
    reference's edge semantics (sample std, 0.01 clip, first-row → 0)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.round(F.sum("value"), 6).alias("load")
    )
    out = rolling_monotony_strain(daily, "load")
    return out.select(
        "date",
        "load",
        F.round("monotony", 6).alias("monotony"),
        F.round("strain", 6).alias("strain"),
    )


MONOTONY_ORACLE = """
WITH daily AS (
  SELECT ts::DATE AS date, round(sum(value), 6) AS load
  FROM events GROUP BY 1
),
win AS (
  SELECT date, load,
         avg(load)         OVER w AS mean7,
         stddev_samp(load) OVER w AS std7,
         sum(load)         OVER w AS sum7
  FROM daily
  WINDOW w AS (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT date, load,
       round(CASE WHEN std7 IS NULL THEN 0.0
                  ELSE mean7 / greatest(std7, 0.01) END, 6) AS monotony,
       round(sum7 * (CASE WHEN std7 IS NULL THEN 0.0
                          ELSE mean7 / greatest(std7, 0.01) END), 6) AS strain
FROM win
"""


# ---------------------------------------------------- interpolation

def interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-TS-1/2/3: sparse anchors (every 5th calendar day) → dense daily
    spine → linear interpolation → trailing gaps forward-filled with the
    last anchor (pandas parity), leading nulls → 0."""
    ev = load_table(spark, sf_dir, "events")
    anchors = (
        ev.filter(F.dayofmonth(F.to_date("ts")) % 5 == 1)
        .groupBy(F.to_date("ts").alias("date"))
        .agg(F.round(F.avg("value"), 6).alias("value"))
    )
    dense = interpolate_linear(anchors, ["value"], fill_zero=True)
    return dense.select("date", F.round("value", 6).alias("value"))


INTERPOLATION_ORACLE = """
WITH anchors AS (
  SELECT ts::DATE AS date, round(avg(value), 6) AS value
  FROM events
  WHERE day(ts::DATE) % 5 = 1
  GROUP BY 1
),
bounds AS (SELECT min(date) AS lo, max(date) AS hi FROM anchors),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS date FROM bounds
),
dense AS (
  SELECT s.date, a.value FROM spine s LEFT JOIN anchors a USING (date)
),
anch AS (
  SELECT date, value,
         last_value(value IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN value IS NOT NULL THEN date END IGNORE NULLS) OVER wb AS pd,
         first_value(value IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN value IS NOT NULL THEN date END IGNORE NULLS) OVER wf AS nd
  FROM dense
  WINDOW wb AS (ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY date ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT date,
       round(coalesce(
         CASE WHEN value IS NOT NULL THEN value
              WHEN nv IS NULL AND pv IS NOT NULL THEN pv
              WHEN pv IS NULL THEN NULL
              ELSE pv + (nv - pv) * date_diff('day', pd, date)::DOUBLE
                                  / date_diff('day', pd, nd)::DOUBLE
         END, 0.0), 6) AS value
FROM anch
"""


# ------------------------------------------------------ densification

def densify_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-JN-1 + OP-DD-1: date-spine × cells left join (gap-fill) — every
    cell gets one row per date in the global span; inserted rows carry
    the default 0 (reference :132-135,471-474)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("date"), F.col("event_type").alias("activity")
    ).agg(F.round(F.sum("value"), 6).alias("load"))
    dense = densify(daily, keys=["activity"])
    # Gap days come from the pre-coalesce null flag — a real daily sum
    # that happens to be 0.0 must NOT classify as a gap, and float
    # equality against 0.0 is engine-sensitive anyway.
    return dense.groupBy("activity").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("load").isNull(), 1).otherwise(0)).alias("n_gap_days"),
        F.round(F.sum(F.coalesce("load", F.lit(0.0))), 4).alias("total_load"),
    )


DENSIFY_ORACLE = """
WITH daily AS (
  SELECT ts::DATE AS date, event_type AS activity, round(sum(value), 6) AS load
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(date) AS lo, max(date) AS hi FROM daily),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS date FROM bounds
),
cells AS (SELECT DISTINCT activity FROM daily),
dense AS (
  SELECT g.date, g.activity, d.load AS load
  FROM (SELECT s.date, c.activity FROM spine s CROSS JOIN cells c) g
  LEFT JOIN daily d ON d.date = g.date AND d.activity = g.activity
)
SELECT activity,
       count(*) AS n_days,
       CAST(sum(CASE WHEN load IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_days,
       round(sum(coalesce(load, 0.0)), 4) AS total_load
FROM dense GROUP BY activity
"""


# -------------------------------------------------------------- EWMA

_ALPHA_CTL = ewma_alpha(42.0)
_ALPHA_ATL = ewma_alpha(7.0)


def ewma_tsb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-WIN-1: CTL/ATL/TSB EWMA recurrences over the densified daily
    order-revenue series (multi-year). applyInPandas per series."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("date")).agg(
        F.round(F.sum(F.col("o_totalprice") / 1000.0), 6).alias("tss")
    )
    dense = densify(daily, keys=[], defaults={"tss": 0.0})
    curves = ewma(dense, [("tss", "ctl", 42.0), ("tss", "atl", 7.0)])
    out = tsb(curves)
    return out.select(
        "date", "tss",
        F.round("ctl", 4).alias("ctl"),
        F.round("atl", 4).alias("atl"),
        F.round("tsb", 4).alias("tsb"),
    )


# α literals are repr()-exact doubles: both engines parse the identical
# 17-digit decimal, so the recurrences are evaluated bit-identically.
_EWMA_REC_CTE = f"""
WITH RECURSIVE daily AS (
  SELECT o_orderdate::DATE AS date, round(sum(o_totalprice / 1000.0), 6) AS tss
  FROM orders GROUP BY 1
),
bounds AS (SELECT min(date) AS lo, max(date) AS hi FROM daily),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS date FROM bounds
),
dense AS (
  SELECT s.date, coalesce(d.tss, 0.0) AS tss,
         row_number() OVER (ORDER BY s.date) AS rn
  FROM spine s LEFT JOIN daily d USING (date)
),
rec AS (
  SELECT rn, date, tss,
         {_ALPHA_CTL!r} * tss AS ctl,
         {_ALPHA_ATL!r} * tss AS atl
  FROM dense WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.date, d.tss,
         {_ALPHA_CTL!r} * d.tss + (1.0 - {_ALPHA_CTL!r}) * r.ctl,
         {_ALPHA_ATL!r} * d.tss + (1.0 - {_ALPHA_ATL!r}) * r.atl
  FROM rec r JOIN dense d ON d.rn = r.rn + 1
)
"""

# Both execution paths are checked against the SAME recurrence — the
# oracle emits the reference series once per path tag.
EWMA_DUAL_ORACLE = _EWMA_REC_CTE + """
SELECT date, tss, round(ctl, 4) AS ctl, round(atl, 4) AS atl,
       round(ctl - atl, 4) AS tsb, 'pandas' AS path FROM rec
UNION ALL
SELECT date, tss, round(ctl, 4) AS ctl, round(atl, 4) AS atl,
       round(ctl - atl, 4) AS tsb, 'scan' AS path FROM rec
"""


def ewma_tsb_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-WIN-1 via the segmented prefix scan (no Python, no per-series
    length limit — SURVEY §2.3.5's documented fallback) — checked
    against the SAME recursive-CTE oracle as the applyInPandas path
    (agreement ≤ 2e-13 absolute, far inside the 4dp rounding)."""
    from ..operators.timeseries import ewma_scan

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("date")).agg(
        F.round(F.sum(F.col("o_totalprice") / 1000.0), 6).alias("tss")
    )
    dense = densify(daily, keys=[], defaults={"tss": 0.0})
    curves = ewma_scan(dense, [("tss", "ctl", 42.0), ("tss", "atl", 7.0)])
    out = tsb(curves)
    return out.select(
        "date", "tss",
        F.round("ctl", 4).alias("ctl"),
        F.round("atl", 4).alias("atl"),
        F.round("tsb", 4).alias("tsb"),
    )


def ewma_tsb_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-WIN-1 both ways in one entry: the applyInPandas sequential
    recurrence AND the pure-SQL segmented prefix scan, tagged, each
    hash-checked against the same recursive-CTE oracle."""
    a = ewma_tsb(spark, sf_dir).withColumn("path", F.lit("pandas"))
    b = ewma_tsb_scan(spark, sf_dir).withColumn("path", F.lit("scan"))
    return a.unionByName(b)


QUERIES = {
    "op_win_2_monotony_strain": Query(monotony_strain, MONOTONY_ORACLE),
    "op_ts_2_interpolation": Query(interpolation, INTERPOLATION_ORACLE),
    "op_jn_1_densify": Query(densify_query, DENSIFY_ORACLE),
    "op_win_1_ewma_dual": Query(ewma_tsb_dual, EWMA_DUAL_ORACLE),
}
