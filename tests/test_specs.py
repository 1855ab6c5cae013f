"""Unit tests for the config-as-data spec layer (no cluster logic)."""

from __future__ import annotations

import pytest

from training_datawarehouse_spark import specs as S


def test_workout_specs_cover_reference_columns():
    names = {c.name for c in S.WORKOUT_SPECS}
    assert {"km", "miles", "tss", "rpe", "hr", "watts", "seconds", "minutes",
            "hours", "ascent_metres", "ascent_feet", "kj", "reps", "is_race",
            "brick", "watts_estimated", "cadence", "rpe_tss", "mph", "kph"} == names


def test_agg_methods(spark):  # fixture: Column exprs need a live session
    by_name = {c.name: c for c in S.WORKOUT_SPECS}
    assert by_name["km"].agg is S.Agg.SUM
    assert by_name["rpe"].agg is S.Agg.WEIGHTED_MEAN
    assert by_name["is_race"].agg is S.Agg.BOOL_OR
    # mapper columns recomputed post-merge, not aggregated directly
    assert by_name["mph"].mapper == "mph"
    assert all(
        s.agg_expr() is not None for s in S.WORKOUT_SPECS if s.mapper is None
    )


def test_rollup_drops_untagged_columns():
    # columns with no AggMethod are dropped from rollups (SURVEY §2.3.6)
    rolled = {str(c) for c in S.rollup_exprs(S.DAY_SPECS)}
    assert not any("type" in c or "sleep_quality" in c for c in rolled)


def test_unit_factors():
    by_name = {c.name: c for c in S.WORKOUT_SPECS}
    assert by_name["miles"].factor == pytest.approx(0.621371)
    assert by_name["hours"].factor == pytest.approx(1 / 3600)
    by_day = {c.name: c for c in S.DAY_SPECS}
    assert by_day["sleep_seconds"].factor == 3600


def test_spark_projection_semantics(spark):
    df = spark.createDataFrame(
        [(10.0, 3600.0, None), (2.5, 0.0, 5.0)], "km double, seconds double, rpe double"
    )
    km_spec = next(c for c in S.WORKOUT_SPECS if c.name == "miles")
    row = df.select(km_spec.ingest_expr()).collect()
    assert row[0][0] == pytest.approx(6.21, abs=1e-9)  # bround(6.21371, 2)
    # boolean normalization 0→0 else 1
    b = next(c for c in S.WORKOUT_SPECS if c.name == "is_race")
    bdf = spark.createDataFrame([(0,), (3,), (None,)], "isRace long")
    vals = [r[0] for r in bdf.select(b.ingest_expr()).collect()]
    assert vals == [0, 1, 0]


def test_salted_agg_matches_plain(spark):
    """Salted two-level aggregation is result-identical to the plain
    groupBy (hot-key spreading must not change semantics)."""
    from pyspark.sql import functions as F

    from training_datawarehouse_spark.operators.skew import salted_agg

    # 90% of rows on one hot key
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    plain = {
        r["k"]: (r["n"], r["v"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 6).alias("v"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["v"])
        for r in salted_agg(
            df, ["k"],
            partials=[F.count(F.lit(1)).alias("n_p"), F.sum("v").alias("v_p")],
            finals=[F.sum("n_p").alias("n"), F.round(F.sum("v_p"), 6).alias("v")],
            n_salts=8,
        ).collect()
    }
    assert salted == plain
