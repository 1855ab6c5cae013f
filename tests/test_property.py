"""Property-based differential tests (hypothesis; SURVEY §5.2/§5.4).

Spark-session-per-example is expensive → few examples, no deadline;
the value is randomized *structure* (gaps, ties, empty groups,
Not-Set-only cells), not volume.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.lattice import (
    cube_lattice,
    cube_lattice_two_level,
)
from training_datawarehouse_spark.operators.timeseries import ewma, rolling_monotony_strain

from conftest import ref_ewma

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(min_value=0.0, max_value=500.0, allow_nan=False, width=32)


@given(xs=st.lists(finite, min_size=1, max_size=60))
@_settings
def test_ewma_matches_reference_recurrence(spark, xs):
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "date int, tss double"
    )
    got = [
        r["ctl"]
        for r in ewma(df, [("tss", "ctl", 42.0)]).orderBy("date").collect()
    ]
    want = ref_ewma(xs, 42.0)
    assert all(math.isclose(g, w, rel_tol=1e-12, abs_tol=1e-12) for g, w in zip(got, want))


@given(xs=st.lists(finite, min_size=1, max_size=40))
@_settings
def test_monotony_strain_matches_pandas(spark, xs):
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "date int, load double"
    )
    got = {
        r["date"]: (r["monotony"], r["strain"])
        for r in rolling_monotony_strain(df, "load").collect()
    }
    s = pd.Series([float(x) for x in xs])
    mean7 = s.rolling(7, min_periods=1).mean()
    std7 = s.rolling(7, min_periods=0).std()  # ddof=1; n=1 → NaN
    sum7 = s.rolling(7, min_periods=1).sum()
    mono = (mean7 / std7.clip(lower=0.01)).fillna(0.0)
    strain = sum7 * mono
    for i in range(len(xs)):
        assert got[i][0] == pytest.approx(mono[i], rel=1e-9, abs=1e-9)
        assert got[i][1] == pytest.approx(strain[i], rel=1e-9, abs=1e-9)


_dims = st.sampled_from(["Run", "Bike", "All?", ""])  # includes junky labels
_equip = st.sampled_from(["SUP 1", "SUP 2", "Not Set", ""])


@given(
    rows=st.lists(
        st.tuples(_dims, _dims, _equip, finite, st.floats(1.0, 100.0, width=32)),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_two_level_lattice_equals_single_pass(spark, rows):
    """cube_lattice_two_level(partial, final) must be result-identical
    to cube_lattice over the raw rows for algebraic measures."""
    df = spark.createDataFrame(
        [(a, t, e, float(km), float(sec)) for a, t, e, km, sec in rows],
        "activity string, activity_type string, equipment string, km double, seconds double",
    )
    single = cube_lattice(
        df,
        [
            F.sum("km").alias("km"),
            (F.sum(F.col("km") * F.col("seconds")) / F.sum("seconds")).alias("wm"),
            F.count(F.lit(1)).alias("n"),
        ],
    )
    two = cube_lattice_two_level(
        df,
        base_aggs=[
            F.sum("km").alias("km_s"),
            F.sum(F.col("km") * F.col("seconds")).alias("kws"),
            F.sum("seconds").alias("sec_s"),
            F.count(F.lit(1)).alias("n_s"),
        ],
        re_aggs=[
            F.sum("km_s").alias("km"),
            (F.sum("kws") / F.sum("sec_s")).alias("wm"),
            F.sum("n_s").alias("n"),
        ],
    )
    key = lambda r: (r["activity"], r["activity_type"], r["equipment"])  # noqa: E731
    a = {key(r): (round(r["km"], 6), round(r["wm"], 6), r["n"]) for r in single.collect()}
    b = {key(r): (round(r["km"], 6), round(r["wm"], 6), r["n"]) for r in two.collect()}
    assert a == b
