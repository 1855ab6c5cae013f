"""Lattice semantics tests: the 8 grouping sets, 'All' labels, per-set
Not-Set filter, weighted merge, mapper recompute (SURVEY §2.3.1/2.3.2)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.lattice import cube_lattice


@pytest.fixture()
def workouts(spark):
    rows = [
        # activity, type, equipment, km, seconds, rpe
        ("Run", "Road", "Shoes A", 10.0, 3600.0, 5.0),
        ("Run", "Road", "Not Set", 4.0, 1800.0, 6.0),
        ("Run", "Trail", "", 6.0, 2400.0, 7.0),
        ("Bike", "Road", "Bike One", 40.0, 7200.0, 4.0),
    ]
    return spark.createDataFrame(
        rows, "activity string, activity_type string, equipment string, "
              "km double, seconds double, rpe double"
    )


def _measures():
    return [
        F.sum("km").alias("km"),
        F.sum("seconds").alias("seconds"),
        (F.sum(F.col("rpe") * F.col("seconds")) / F.sum("seconds")).alias("rpe"),
    ]


def test_eight_grouping_sets(spark, workouts):
    lat = cube_lattice(workouts, _measures()).collect()
    shapes = {
        (r["activity"] == "All", r["activity_type"] == "All", r["equipment"] == "All")
        for r in lat
    }
    assert len(shapes) == 8  # full cube


def test_all_cell_includes_not_set_rows(spark, workouts):
    lat = {(r["activity"], r["activity_type"], r["equipment"]): r
           for r in cube_lattice(workouts, _measures()).collect()}
    # grand total counts ALL 4 workouts (Not Set / '' included)
    assert lat[("All", "All", "All")]["km"] == pytest.approx(60.0)
    # equipment-grouped sets exclude Not Set / ''
    eq_cells = [k for k in lat if k[2] not in ("All",)]
    assert all(k[2] in ("ShoesA", "BikeOne") for k in eq_cells)
    # spaces stripped AFTER the Not-Set check (reference :372)
    assert ("All", "All", "ShoesA") in lat
    assert lat[("All", "All", "ShoesA")]["km"] == pytest.approx(10.0)


def test_weighted_mean_merge(spark, workouts):
    lat = {(r["activity"], r["activity_type"], r["equipment"]): r
           for r in cube_lattice(workouts, _measures()).collect()}
    run_all = lat[("Run", "All", "All")]
    # seconds-weighted: (5*3600 + 6*1800 + 7*2400) / 7800
    assert run_all["rpe"] == pytest.approx((5 * 3600 + 6 * 1800 + 7 * 2400) / 7800.0)


def test_sum_over_partition_equals_all_cell(spark, workouts):
    """Lattice invariant (SURVEY §5.4): SUM over the (activity) cells
    equals the All/All/All cell for additive measures."""
    lat = cube_lattice(workouts, _measures())
    acts = lat.filter(
        (F.col("activity") != "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    ).agg(F.sum("km")).collect()[0][0]
    total = lat.filter(
        (F.col("activity") == "All") & (F.col("activity_type") == "All")
        & (F.col("equipment") == "All")
    ).collect()[0]["km"]
    assert acts == pytest.approx(total)


def test_lattice_adversarial_labels_multiset(spark):
    """Single-pass and two-level lattices agree as MULTISETS even when
    the data contains literal 'All'/'Not Set'/empty/space-laden values
    in every dimension (label collisions produce duplicate keys — both
    implementations must emit identical row multisets)."""
    import random
    from collections import Counter

    from pyspark.sql import functions as F

    from training_datawarehouse_spark.operators.lattice import (
        cube_lattice,
        cube_lattice_two_level,
    )

    rng = random.Random(99)
    dims = ["Run", "Bike", "", "All", "Not Set", "x y z"]
    eq = ["SUP 1", "SUP1", "Not Set", "", "  ", "Gear  X"]
    for _ in range(3):
        rows = [
            (rng.choice(dims), rng.choice(dims), rng.choice(eq),
             round(rng.uniform(0, 100), 3), round(rng.uniform(1, 50), 3))
            for _ in range(rng.randint(1, 60))
        ]
        df = spark.createDataFrame(
            rows,
            "activity string, activity_type string, equipment string, km double, seconds double",
        )
        meas = [F.round(F.sum("km"), 6).alias("km"), F.count(F.lit(1)).alias("n")]
        key = lambda r: (r["activity"], r["activity_type"], r["equipment"], r["km"], r["n"])  # noqa: E731
        single = Counter(key(r) for r in cube_lattice(df, meas).collect())
        two = Counter(key(r) for r in cube_lattice_two_level(
            df,
            [F.sum("km").alias("km_s"), F.count(F.lit(1)).alias("n_s")],
            [F.round(F.sum("km_s"), 6).alias("km"), F.sum("n_s").alias("n")],
        ).collect())
        assert single == two
