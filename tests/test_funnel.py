"""Funnel min-chain semantics (operators/funnel.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.funnel import funnel_counts

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(rows, spark):
    return spark.createDataFrame(
        [(u, BASE + dt.timedelta(hours=h), t) for u, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_order_window_and_conversion(spark):
    rows = [
        # user 1: full funnel, in order, inside 7 days
        (1, 0, "view"), (1, 2, "click"), (1, 5, "purchase"),
        # user 2: view then purchase WITHOUT a click — stops at step 1
        (2, 0, "view"), (2, 3, "purchase"),
        # user 3: click BEFORE the first view never counts; the later
        # click does — reaches step 2 only
        (3, -1, "click"), (3, 0, "view"), (3, 4, "click"),
        # user 4: click inside the window, purchase 8 days after the
        # first view — outside the 7-day attribution window
        (4, 0, "view"), (4, 1, "click"), (4, 8 * 24, "purchase"),
        # user 5: never views — not in the funnel at all
        (5, 0, "click"), (5, 1, "purchase"),
        # user 6: purchase must be AFTER the click, not merely after
        # the view — simultaneous-with-click purchase doesn't count
        (6, 0, "view"), (6, 2, "click"), (6, 2, "purchase"),
    ]
    out = {
        r["step_name"]: r
        for r in funnel_counts(
            _ev(rows, spark), ["view", "click", "purchase"], within_days=7
        ).collect()
    }
    assert out["view"]["n_users"] == 5        # users 1,2,3,4,6
    assert out["click"]["n_users"] == 4       # users 1,3,4,6
    assert out["purchase"]["n_users"] == 1    # user 1 only
    assert out["view"]["conversion"] == 1.0
    assert out["click"]["conversion"] == pytest.approx(0.8)
    assert out["purchase"]["conversion"] == pytest.approx(0.2)


def test_funnel_empty_first_step_null_conversion(spark):
    rows = [(1, 0, "click"), (1, 1, "purchase")]
    out = {
        r["step_name"]: r
        for r in funnel_counts(
            _ev(rows, spark), ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"]["n_users"] == 0
    assert out["click"]["n_users"] == 0
    assert all(r["conversion"] is None for r in out.values())


def test_funnel_rejects_single_step(spark):
    with pytest.raises(ValueError):
        funnel_counts(_ev([(1, 0, "view")], spark), ["view"])
