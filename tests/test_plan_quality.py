"""Plan-quality gates: every registered query must keep the shapes the
engine promises (README design rules / SCALE.md).

These parse physical plans without executing them — cheap, and they
catch regressions like a rewrite silently introducing a row-at-a-time
Python UDF or losing a broadcast.
"""

from __future__ import annotations

import pytest

from training_datawarehouse_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# The only queries allowed to cross into Python — and only via Arrow
# (FlatMapGroupsInPandas / MapInPandas / FlatMapGroupsInPandasWithState).
ARROW_ALLOWED = {
    "op_win_1_ewma_dual",       # sequential EWMA recurrence (pandas path)
    "ns_multimodal_meta",       # media decode (stub + real PNG/WAV codecs)
}


def _plan(spark, name: str) -> str:
    df = QUERIES[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    return {name: _plan(spark, name) for name in QUERIES}


def test_no_row_python_udfs_anywhere(plans):
    """Row-at-a-time Python UDFs (BatchEvalPython) are banned outright."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == []


def test_python_crossings_are_arrow_and_allowlisted(plans):
    """Any Python crossing must be Arrow-batched AND on the allowlist."""
    py_nodes = ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython")
    crossing = {n for n, p in plans.items() if any(k in p for k in py_nodes)}
    assert crossing <= ARROW_ALLOWED, f"unexpected Python crossing: {crossing - ARROW_ALLOWED}"


def test_dim_joins_broadcast_not_sortmerge(plans):
    """TPC-H-shaped dim joins must stay broadcast (no SortMergeJoin)."""
    for name in ("tpch_q3_shipping_priority", "tpch_q5_nation_revenue"):
        assert "SortMergeJoin" not in plans[name], name


def test_scans_prune_columns(plans):
    """q6 must read only its 4 needed lineitem columns."""
    p = plans["tpch_q6_forecast_revenue"]
    scan_line = next(l for l in p.splitlines() if "FileScan parquet" in l)
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in scan_line
    assert "l_partkey" not in scan_line and "l_comment" not in scan_line


def test_q19_or_blocks_push_into_both_scans(spark):
    """The disjunction-of-conjunctions must reach the parquet readers:
    quantity bands on the lineitem scan, brand/size bands on the part
    scan — not sit in a post-join Filter only."""
    from training_datawarehouse_spark.plans.tpch_deep import q19_discount_revenue

    p = q19_discount_revenue(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l and "Or(" in l for l in pushed), pushed
    assert any("p_brand" in l and "Or(" in l for l in pushed), pushed


def test_salted_agg_is_two_level(plans):
    """op_skew_salted_agg must aggregate twice ((keys, salt) then keys),
    each with a partial/final split — and never join."""
    p = plans["op_skew_salted_agg"]
    assert p.count("HashAggregate") == 4, p.count("HashAggregate")
    assert "Join" not in p


def test_tpch_deep_dims_broadcast(plans):
    """Across the nine deep TPC-H subplans every dimension join must be
    broadcast; sort-merge is reserved for fact-fact and decorrelated
    subquery joins (q2/q16/q18/q22 machinery)."""
    p = plans["tpch_deep_shapes"]
    assert p.count("BroadcastHashJoin") >= 10


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """orders ⋈ lineitem both bucketed on the order key: the sort-merge
    join must consume the bucketed layout with NO exchange on either
    side (co-located join — the pay-once clustering for repeated
    fact-to-fact joins)."""
    from training_datawarehouse_spark.sources.tables import load_table, write_bucketed

    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 4, str(tmp_path / "ob"))
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 4, str(tmp_path / "lb"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_every_registry_entry_has_an_oracle():
    """r03 milestone, pinned: all 50 entries carry DuckDB oracle SQL —
    no rows-only rows left (even the approximate-aggregate entry is
    bounds-checked). A new entry without an oracle fails here first."""
    assert len(QUERIES) == 50
    missing = [n for n, q in QUERIES.items() if not q.oracle]
    assert missing == []


def test_tpch_deep_every_shape_nonempty(spark):
    """Each of the nine shapes inside the composite must contribute
    rows at the correctness scale factor — guards against a data
    regeneration silently emptying a constituent (q9/q22 shipped empty
    once: a LIKE pattern and a NOT EXISTS window that matched nothing)."""
    from training_datawarehouse_spark.plans.tpch_deep import tpch_deep_shapes

    counts = {
        r["shape"]: r["count"]
        for r in tpch_deep_shapes(spark, "/root/testdata/sf0.01")
        .groupBy("shape").count().collect()
    }
    expected = {
        "q2_min_cost_supplier", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "q14_promo_revenue", "q16_supplier_diversity",
        "q18_large_orders", "q19_discount_revenue", "q22_idle_accounts",
    }
    assert set(counts) == expected
    assert all(v > 0 for v in counts.values()), counts
