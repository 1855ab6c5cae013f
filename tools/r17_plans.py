"""Dump .explain('formatted') for headline queries to plans/r17/.

Usage: python tools/r17_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)

Builders run lazily where possible, but several composite builders
eagerly materialize internal checkpoints — that is part of their plan
construction and unavoidable here; the dumped plan is the FINAL
returned frame's physical plan, which is what the bench collects.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from training_datawarehouse_spark.session import get_spark  # noqa: E402
from training_datawarehouse_spark.plans import QUERIES  # noqa: E402

HEADLINE = [
    "tpch_q1_pricing_summary", "op_agg_1_cube_lattice",
    "op_agg_6_rollup_periodic", "op_win_2_monotony_strain",
    "op_win_1_ewma_dual", "op_ts_2_interpolation",
    "tpch_q3_shipping_priority", "tpch_q5_nation_revenue",
    "op_dd_1_dedup_first", "ns_dedup_exact", "ns_text_profile",
    "ns_similarity_topk", "ns_dedup_lsh_cross_modal",
    "tpch_q6_forecast_revenue", "op_stream_session_batch",
    "ns_multimodal_meta", "op_approx_aggs", "op_jn_asof", "op_jn_range",
    "op_agg_event_profile", "op_fn_scalar_breadth", "ns_chunk_pack",
    "op_stream_windows_batch", "ns_split_train_val",
]


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r17-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in HEADLINE:
        if only and name not in only:
            continue
        df = QUERIES[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
