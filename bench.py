"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total-sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is built fresh and driven to completion with a count-style
action (``collect`` on small results) — wall-clock includes planning +
execution, excluding session startup (amortized across a real
deployment) and excluding the first-query JVM warm-up via a throwaway
warm-up query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from training_datawarehouse_spark.session import get_spark  # noqa: E402
from training_datawarehouse_spark.plans import QUERIES  # noqa: E402

# Headline set: one per operator family — scan-agg, cube, rollup,
# windows, EWMA, interpolation, joins, dedup, text, similarity.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "op_agg_1_cube_lattice",
    "op_agg_6_rollup_periodic",
    "op_win_2_monotony_strain",
    "op_win_1_ewma_dual",
    "op_ts_2_interpolation",
    "tpch_q3_shipping_priority",
    "tpch_q5_nation_revenue",
    "op_dd_1_dedup_first",
    "ns_dedup_exact",
    "ns_text_profile",
    "ns_similarity_topk",
    "ns_dedup_lsh_cross_modal",
    "tpch_q6_forecast_revenue",
    "op_stream_session_batch",
    "ns_multimodal_meta",
    "op_approx_aggs",
    "op_jn_asof",
    "op_jn_range",
    "op_agg_event_profile",
    "op_fn_scalar_breadth",
    "ns_chunk_pack",
    "ns_split_train_val",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + parquet footer caches with an off-benchmark query,
    # and the Python/Arrow worker pool (long-lived in a real deployment —
    # spark.python.worker.reuse keeps it hot) with a one-row applyInPandas
    QUERIES["op_agg_3_weighted_mean"].builder(spark, sf_dir).collect()
    import pandas as _pd

    spark.range(1).groupBy("id").applyInPandas(
        lambda p: p, schema="id long"
    ).collect()

    # Best of 2 runs per query: single cold samples vary ±40% with
    # machine load; the min is the stable, comparable statistic (both
    # runs build the plan fresh — only JVM/page-cache warmth carries).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = QUERIES[name]
        samples = []
        for _ in range(2):
            t0 = time.time()
            df = q.builder(spark, sf_dir)
            n = df.count() if name.startswith("op_prj") else len(df.collect())
            samples.append(round(time.time() - t0, 3))
            assert n >= 0
        timings[name] = min(samples)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
