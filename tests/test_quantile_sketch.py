"""Mergeable quantile sketch (r12): bottom-K coordinated sample.

Contracts:
1. the daily-partial MERGE path equals the direct build exactly (the
   semilattice law the family's mergeability rests on);
2. the direct build's hash-threshold prefilter is lossless even when
   it actually prunes (n >> 8K);
3. the streaming maintenance's final state equals the batch sketch
   bit-for-bit regardless of micro-batch layout;
4. when the population fits in the sketch, estimates are EXACT.
"""

from __future__ import annotations

import hashlib
import math
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from training_datawarehouse_spark.plans.relational import _qsk_stages


def _events_df(spark, n, types=("a", "b"), days=5):
    rows = [
        (i, types[i % len(types)],
         (pd.Timestamp("2024-01-01")
          + pd.Timedelta(days=i % days, hours=i % 7)).to_pydatetime(),
         round((i * 37 % 1000) / 7.0, 2))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )


def _py_bottom_k(rows, k):
    """Pure-python reference: k smallest (md5-prefix(event_id), eid)."""
    hashed = [
        (int(hashlib.md5(str(eid).encode()).hexdigest()[:15], 16), eid, vc)
        for eid, vc in rows
    ]
    hashed.sort()
    return hashed[:k]


def test_qsk_merge_equals_direct(spark):
    ev = _events_df(spark, 3000)
    out = _qsk_stages(spark, ev, k=128).collect()
    direct = {r["k"]: (r["n_users"], r["n"], r["hll_in_band"])
              for r in out if r["stage"] == "qsk"}
    merged = {r["k"]: (r["n_users"], r["n"], r["hll_in_band"])
              for r in out if r["stage"] == "qsk_merge"}
    assert direct == merged
    assert len(direct) == 6  # 2 types x 3 quantiles


def test_qsk_prefilter_lossless_and_matches_python(spark):
    """n/type = 1500 >> 8K = 8*64: the prefilter genuinely prunes, and
    the surviving sample still equals pure bottom-k (python md5)."""
    k = 64
    ev = _events_df(spark, 3000)
    out = {r["k"]: r["n_users"]
           for r in _qsk_stages(spark, ev, k=k).collect()
           if r["stage"] == "qsk"}
    pdf = ev.select("event_id", "event_type", "value").toPandas()
    for t in ("a", "b"):
        rows = [
            (int(e), int(round(v * 100)))
            for e, ty, v in zip(pdf["event_id"], pdf["event_type"],
                                pdf["value"])
            if ty == t
        ]
        sample = sorted(vc for _, _, vc in _py_bottom_k(rows, k))
        m = len(sample)
        for lbl, q in ((50, 0.5), (95, 0.95), (99, 0.99)):
            assert out[f"{t}|p{lbl}"] == sample[math.ceil(q * m) - 1]


def test_qsk_exact_when_population_fits(spark):
    """m == n: the estimate IS the exact ceil(q*n)-th smallest value
    and the rank band is trivially satisfied."""
    ev = _events_df(spark, 200)
    out = [r for r in _qsk_stages(spark, ev, k=2048).collect()
           if r["stage"] == "qsk"]
    pdf = ev.select("event_type", "value").toPandas()
    for r in out:
        t, lbl = r["k"].split("|")
        q = {"p50": 0.5, "p95": 0.95, "p99": 0.99}[lbl]
        vals = sorted(
            int(round(v * 100))
            for ty, v in zip(pdf["event_type"], pdf["value"]) if ty == t
        )
        assert r["n_users"] == vals[math.ceil(q * len(vals)) - 1]
        assert r["hll_in_band"] is True


def test_streaming_qsk_matches_batch(spark, tmp_path):
    """Final streaming state == batch bottom-k sketch, across a 2-batch
    split that genuinely crosses a state read-merge-write."""
    from training_datawarehouse_spark.streaming.stateful import (
        streaming_quantile_sketch,
    )

    k = 32
    n = 400
    rows = [
        {"event_id": i, "event_type": "a" if i % 2 else "b",
         "value": round((i * 13 % 500) / 3.0, 2)}
        for i in range(n)
    ]
    schema = pa.schema([
        ("event_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()),
    ])
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows[: n // 2], schema=schema),
                   src / "part0.parquet")
    pq.write_table(pa.Table.from_pylist(rows[n // 2:], schema=schema),
                   src / "part1.parquet")
    now = os.path.getmtime(src / "part0.parquet")
    os.utime(src / "part0.parquet", (now - 10,) * 2)
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    raw = (
        spark.readStream.schema(
            "event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    stream = raw.select(
        "event_type", h.alias("h"), F.col("event_id").alias("eid"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    q = (
        streaming_quantile_sketch(stream, k)
        .writeStream.format("memory")
        .queryName("qsk_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    q.stop()
    final = {
        r["event_type"]: r
        for r in spark.table("qsk_sink")
        .groupBy("event_type")
        .agg(F.max_by(F.struct("nb", "m", "p50c", "p95c", "p99c"), "nb")
             .alias("s"))
        .select("event_type", "s.*")
        .collect()
    }
    assert {r["nb"] for r in final.values()} == {2}  # both batches seen
    for t in ("a", "b"):
        batch = _py_bottom_k(
            [(r["event_id"], int(round(r["value"] * 100)))
             for r in rows if r["event_type"] == t], k,
        )
        vs = sorted(vc for _, _, vc in batch)
        m = len(vs)
        assert final[t]["m"] == m == k
        for lbl, qv in ((50, 0.5), (95, 0.95), (99, 0.99)):
            assert final[t][f"p{lbl}c"] == vs[math.ceil(qv * m) - 1]

def test_qsk_4sigma_band_holds_at_fixed_n_k(spark):
    """r13 (verdict #5): pin the REALIZED accuracy at one (n, K) the
    prefilter genuinely prunes — n = 23·K, K = 256. The estimate's
    exact rank must sit inside the emitted 4-sigma band
    (|rank/N − q| ≤ 4·sqrt(q(1−q)/m) + 1/N) for every quantile, and
    the sampling error must be REAL (some estimate lands off the
    exact quantile) — so the band boolean is a live check, not a
    tautology. The 100× replica's measured rank-error-vs-K curve
    lives in SCALE.md; this pins the contract at test scale."""
    k = 256
    n = 23 * k
    ev = _events_df(spark, n, types=("a",))
    out = [r for r in _qsk_stages(spark, ev, k=k).collect()
           if r["stage"] == "qsk"]
    assert len(out) == 3
    vals = sorted(
        int(round(v * 100))
        for v in ev.select("value").toPandas()["value"]
    )
    off_exact = 0
    for r in out:
        lbl = r["k"].split("|")[1]
        q = {"p50": 0.5, "p95": 0.95, "p99": 0.99}[lbl]
        assert r["hll_in_band"] is True, (lbl, r)
        # realized rank error, recomputed from first principles
        rank = sum(1 for v in vals if v <= r["n_users"])
        err = abs(rank / n - q)
        assert err <= 4.0 * math.sqrt(q * (1 - q) / k) + 1.0 / n
        exact = vals[math.ceil(q * n) - 1]
        if r["n_users"] != exact:
            off_exact += 1
    assert off_exact >= 1   # the sample really is a sample
