"""Streaming near-dup admission (r12 — the r11 verdict's top ask).

Three contracts:
1. the ROW-LOCAL signature kernel is bit-identical to the batch
   portable minhash family (same band keys -> the streaming decision
   and every batch LSH consumer agree on what "collides" means);
2. the streaming admission decision equals the batch first-writer rule
   (earliest smaller-id doc sharing any band bucket), including matches
   whose evidence lives in an EARLIER micro-batch's state;
3. state is bucket-grain and O(1) per bucket — a mega-bucket flood
   (many identical docs) leaves exactly one state row per touched
   bucket, never one per document.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

import training_datawarehouse_spark.operators.dedup as dd
from training_datawarehouse_spark.streaming.stateful import (
    streaming_neardup_admission,
)

DOC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
SPARK_DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _drain_admission(spark, tmp_path, batches, name):
    """Write each batch as one mtime-ordered parquet file, stream it
    through the admission operator, return (sink rows, query)."""
    src = tmp_path / "src"
    src.mkdir()
    for i, docs in enumerate(batches):
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": d, "text": t} for d, t in docs],
                schema=DOC_SCHEMA,
            ),
            src / f"part{i}.parquet",
        )
    now = os.path.getmtime(src / "part0.parquet")
    for i in range(len(batches)):
        os.utime(src / f"part{i}.parquet", (now - 30 + 10 * i,) * 2)
    raw = (
        spark.readStream.schema(SPARK_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    bands = dd.minhash_band_rows_rowlocal(
        raw, "doc_id", "text", num_hashes=16, bands=4, rows_per_band=4,
        shingle_n=3,
    )
    q = (
        streaming_neardup_admission(bands)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    q.stop()
    return spark.table(name).collect(), q


def _batch_rule(spark, all_docs):
    """The batch twin: per (doc, band), min smaller-id doc sharing the
    bucket — computed from the SAME row-local band rows, in batch."""
    df = spark.createDataFrame(
        [(d, t) for d, t in all_docs], "doc_id long, text string"
    )
    b = dd.minhash_band_rows_rowlocal(
        df, "doc_id", "text", num_hashes=16, bands=4, rows_per_band=4,
        shingle_n=3,
    )
    joined = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("y.doc_id") < F.col("x.doc_id")),
            "left",
        )
        .groupBy(F.col("x.doc_id").alias("doc_id"), F.col("x.band").alias("band"))
        .agg(F.min("y.doc_id").alias("match_id"))
    )
    return {(r["doc_id"], r["band"]): r["match_id"] for r in joined.collect()}


def test_rowlocal_bands_match_batch_portable(spark):
    """Kernel parity: the streaming-legal row-local fold produces the
    exact band keys of the batch shingle-explode -> groupBy -> k-min
    portable family (one formula, two plan shapes)."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different content with many unique words here",
        "short text only",   # 3 tokens -> 1 shingle
        "ab cd",             # 2 tokens -> filtered out (no shingles)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    sh = dd.hashed_shingles_portable(df, "doc_id", "text", 3)
    per = sh.groupBy("doc_id").agg(*dd._portable_min_exprs(16))
    batch = per.select("doc_id", F.explode(F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[
                F.col(f"h{b * 4 + j}").cast("string") for j in range(4)
            ]).alias("sig"),
        )
        for b in range(4)
    ])).alias("bs")).select("doc_id", "bs.band", "bs.sig")
    rl = dd.minhash_band_rows_rowlocal(df, "doc_id", "text", 16, 4, 4, 3)
    got = {(r["doc_id"], r["band"]): r["sig"] for r in rl.collect()}
    want = {(r["doc_id"], r["band"]): r["sig"] for r in batch.collect()}
    assert got == want
    # doc 4 (2 tokens) dropped by both kernels
    assert not any(k[0] == 4 for k in got)


def test_rowlocal_bands_reject_colliding_keep_cols(spark):
    """r16 (r15 ADVICE low): a kept column named like the kernel's
    own output/internal columns would silently produce
    duplicate/ambiguous columns — loud ValueError instead."""
    df = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d").alias("text"),
        F.lit(1).alias("band"),
    )
    for bad in ("band", "sig", "__tk", "bs", "doc_id"):
        with pytest.raises(ValueError, match="keep_cols"):
            dd.minhash_band_rows_rowlocal(
                df, "doc_id", "text", num_hashes=16, bands=4,
                rows_per_band=4, keep_cols=(bad,))


def test_admission_matches_batch_rule_across_batches(spark, tmp_path):
    """The sequential streaming decision == the batch first-writer rule,
    with at least one reject whose ONLY evidence is state written by an
    earlier micro-batch (the filter-before-store path actually crossing
    a state read)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch0 = [
        (0, base),
        (1, "unrelated content about something else entirely here now"),
        (2, base + " extra"),  # near-dup of 0, same batch
    ]
    batch1 = [
        (10, base + " tail"),  # near-dup of 0 — CROSS-batch evidence
        (11, "fresh novel text with no overlap to anything prior ok"),
    ]
    rows, _ = _drain_admission(spark, tmp_path, [batch0, batch1], "adm_par")
    got = {(r["doc_id"], r["band"]): r["match_id"] for r in rows}
    want = _batch_rule(spark, batch0 + batch1)
    assert got == want
    # the planted cross-batch near-dup was rejected against doc 0
    m10 = {got[k] for k in got if k[0] == 10} - {None}
    assert 0 in m10
    # novel docs admitted (all bands NULL)
    for d in (0, 1, 11):
        assert {got[k] for k in got if k[0] == d} == {None}


def test_admission_state_is_bucket_grain(spark, tmp_path):
    """Mega-bucket flood: 40 identical docs touch 4 buckets total; the
    state store must hold ONE row per bucket (first_id, n), not one per
    doc — the hot-bucket problem vanishes by construction instead of
    needing a cap."""
    text = "identical boilerplate spam flood document body text here"
    flood0 = [(i, text) for i in range(20)]
    flood1 = [(i, text) for i in range(20, 40)]
    rows, q = _drain_admission(spark, tmp_path, [flood0, flood1], "adm_flood")
    got = {(r["doc_id"], r["band"]): r["match_id"] for r in rows}
    # every doc except the first matches doc 0 in all 4 bands
    for d in range(1, 40):
        assert {got[(d, b)] for b in range(4)} == {0}
    assert {got[(0, b)] for b in range(4)} == {None}
    # state rows == touched buckets (4), independent of 40 docs
    n_state = max(
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in json.loads(p.json)["stateOperators"]
    )
    assert n_state == 4


def test_admission_e2e_stage_matches_oracle(spark):
    """The registry 'admit' stage of op_stream_e2e against its DuckDB
    oracle at sf0.001 — doc-grain admission decisions as values."""
    duckdb = pytest.importorskip("duckdb")
    from training_datawarehouse_spark.plans.relational import (
        _neardup_admission_oracle, stream_neardup_e2e,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["k1"]: (r["k2"], r["n"], r["v"])
        for r in stream_neardup_e2e(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    sql = f"""
WITH {_neardup_admission_oracle().strip()}
SELECT CAST(did AS VARCHAR) AS k1, CAST(min(bmid) AS VARCHAR) AS k2,
       count(bmid) AS n,
       CASE WHEN count(bmid) = 0 THEN 1.0 ELSE 0.0 END AS v
FROM adm_m GROUP BY did
"""
    want = {
        k1: (k2, n, float(v)) for k1, k2, n, v in con.execute(sql).fetchall()
    }
    assert got == want
    assert any(n > 0 for _, n, _ in got.values())  # rejects exist


def test_admission_serves_media_phash_bands(spark, tmp_path):
    """MEDIA signatures ride the SAME admission operator (the verdict
    ask covers 'documents/media'): in-stream pHash band rows (real PNG
    encode->decode->DCT inside mapInPandas — stateless, so legal
    upstream of the stateful op) align onto (band, sig) and the
    cross-batch near-dup is rejected against the first-seen image."""
    import training_datawarehouse_spark.operators.phash as ph

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    batch0 = [(0, base), (1, "utterly different pixels come from "
                             "utterly different token histograms ok")]
    batch1 = [(10, base)]  # identical content -> identical pHash
    src = tmp_path / "src"
    src.mkdir()
    for i, docs in enumerate((batch0, batch1)):
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": d, "text": t} for d, t in docs],
                schema=DOC_SCHEMA,
            ),
            src / f"part{i}.parquet",
        )
    now = os.path.getmtime(src / "part0.parquet")
    for i in range(2):
        os.utime(src / f"part{i}.parquet", (now - 30 + 10 * i,) * 2)
    raw = (
        spark.readStream.schema(SPARK_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sig = ph.image_phash_signatures(raw, "doc_id", "text")
    bands = ph.phash_band_index(sig).select(
        F.col("id").alias("doc_id"), "band",
        F.col("val").cast("string").alias("sig"),
    )
    q = (
        streaming_neardup_admission(bands)
        .writeStream.format("memory")
        .queryName("adm_media")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    q.stop()
    got = {}
    for r in spark.table("adm_media").collect():
        got.setdefault(r["doc_id"], set()).add(r["match_id"])
    # doc 10's image is pixel-identical to doc 0's -> all 4 bands
    # collide with the batch-0 state; docs 0 and 1 admitted
    assert got[10] == {0}
    assert got[0] == {None} and got[1] == {None}


def test_stream_bloomgate_matches_batch_probe(spark):
    """The streaming decontamination gate is stateless, so its
    decisions must equal the batch bloom probe on the same corpus —
    micro-batching can have no effect."""
    from pyspark.sql import functions as F

    from training_datawarehouse_spark.operators import dedup as dd
    from training_datawarehouse_spark.operators import text as tx
    from training_datawarehouse_spark.plans.relational import (
        stream_bloomgate_e2e,
    )
    from training_datawarehouse_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["k1"]: (r["k2"], r["n"])
           for r in stream_bloomgate_e2e(spark, sf).collect()}

    docs = load_table(spark, sf, "documents")
    label = tx.train_val_test_split(F.col("doc_id"))
    words = list(dd.bloom_build(docs.filter(label != "train"),
                                "doc_id", "text", n=5)
                 .collect()[0]["words"])
    batch = dd.bloom_probe_lit(docs.filter(label == "train"),
                               "doc_id", "text", words, n=5)
    want = {str(r["doc_id"]): ("reject" if r["n_bloom_hits"] > 0
                               else "admit", r["n_bloom_hits"])
            for r in batch.filter(F.col("n_grams") >= 1).collect()}
    assert got == want
    assert any(v[0] == "reject" for v in want.values())
    assert any(v[0] == "admit" for v in want.values())


def test_admission_ttl_evicts_idle_buckets_and_readmits(spark, tmp_path):
    """r13 TTL variant (verdict #3): with ttl_ms set, buckets idle past
    the horizon are EVICTED (state count drops to zero on the live
    query's progress), and a later duplicate of the evicted bucket's
    ancient first member is RE-ADMITTED (match NULL) — the stated
    time-horizon semantics. Within-horizon behavior is unchanged
    (same-batch duplicates still reject). One long-lived
    processingTime-trigger query (the TTL deployment shape — with
    AvailableNow the engine keeps scheduling timeout-check batches and
    never self-terminates, per the operator docstring), files dropped
    while it runs."""
    import json as _json
    import time as _time

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    src = tmp_path / "src"
    src.mkdir()

    def write_batch(i, docs):
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": d, "text": t} for d, t in docs],
                schema=DOC_SCHEMA,
            ),
            src / f"part{i}.parquet",
        )

    def state_rows(q):
        lp = q.lastProgress
        ops = (_json.loads(lp.json)["stateOperators"]
               if lp is not None else [])
        return ops[0]["numRowsTotal"] if ops else None

    def wait_for(pred, timeout_s=240):
        t0 = _time.time()
        while _time.time() - t0 < timeout_s:
            if pred():
                return True
            _time.sleep(1)
        return False

    def sink():
        return {
            (r["doc_id"], r["band"]): r["match_id"]
            for r in spark.table("adm_ttl").collect()
        }

    write_batch(0, [(0, base), (1, base + " extra")])
    raw = (
        spark.readStream.schema(SPARK_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    bands = dd.minhash_band_rows_rowlocal(
        raw, "doc_id", "text", num_hashes=16, bands=4,
        rows_per_band=4, shingle_n=3,
    )
    q = (
        streaming_neardup_admission(bands, ttl_ms=3000)
        .writeStream.format("memory")
        .queryName("adm_ttl")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # phase 1: both docs decided; same-batch near-dup rejects
        assert wait_for(lambda: len({k[0] for k in sink()}) == 2)
        got = sink()
        assert {got[k] for k in got if k[0] == 0} == {None}
        assert {got[k] for k in got if k[0] == 1} - {None} == {0}
        assert wait_for(lambda: (state_rows(q) or 0) >= 4)

        # phase 2: idle past the horizon -> the engine's timeout
        # batches evict every bucket (STATE COUNT DROPS — the gate)
        assert wait_for(lambda: state_rows(q) == 0), state_rows(q)

        # phase 3: the ancient near-dup arrives after eviction and is
        # RE-ADMITTED (its buckets were forgotten — the stated trade)
        write_batch(1, [(10, base)])
        assert wait_for(lambda: 10 in {k[0] for k in sink()})
        got = sink()
        assert {got[k] for k in got if k[0] == 10} == {None}
    finally:
        q.stop()


def test_admission_event_ttl_horizon_is_data_defined(spark, tmp_path):
    """r15 EventTimeTimeout variant (r14 verdict #2): the horizon is
    defined by the DATA's timestamps, not trigger cadence — the exact
    failure the r14 wall-clock probe measured (a 16.9 s cold-start
    cadence blew a 15 s ttl_ms and re-admitted within-horizon dups)
    cannot happen here. The test replays a 5-minute event-time
    timeline in a few wall-clock seconds: a duplicate arriving 30
    EVENT-seconds after its bucket opened still rejects against a
    60 s event horizon (wall-clock elapsed is ~2 s — irrelevant),
    buckets whose last arrival trails the advancing WATERMARK by more
    than the horizon are evicted (state count drops on the live
    query's progress), and a later duplicate of the evicted bucket's
    first member is re-admitted — the same stated time-horizon trade,
    now replay-stable."""
    import time as _time
    from datetime import datetime, timedelta

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    ts_schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("ts", pa.timestamp("us")),
    ])
    spark_ts_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    src = tmp_path / "src"
    src.mkdir()

    def write_batch(i, docs):
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": d, "text": t, "ts": t0 + timedelta(seconds=dt)}
                 for d, t, dt in docs],
                schema=ts_schema,
            ),
            src / f"part{i}.parquet",
        )

    def state_rows(q):
        lp = q.lastProgress
        ops = (json.loads(lp.json)["stateOperators"]
               if lp is not None else [])
        return ops[0]["numRowsTotal"] if ops else None

    def wait_for(pred, timeout_s=240):
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if pred():
                return True
            _time.sleep(1)
        return False

    def sink():
        return {
            (r["doc_id"], r["band"]): r["match_id"]
            for r in spark.table("adm_ettl").collect()
        }

    write_batch(0, [(0, base, 0), (1, base + " extra", 0)])
    raw = (
        spark.readStream.schema(spark_ts_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 second")
    )
    bands = dd.minhash_band_rows_rowlocal(
        raw, "doc_id", "text", num_hashes=16, bands=4,
        rows_per_band=4, shingle_n=3, keep_cols=("ts",),
    )
    q = (
        streaming_neardup_admission(bands, event_ttl_ms=60_000)
        .writeStream.format("memory")
        .queryName("adm_ettl")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # phase 1: bucket opens at event T+0; same-batch dup rejects
        assert wait_for(lambda: len({k[0] for k in sink()}) == 2)
        got = sink()
        assert {got[k] for k in got if k[0] == 0} == {None}
        assert {got[k] for k in got if k[0] == 1} - {None} == {0}

        # phase 2: a dup 30 EVENT-seconds later — inside the 60 s
        # event horizon, so it REJECTS no matter how much or little
        # wall clock elapsed between the files (the r14 probe's
        # cadence failure is impossible by construction)
        write_batch(1, [(2, base + " extra", 30)])
        assert wait_for(lambda: 2 in {k[0] for k in sink()})
        got = sink()
        # matches are per-band first writers: buckets shared with doc
        # 0's base text carry 0, buckets of the identical "extra"
        # text carry 1 — any non-NULL match is a rejection
        m2 = {got[k] for k in got if k[0] == 2} - {None}
        assert m2 and m2 <= {0, 1}
        n_before = state_rows(q)
        assert n_before and n_before >= 4

        # phase 3: an unrelated doc at event T+300 s advances the
        # watermark past every open bucket's (last arrival + 60 s) —
        # the engine's next timeout batch evicts them; only the new
        # doc's own buckets remain
        write_batch(2, [(3, other, 300)])
        assert wait_for(lambda: 3 in {k[0] for k in sink()})
        assert wait_for(lambda: (state_rows(q) or 99) <= 4), state_rows(q)

        # phase 4: a dup of the evicted bucket's first member
        # RE-ADMITS (the stated horizon trade, event-time edition)
        write_batch(3, [(10, base, 310)])
        assert wait_for(lambda: 10 in {k[0] for k in sink()})
        got = sink()
        assert {got[k] for k in got if k[0] == 10} == {None}
    finally:
        q.stop()


def test_admission_event_ttl_late_row_does_not_rewind_horizon(
        spark, tmp_path):
    """r16 (the r15 ADVICE medium): the event horizon anchors to the
    bucket's RUNNING MAX event time persisted in state, not to the
    current batch's max. A late out-of-order row that lands in a
    batch AFTER a newer row must not rewind the eviction deadline
    from newer_ts+horizon back to late_ts+horizon — under the old
    batch-max anchoring, eviction (hence re-admission) depended on
    which micro-batch boundary a late row fell on. The late row must
    sit WITHIN the watermark delay (EventTimeTimeout drops
    older-than-watermark input before it reaches the function), so
    the delay here is 30 s: bucket opens at T+100, a late dup at
    T+80 lands in the next batch (wm = 70, passes the gate), then an
    unrelated doc advances the watermark to T+145 — past the
    REWOUND deadline (80+60 = 140) but inside the correct one
    (100+60 = 160); with batch-max anchoring the bucket would evict
    here and the T+150 duplicate would falsely re-admit. With the
    running max in state it rejects."""
    import time as _time
    from datetime import datetime, timedelta

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    t0 = datetime(2026, 1, 1, 0, 0, 0)
    ts_schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("ts", pa.timestamp("us")),
    ])
    spark_ts_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    src = tmp_path / "src"
    src.mkdir()

    def write_batch(i, docs):
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": d, "text": t, "ts": t0 + timedelta(seconds=dt)}
                 for d, t, dt in docs],
                schema=ts_schema,
            ),
            src / f"part{i}.parquet",
        )

    def sink():
        return {
            (r["doc_id"], r["band"]): r["match_id"]
            for r in spark.table("adm_ettl_late").collect()
        }

    def wait_for(pred, timeout_s=240):
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if pred():
                return True
            _time.sleep(1)
        return False

    # batch 0: the bucket opens at event T+100 (its NEWEST arrival)
    write_batch(0, [(0, base, 100)])
    raw = (
        spark.readStream.schema(spark_ts_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "30 seconds")
    )
    bands = dd.minhash_band_rows_rowlocal(
        raw, "doc_id", "text", num_hashes=16, bands=4,
        rows_per_band=4, shingle_n=3, keep_cols=("ts",),
    )
    q = (
        streaming_neardup_admission(bands, event_ttl_ms=60_000)
        .writeStream.format("memory")
        .queryName("adm_ettl_late")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        assert wait_for(lambda: 0 in {k[0] for k in sink()})

        # batch 1: a LATE out-of-order duplicate at event T+80 — 20
        # event-seconds behind the bucket's newest arrival, inside
        # the 30 s watermark delay (wm = 70 after batch 0, so the row
        # is not dropped). It rejects; the deadline must STAY at
        # 100+60 = 160, not rewind to 80+60 = 140.
        write_batch(1, [(5, base, 80)])
        assert wait_for(lambda: 5 in {k[0] for k in sink()})
        got = sink()
        assert {got[k] for k in got if k[0] == 5} == {0}

        # batch 2: an unrelated doc at T+175 advances the watermark
        # to 145 — past the rewound deadline, inside the correct one.
        # Give the engine a few timeout-check triggers: under
        # batch-max anchoring the bucket would evict here.
        write_batch(2, [(6, other, 175)])
        assert wait_for(lambda: 6 in {k[0] for k in sink()})
        _time.sleep(3)

        # batch 3: a duplicate at event T+150 — inside the horizon
        # anchored at the bucket's newest arrival (160 > wm 145).
        # Running-max anchoring keeps the state row alive, so it
        # REJECTS; the rewound deadline would have re-admitted it.
        write_batch(3, [(7, base, 150)])
        assert wait_for(lambda: 7 in {k[0] for k in sink()})
        got = sink()
        assert {got[k] for k in got if k[0] == 7} == {0}
    finally:
        q.stop()


def test_admission_ttl_modes_mutually_exclusive(spark):
    with pytest.raises(ValueError, match="mutually exclusive"):
        streaming_neardup_admission(
            spark.range(1).select(
                F.col("id").alias("doc_id"),
                F.lit(0).alias("band"), F.lit("s").alias("sig"),
            ),
            ttl_ms=1000, event_ttl_ms=1000,
        )
