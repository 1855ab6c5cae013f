"""Streaming (stream/batch parity) + multimodal plumbing tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from training_datawarehouse_spark.operators import multimodal as mm
from training_datawarehouse_spark.plans.relational import tumbling_window
from training_datawarehouse_spark.streaming.events_stream import run_available_now

SF_DIR = "/root/testdata/sf0.001"


def test_stream_batch_parity(spark, tmp_path):
    """availableNow drain of the events stream == the batch F.window
    aggregation (Structured Streaming's own guarantee, asserted)."""
    # file-stream sources read directories; stage the single parquet file
    src = tmp_path / "events_src"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")
    stream_rows = run_available_now(spark, str(src), str(tmp_path / "ckpt"))
    batch = tumbling_window(spark, SF_DIR).collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    s = {key(r): (r["n"], r["total_value"]) for r in stream_rows}
    b = {key(r): (r["n"], r["total_value"]) for r in batch}
    assert s == b


def test_multimodal_decode_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc")], "doc_id long, text string"
    )
    payloads = mm.attach_binary_payload(docs, "doc_id", "text")
    meta = mm.decode_metadata(payloads).collect()
    assert len(meta) == 2
    by_id = {r["id"]: r for r in meta}
    assert by_id[1]["n_bytes"] == 16  # md5 digest payload
    assert by_id[1]["format"] in ("png", "jpeg", "webp")
    assert len(by_id[1]["checksum"]) == 16
    # deterministic: same text → same checksum
    again = {r["id"]: r for r in mm.decode_metadata(payloads).collect()}
    assert again[1]["checksum"] == by_id[1]["checksum"]


def test_multimodal_frame_sampling(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    payloads = mm.attach_binary_payload(docs, "doc_id", "text")
    frames = mm.sample_frames(payloads, every_n_bytes=4).collect()
    # md5 payload = 16 bytes → offsets 0,4,8,12
    assert [r["offset"] for r in frames] == [0, 4, 8, 12]


def test_decode_stub_raises_on_empty():
    with pytest.raises(NotImplementedError):
        mm.deterministic_fake_decode(b"")
