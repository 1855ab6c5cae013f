"""Multimodal column plumbing (charter extension).

Images / audio / video ride through the engine as opaque ``binary``
columns with typed metadata structs. The Spark-side machinery — schema,
partition-preserving ``mapInPandas``, Arrow batch shapes — is real and
tested; the actual decode kernels (PIL/ffmpeg-class work) are STUBS
behind ``decode_fn`` because the media libraries are not available in
this environment: ``deterministic_fake_decode`` produces stable fake
metadata from the bytes so tests can assert the plumbing end-to-end.

At 100 TB: binary payloads dominate row size, so the operators are
careful to (a) select only the needed columns into the UDF
(``mapInPandas`` receives pruned Arrow batches), (b) never shuffle the
binary column for metadata-only outputs (project metadata first, then
aggregate), and (c) bound Arrow batch memory via
``spark.sql.execution.arrow.maxRecordsPerBatch`` for wide payloads.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("checksum", T.StringType()),
])


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test/demo source: derive a deterministic binary payload from a
    text column (stands in for reading image bytes from a store)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
    )


def deterministic_fake_decode(payload: bytes) -> dict:
    """STUB decode: real implementation would call PIL / libav here.

    Derives stable pseudo-metadata from the bytes so the Spark plumbing
    (schema, batching, partitioning) is testable without media libs.
    """
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload: real decoder not available")
    import hashlib

    digest = hashlib.sha256(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "format": ["png", "jpeg", "webp"][payload[0] % 3],
        "width": 64 + payload[0] % 64,
        "height": 64 + payload[1] % 64,
        "checksum": digest[:16],
    }


def decode_metadata(
    df: DataFrame,
    decode_fn: Callable[[bytes], dict] = deterministic_fake_decode,
) -> DataFrame:
    """mapInPandas decode: (id, payload) → MEDIA_META_SCHEMA rows.

    Arrow-batched; one Python crossing per batch, not per row. The
    binary column is consumed here and does not survive into the
    output — downstream aggregations never shuffle payload bytes.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_fn(p) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "id", pdf["id"].to_numpy())
            yield out[["id", "n_bytes", "format", "width", "height", "checksum"]]

    return df.select("id", "payload").mapInPandas(decode_batches, MEDIA_META_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize plumbing: (id, payload) → (id, resized payload, w, h).

    STUB kernel — a real implementation calls PIL's ``Image.resize``
    here; the deterministic fake tiles/truncates the bytes to the
    target size so output payload length is exactly ``width·height``
    and the pipeline shape (binary in → binary out through Arrow) is
    testable. Unlike metadata extraction, the binary column legitimately
    survives this operator — downstream writers should partition before
    shuffling payloads.
    """
    target = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for pid, payload in zip(pdf["id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    raise NotImplementedError("empty payload: real resizer not available")
                reps = -(-target // len(payload))  # ceil
                outs.append((payload * reps)[:target])
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy(),
                "payload": outs,
                "width": width,
                "height": height,
            })

    return df.select("id", "payload").mapInPandas(resize_batches, RESIZED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing: (id, payload) → (id, float vector).

    STUB kernel — a real implementation runs an image/audio encoder;
    the deterministic fake hashes byte windows into ``dim`` floats in
    [0, 1). Output is a dense ``array<float>`` column, i.e. the same
    shape the similarity operators consume — the multimodal and
    embedding halves of the engine compose end-to-end (tested).
    """
    import hashlib

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None or len(payload) == 0:
                    raise NotImplementedError("empty payload: real encoder not available")
                vec = []
                for i in range(dim):
                    h = hashlib.sha256(payload + bytes([i])).digest()
                    vec.append(int.from_bytes(h[:4], "big") / 2**32)
                feats.append(vec)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "features": feats})

    return df.select("id", "payload").mapInPandas(feat_batches, schema)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 4
) -> DataFrame:
    """Frame-sampling plumbing demo: explode byte offsets 0, n, 2n, …
    per payload (a real video pipeline explodes frame timestamps).
    Pure built-ins — offsets come from ``sequence``, no UDF."""
    return df.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.length("payload") - 1, F.lit(every_n_bytes))
        ).alias("offset"),
        F.length("payload").alias("n_bytes"),
    )
