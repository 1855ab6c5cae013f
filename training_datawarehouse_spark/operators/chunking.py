"""Document chunking and training-window packing (charter extensions:
the corpus-preparation steps between "clean documents" and "training
batches").

- ``chunk_text_tokens``: split each document's token stream into
  fixed-size overlapping chunks (the retrieval / long-doc-truncation
  primitive). Pure per-row array expressions — one codegen'd projection,
  no explode until the caller asks for chunk rows.

- ``pack_training_windows``: concatenate the corpus in deterministic
  id order and cut every ``capacity`` tokens — the standard pretraining
  packing (documents straddle window boundaries). Assigning each doc its
  (window, offset) needs the GLOBAL running token total, which naively
  is a single-partition window — a scale-killer. Implemented instead as
  a two-level prefix sum (the same segmented-scan shape as
  ``timeseries.ewma_scan``): per-shard cumsum in parallel, then tiny
  per-shard totals are scanned on the driver side of a broadcast join.
  No stage touches more than one shard's rows; shard count scales with
  the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_array(text: Column) -> Column:
    return F.split(text, " ")


def chunk_text_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 56,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_idx`` (0-based), ``n_tokens``,
    ``chunk_text``. Chunk starts at token offsets 1, 1+stride, … ≤ len;
    the last chunk may be short (standard truncation semantics).
    ``stride < chunk_tokens`` gives overlapping chunks."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    # materialize the token array as a column BEFORE the higher-order
    # transform: a slice over an inline token_array(text) expression
    # would re-split the text once per chunk start (no CSE inside
    # lambdas — SCALE.md "Expression-level scale trap")
    t = F.col("__t")
    arr = df.select(
        F.col(id_col), token_array(F.col(text_col)).alias("__t")
    )
    starts = F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(t, s, chunk_tokens))
    out = arr.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.size("chunk").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
    )


def pack_training_windows(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    capacity: int = 512,
    shard_width: int = 1024,
) -> DataFrame:
    """Assign each doc (ordered by ``id_col``) its packed training
    window: ``win_id`` = window index of the doc's FIRST token,
    ``win_offset`` = that token's offset inside the window. Equivalent
    to ``floor(prefix_sum/capacity)`` over a global cumsum, computed as
    a two-level scan:

      1. shard by FIXED contiguous id range ``floor(id / shard_width)``
         — shard ids need not be dense, so no min/max pre-scan (a
         driver action here would recompute the input lineage just to
         size shards); any width preserves shard ↔ order alignment,
      2. per-shard cumsum (parallel windows over single shards),
      3. per-shard totals → tiny frame → running offsets → broadcast.

    The only global structure that ever moves is one row per non-empty
    shard. Pick ``shard_width`` so a shard's rows fit one task (it is a
    partitioning knob, not a correctness one — any value ≥ 1 is exact).

    All other columns of ``df`` are carried through unchanged, so
    callers never need a recompute-the-lineage self-join to reattach
    their data to the assignment.
    """
    sharded = df.withColumn(
        "__shard", F.floor(F.col(id_col) / shard_width).cast("long")
    )
    n = F.col(n_tokens_col)

    w = Window.partitionBy("__shard").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    within = sharded.withColumn(
        "__before_in_shard", F.coalesce(F.sum(n).over(w), F.lit(0))
    )

    totals = sharded.groupBy("__shard").agg(F.sum(n).alias("__shard_total"))
    w2 = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    # |shards| rows: the single-partition window here is over a tiny
    # frame by construction, not over the data
    offsets = totals.withColumn(
        "__shard_offset", F.coalesce(F.sum("__shard_total").over(w2), F.lit(0))
    ).select("__shard", "__shard_offset")

    packed = within.join(F.broadcast(offsets), "__shard")
    before = F.col("__before_in_shard") + F.col("__shard_offset")
    return (
        packed.withColumn("win_id", F.floor(before / capacity).cast("long"))
        .withColumn("win_offset", (before % capacity).cast("long"))
        .drop("__shard", "__before_in_shard", "__shard_offset")
    )
