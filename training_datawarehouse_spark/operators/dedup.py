"""Deduplication operators for training-data pipelines (charter
extensions; no reference implementation — SURVEY §2.2).

All variants are compositions of built-in expressions — no Python UDFs:

- ``exact_dedup``: hash-groupBy keep-first. One shuffle on the content
  hash; at 100 TB the md5 key distributes uniformly so no skew.
- ``minhash_signatures`` + ``lsh_candidate_pairs``: MinHash over word
  shingles with k seeded murmur3 hashes (``F.hash(shingle, lit(seed))``),
  banded LSH self-join on (band, band-signature). The band join is an
  equi-join on a high-cardinality composite key — shuffle both sides,
  no broadcast; candidate verification re-computes exact Jaccard on the
  (tiny) candidate set only.
- ``simhash``: 64-bit SimHash from xxhash64 token hashes — per-bit
  weighted majority via explode + 64 conditional sums.
- ``ngram_jaccard_pairs``: exact all-pairs n-gram Jaccard via
  explode + shingle equi-join — quadratic in docs sharing a shingle;
  the scale path is LSH above, this is the exact verifier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_col: str, order_col: str) -> DataFrame:
    """Keep the first row (by ``order_col``) per distinct content value."""
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(order_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-tokenized, 0-based sequence index)."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)])
    )
    # sequence(0, negative) would count downward — short docs get no grams.
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(id, minhash array<int>[num_hashes], shingles) per document.

    Hash family: murmur3 with seed-chaining — ``F.hash(s, lit(i))`` is
    an independent-enough family and stays JVM-side.
    """
    with_sh = df.select(
        F.col(id_col), F.col(text_col), word_shingles(F.col(text_col), shingle_n).alias("shingles")
    )
    mins = [
        F.array_min(F.transform("shingles", lambda s, i=i: F.hash(s, F.lit(i)))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return with_sh.select(id_col, "shingles", F.array(*[m for m in mins]).alias("minhash"))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int = 8, rows_per_band: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH candidate pairs verified with exact shingle Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥
    threshold. Shuffles: one explode+join on (band, signature) to find
    candidates, then a self-join back to shingle sets for verification.
    """
    banded = sigs.select(
        F.col(id_col).alias("bid"),
        F.col("shingles").alias("bsh"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice("minhash", b * rows_per_band + 1, rows_per_band),
            )
        ).alias("band", "band_sig"),
    ).select("bid", "bsh", "band", F.concat_ws("_", F.col("band_sig").cast("array<string>")).alias("sig"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.bid") < F.col("b.bid")))
        .select(F.col("a.bid").alias("id_a"), F.col("b.bid").alias("id_b"),
                F.col("a.bsh").alias("sh_a"), F.col("b.bsh").alias("sh_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold (id_a < id_b).

    explode → self-equi-join on shingle → pair-count agg → Jaccard from
    |A∩B| and per-doc set sizes. SQL-expressible (has a DuckDB oracle).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document from xxhash64 token hashes.

    Per-bit majority vote over tokens (explode + 64 conditional sums →
    one shuffle on id), bits recombined with shiftleft/bitwise-or.
    """
    toks = df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("t"))
    h = F.xxhash64("t")
    votes = toks.groupBy("id").agg(*[
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ])
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return votes.select("id", sim.alias("simhash"))
