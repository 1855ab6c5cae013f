"""Record linkage / entity resolution: blocked fuzzy matching.

The dimension-side twin of the document near-dup family: match dirty
entity names (typos, drops) against a clean directory. Reference
scope: the reference warehouse matches entities by exact string keys
only (`populate_from_json.py` table/equipment names); fuzzy linkage is
charter-extension surface every real warehouse ingest needs.

Method (the standard blocking + edit-distance shape, e.g.
Fellegi-Sunter-style candidate generation):

1. BLOCK both sides on a cheap deterministic key (a name-suffix slice,
   a soundex, a sorted-token prefix) — the quadratic pair space
   collapses to in-block pairs, exactly the LSH-bucket argument from
   the dedup family;
2. score in-block pairs with ``levenshtein`` (JVM codegen'd, and
   identically defined in DuckDB — unit-cost ins/del/sub — so the
   whole operator is oracle-checkable);
3. resolve each dirty record to its best candidate by (distance, id)
   — deterministic tie-break.

Scale shape (100 TB dims): one equi-shuffle on the block key, in-block
pair expansion bounded by block size (pick the key so blocks stay
small; hot blocks are the same hazard as hot LSH buckets and take the
same cap), one min_by aggregation. Nothing is all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_name(name: Column) -> Column:
    """Case-fold and strip non-alphanumerics — the minimal canonical
    form both engines reproduce (lower + regexp_replace)."""
    return F.regexp_replace(F.lower(name), "[^a-z0-9]", "")


def blocked_fuzzy_pairs(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str,
    clean_id: str,
    dirty_name: str,
    clean_name: str,
    block: Column | None = None,
    max_dist: int = 2,
    max_block: int | None = None,
) -> DataFrame:
    """(dirty_id, clean_id, dist) for every in-block pair within
    ``max_dist`` edits of each other (normalized names). ``block``
    is a Column computed from the NORMALIZED name (exposed as ``__nm``
    while it is evaluated); default: last 3 characters — swap in
    ``F.soundex(F.col("__nm"))`` or a sorted-token prefix per corpus.

    ``max_block`` caps the CLEAN-side block size (None = off): a hot
    block (a very common suffix/phonetic key) is the same quadratic
    hazard as a hot LSH bucket and takes the same treatment — skip it
    and surface those entities to an exact/manual path. The registry
    stage runs uncapped (its planted blocks are ≤ a few rows); set the
    cap in production."""
    if block is None:
        block = F.substring(F.col("__nm"), -3, 3)
    d = dirty.select(
        F.col(dirty_id).alias("__di"),
        normalize_name(F.col(dirty_name)).alias("__nm"),
    ).select("__di", F.col("__nm").alias("__dn"), block.alias("__blk"))
    c = clean.select(
        F.col(clean_id).alias("__ci"),
        normalize_name(F.col(clean_name)).alias("__nm"),
    ).select("__ci", F.col("__nm").alias("__cn"), block.alias("__blk"))
    if max_block is not None:
        keep = (
            c.groupBy("__blk").agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_block).select("__blk")
        )
        c = c.join(F.broadcast(keep), "__blk")
    return (
        d.join(c, "__blk")
        .select(
            F.col("__di").alias(dirty_id),
            F.col("__ci").alias(clean_id),
            F.levenshtein("__dn", "__cn").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def resolve_best_match(
    pairs: DataFrame, dirty_id: str, clean_id: str
) -> DataFrame:
    """One row per dirty id: the candidate with the smallest
    (dist, clean_id) — a deterministic argmin via ``min_by`` over a
    struct (map-side combinable, no window sort)."""
    return (
        pairs.groupBy(dirty_id)
        .agg(
            F.min_by(
                F.struct(F.col(clean_id), F.col("dist")),
                F.struct(F.col("dist"), F.col(clean_id)),
            ).alias("__best")
        )
        .select(
            dirty_id,
            F.col(f"__best.{clean_id}").alias(clean_id),
            F.col("__best.dist").alias("dist"),
        )
    )
