"""Deduplication operators for training-data pipelines (charter
extensions; no reference implementation — SURVEY §2.2).

All variants are compositions of built-in expressions — no Python UDFs:

- ``exact_dedup``: min_by hash aggregate keyed on the content hash.
  One shuffle; at 100 TB the md5 key distributes uniformly so no skew.
- ``hashed_shingles``: the shared shingling kernel — row-local
  split → transform(sequence) → explode → one xxhash64; no shuffle,
  shingles ride downstream exchanges as 8-byte longs.
- ``minhash_signatures`` + ``lsh_candidate_pairs``: k seeded murmur3
  minima per doc; banded LSH buckets expanded in-bucket (no self-join),
  hot buckets capped, candidates broadcast into exact-Jaccard
  verification over the shingle sets produced by the SAME groupBy pass
  as the signatures.
- ``simhash``: 64-bit SimHash from xxhash64 token hashes — per-bit
  weighted majority via explode + 64 conditional sums.
- ``winnowing_fingerprints``: rolling-hash window minima (MOSS) — the
  containment-detection complement to MinHash resemblance.
- ``ngram_jaccard_pairs``: exact all-pairs n-gram Jaccard via shingle
  posting lists — quadratic in posting-list length; the scale path is
  LSH above, this is the exact verifier (and the DuckDB-oracled one).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.caching import eager_checkpoint, release_local_checkpoint


def exact_dedup(df: DataFrame, content_col: str, order_col: str) -> DataFrame:
    """Keep the first row (by ``order_col``) per distinct content value.

    ``min_by`` hash aggregate, not a sort-window: map-side combine
    collapses each task to one candidate per content hash before the
    shuffle, and no per-partition sort runs — measured ~45% faster cold
    at sf0.1 and the shape that wins at 100 TB. Winner is deterministic
    whenever ``order_col`` is unique per content value."""
    payload = F.struct(*df.columns)
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("__h"))
        .agg(F.min_by(payload, F.col(order_col)).alias("__row"))
        .select("__row.*")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-tokenized). Delegates to
    ``text.word_ngrams`` — the r5 zip_with-over-top-level-slices form:
    the old index-sequence transform re-ran ``split(text)`` per lambda
    element (higher-order lambdas get no CSE → O(tokens²) per doc;
    see SCALE.md "Expression-level scale trap"). ``_gram_stream``
    below was never affected: it materializes ``__tk`` first."""
    from .text import word_ngrams

    return F.array_distinct(word_ngrams(text, n))


def _gram_stream(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(id, __gram) — one row per word-shingle occurrence, built
    entirely row-locally: split → ``transform(sequence(...))`` over the
    token array → explode. No window, no shuffle — shingling is
    embarrassingly row-parallel and the first exchange downstream ships
    slim hashed longs, not token strings. (An earlier kernel used
    posexplode + window ``lead``, which shuffles and sorts every token
    row by id before the first hash — measured equal at sf0.1 and
    strictly worse at scale.) The explode's Generate node is also an
    optimizer barrier: CollapseProject cannot inline the gram
    construction into each downstream hash expression (the hazard the
    ``minhash_signatures`` docstring describes).

    Duplicate shingles are removed PER DOCUMENT before the explode
    (``array_distinct`` — row-local, so it costs no shuffle): every
    consumer is set-semantics (``min`` aggregates, ``collect_set``,
    distinct-counted Jaccard), and repeated-phrase documents otherwise
    pay one hash + one shuffled row per repetition. The DuckDB oracles
    apply ``list_distinct`` at the same point.
    """
    if shingle_n < 1 or shingle_n > 8:
        raise ValueError("shingle_n must be in [1, 8]")
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__tk")
    ).filter(F.size("__tk") >= shingle_n)
    parts = ", ".join(
        "__tk[i]" if j == 0 else f"__tk[i + {j}]" for j in range(shingle_n)
    )
    grams = (
        f"array_distinct(transform(sequence(0, size(__tk) - {shingle_n}), "
        f"i -> concat_ws(' ', {parts})))"
    )
    return toks.select(F.col(id_col), F.explode(F.expr(grams)).alias("__gram"))


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """(id, g) — one row per word-shingle occurrence, as a 64-bit
    ``xxhash64`` of the gram string (tokens cannot contain the space
    delimiter, so the join is unambiguous). Fully row-local — see
    ``_gram_stream``."""
    return _gram_stream(df, id_col, text_col, shingle_n).select(
        id_col, F.xxhash64("__gram").alias("g")
    )


# ------------------------------------------------------------------
# Engine-portable hash family (differential-oracle support).
#
# xxhash64/murmur3 are Spark-native and fast but exist in no other
# engine, so queries built on them can only ever get a rows-only check.
# The portable family below uses ONE md5 per shingle (md5 exists in
# every engine) split into two 60-bit integers, then k universal
# hashes h_i(g) = (a_i·x + b_i·y + i) mod P over those integers —
# pure 64-bit-safe integer arithmetic any SQL engine reproduces
# bit-for-bit. Cost vs the native family is one md5 instead of one
# xxhash64 per shingle; the plan shape (and every scale property) is
# identical, so the portable family is the registry default and the
# xxhash64 family remains for hot paths that don't need an oracle.

_LSH_P = 2_147_483_647  # 2^31 − 1 (Mersenne prime)


def lsh_hash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficient pairs for the portable
    minhash family — a pure integer formula, reproducible in any
    engine/language (the DuckDB oracle generator embeds the same
    values as literals)."""
    out = []
    for i in range(num_hashes):
        a = (1103515245 * (i + 1) + 12345) % _LSH_P
        b = (22695477 * (i + 7) + 54321) % _LSH_P
        out.append((a or 1, b or 1))
    return out


def hashed_shingles_portable(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """(id, g1, g2) — one row per word-shingle occurrence as two 60-bit
    md5-prefix integers (hex chars 1-15 and 17-31 of md5(gram)).

    Same row-local kernel as ``hashed_shingles`` (``_gram_stream``:
    split → transform → explode, no shuffle); ``conv(hex,16,10)`` turns
    the prefixes into longs identically to DuckDB's
    ``('0x' || substr(md5(g),1,15))::BIGINT``."""
    grams = _gram_stream(df, id_col, text_col, shingle_n).select(
        F.col(id_col), F.md5("__gram").alias("__m")
    )
    return grams.select(
        id_col,
        F.conv(F.substring("__m", 1, 15), 16, 10).cast("long").alias("g1"),
        F.conv(F.substring("__m", 17, 15), 16, 10).cast("long").alias("g2"),
    )


def _portable_min_exprs(num_hashes: int) -> list[Column]:
    """k portable minhash aggregates over (g1, g2) shingle rows."""
    x = F.col("g1") % _LSH_P
    y = F.col("g2") % _LSH_P
    return [
        F.min(((F.lit(a) * x) % _LSH_P + (F.lit(b) * y) % _LSH_P + i) % _LSH_P)
        .alias(f"h{i}")
        for i, (a, b) in enumerate(lsh_hash_coeffs(num_hashes))
    ]


def _release_internal(frame: DataFrame, internal_storage: str) -> None:
    """Free a materialized internal table built under either
    ``internal_storage`` mode (see ``lsh_candidate_pairs_portable``)."""
    if internal_storage == "persist":
        frame.unpersist()
    else:
        release_local_checkpoint(frame)


def lsh_candidate_pairs_portable(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 32, bands: int = 8, rows_per_band: int = 4,
    jaccard_threshold: float = 0.5, shingle_n: int = 3,
    max_bucket: int = 10_000,
    materialize: bool = False,
    internal_storage: str = "checkpoint",
) -> DataFrame:
    """``lsh_candidate_pairs`` on the engine-portable hash family —
    identical plan shape (one groupBy(id) for signature AND shingle
    set, banded bucket expansion with hot-bucket cap, broadcast
    candidates into exact-Jaccard verification), but every hash is
    md5-derived so a DuckDB oracle reproduces the full pipeline
    bit-for-bit (see plans/northstar.py). Jaccard is computed over the
    60-bit g1 shingle ids in BOTH engines, so even a prefix collision
    cannot diverge them.

    ``materialize=True`` (r16): materializes the shared
    (signature + shingle-set) table for its THREE consumers (band
    explode and both Jaccard-verify sides — without it each consumer
    statically re-derives the whole shingle→md5→aggregate pipeline;
    the r16 plan audit measured zero exchange reuse across them),
    materializes the returned pair frame, and releases the internal
    table. Identical rows either way.

    ``internal_storage`` (r17, r16 verdict #1): the internal table is
    CORPUS-SIZED (minhash signature + shingle set per document).
    ``"persist"`` stores it as a MEMORY_AND_DISK cache — lineage kept
    (an executor loss recomputes instead of failing the job), spill
    by policy — with an eager count. MEASURED at sf0.1: the columnar
    cache build/read of the shingle-set arrays costs 15–30 % on this
    entry (persist 4.8–5.6 s vs checkpoint 4.0–4.4 s warm, same
    session), outside the verdict's own ±10 % acceptance, so
    ``"checkpoint"`` (the r16 localCheckpoint) stays the default;
    deployments where executor loss is routine should pass
    ``"persist"`` and pay the measured premium. The bounded
    (id, id, jaccard) pair frame always uses ``localCheckpoint``."""
    sh = hashed_shingles_portable(df, id_col, text_col, shingle_n)
    per_doc = sh.groupBy(id_col).agg(
        *_portable_min_exprs(num_hashes), F.collect_set("g1").alias("sh")
    )
    if materialize:
        if internal_storage == "persist":
            per_doc = per_doc.persist(StorageLevel.MEMORY_AND_DISK)
            per_doc.count()
        else:
            per_doc = per_doc.localCheckpoint(eager=True)

    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[
                F.col(f"h{b * rows_per_band + j}").cast("string")
                for j in range(rows_per_band)
            ]).alias("sig"),
        )
        for b in range(bands)
    ])
    banded = per_doc.select(
        F.col(id_col).alias("bid"), F.explode(band_structs).alias("bs")
    ).select("bid", F.col("bs.band"), F.col("bs.sig"))

    cand = (
        banded.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("bid")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )

    sets = per_doc.select(F.col(id_col).alias("id"), "sh")
    verified = (
        sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
        .join(F.broadcast(cand), "id_a")
        .join(
            sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (
        verified.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not materialize:
        return out
    try:
        out = out.localCheckpoint(eager=True)
    except BaseException:
        _release_internal(per_doc, internal_storage)
        raise
    _release_internal(per_doc, internal_storage)
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(id, minhash array<int>[num_hashes]) per document.

    Hash family: murmur3 with seed-chaining — ``F.hash(g, lit(i))`` is
    an independent-enough family and stays JVM-side.

    Formulated as explode → groupBy(id) → k ``min`` aggregates rather
    than ``array_min(transform(...))`` columns: the Aggregate is an
    optimizer barrier (CollapseProject would otherwise inline the whole
    shingle construction into EACH of the k hash expressions — measured
    ~5× slowdown), and partial map-side mins mean the shuffle carries
    one slim row per (mapper, doc), which is the shape that survives
    100 TB. Docs with fewer than ``shingle_n`` tokens have no shingles
    and drop out (they cannot be near-dups at this shingle size).
    """
    sh = hashed_shingles(df, id_col, text_col, shingle_n)
    mins = [F.min(F.hash("g", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("minhash")
    )


def lsh_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 32, bands: int = 8, rows_per_band: int = 4,
    jaccard_threshold: float = 0.5, shingle_n: int = 3,
    max_bucket: int = 10_000,
    materialize: bool = False,
    internal_storage: str = "checkpoint",
) -> DataFrame:
    """Banded-LSH near-dup pairs verified with exact shingle Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥
    threshold. Plan shape: signatures (1 shuffle on id) → band explode →
    groupBy bucket → in-bucket pair expansion via array expression (1
    shuffle of slim (band, sig, id) triples, no self-join) → distinct
    pairs → join shingle sets for the exact-Jaccard verification (only
    candidate pairs ever carry shingle arrays through a shuffle).

    ``materialize=True``: see ``lsh_candidate_pairs_portable`` — the
    same three-consumer signature-table materialization, same
    identical-rows contract.
    """
    sh = hashed_shingles(df, id_col, text_col, shingle_n)
    # ONE groupBy(id) produces both the k-min signature and the exact
    # shingle set — signature banding and the later Jaccard verification
    # share a single shuffle over slim (id, g) longs.
    mins = [F.min(F.hash("g", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    per_doc = sh.groupBy(id_col).agg(*mins, F.collect_set("g").alias("sh"))
    if materialize:
        if internal_storage == "persist":
            per_doc = per_doc.persist(StorageLevel.MEMORY_AND_DISK)
            per_doc.count()
        else:
            per_doc = per_doc.localCheckpoint(eager=True)

    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[
                F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)
            ]).alias("sig"),
        )
        for b in range(bands)
    ])
    banded = per_doc.select(
        F.col(id_col).alias("bid"), F.explode(band_structs).alias("bs")
    ).select("bid", F.col("bs.band"), F.col("bs.sig"))

    # In-bucket pair expansion is quadratic in bucket size. A bucket
    # larger than max_bucket means a degenerate signature (boilerplate/
    # spam floods at corpus scale) — expanding it would dominate the
    # job for pairs that exact verification mostly rejects anyway.
    # Standard practice: drop the bucket (its members still pair up in
    # their other bands unless they collide everywhere).
    cand = (
        banded.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("bid")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )

    # Candidate set is tiny relative to the corpus — broadcast it into
    # both set-lookup joins so the (id, shingle-set) table never
    # reshuffles.
    sets = per_doc.select(F.col(id_col).alias("id"), "sh")
    verified = (
        sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
        .join(F.broadcast(cand), "id_a")
        .join(
            sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (
        verified.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not materialize:
        return out
    try:
        out = out.localCheckpoint(eager=True)
    except BaseException:
        _release_internal(per_doc, internal_storage)
        raise
    _release_internal(per_doc, internal_storage)
    return out


def _pairs_expr(ids: str) -> Column:
    """All ordered pairs (a<b) from a sorted id array, as one expression:
    flatten(transform(ids, (x,i) -> transform(tail_after_i, y -> (x,y))))."""
    return F.flatten(
        F.transform(
            F.col(ids),
            lambda x, i: F.transform(
                F.slice(F.col(ids), (i + 2).cast("int"), F.greatest(F.size(F.col(ids)) - i - 1, F.lit(0)).cast("int")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, window: int = 5
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    MOSS scheme): rolling k-gram hashes → per-position minimum over a
    ``window``-wide frame → distinct minima per document.

    Guarantees: any shared substring of length ≥ k + window − 1 between
    two documents yields at least one shared fingerprint, and
    fingerprint density is ~2/(window+1) of positions — a tunable
    size/recall knob for plagiarism-style containment detection
    (complementary to MinHash, which measures whole-set resemblance).

    Fully row-local: gram hashes, the rolling window minima, and the
    per-document fingerprint dedup are all array expressions over the
    token array — the ONLY shuffle in the whole operator is the final
    (id, fp) distinct, and it ships two longs per fingerprint. (The
    per-position ``array_min(slice(...))`` is O(n·window) per doc, the
    same work the frame-based window minimum does, without the
    shuffle+sort of every token row that a window would need.)
    """
    return _winnow(df, id_col, text_col, k, window, "xxhash64(g)")


def _winnow(
    df: DataFrame, id_col: str, text_col: str, k: int, window: int,
    hash_sql: str,
) -> DataFrame:
    """Shared winnowing kernel: ``hash_sql`` maps a gram string ``g``
    to a BIGINT inside a SQL lambda."""
    toks = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__tk")
    ).filter(F.size("__tk") >= k)
    parts = ", ".join(
        "__tk[i]" if j == 0 else f"__tk[i + {j}]" for j in range(k)
    )
    gh = (
        f"transform(sequence(0, size(__tk) - {k}), "
        f"i -> concat_ws(' ', {parts}))"
    )
    gh = f"transform({gh}, g -> {hash_sql})"
    staged = toks.select(F.col(id_col), F.expr(gh).alias("__gh"))
    fps = (
        "array_distinct(transform(sequence(1, size(__gh)), "
        f"p -> array_min(slice(__gh, p, {window}))))"
    )
    return staged.select(
        F.col(id_col), F.explode(F.expr(fps)).alias("fp")
    ).distinct()


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
    # One scan, no self-join: group each shingle's (sorted) posting list,
    # expand in-list pairs with an array expression, count pair hits.
    # In-bucket expansion is quadratic in posting-list length — inherent
    # to exact Jaccard; rare hot shingles can be dropped like stopwords
    # upstream if a corpus makes them explode.
    common = (
        sh.groupBy("g")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
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


def contamination_pairs(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: find training documents that share
    word n-grams with an evaluation/benchmark set, so they can be
    dropped before training (the standard train/test-overlap guard;
    production pipelines use n of 8-13 — the knob is ``n``).

    Returns (train_id, eval_id, n_shared, overlap) where ``n_shared``
    counts shared DISTINCT n-grams and ``overlap`` is the fraction of
    the train doc's n-grams that are shared.

    Scale shape: the eval side is benchmark data — a few MB against a
    100 TB corpus — so its exploded gram list broadcasts and the train
    corpus NEVER shuffles for the join; the only shuffle is the final
    per-pair count, whose input is already filtered to gram hits.
    """
    base = train.select(
        F.col(id_col).alias("train_id"),
        word_shingles(F.col(text_col), n).alias("gs"),
    )
    tr = base.select(
        "train_id", F.size("gs").alias("n_grams"), F.explode("gs").alias("g")
    )
    ev = eval_docs.select(
        F.col(id_col).alias("eval_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("g"),
    )
    hits = tr.join(F.broadcast(ev), "g")
    return (
        hits.groupBy("train_id", "eval_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "train_id",
            "eval_id",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_grams"), 6).alias("overlap"),
        )
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


_HEX = "0123456789abcdef"


def simhash_hex_portable(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash as a 16-hex-char string, md5 token hashes only —
    the engine-portable twin of ``simhash64`` (same per-bit weighted
    majority; bit j of a token is bit (3 − j%4) of md5 hex digit j/4).
    Output is a hex STRING because recombining bit 63 into a signed
    BIGINT overflows in ANSI engines; Hamming distance works the same.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    ).select("id", F.md5("t").alias("__m"))
    digs = toks.select(
        "id",
        *[
            F.conv(F.substring("__m", d + 1, 1), 16, 10).cast("int").alias(f"d{d}")
            for d in range(16)
        ],
    )
    votes = digs.groupBy("id").agg(*[
        F.sum(
            F.when(
                F.shiftright(F.col(f"d{j // 4}"), 3 - j % 4).bitwiseAND(F.lit(1)) == 1,
                1,
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ])
    hex_chars = []
    alphabet = F.array(*[F.lit(c) for c in _HEX])
    for d in range(16):
        val = None
        for j4 in range(4):
            j = 4 * d + j4
            bit = F.when(F.col(f"b{j}") > 0, F.lit(1)).otherwise(F.lit(0))
            term = bit * (2 ** (3 - j4))
            val = term if val is None else val + term
        hex_chars.append(F.element_at(alphabet, val + 1))
    return votes.select("id", F.concat(*hex_chars).alias("simhash_hex"))


def winnowing_fingerprints_portable(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, window: int = 5
) -> DataFrame:
    """``winnowing_fingerprints`` on 60-bit md5-prefix k-gram hashes —
    same kernel and guarantees, but reproducible in any engine with
    md5 (DuckDB oracle in plans/northstar.py)."""
    return _winnow(
        df, id_col, text_col, k, window,
        "CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT)",
    )


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 60
) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation with pointer jumping: every node's label converges to
    the smallest node id in its component. Returns (node, component).

    Iterative surface (like Lloyd's k-means): each round joins the
    label table to the symmetrized edges for the neighbor minimum, then
    jumps each node's label to its label's label (path halving — the
    same shortcutting that makes large-star/small-star O(log n)). The
    only driver-side value is the scalar changed-count that decides
    convergence; ``localCheckpoint`` truncates lineage per round so the
    plan doesn't grow with iterations.

    Rounds needed: O(log(diameter)) thanks to the jump step — a
    10⁶-node boilerplate chain converges in ~20 rounds instead of 10⁶,
    so the default ``max_iter=60`` bounds any graph of < 2⁶⁰ nodes
    rather than being a scale hazard (round-2 ADVICE: diameter-bound
    propagation turned template chains into hard failures).
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    labels = sym.select("a").distinct().withColumn("label", F.col("a"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("a").alias("b"), F.col("label").alias("nl")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nbr_min"))
        )
        stepped = labels.join(nbr_min, "a", "left").select(
            "a",
            F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
        )
        # pointer jump: label ← min(label, label(label)). Labels are
        # always node ids present in the table, so the self-join is
        # total; each jump halves remaining chain depth.
        lbl_of_lbl = stepped.select(
            F.col("a").alias("label"), F.col("label").alias("ll")
        )
        # eager_checkpoint, not plain localCheckpoint (r13 verdict #5):
        # each generation reads the previous generation's leaf twice
        # (neighbor-min + pointer-jump self-join), so origin-stats
        # inheritance would square the size estimate per round — the
        # same BigInteger driver grind diagnosed on NN-descent.
        new = eager_checkpoint(
            stepped.join(lbl_of_lbl, "label", "left")
            .select(
                "a",
                F.least("label", F.coalesce("ll", "label")).alias("label"),
            )
        )
        changed = (
            new.join(labels.select("a", F.col("label").alias("old")), "a")
            .filter(F.col("label") < F.col("old"))
            .count()
        )
        # the changed-count above was the last reader of the previous
        # round's checkpoint — release its RDD blocks (Dataset.
        # unpersist would be a no-op; see functions/caching.py). The
        # round-0 labels frame is not a checkpoint → helper no-ops.
        release_local_checkpoint(labels)
        labels = new
        if changed == 0:
            return labels.select(F.col("a").alias("node"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def resolve_near_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality: Column | None = None,
    components: DataFrame | None = None,
) -> DataFrame:
    """Duplicate-cluster resolution — the end step of every dedup
    pipeline: candidate pairs → connected components → ONE canonical
    survivor per cluster, highest ``quality`` first (default: text
    length), smallest id as tiebreak. Returns (component, survivor,
    n_members).

    The survivor is row 1 of a (quality DESC, member ASC) window per
    component — the tiebreak works for ANY orderable id type (string
    doc ids included; a negate-the-id max_by trick silently breaks on
    non-numeric ids — round-2 ADVICE). Clusters are tiny relative to
    the corpus (only duplicate members reach this stage), so the
    per-component sort is bounded.
    Pass ``components`` to reuse an already-computed labeling.
    """
    comp = components if components is not None else connected_components(pairs)
    q = quality if quality is not None else F.length("text")
    members = docs.join(
        comp, docs[id_col] == comp["node"], "inner"
    ).select("component", F.col(id_col).alias("member"), q.alias("q"))
    w = Window.partitionBy("component").orderBy(
        F.col("q").desc(), F.col("member").asc()
    )
    return (
        members.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .filter(F.col("__rn") == 1)
        .select("component", F.col("member").alias("survivor"), "n_members")
    )


def minhash_band_rows_rowlocal(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 16, bands: int = 4, rows_per_band: int = 4,
    shingle_n: int = 3, keep_cols: tuple = (),
) -> DataFrame:
    """(id, band, sig) LSH band rows computed ENTIRELY ROW-LOCALLY on
    the engine-portable md5 family — no groupBy, no window, no shuffle
    of any kind, which makes this the streaming-legal signature kernel:
    Structured Streaming forbids an aggregation upstream of
    ``applyInPandasWithState``, so the batch family's
    shingle-explode → groupBy(id) → k-min plan cannot feed a stateful
    operator, but a per-row ``aggregate()`` over the document's OWN
    gram array computes the identical minima (r12 — the streaming
    near-dup admission stage's input).

    One expression tree per row: grams (``array_distinct`` over the
    shingle windows, the `_gram_stream` semantics) → (g1, g2)
    md5-prefix integer pairs via ``transform`` (one md5 per gram,
    evaluated once — the array is bound to a higher-order-function
    variable, so CollapseProject cannot duplicate it into each
    downstream reference, the `minhash_signatures` CSE trap) → a
    single ``aggregate`` that folds every gram into the
    ``num_hashes``-vector of running minima via ``zip_with`` against
    the injected ``lsh_hash_coeffs`` literal arrays → band structs
    from the bound minima vector → explode. Values are bit-identical
    to ``lsh_candidate_pairs_portable``'s signatures (same formula
    h_i = (a_i·(g1%P) + b_i·(g2%P) + i) mod P; the fold's initial
    value P is an identity because every h_i < P) and to the DuckDB
    re-derivation (`plans/relational._neardup_admission_oracle`).

    At 100 TB: stateless and embarrassingly row-parallel — the exact
    shape an ingest stream needs (signatures ride the stream as slim
    (id, band, sig) rows; nothing waits on a shuffle boundary). Batch
    pipelines should keep the groupBy kernel (map-side combine beats
    per-row fold when shingle rows already flow through an exchange).

    Docs with fewer than ``shingle_n`` tokens have no shingles and are
    filtered out, exactly like the batch kernel.

    ``keep_cols`` (r15) passes extra row-local columns through beside
    (id, band, sig) — the event-time column an EventTimeTimeout
    admission gate needs must survive the kernel so the watermark can
    propagate into the stateful operator. Kept names may not collide
    with the kernel's own output/internal columns (``band``, ``sig``,
    the ``__tk``/``bs`` internals, or ``id_col``): a silent duplicate
    column would poison every downstream selection, so that is a
    ``ValueError`` (r16, r15 ADVICE)."""
    if num_hashes != bands * rows_per_band:
        raise ValueError("num_hashes must equal bands * rows_per_band")
    reserved = {"band", "sig", "__tk", "bs", id_col} & set(keep_cols)
    if reserved:
        raise ValueError(
            f"keep_cols may not contain {sorted(reserved)}: these "
            "collide with the kernel's output/internal columns "
            f"('band', 'sig', '__tk', 'bs') or id_col={id_col!r}")
    p = _LSH_P
    coeffs = lsh_hash_coeffs(num_hashes)
    arr_a = "array(" + ",".join(str(a) for a, _ in coeffs) + ")"
    arr_b = "array(" + ",".join(str(b) for _, b in coeffs) + ")"
    idx = "array(" + ",".join(str(i) for i in range(num_hashes)) + ")"
    parts = ", ".join(
        "__tk[i]" if j == 0 else f"__tk[i + {j}]" for j in range(shingle_n)
    )
    grams = (
        f"array_distinct(transform(sequence(0, size(__tk) - {shingle_n}), "
        f"i -> concat_ws(' ', {parts})))"
    )
    gh = (
        f"transform({grams}, g -> named_struct("
        "'g1', CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT), "
        "'g2', CAST(conv(substring(md5(g), 17, 15), 16, 10) AS BIGINT)))"
    )
    mins = (
        f"aggregate({gh}, array_repeat(CAST({p} AS BIGINT), {num_hashes}), "
        f"(acc, s) -> zip_with(acc, {idx}, (m, i) -> least(m, "
        f"((element_at({arr_a}, i + 1) * (s.g1 % {p})) % {p} "
        f"+ (element_at({arr_b}, i + 1) * (s.g2 % {p})) % {p} + i) % {p})))"
    )
    sig_parts = ", ".join(
        f"CAST(element_at(ms, b * {rows_per_band} + {j} + 1) AS STRING)"
        for j in range(rows_per_band)
    )
    # bind the minima vector once (array(...) -> lambda var ms), so the
    # whole fold is evaluated once per row however many band structs
    # read from it
    banded = (
        f"explode(flatten(transform(array({mins}), ms -> "
        f"transform(sequence(0, {bands - 1}), b -> named_struct("
        f"'band', CAST(b AS INT), "
        f"'sig', concat_ws('|', {sig_parts}))))))"
    )
    keep = [F.col(c) for c in keep_cols]
    return (
        df.select(F.col(id_col), *keep,
                  F.split(F.col(text_col), " ").alias("__tk"))
        .filter(F.size("__tk") >= shingle_n)
        .select(F.col(id_col), *keep, F.expr(banded).alias("bs"))
        .select(id_col, *keep_cols, F.col("bs.band").alias("band"),
                F.col("bs.sig").alias("sig"))
    )


def lsh_band_index(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 32, bands: int = 8, rows_per_band: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(band, sig, id) rows — the persistable LSH index of a corpus.

    Incremental-dedup support: build once, write partitioned/bucketed
    by (band, sig), then each new ingest batch probes the index with
    ``lsh_probe_index`` instead of re-hashing the whole corpus. The
    index row is 3 longs — at 100 TB of text it is orders of magnitude
    smaller than its corpus and cheap to keep hot.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[
                F.element_at("minhash", b * rows_per_band + j + 1)
                for j in range(rows_per_band)
            ]).alias("sig"),
        )
        for b in range(bands)
    ])
    return sigs.select(
        F.col(id_col).alias("id"), F.explode(band_structs).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def lsh_probe_index(
    index: DataFrame, new_docs: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 32, bands: int = 8, rows_per_band: int = 4,
    shingle_n: int = 3, max_bucket: int = 10_000,
) -> DataFrame:
    """Incremental near-dup candidates: (new_id, old_id) pairs whose
    band signature collides with the stored corpus index, plus
    new-vs-new collisions within the batch (old_id < new_id convention
    cannot hold across generations, so columns are role-named).

    The probe joins the batch's band rows — tiny — against the index on
    (band, sig): with the index bucketed on those keys this reads only
    the touched buckets, never the corpus. In-batch collisions reuse
    the same in-bucket array expansion (and ``max_bucket`` hot-bucket
    cap) as ``lsh_candidate_pairs``, so an ingest batch flooded with a
    degenerate signature inherits the quadratic-blowup guard instead of
    self-joining. Verification (exact Jaccard on the candidate ids'
    texts) stays a separate composable step, as in
    ``lsh_candidate_pairs``.
    """
    probe = lsh_band_index(
        new_docs, id_col, text_col, num_hashes, bands, rows_per_band, shingle_n
    )
    vs_corpus = (
        probe.alias("n")
        .join(index.alias("o"), ["band", "sig"])
        .filter(F.col("n.id") != F.col("o.id"))
        .select(F.col("n.id").alias("new_id"), F.col("o.id").alias("old_id"))
        .distinct()
    )
    vs_batch = (
        probe.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        .select(F.explode(_pairs_expr("ids")).alias("p"))
        .select(F.col("p.id_a").alias("new_id"), F.col("p.id_b").alias("old_id"))
        .distinct()
    )
    return vs_corpus.unionByName(vs_batch).distinct()


def dup_span_coverage(
    docs: DataFrame, id_col: str, text_col: str, gram_len: int = 5
) -> DataFrame:
    """Substring-level duplication coverage (the distributed
    approximation of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" — public method): for every document,
    the number and fraction of token positions covered by a
    ``gram_len``-token window that occurs MORE THAN ONCE in the corpus
    (including within the same document). Exact-substring dedup via a
    corpus-wide suffix array doesn't distribute; k-gram anchors do —
    a repeated span of length >= gram_len is covered end-to-end by its
    repeated k-grams, so anchor coverage equals span coverage for all
    spans >= gram_len.

    Plan shape (100 TB): row-local gram construction (slice over the
    materialized token array — linear, no lambda-CSE trap), then ONE
    window partitioned by the 16-hex-char md5 gram key to count
    occurrences (same shuffle a groupBy+join-back would take, one pass
    instead of two), then per-doc interval union via a lag window:
    covered = sum(min(gram_len, pos - prev_pos)) — overlapping windows
    merge arithmetically, no interval list materializes. Two shuffles
    of the gram stream (by gram key, then by doc) — the honest cost of
    substring-level dedup; nothing is all-pairs and nothing collects.
    md5 keys keep the oracle in DuckDB; production swaps xxhash64.

    Returns (id_col, dup_span_tokens, dup_span_frac); documents with
    no duplicated grams (or fewer than ``gram_len`` tokens) get 0/0.0.
    """
    tk = docs.select(
        F.col(id_col).alias("__id"),
        F.split(F.col(text_col), " ").alias("tk"),
    )
    n_grams = F.size("tk") - F.lit(gram_len - 1)
    grams = tk.select(
        "__id",
        F.size("tk").alias("n_tokens"),
        F.explode(
            F.when(n_grams < 1, F.array().cast("array<struct<pos:int,g:string>>"))
            .otherwise(
                F.transform(
                    F.sequence(F.lit(1), n_grams),
                    lambda i: F.struct(
                        i.cast("int").alias("pos"),
                        F.substring(
                            F.md5(F.concat_ws(" ", F.slice("tk", i, gram_len))),
                            1, 16,
                        ).alias("g"),
                    ),
                )
            )
        ).alias("p"),
    ).select("__id", "n_tokens", F.col("p.pos").alias("pos"), F.col("p.g").alias("g"))
    dup = grams.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("g"))
    ).filter(F.col("cnt") > 1)
    w = Window.partitionBy("__id").orderBy("pos")
    covered = (
        dup.withColumn(
            "inc",
            F.least(
                F.lit(gram_len),
                F.col("pos") - F.coalesce(
                    F.lag("pos").over(w), F.col("pos") - F.lit(gram_len)
                ),
            ),
        )
        .groupBy("__id")
        .agg(
            F.sum("inc").cast("long").alias("dup_span_tokens"),
            F.first("n_tokens").alias("__n"),
        )
        .select(
            "__id", "dup_span_tokens",
            F.round(
                F.col("dup_span_tokens") / F.col("__n").cast("double"), 6
            ).alias("dup_span_frac"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(covered, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("dup_span_tokens", F.lit(0)).alias("dup_span_tokens"),
            F.coalesce("dup_span_frac", F.lit(0.0)).alias("dup_span_frac"),
        )
    )


# ------------------------------------------------------------------
# Bloom-filter decontamination — the map-only scale path of
# ``contamination_pairs``.
#
# The pairwise path materializes one row per (train gram hit) and
# shuffles them into per-pair counts; at 100 TB that is still the right
# tool for the REPORT (which eval doc leaked where), but the ADMISSION
# decision ("does this train doc overlap the benchmark at all?") only
# needs a membership test. A Bloom filter over the eval set's distinct
# n-grams is a few KB..MB regardless of corpus size, broadcasts to
# every executor, and turns the decision into a pure projection over
# the corpus scan: no join, no shuffle, no eval-side re-read —
# one-sided error only (no false negatives, tunable false positives).
#
# Portable hash family: the K bit positions per gram are K disjoint
# 8-hex-char slices of ONE md5(gram) reduced mod M — the same
# md5-slice discipline as the portable minhash family above, so the
# DuckDB oracle re-derives the filter AND the probe bit-for-bit
# (verified: Spark conv(substring(md5 ..),16,10) == DuckDB
# ('0x'||substr(md5 ..))::BIGINT on shared inputs). Words pack 32 bits
# each (masks stay below 2^31: no sign-bit divergence in any engine).

BLOOM_M = 65_536          # filter bits
BLOOM_WORD_BITS = 32      # bits packed per array element
BLOOM_WORDS = BLOOM_M // BLOOM_WORD_BITS
BLOOM_K = 4               # hash functions = disjoint md5 hex slices


def _bloom_pos_sql(h: str, i: int, m_bits: int = BLOOM_M) -> str:
    """Spark-SQL expression: bit position i (0-based) for md5 hex ``h``."""
    return (
        f"CAST(conv(substring({h}, {1 + 8 * i}, 8), 16, 10) AS BIGINT)"
        f" % {m_bits}"
    )


BLOOM_M_CAP = 1 << 27     # auto-sizing cap: 2^27 bits = 16 MB bitmap


def bloom_build(
    eval_docs: DataFrame, id_col: str, text_col: str, n: int = 5,
    m_bits: int | None = BLOOM_M,
) -> DataFrame:
    """Build the Bloom bitmap over the eval set's distinct word
    n-grams. Returns a ONE-ROW DataFrame with columns ``words``
    (``array<bigint>`` of length ``m_bits / 32``, 32 bits per word),
    ``m_bits``, and ``fill`` — the set-bit fraction, IN-BAND, so a
    saturated filter is detectable from the build output instead of
    only from the docstring's sizing note (r12 advice + verdict #2:
    the 100× probe measured the old fixed default at fill 1.000,
    flagging every train doc — a silently useless filter).

    ``m_bits=None`` AUTO-SIZES from the eval set: the next power of
    two ≥ 16·n_grams (K=4 → fp ≈ 2e-3), floored at the registry
    default and capped at 2^27 (a 16 MB bitmap — still a cheap
    broadcast; beyond that the eval set is large enough that the
    pairwise report path is the right tool anyway). Auto mode runs
    ONE count action over the eval gram stream — the eval side is
    benchmark data (MBs), and the build already aggregates exactly
    this stream; pinned-M callers (the registry, whose plan builders
    must stay action-free) pass the explicit value and keep a fully
    lazy build.

    Scale shape: the eval side is benchmark data (MBs); its gram
    stream reduces to ≤ M distinct bit positions, then to packed
    words via ``bit_or`` — every step is a shrinking aggregation, and
    the result is a broadcast payload of fixed size chosen by M,
    independent of corpus size. SIZE M TO THE EVAL SET: with K=4,
    fp ≈ (1 - e^(-K·n_grams/M))^K — M ≈ 16·n_grams gives ~2e-3."""
    g = (
        _gram_stream(eval_docs, id_col, text_col, n)
        .select("__gram").distinct()
    )
    if m_bits is None:
        n_grams = g.count()
        m_bits = max(BLOOM_M, 1 << max(0, (16 * n_grams - 1).bit_length()))
        m_bits = min(m_bits, BLOOM_M_CAP)
    if m_bits % BLOOM_WORD_BITS != 0:
        raise ValueError("m_bits must be a multiple of 32")
    pos = g.select(
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql("md5(__gram)", i, m_bits))
                      for i in range(BLOOM_K)])
        ).alias("p")
    ).distinct()
    words = (
        pos.select(
            (F.col("p") / BLOOM_WORD_BITS).cast("long").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(p % {BLOOM_WORD_BITS} AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    spine = eval_docs.sparkSession.range(m_bits // BLOOM_WORD_BITS).select(
        F.col("id").alias("w")
    )
    return (
        spine.join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
        .agg(F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("s"))
        .select(
            F.expr("transform(s, x -> x.bits)").alias("words"),
            F.lit(m_bits).alias("m_bits"),
            (F.expr("aggregate(s, 0L, (a, x) -> a + bit_count(x.bits))")
             / F.lit(float(m_bits))).alias("fill"),
        )
    )


def bloom_probe(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bloom: DataFrame,
    n: int = 5,
    m_bits: int = BLOOM_M,
) -> DataFrame:
    """Probe every document's distinct word n-grams against a
    ``bloom_build`` bitmap. Returns (id_col, n_grams, n_bloom_hits)
    — ``n_bloom_hits`` counts grams whose ``BLOOM_K`` bit tests all
    pass (a superset of true eval-set membership: Bloom filters have
    no false negatives).

    Plan shape: ``crossJoin(broadcast(bloom))`` pins the one-row
    bitmap to every task, then the whole probe — md5, K slice/mod
    positions, word lookup, shift, mask, count — runs inside a single
    codegen'd projection over the corpus scan. No shuffle touches the
    corpus; the operator is embarrassingly scan-parallel at any scale.
    """
    tests = " AND ".join(
        f"(shiftright(element_at(words, "
        f"CAST({_bloom_pos_sql('h', i, m_bits)} DIV {BLOOM_WORD_BITS} AS INT)"
        f" + 1), "
        f"CAST({_bloom_pos_sql('h', i, m_bits)} % {BLOOM_WORD_BITS} AS INT))"
        f" & 1) = 1"
        for i in range(BLOOM_K)
    )
    base = docs.select(
        F.col(id_col),
        word_shingles(F.col(text_col), n).alias("__gs"),
    )
    return (
        base.join(F.broadcast(bloom))
        .select(
            id_col,
            F.size("__gs").alias("n_grams"),
            F.expr(
                f"size(filter(transform(__gs, g -> md5(g)), h -> {tests}))"
            ).cast("long").alias("n_bloom_hits"),
        )
    )


def bloom_probe_lit(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    words: list,
    n: int = 5,
    m_bits: int = BLOOM_M,
    max_fill: float = 0.8,
) -> DataFrame:
    """``bloom_probe`` with the bitmap riding the EXPRESSION TREE as an
    array literal (one constant per task) instead of a joined column.

    Why it exists (measured, 100× probe): the join variant concatenates
    the build row into every probe row, so a large bitmap is copied
    per ROW — at m=2^23 (256 k longs, ~2 MB) that took the 500 k-doc
    probe from 6 s to 36 s while the m=65536 bitmap showed no cost.
    Embedding the bitmap as a ``lit`` array keeps it a per-task
    constant; the registry keeps the join form (tiny M, fully lazy —
    no driver action inside the plan builder), production probes with
    benchmark-suite-sized filters take this seam:
    ``bloom_probe_lit(docs, ..., bloom_build(...).collect()[0]["words"],
    m_bits=...)``. Semantics are identical bit-for-bit (pytest parity).

    SATURATION GUARD (r13, verdict #2): the bitmap is already on the
    driver here, so its fill factor is free to compute — a fill ≥
    ``max_fill`` means the filter flags (nearly) everything and the
    probe result is useless noise; that is a LOUD error, not a silent
    degrade (the 100× probe measured M=65536 at 500 k docs reaching
    fill 1.000 and flagging all 448 800 train docs). Re-build with
    ``bloom_build(..., m_bits=None)`` (auto-sized) or pass
    ``max_fill=1.0`` to explicitly accept a saturated probe.
    """
    from functools import reduce

    fill = sum(int(w).bit_count() for w in words) / max(1, m_bits)
    if max_fill < 1.0 and fill >= max_fill:   # max_fill=1.0 disables
        raise ValueError(
            f"bloom filter saturated: fill={fill:.3f} >= {max_fill} "
            f"at m_bits={m_bits} — the probe would flag (nearly) "
            "every document; re-build with bloom_build(m_bits=None) "
            "to auto-size, or pass max_fill=1.0 to accept")
    lw = F.lit([int(w) for w in words])

    def pos(h, i):
        return (
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
            % m_bits
        )

    def test(h, i):
        p = pos(h, i)
        word = F.element_at(lw, (p / BLOOM_WORD_BITS).cast("int") + 1)
        return (
            F.call_function(
                "shiftright", word, (p % BLOOM_WORD_BITS).cast("int")
            ).bitwiseAND(F.lit(1)) == 1
        )

    base = docs.select(
        F.col(id_col),
        word_shingles(F.col(text_col), n).alias("__gs"),
    )
    return base.select(
        id_col,
        F.size("__gs").alias("n_grams"),
        F.size(
            F.filter(
                F.transform("__gs", lambda g: F.md5(g)),
                lambda h: reduce(
                    lambda a, b: a & b,
                    [test(h, i) for i in range(BLOOM_K)],
                ),
            )
        ).cast("long").alias("n_bloom_hits"),
    )


def connected_components_incremental(
    old_components: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 60,
    validate: bool = True,
) -> DataFrame:
    """Incremental connected-components maintenance (r12 — the dedup-
    cluster member of the incremental suite next to the r9 pHash band
    index, `nnd_insert`, and the PageRank warm start): fold a batch of
    NEW edges into an existing labeling without re-running CC over the
    corpus.

    Method: relabel each new edge's endpoints by their OLD component
    label (an endpoint never seen before labels itself), keep only the
    BRIDGE edges (endpoints in different old components), run the
    batch ``connected_components`` on that CONTRACTED graph — one node
    per touched component, so its size is bounded by the ingest batch,
    not the corpus — and remap. Labels are min node ids, which are
    hierarchical (the min over merged labels IS the min over merged
    node sets), so the result is IDENTICAL to a full rebuild over
    old ∪ new edges — pytest-pinned, not assumed.

    Returns (node, component) covering every previously-labeled node
    plus every endpoint of ``new_edges``. Scale shape: two broadcast-
    able hash joins against the old labeling (at 100 TB the labeling
    is a bucketed table and these are co-located joins), one CC on the
    bridge contraction, one remap join. A daily ingest pays for its
    batch; only cluster-merging edges cost iteration.

    ``validate`` (default True) runs the min-node-id contract check
    below, which is an EAGER action (one batch-sized join per call) —
    a hot ingest loop that already trusts its labeling provenance can
    pass ``validate=False`` to keep this operator purely
    plan-building (r13 ADVICE). The check is NECESSARY BUT NOT
    SUFFICIENT either way: a foreign labeling whose labels all happen
    to be ≤ the touched node ids passes undetected — it catches the
    likely accident (labels from a different scheme or a different
    corpus), not an adversarially-crafted one."""
    oc = old_components.select(
        F.col("node").alias("__on"), F.col("component").alias("__oc")
    )
    e = new_edges.select(F.col(src).alias("__ea"), F.col(dst).alias("__eb"))
    # Contract check (r12 advice): correctness REQUIRES min-node-id
    # (hierarchical) labels, as connected_components produces — any
    # other labeling scheme would silently merge wrong. Validate the
    # TOUCHED slice only (batch-sized — the same endpoints⋈labeling
    # join the fold performs anyway; a full-labeling scan per ingest
    # would not be "cheap" at corpus scale): a min-id label is never
    # greater than its member's node id.
    if validate:
        bad = (
            e.select(F.col("__ea").alias("__on"))
            .union(e.select(F.col("__eb").alias("__on")))
            .distinct()
            .join(oc, "__on")
            .filter(F.col("__oc") > F.col("__on"))
        )
        if not bad.isEmpty():
            raise ValueError(
                "old_components is not a min-node-id labeling (found a "
                "component label greater than a member node id on the "
                "batch's touched slice); connected_components_incremental "
                "requires labels produced by connected_components")
    relabeled = (
        e.join(oc.withColumnRenamed("__on", "__ea"), "__ea", "left")
        .select(
            F.coalesce("__oc", F.col("__ea")).alias("__ca"), "__eb"
        )
        .join(oc.withColumnRenamed("__on", "__eb"), "__eb", "left")
        .select("__ca", F.coalesce("__oc", F.col("__eb")).alias("__cb"))
    )
    bridges = relabeled.filter(F.col("__ca") != F.col("__cb"))
    new_nodes = (
        e.select(F.col("__ea").alias("__on"))
        .union(e.select(F.col("__eb").alias("__on")))
        .distinct()
        .join(oc, "__on", "left_anti")
        .select("__on", F.col("__on").alias("__oc"))
    )
    mapping = oc.unionByName(new_nodes)
    if bridges.isEmpty():
        return mapping.select(
            F.col("__on").alias("node"), F.col("__oc").alias("component")
        )
    merged = connected_components(bridges, "__ca", "__cb", max_iter).select(
        F.col("node").alias("__oc"), F.col("component").alias("__mc")
    )
    return mapping.join(merged, "__oc", "left").select(
        F.col("__on").alias("node"),
        F.coalesce("__mc", F.col("__oc")).alias("component"),
    )
