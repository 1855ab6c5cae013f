"""North-star extension queries: dedup, similarity search, text
analysis over ``documents`` / ``embeddings`` (charter-mandated; no
reference implementation — SURVEY §2.2).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.caching import (
    release_checkpoints_in, release_local_checkpoint,
)
from ..functions.scalars import round_half_away
from ..operators import bpe
from ..operators import classifier as clf
from ..operators import unigram as ug
from ..operators import audiofp as afp
from ..operators import dedup as dd
from ..operators import phash as ph
from ..operators import quantization as pq
from ..operators import retrieval as rtr
from ..operators import sampling
from ..operators import sharding
from ..operators import similarity as sim
from ..operators import text as tx
from ..operators import graph as gr
from ..operators import nndescent as nnd_op
from ..operators import video as vd
from ..operators import wordpiece as wpc
from ..sources.tables import load_table
from .base import Query

# The driver's embeddings tables carry dim-64 vectors at every sf
# (TESTDATA.md); passing the dim keeps the ANN builders free of
# driver-side probes before the distributed plan.
EMBEDDING_DIM = 64

# one hex byte of md5(doc_id) → bucket 0..255; test = [0,13), val = [13,26)
# (the SQL twin of text.train_val_test_split — shared by the split and
# decontamination oracles)
_B0_DOC = (
    "((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(h, 2, 1)) - 1)"
)


def _messy_url(did, source):
    """The shared messy-raw-URL synthesis rule (upper-case scheme/host,
    default port, tracking params, fragment; the id param only on odd
    docs so EVEN docs collide after normalization). Used by the
    lang_quality url stage AND the split composite's leakage stage;
    the oracles re-derive the normalized form in closed form."""
    return F.concat(
        F.lit("HTTPS://WWW."), F.upper(source),
        F.lit(".Example.COM:443/Articles/"),
        (did % 7).cast("string"), F.lit("/item"),
        F.when(
            did % 2 == 1,
            F.concat(F.lit("?id="), (did % 10).cast("string"),
                     F.lit("&utm_source=feed&b=2")),
        ).otherwise(F.lit("?utm_campaign=x&gclid=g")),
        F.when(did % 4 == 0, F.lit("&ref=r")).otherwise(F.lit("")),
        F.lit("#sec"), (did % 5).cast("string"),
    )


# the oracle's closed form of normalize_url(_messy_url(...)) — shared
# by the lang_quality and split-leakage oracles
_URL_NORM_SQL = (
    "'https://www.' || source || '.example.com/Articles/'"
    " || CAST(doc_id % 7 AS VARCHAR) || '/item'"
    " || CASE WHEN doc_id % 2 = 1"
    "         THEN '?b=2&id=' || CAST(doc_id % 10 AS VARCHAR)"
    "         ELSE '' END"
)


# ------------------------------------------------------- exact dedup

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: first doc_id per distinct text (hash-groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(docs, "text", "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


DEDUP_EXACT_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn = 1
"""


# -------------------------------------------------------- text stats

def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical stats, all JVM-side expressions."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(t).alias("n_tokens"),
        tx.distinct_token_count(t).alias("n_distinct"),
        F.round(tx.type_token_ratio(t), 6).alias("ttr"),
        F.round(tx.avg_token_length(t), 6).alias("avg_token_len"),
        tx.stopword_count(t, "en").alias("n_stopwords_en"),
    )


TEXT_STATS_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       len(list_distinct(toks))::BIGINT AS n_distinct,
       round(len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE, 6) AS ttr,
       round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE
             / len(toks)::DOUBLE, 6) AS avg_token_len,
       len(list_filter(toks, x -> x IN ('the','and','of','to','in','is','that','it','was','for')))::BIGINT
         AS n_stopwords_en
FROM t
"""


# --------------------------------------------- language id + quality

def lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH language-ID families plus quality filtering in ONE
    projection over one scan: stopword-heuristic lang ID, [0,1] quality
    score, word-bigram repetition fraction (the cheap boilerplate
    signal), ``drop_reason`` — the first failing filter rule per
    document ('kept' if none, so the cleaning funnel is a groupBy
    away) — and the char-trigram lang ID with its per-language overlap
    counts (``lang_pred_ngram``, ``n_en``/``n_fr``/``n_de``). Reasons
    are computed from the ROUNDED scores the row itself reports,
    keeping Spark and the oracle bit-identical at the thresholds.
    Formerly two registry entries; merged so both ride one scan.

    r4 adds the PII-scrubbing stage (``operators/text.py:redact_pii``)
    on the same scan: the synthetic corpus carries no PII (zero digit
    runs corpus-wide), so the stage INJECTS deterministic PII derived
    from ``doc_id`` — an email, a phone, a URL, each on its own residue
    class so docs carry 0–3 kinds — then counts and redacts it, and the
    oracle re-derives the identical dirty text and regex semantics in
    DuckDB (Java regex vs RE2 agree on the explicit-class patterns;
    redaction order URL→email→phone is part of the contract). Reported:
    ``n_emails``/``n_urls``/``n_phones`` on the dirty text and
    ``clean_fp`` — md5-16 of the redacted text, so a single character
    of redaction drift hash-mismatches. Everything is codegen'd
    string/regex work on the one scan: no extra shuffle, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    lp = tx.lang_id(t)
    q = F.round(tx.quality_score(t), 6)
    r = F.round(tx.repetition_score(t, 2), 6)
    grams = tx.char_trigrams(t)
    ngram_cols = [
        F.size(F.array_intersect(grams, F.lit(list(prof))))
        .alias(f"n_{lang}")
        for lang, prof in tx.CHAR_TRIGRAM_PROFILES.items()
    ]
    did = F.col("doc_id")
    dirty = F.concat(
        t,
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" reach user"), did.cast("string"),
                     F.lit("@mail-example.org for details")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 1,
            F.concat(F.lit(" or call +1-555-"),
                     F.lpad((did % 10000).cast("string"), 4, "0"),
                     F.lit("-0199")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 2,
            F.concat(F.lit(" see https://corpus.example.org/doc/"),
                     did.cast("string"), F.lit(" first")),
        ).otherwise(F.lit("")),
    )
    pii = tx.pii_counts(dirty)

    # r5 URL-hygiene stage, same scan: a deliberately MESSY raw URL per
    # doc (upper-case scheme/host, default port, tracking params,
    # fragment; the id param only on odd docs so even docs COLLIDE
    # after normalization) is parsed with Spark's parse_url machinery,
    # normalized (lowercase scheme/host, port/fragment/tracking
    # dropped, kept params sorted), and deduped by a window count over
    # the canonical form. The oracle re-derives every value in closed
    # form from (source, doc_id) — a genuine differential check of the
    # whole parse→filter→sort→rebuild chain.
    url_raw = _messy_url(did, F.col("source"))

    # r8 Gopher rule battery (operators/text.py, Rae et al. 2021
    # A1.1), same scan. The synthetic corpus is rule-degenerate (no
    # stop words, bullets, symbols, or digit words), so — the PII-
    # stage pattern — deterministic rule-relevant content is APPENDED
    # per doc_id residue class: stop words on even ids (odd ids fail
    # g_stop_words), a 10-bullet-line tail on %13==5 (frac 10/11 >
    # 0.9 → fails), a 3-bullet tail on %7==3 (0.75 → passes, nonzero
    # measurement), 4 ellipsis-ended lines on %17==6 (0.8 > 0.3 →
    # fails), a '#' burst on %11==4 (symbol ratio > 0.1 → fails), and
    # 30 digit words on %19==7 (alpha frac < 0.8 → fails). Overlaps
    # resolve by the battery's fixed rule order. The oracle re-derives
    # the identical appended text and every measurement in SQL.
    g_text = F.concat(
        t,
        F.when(did % 2 == 0,
               F.lit(" the of and that have with be to")
               ).otherwise(F.lit("")),
        F.when(did % 13 == 5,
               F.lit("".join(f"\n• item{i}" for i in range(10)))
               ).otherwise(F.lit("")),
        F.when((did % 7 == 3) & ~(did % 13 == 5),
               F.lit("\n• one\n• two\n• three")).otherwise(F.lit("")),
        F.when(did % 17 == 6,
               F.lit("\nwait...\nmore...\nhmm...\nyes...")
               ).otherwise(F.lit("")),
        F.when(did % 11 == 4,
               F.lit(" ################")).otherwise(F.lit("")),
        F.when(did % 19 == 7,
               F.lit(" " + " ".join(str(i % 10) for i in range(30)))
               ).otherwise(F.lit("")),
        # repetition half (r8b): 8 identical boilerplate lines
        # (dup-line char fraction ≫ 0.2) and a 20×-repeated bigram
        # (top-2-gram char fraction > 0.2)
        F.when(did % 23 == 8,
               F.lit("\nduplicate boilerplate navigation footer" * 8)
               ).otherwise(F.lit("")),
        F.when(did % 37 == 11,
               F.lit(" buy now" * 20)).otherwise(F.lit("")),
    )
    gm = tx.gopher_measurements(g_text)

    # r8b C4 battery (operators/text.py, Raffel et al. 2020 §2.2) on
    # its own injected twin text (the corpus has no sentence
    # punctuation, placeholder text, or braces): docs with
    # doc_id % 3 != 2 gain three terminal-punctuated sentences (the
    # %3 == 2 residue fails c4_few_sentences), %41 == 3 gains
    # "lorem ipsum", %43 == 5 gains a code brace.
    c4_text = F.concat(
        t,
        F.when(did % 3 != 2,
               F.lit(" First tail. Second tail! Third tail?")
               ).otherwise(F.lit("")),
        F.when(did % 41 == 3,
               F.lit(" lorem ipsum dolor sit")).otherwise(F.lit("")),
        F.when(did % 43 == 5,
               F.lit(" function() { return 1; }")).otherwise(F.lit("")),
    )
    cm = tx.c4_measurements(c4_text)

    # r12 link-graph centrality stage (operators/graph.py): the corpus
    # carries no hyperlinks, so — the PII-stage pattern — a
    # deterministic synthetic link graph is derived from doc_id alone:
    # each doc gets (doc_id % 4) out-slots, slot j targeting
    # md5(doc_id||'#'||j) % N (self-loops/dups dropped by the
    # operator; %4==0 docs are dangling). Fixed-point integer PageRank
    # (5 iterations, d=0.85, SCALE=1e12) is bit-exact in both engines —
    # no float agg, no rounding contract. pr_rank is the document's
    # link-quality prior in 1e-12 units.
    cntd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    edges = (
        docs.select("doc_id").crossJoin(F.broadcast(cntd))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(F.expr(
                "CASE WHEN doc_id % 4 = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
                "ELSE transform(sequence(0, CAST(doc_id % 4 AS INT) - 1), "
                "j -> CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
                " '#', CAST(j AS STRING))), 1, 8), 16, 10) AS BIGINT)"
                " % n_docs) END"
            )).alias("dst"),
        )
    )
    pr = gr.pagerank_fixed(
        docs.select("doc_id"), edges, node_col="doc_id",
        iterations=5, damping_pct=85,
    )

    out = docs.select(
        "doc_id",
        lp.alias("lang_pred"),
        q.alias("quality"),
        r.alias("repetition"),
        tx.drop_reason(lp, q, r, tx.token_count(t)).alias("drop_reason"),
        tx.lang_id_char_ngram(t).alias("lang_pred_ngram"),
        *ngram_cols,
        *[v.alias(k) for k, v in gm.items()],
        tx.gopher_drop(gm).alias("gopher_drop"),
        *[v.alias(k) for k, v in cm.items()],
        tx.c4_drop(cm).alias("c4_drop"),
        pii["n_emails"].alias("n_emails"),
        pii["n_urls"].alias("n_urls"),
        pii["n_phones"].alias("n_phones"),
        F.substring(F.md5(tx.redact_pii(dirty)), 1, 16).alias("clean_fp"),
        tx.url_host(url_raw).alias("url_host"),
        tx.registrable_domain(url_raw).alias("url_domain"),
        tx.url_path_depth(url_raw).alias("url_path_depth"),
        tx.n_tracking_params(url_raw).alias("n_tracking"),
        tx.normalize_url(url_raw).alias("url_norm"),
    )
    return out.withColumn(
        "url_dups",
        F.count(F.lit(1)).over(Window.partitionBy("url_norm")),
    ).join(pr, "doc_id")


def _pagerank_oracle(iterations: int = 5, d: int = 85,
                     scale: int = 10**12) -> str:
    """DuckDB twin of the lang_quality PageRank stage: the same
    deterministic link-graph synthesis and the same integer recurrence,
    unrolled to ``iterations`` CTE generations. Pure BIGINT arithmetic
    (``//`` == Spark ``DIV`` for non-negative operands) — bit-exact, no
    float column anywhere."""
    dd = 100
    its = []
    for k in range(1, iterations + 1):
        p = k - 1
        its.append(f"""
prdang{k} AS (
  SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS dang FROM pr{p}
  LEFT JOIN prdeg ON pr{p}.node = prdeg.src WHERE deg IS NULL
),
prin{k} AS (
  SELECT e.dst, CAST(sum({d} * p.r // ({dd} * g.deg)) AS BIGINT) AS inmass
  FROM pred e
  JOIN pr{p} p ON p.node = e.src
  JOIN prdeg g ON g.src = e.src
  GROUP BY 1
),
pr{k} AS (
  SELECT n0.node,
         CAST(({dd - d} * {scale}) // ({dd} * nn.n_docs)
         + {d} * dk.dang // ({dd} * nn.n_docs)
         + COALESCE(c.inmass, 0) AS BIGINT) AS r
  FROM pr0 n0
  LEFT JOIN prin{k} c ON c.dst = n0.node
  CROSS JOIN prn nn
  CROSS JOIN prdang{k} dk
)""")
    return f"""
WITH prn AS (SELECT count(*) AS n_docs FROM documents),
pre_raw AS (
  SELECT d.doc_id AS src,
         ('0x' || substr(md5(d.doc_id::VARCHAR || '#' || j::VARCHAR), 1, 8)
         )::BIGINT % n.n_docs AS dst
  FROM documents d, prn n, range(0, 3) t(j)
  WHERE j < d.doc_id % 4
),
-- dst restricted to the node set, mirroring pagerank_fixed's
-- node-set filter (r12 advice: the fixtures' contiguous [0, N)
-- doc_id domain made the restriction a no-op, but a changed domain
-- would silently diverge out-degrees without it)
pred AS (
  SELECT DISTINCT p.src, p.dst FROM pre_raw p
  JOIN documents nd ON nd.doc_id = p.dst
  WHERE p.src != p.dst
),
prdeg AS (SELECT src, count(*) AS deg FROM pred GROUP BY 1),
prind AS (SELECT dst, count(*) AS ind FROM pred GROUP BY 1),
pr0 AS (
  SELECT doc_id AS node, CAST({scale} // n.n_docs AS BIGINT) AS r
  FROM documents, prn n
),{','.join(its)}
SELECT p.node AS doc_id, p.r AS pr_rank,
       COALESCE(g.deg, 0) AS pr_out_deg,
       COALESCE(i.ind, 0) AS pr_in_deg
FROM pr{iterations} p
LEFT JOIN prdeg g ON g.src = p.node
LEFT JOIN prind i ON i.dst = p.node
"""


_SW_EN = "('the','and','of','to','in','is','that','it','was','for')"
_SW_FR = "('le','la','les','de','et','un','une','est','que','pour')"
_SW_DE = "('der','die','das','und','ist','ein','eine','nicht','mit','für')"

LANG_QUALITY_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
cnt AS (
  SELECT doc_id, toks,
         len(list_filter(toks, x -> x IN {_SW_EN})) AS en,
         len(list_filter(toks, x -> x IN {_SW_FR})) AS fr,
         len(list_filter(toks, x -> x IN {_SW_DE})) AS de
  FROM t
)
, m AS (
SELECT doc_id, len(toks) AS n_tokens,
       CASE WHEN en > fr AND en > de THEN 'en'
            WHEN fr > en AND fr > de THEN 'fr'
            WHEN de > en AND de > fr THEN 'de'
            ELSE 'und' END AS lang_pred,
       round(0.4 * least(len(toks)::DOUBLE / 100.0, 1.0)
           + 0.3 * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
           + 0.3 * least((en::DOUBLE / len(toks)::DOUBLE) * 5.0, 1.0), 6) AS quality,
       round(CASE WHEN len(toks) < 2 THEN 0.0
                  ELSE 1.0 - len(list_distinct([toks[i] || ' ' || toks[i+1]
                                                for i in range(1, len(toks))]))::DOUBLE
                             / (len(toks) - 1)::DOUBLE END, 6) AS repetition
FROM cnt
)
, sw AS (
SELECT doc_id, lang_pred, quality, repetition,
       CASE WHEN n_tokens < 5 THEN 'too_short'
            WHEN repetition > 0.5 THEN 'repetitive'
            WHEN quality < 0.3 THEN 'low_quality'
            WHEN lang_pred = 'und' THEN 'unknown_lang'
            ELSE 'kept' END AS drop_reason
FROM m
)
, u AS (
  -- url-hygiene stage: every value re-derived in closed form from
  -- (source, doc_id) — the synthesis rule the Spark side parses back
  -- out of the messy raw URL
  SELECT doc_id,
         'www.' || source || '.example.com' AS url_host,
         'example.com' AS url_domain,
         CAST(3 AS BIGINT) AS url_path_depth,
         CAST(CASE WHEN doc_id % 2 = 1 THEN 1
                   WHEN doc_id % 4 = 0 THEN 3
                   ELSE 2 END AS BIGINT) AS n_tracking,
         {_URL_NORM_SQL} AS url_norm
  FROM documents
)
, ud AS (
  SELECT u.*, count(*) OVER (PARTITION BY url_norm) AS url_dups FROM u
)
SELECT sw.*, cg.lang_pred AS lang_pred_ngram, cg.n_en, cg.n_fr, cg.n_de,
       gq.g_dup_line_frac, gq.g_top2gram_frac,
       gq.g_n_words, gq.g_mean_word_len, gq.g_symbol_ratio,
       gq.g_bullet_frac, gq.g_ellipsis_frac, gq.g_alpha_frac,
       gq.g_stop_hits, gq.gopher_drop,
       cq.c4_n_sentences, cq.c4_terminal_frac, cq.c4_has_lorem,
       cq.c4_has_brace, cq.c4_drop,
       p.n_emails, p.n_urls, p.n_phones, p.clean_fp,
       ud.url_host, ud.url_domain, ud.url_path_depth, ud.n_tracking,
       ud.url_norm, ud.url_dups,
       prq.pr_rank, prq.pr_out_deg, prq.pr_in_deg
FROM sw JOIN ({{CHAR_NGRAM}}) cg USING (doc_id)
JOIN (@@GOPHER@@) gq USING (doc_id)
JOIN (@@C4@@) cq USING (doc_id)
JOIN (@@PII@@) p USING (doc_id)
JOIN ud USING (doc_id)
JOIN (@@PAGERANK@@) prq USING (doc_id)
"""

# PII stage oracle: identical dirty-text derivation + the same three
# explicit-character-class regexes (Java regex on Spark, RE2 here —
# the patterns avoid every dialect divergence: no \d, no lookaround,
# no backrefs). Kept OUT of the f-string/.format pipeline (regex
# quantifier braces would need quadruple-escaping) and spliced via the
# @@PII@@ marker + .replace below.
_PII_ORACLE = """
WITH dirty AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' reach user' || doc_id || '@mail-example.org for details'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 1
            THEN ' or call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 || '-0199'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 2
            THEN ' see https://corpus.example.org/doc/' || doc_id || ' first'
            ELSE '' END
    AS d
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(d, '__EMAIL__'))::BIGINT AS n_emails,
  len(regexp_extract_all(d, '__URL__'))::BIGINT AS n_urls,
  len(regexp_extract_all(d, '__PHONE__'))::BIGINT AS n_phones,
  substr(md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(d, '__URL__', '<URL>', 'g'),
        '__EMAIL__', '<EMAIL>', 'g'),
      '__PHONE__', '<PHONE>', 'g')
  ), 1, 16) AS clean_fp
FROM dirty
""".replace("__EMAIL__", tx.EMAIL_PATTERN).replace(
    "__URL__", tx.URL_PATTERN).replace("__PHONE__", tx.PHONE_PATTERN)


def lang_char_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram language ID (the n-gram heuristic complement to the
    stopword-based lang_id), plus per-language overlap counts."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    grams = tx.char_trigrams(t)
    cols = [
        F.size(F.array_intersect(grams, F.lit(list(prof))))
        .alias(f"n_{lang}")
        for lang, prof in tx.CHAR_TRIGRAM_PROFILES.items()
    ]
    return docs.select(
        "doc_id", tx.lang_id_char_ngram(t).alias("lang_pred"), *cols
    )


def _prof_sql(lang: str) -> str:
    grams = ", ".join("'" + g.replace("'", "''") + "'" for g in
                      tx.CHAR_TRIGRAM_PROFILES[lang])
    return f"[{grams}]"


LANG_CHAR_NGRAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct([substr(p, i, 3)
                        for i in range(1, greatest(length(p) - 2, 0) + 1)]) AS grams
  FROM t
),
c AS (
  SELECT doc_id,
         len(list_intersect(grams, {_prof_sql('en')})) AS n_en,
         len(list_intersect(grams, {_prof_sql('fr')})) AS n_fr,
         len(list_intersect(grams, {_prof_sql('de')})) AS n_de
  FROM g
)
SELECT doc_id,
       CASE WHEN n_en > n_fr AND n_en > n_de THEN 'en'
            WHEN n_fr > n_en AND n_fr > n_de THEN 'fr'
            WHEN n_de > n_en AND n_de > n_fr THEN 'de'
            ELSE 'und' END AS lang_pred,
       n_en::INT AS n_en, n_fr::INT AS n_fr, n_de::INT AS n_de
FROM c
"""

# Gopher-battery oracle (r8): re-derives the identical appended
# rule-relevant text and every measurement/decision in SQL —
# thresholds spliced from the same operators/text.py constants the
# Spark battery uses. Kept out of the f-string (the injected bullet
# block is generated) and spliced via @@GOPHER@@.
_GOPHER_BULLETS_10 = "".join(
    f" || chr(10) || '• item{i}'" for i in range(10)
)
_GOPHER_DIGITS_30 = " " + " ".join(str(i % 10) for i in range(30))
_GOPHER_ORACLE = f"""
WITH gt AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 2 = 0
            THEN ' the of and that have with be to' ELSE '' END
    || CASE WHEN doc_id % 13 = 5 THEN ''{_GOPHER_BULLETS_10} ELSE '' END
    || CASE WHEN doc_id % 7 = 3 AND NOT doc_id % 13 = 5
            THEN chr(10) || '• one' || chr(10) || '• two'
                 || chr(10) || '• three' ELSE '' END
    || CASE WHEN doc_id % 17 = 6
            THEN chr(10) || 'wait...' || chr(10) || 'more...'
                 || chr(10) || 'hmm...' || chr(10) || 'yes...'
            ELSE '' END
    || CASE WHEN doc_id % 11 = 4 THEN ' ################' ELSE '' END
    || CASE WHEN doc_id % 19 = 7 THEN '{_GOPHER_DIGITS_30}' ELSE '' END
    || CASE WHEN doc_id % 23 = 8
            THEN repeat(chr(10) || 'duplicate boilerplate navigation'
                        || ' footer', 8) ELSE '' END
    || CASE WHEN doc_id % 37 = 11 THEN repeat(' buy now', 20)
            ELSE '' END
    AS g
  FROM documents
),
gw AS (
  SELECT doc_id, g, string_split(g, ' ') AS w,
         string_split(g, chr(10)) AS ln,
         [string_split(g, ' ')[i] || ' ' || string_split(g, ' ')[i + 1]
          for i in range(1, len(string_split(g, ' ')))] AS bg
  FROM gt
),
gx AS (
  SELECT doc_id,
    round(CASE WHEN list_sum(list_transform(ln, x -> len(x))) > 0
          THEN coalesce(list_sum(list_transform(
                 list_filter(ln, x -> len(list_filter(ln, o -> o = x)) > 1),
                 x -> len(x))), 0)::DOUBLE
               / list_sum(list_transform(ln, x -> len(x)))
          ELSE 0.0 END, 6) AS g_dup_line_frac,
    round(CASE WHEN len(w) >= 2
          THEN list_max(list_transform(list_distinct(bg),
                 b -> CASE WHEN len(list_filter(bg, x -> x = b)) >= 2
                      THEN len(list_filter(bg, x -> x = b)) * len(b)
                      ELSE 0 END))::DOUBLE
               / len(g)
          ELSE 0.0 END, 6) AS g_top2gram_frac,
    len(w)::BIGINT AS g_n_words,
    round(list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w), 6)
      AS g_mean_word_len,
    round(((len(g) - len(replace(g, '#', '')))
           + floor((len(g) - len(replace(g, '...', ''))) / 3))::DOUBLE
          / len(w), 6) AS g_symbol_ratio,
    round(len(list_filter(ln, x -> starts_with(x, '•')
                                   OR starts_with(x, '- ')))::DOUBLE
          / len(ln), 6) AS g_bullet_frac,
    round(len(list_filter(ln, x -> ends_with(x, '...')))::DOUBLE
          / len(ln), 6) AS g_ellipsis_frac,
    round(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))::DOUBLE
          / len(w), 6) AS g_alpha_frac,
    len(list_intersect(list_distinct(w),
        [{", ".join("'" + s + "'" for s in tx.GOPHER_STOPWORDS)}]))::BIGINT
      AS g_stop_hits
  FROM gw
)
SELECT *,
  CASE WHEN g_dup_line_frac > {tx.GOPHER_MAX_DUP_LINE_CHAR_FRAC}
         THEN 'g_dup_lines'
       WHEN g_top2gram_frac > {tx.GOPHER_MAX_TOP2GRAM_CHAR_FRAC}
         THEN 'g_top_2gram'
       WHEN g_n_words < {tx.GOPHER_MIN_WORDS}
            OR g_n_words > {tx.GOPHER_MAX_WORDS} THEN 'g_word_count'
       WHEN g_mean_word_len < {tx.GOPHER_MIN_MEAN_WORD_LEN}
            OR g_mean_word_len > {tx.GOPHER_MAX_MEAN_WORD_LEN}
         THEN 'g_mean_word_len'
       WHEN g_symbol_ratio > {tx.GOPHER_MAX_SYMBOL_RATIO}
         THEN 'g_symbol_ratio'
       WHEN g_bullet_frac > {tx.GOPHER_MAX_BULLET_FRAC}
         THEN 'g_bullet_lines'
       WHEN g_ellipsis_frac > {tx.GOPHER_MAX_ELLIPSIS_FRAC}
         THEN 'g_ellipsis_lines'
       WHEN g_alpha_frac < {tx.GOPHER_MIN_ALPHA_FRAC}
         THEN 'g_alpha_words'
       WHEN g_stop_hits < {tx.GOPHER_MIN_STOPWORD_HITS}
         THEN 'g_stop_words'
       ELSE 'kept' END AS gopher_drop
FROM gx
"""

# C4-battery oracle (r8b): the identical injected twin text and every
# measurement/decision re-derived in SQL (thresholds from the same
# operators/text.py constants). Spliced (the brace-bearing injected
# code snippet must never meet .format).
_C4_ORACLE = """
WITH ct AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 != 2
            THEN ' First tail. Second tail! Third tail?' ELSE '' END
    || CASE WHEN doc_id % 41 = 3 THEN ' lorem ipsum dolor sit'
            ELSE '' END
    || CASE WHEN doc_id % 43 = 5 THEN ' function() [BRACE] return 1; }'
            ELSE '' END
    AS c
  FROM documents
),
cx AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(c, '[.!?]'),
        s -> trim(s) != ''))::BIGINT AS c4_n_sentences,
    round(len(list_filter(string_split(c, chr(10)),
          x -> ends_with(x, '.') OR ends_with(x, '!')
               OR ends_with(x, '?') OR ends_with(x, '"')))::DOUBLE
          / len(string_split(c, chr(10))), 6) AS c4_terminal_frac,
    (CASE WHEN contains(lower(c), 'lorem ipsum') THEN 1 ELSE 0 END)::INT
      AS c4_has_lorem,
    (CASE WHEN contains(c, '[BRACE]') THEN 1 ELSE 0 END)::INT
      AS c4_has_brace
  FROM ct
)
SELECT *,
  CASE WHEN c4_has_lorem = 1 THEN 'c4_lorem'
       WHEN c4_has_brace = 1 THEN 'c4_brace'
       WHEN c4_n_sentences < __C4_MIN__ THEN 'c4_few_sentences'
       ELSE 'kept' END AS c4_drop
FROM cx
""".replace("[BRACE]", "{").replace(
    "__C4_MIN__", str(tx.C4_MIN_SENTENCES))

# the merged lang entry joins the char-ngram block in as a subquery;
# the PII block splices in AFTER .format so its regex braces never
# meet the format machinery
LANG_QUALITY_ORACLE = LANG_QUALITY_ORACLE.format(
    CHAR_NGRAM=LANG_CHAR_NGRAM_ORACLE
).replace("@@PII@@", _PII_ORACLE).replace(
    "@@GOPHER@@", _GOPHER_ORACLE).replace("@@C4@@", _C4_ORACLE).replace(
    "@@PAGERANK@@", _pagerank_oracle())


# ------------------------------------------------------- fingerprint

def fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical md5 fingerprint of normalized text + dupe-group size."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", tx.fingerprint(F.col("text")).alias("fp"))
    counts = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("group_size"))
    return fp.join(counts, "fp").select("doc_id", "fp", "group_size")


FINGERPRINT_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) AS fp
  FROM documents
)
SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS group_size FROM fp
"""


# ------------------------------------------------ similarity search

#: fixed lexical probe queries for the BM25 stage — drawn from the
#: synthetic corpus vocabulary; ids ≥100 so they can't collide with
#: the more-like-this query-doc ids (0..2)
_BM25_QUERIES: list[tuple[int, tuple[str, ...]]] = [
    (100, ("spark", "window", "agg")),
    (101, ("customer", "query", "join")),
    (102, ("vector", "stream", "batch")),
]
_MLT_N_QUERIES = 3   # more-like-this query docs: doc_id 0..2 (≡ vec_id)
_MLT_MAX_TERMS = 8
_RETR_K = 5
_RRF_DEPTH = 20      # fusion depth: top-20 from each ranking


def similarity_topk(spark: SparkSession, sf_dir: str,
                    include_retrieval: bool = True) -> DataFrame:
    """Retrieval composite (r7): three hash-checked stages on the
    (query_id, rank, neighbor_id, score) grain.

    - 'cosine': brute-force exact top-5 cosine neighbours for 8 query
      vectors (the r1 entry; score = cosine).
    - 'bm25' (r7): BM25 lexical ranked retrieval (Robertson et al.;
      Lucene-default scoring) for three fixed term queries over
      ``documents`` — see ``operators/retrieval.py`` for the 100 TB
      shape (query-term broadcast prune before any shuffle, tf+|d|
      from one aggregation, two-level top-k).
    - 'mlt_rrf' (r7): hybrid more-like-this search — for query docs
      0..2 (doc_id ≡ vec_id in the synthetic corpus), fuse the BM25
      ranking of the doc's first-8 sorted distinct tokens with the
      exact embedding-cosine ranking by reciprocal-rank fusion
      (Cormack et al. 2009, c=60) over the top-20 of each, re-ranked
      to top-5. The standard hybrid lexical+vector retrieval combiner,
      entirely in DataFrame ops.

    The oracle RE-DERIVES all three rankings — BM25 scores (same
    idf/saturation arithmetic, same 6-dp pre-rank rounding, same
    neighbor-id tie-break), the fusion sum, and the final ranks — so
    the retrieval math itself is hash-checked.
    ``include_retrieval=False`` is the r6-equivalent (cosine-only)
    sub-plan for the bench twin."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < 8)
    if not include_retrieval:
        cos = sim.cosine_topk(emb, qv, "vec_id", "embedding", k=_RETR_K)
        return cos.select(
            F.lit("cosine").alias("stage"), "query_id", "rank",
            "neighbor_id", F.col("cosine").alias("score"),
        )
    # ONE exact-cosine pass serves BOTH vector consumers (r16): the
    # 'cosine' stage needs top-_RETR_K for queries 0..7 and the RRF
    # fusion needs top-_RRF_DEPTH for queries 0.._MLT_N_QUERIES-1 —
    # `cosine_topk` ranks by the TOTAL order (cosine desc,
    # neighbor_id asc), so the top-5 rows are exactly the rank<=5
    # prefix of one k=_RRF_DEPTH ranking over the union query set,
    # and the deeper ranking for the MLT queries is its
    # query_id-filter. Before, the corpus was scanned and
    # broadcast-joined twice for byte-identical arithmetic.
    # materialized (eager localCheckpoint, <= 8·_RRF_DEPTH rows): the
    # two consumers' pushed-down filters would otherwise
    # de-canonicalize the shared subplan and re-run the scoring pass
    # per consumer — the same statically-duplicated-subplan failure
    # the r16 lsh_cross_modal plan audit caught
    docs = load_table(spark, sf_dir, "documents")
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in _BM25_QUERIES for t in ts],
        "query_id long, term string",
    )
    qterms = rtr.mlt_query_terms(
        docs.filter(F.col("doc_id") < _MLT_N_QUERIES),
        max_terms=_MLT_MAX_TERMS,
    )
    # ONE shared scoring pass for the literal queries AND the
    # more-like-this queries: tf/df/idf are per-TERM global
    # quantities, so scoring against the union query map yields
    # byte-identical scores while halving the corpus token scans and
    # the tf/df exchanges (the oracle shares them the same way). The
    # scored candidate set is MATERIALIZED once (the posting-
    # intersection point every search system lands): the bm25 and
    # more-like-this ranking paths would otherwise each statically
    # re-derive the whole scoring pipeline — plan-gate-asserted at 12
    # corpus scans before, 0 in the final plan after.
    # r16: the cosine pass and the BM25 scoring pass are independent
    # eager builds — overlap them (guide §2.6) instead of two serial
    # barriers.
    from concurrent.futures import ThreadPoolExecutor

    # ``deep`` / ``scored`` are BUILDER-LIFETIME checkpoints by design
    # (r16 ADVICE, documented r17): both feed the RETURNED union plan,
    # so the builder can never release them — the caller's collect
    # still needs their blocks (release_local_checkpoint's contract).
    # Residency is bounded: deep is ≤ 8·_RRF_DEPTH rows, scored is
    # candidate-grain (docs matching ≥1 query term, slim columns);
    # both die with the session like any cached result a caller holds.
    def _deep_build():
        spark.sparkContext.setJobDescription("similarity_topk: cosine pass")
        return sim.cosine_topk(
            emb, qv, "vec_id", "embedding", k=_RRF_DEPTH,
        ).localCheckpoint(eager=True)

    def _scored_build():
        spark.sparkContext.setJobDescription("similarity_topk: BM25 scoring")
        return rtr.bm25_scores(
            docs, qmap.unionByName(qterms)).localCheckpoint(eager=True)

    with ThreadPoolExecutor(2) as ex:
        f_deep = ex.submit(_deep_build)
        f_scored = ex.submit(_scored_build)
        deep = f_deep.result()
        scored = f_scored.result()
    base = deep.filter(F.col("rank") <= _RETR_K).select(
        F.lit("cosine").alias("stage"), "query_id", "rank",
        "neighbor_id", F.col("cosine").alias("score"),
    )
    bm = rtr.topk_per_query(
        scored.filter(F.col("query_id") >= 100), k=_RETR_K
    )
    bm_s = bm.select(
        F.lit("bm25").alias("stage"), "query_id", "rank",
        "neighbor_id", "score",
    )
    lex_rank = rtr.topk_per_query(
        scored.filter(
            (F.col("query_id") < 100)
            & (F.col("query_id") != F.col("neighbor_id"))
        ),
        k=_RRF_DEPTH,
    )
    vec_rank = deep.filter(F.col("query_id") < _MLT_N_QUERIES)
    rrf = rtr.rrf_fuse(lex_rank, vec_rank, k=_RETR_K)
    rrf_s = rrf.select(
        F.lit("mlt_rrf").alias("stage"), "query_id", "rank",
        "neighbor_id", "score",
    )
    return base.unionByName(bm_s).unionByName(rrf_s)


def _retrieval_oracle() -> str:
    """Re-derives all three retrieval stages in DuckDB. The BM25
    constants are spliced with ``repr`` so both engines parse the
    IDENTICAL doubles Python computed (1.2 + 1.0 is not the 2.2
    literal's double); arithmetic is parenthesized exactly as the
    Spark expression tree groups it. Two-level top-k needs no oracle
    twin — it returns exactly the global top-k by construction."""
    k1, b = rtr.BM25_K1, rtr.BM25_B
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in _BM25_QUERIES for t in ts
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
cos_scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id
),
cos_ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM cos_scored
),
dt AS (
  SELECT doc_id AS doc, len(string_split(lower(text), ' ')) AS dl,
         unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
stats AS (
  SELECT count(*)::BIGINT AS n,
         avg(len(string_split(lower(text), ' '))) AS avgdl
  FROM documents
),
qmap AS (SELECT * FROM (VALUES {qvals}) v(query_id, term)),
mlt AS (
  SELECT doc_id AS query_id, unnest(terms[1:{_MLT_MAX_TERMS}]) AS term
  FROM (SELECT doc_id,
               list_sort(list_distinct(string_split(lower(text), ' '))) AS terms
        FROM documents WHERE doc_id < {_MLT_N_QUERIES})
),
allq AS (SELECT query_id, term FROM qmap UNION ALL SELECT query_id, term FROM mlt),
terms AS (SELECT DISTINCT term FROM allq),
tf AS (
  SELECT doc, term, count(*)::BIGINT AS tf, max(dl) AS dl
  FROM dt JOIN terms USING (term)
  GROUP BY doc, term
),
dfx AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
contrib AS (
  SELECT t.doc, t.term,
         ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * ((t.tf * {k1 + 1.0!r}) /
              (t.tf + {k1!r} * ({1.0 - b!r} + {b!r} * t.dl / s.avgdl))) AS c
  FROM tf t JOIN dfx d USING (term) CROSS JOIN stats s
),
bm_scored AS (
  SELECT a.query_id, c.doc AS neighbor_id, round(sum(c.c), 6) AS score
  FROM contrib c JOIN allq a USING (term)
  GROUP BY 1, 2
),
bm_ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM bm_scored WHERE query_id >= 100
),
lex_ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM bm_scored WHERE query_id < 100 AND neighbor_id <> query_id
),
fused AS (
  SELECT query_id, neighbor_id,
         round(coalesce(1.0 / ({rtr.RRF_C} + l.rank), 0.0)
               + coalesce(1.0 / ({rtr.RRF_C} + v.rank), 0.0), 6) AS score
  FROM (SELECT * FROM lex_ranked WHERE rank <= {_RRF_DEPTH}) l
  FULL JOIN (SELECT query_id, neighbor_id, rank FROM cos_ranked
             WHERE query_id < {_MLT_N_QUERIES} AND rank <= {_RRF_DEPTH}) v
  USING (query_id, neighbor_id)
),
rrf_ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM fused
)
SELECT 'cosine' AS stage, query_id, rank, neighbor_id, round(cos, 6) AS score
FROM cos_ranked WHERE rank <= {_RETR_K}
UNION ALL
SELECT 'bm25', query_id, rank, neighbor_id, score
FROM bm_ranked WHERE rank <= {_RETR_K}
UNION ALL
SELECT 'mlt_rrf', query_id, rank, neighbor_id, score
FROM rrf_ranked WHERE rank <= {_RETR_K}
"""


SIMILARITY_ORACLE = _retrieval_oracle()


def similarity_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 via Arrow-batched numpy matmul (the dense
    scoring scale path). Same result as ns_similarity_topk — equality
    asserted in tests; rows-only here because float fold order differs
    from the SQL oracle in the last ulp."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return sim.cosine_topk_vectorized(emb, queries, "vec_id", "embedding", k=5)


def similarity_lsh(spark: SparkSession, sf_dir: str,
                   emb: DataFrame | None = None) -> DataFrame:
    """Multi-table sign-LSH ANN (8 tables × 4 planes): candidate union
    across tables, exact cosine re-score — recall ≈ 0.8 at ~40% of the
    corpus scanned on isotropic data (one table would scan 2% at
    near-zero recall; the table count is the recall/cost knob).
    ``emb`` overrides the corpus (r9: the clustered-vector recall
    eval injects a mixture-of-gaussians slice through the SAME
    pipeline the registry runs)."""
    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return sim.signlsh_topk(emb, queries, "vec_id", "embedding", k=5,
                            n_planes=_ANN_PLANES, n_tables=_ANN_TABLES,
                            dim=EMBEDDING_DIM)


# ------------------------------------------------------ near-dedup

def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full exact-dedup pipeline, tagged by stage — each stage
    hash-checked against the recursive-CTE oracle:

    - 'pairs': exact all-pairs word-3-gram Jaccard ≥ 0.5 (the oracle
      anchor for the LSH scale path).
    - 'cluster': connected components over those pairs (min-label
      propagation; label = smallest doc_id in the component).
    - 'survivor': duplicate-cluster resolution — one canonical doc per
      cluster (longest text, then smallest id) with member count.
    - 'contam': benchmark decontamination — train docs (id-hash
      split) sharing word-5-grams with the val/test docs, the
      train/eval-overlap guard every corpus release runs. id_a = train
      doc, id_b = eval doc, jaccard = shared fraction of the train
      doc's grams, n_members = shared distinct-gram count.
    - 'bloom' (r12): the MAP-ONLY scale path of 'contam' — a Bloom
      filter (M=65536 bits, K=4 md5-slice hashes, ``dedup.bloom_build``)
      over the eval set's distinct 5-grams, broadcast and probed in a
      pure projection over the train scan (``dedup.bloom_probe``); the
      corpus never shuffles for the decision. One row per train doc the
      filter flags: id_a = train doc, id_b = its EXACT shared-gram
      count (0 for a pure false positive — the one-sided-error contract
      measured in-band), jaccard = flagged fraction of the doc's grams,
      n_members = flagged gram count. Bloom hits ⊇ exact hits by
      construction; the oracle re-derives filter AND probe bit-for-bit.

    ``pairs`` is localCheckpointed once and feeds the three dedup
    stages, so the quadratic verification runs exactly once; 'contam'
    rides its own scan (eval grams broadcast — the corpus side never
    shuffles for the probe)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).localCheckpoint(eager=True)
    comp = dd.connected_components(pairs)
    surv = dd.resolve_near_duplicates(docs, pairs, components=comp)
    label = tx.train_val_test_split(F.col("doc_id"))
    train_docs = docs.filter(label == "train")
    eval_docs = docs.filter(label != "train")
    contam = dd.contamination_pairs(
        train_docs, eval_docs, "doc_id", "text", n=5,
    )
    bloom = dd.bloom_build(eval_docs, "doc_id", "text", n=5)
    bprobe = dd.bloom_probe(train_docs, "doc_id", "text", bloom, n=5)
    ev_grams = (
        eval_docs.select(
            F.explode(dd.word_shingles(F.col("text"), 5)).alias("g")
        ).distinct()
    )
    bexact = (
        train_docs.select(
            "doc_id", F.explode(dd.word_shingles(F.col("text"), 5)).alias("g")
        )
        .join(F.broadcast(ev_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    bloom_rows = (
        bprobe.filter(F.col("n_bloom_hits") > 0)
        .join(bexact, "doc_id", "left")
        .select(
            F.lit("bloom").alias("stage"),
            F.col("doc_id").alias("id_a"),
            F.coalesce("n_exact", F.lit(0).cast("long")).alias("id_b"),
            F.round(F.col("n_bloom_hits") / F.col("n_grams"), 6)
            .alias("jaccard"),
            F.col("n_bloom_hits").alias("n_members"),
        )
    )
    nul = lambda: F.lit(None).cast("double")  # noqa: E731
    p = pairs.select(
        F.lit("pairs").alias("stage"), "id_a", "id_b", "jaccard",
        F.lit(None).cast("long").alias("n_members"),
    )
    c = comp.select(
        F.lit("cluster").alias("stage"),
        F.col("node").alias("id_a"), F.col("component").alias("id_b"),
        nul().alias("jaccard"), F.lit(None).cast("long").alias("n_members"),
    )
    s = surv.select(
        F.lit("survivor").alias("stage"),
        F.col("survivor").alias("id_a"), F.col("component").alias("id_b"),
        nul().alias("jaccard"), "n_members",
    )
    x = contam.select(
        F.lit("contam").alias("stage"),
        F.col("train_id").alias("id_a"), F.col("eval_id").alias("id_b"),
        F.col("overlap").alias("jaccard"), F.col("n_shared").alias("n_members"),
    )
    return (
        p.unionByName(c).unionByName(s).unionByName(x)
        .unionByName(bloom_rows)
    )


NGRAM_JACCARD_ORACLE = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
  FROM t WHERE len(toks) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b,
         round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, least(a, min(b)) AS component FROM reach GROUP BY a
),
surv AS (
  SELECT component, doc_id AS survivor, n_members FROM (
    SELECT c.component, d.doc_id,
           count(*) OVER (PARTITION BY c.component) AS n_members,
           row_number() OVER (PARTITION BY c.component
                              ORDER BY len(d.text) DESC, d.doc_id) AS rn
    FROM comp c JOIN documents d ON d.doc_id = c.node
  ) WHERE rn = 1
),
g5 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS gram
  FROM t WHERE len(toks) >= 5
),
g5sizes AS (SELECT doc_id, count(*) AS n_g FROM g5 GROUP BY doc_id),
hx AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents),
lbl AS (SELECT doc_id, {_B0_DOC} % 256 < 26 AS is_eval FROM hx),
contam AS (
  SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS n_shared
  FROM g5 tr
  JOIN lbl lt ON lt.doc_id = tr.doc_id AND NOT lt.is_eval
  JOIN g5 ev ON ev.gram = tr.gram
  JOIN lbl le ON le.doc_id = ev.doc_id AND le.is_eval
  GROUP BY 1, 2
),
-- bloom stage: the filter (M=65536 bits / 2048 32-bit words, K=4
-- disjoint md5-hex-slice hashes) and the probe, re-derived bit-for-bit
evg AS (
  SELECT DISTINCT gram FROM g5
  JOIN lbl ON lbl.doc_id = g5.doc_id AND lbl.is_eval
),
bpos AS (
  SELECT DISTINCT p FROM (
    SELECT unnest([('0x'||substr(md5(gram),1,8))::BIGINT % 65536,
                   ('0x'||substr(md5(gram),9,8))::BIGINT % 65536,
                   ('0x'||substr(md5(gram),17,8))::BIGINT % 65536,
                   ('0x'||substr(md5(gram),25,8))::BIGINT % 65536]) AS p
    FROM evg)
),
bwords AS (
  SELECT p // 32 AS w, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
  FROM bpos GROUP BY 1
),
barr AS (
  SELECT list(COALESCE(bits, 0) ORDER BY s.w) AS words
  FROM range(0, 2048) s(w) LEFT JOIN bwords ON bwords.w = s.w
),
trl AS (
  SELECT g5.doc_id, list(md5(gram)) AS hs, count(*) AS n_g FROM g5
  JOIN lbl ON lbl.doc_id = g5.doc_id AND NOT lbl.is_eval
  GROUP BY 1
),
bprobe AS (
  SELECT doc_id, n_g,
    len(list_filter(hs, h ->
      ((words[CAST((('0x'||substr(h,1,8))::BIGINT % 65536) // 32 AS INT) + 1]
        >> CAST((('0x'||substr(h,1,8))::BIGINT % 65536) % 32 AS INT)) & 1) = 1
      AND
      ((words[CAST((('0x'||substr(h,9,8))::BIGINT % 65536) // 32 AS INT) + 1]
        >> CAST((('0x'||substr(h,9,8))::BIGINT % 65536) % 32 AS INT)) & 1) = 1
      AND
      ((words[CAST((('0x'||substr(h,17,8))::BIGINT % 65536) // 32 AS INT) + 1]
        >> CAST((('0x'||substr(h,17,8))::BIGINT % 65536) % 32 AS INT)) & 1) = 1
      AND
      ((words[CAST((('0x'||substr(h,25,8))::BIGINT % 65536) // 32 AS INT) + 1]
        >> CAST((('0x'||substr(h,25,8))::BIGINT % 65536) % 32 AS INT)) & 1) = 1
    )) AS n_hits
  FROM trl, barr
),
bexact AS (
  SELECT g5.doc_id, count(*) AS n_exact FROM g5
  JOIN lbl ON lbl.doc_id = g5.doc_id AND NOT lbl.is_eval
  JOIN evg ON evg.gram = g5.gram
  GROUP BY 1
)
SELECT 'pairs' AS stage, id_a, id_b, jaccard, NULL::BIGINT AS n_members
FROM pairs
UNION ALL
SELECT 'cluster', node, component, NULL, NULL FROM comp
UNION ALL
SELECT 'survivor', survivor, component, NULL, n_members FROM surv
UNION ALL
SELECT 'contam', train_id, eval_id, round(n_shared / s.n_g, 6), n_shared
FROM contam JOIN g5sizes s ON s.doc_id = train_id
UNION ALL
SELECT 'bloom', p.doc_id, COALESCE(e.n_exact, 0),
       round(p.n_hits / p.n_g, 6), p.n_hits
FROM bprobe p LEFT JOIN bexact e ON e.doc_id = p.doc_id
WHERE p.n_hits > 0
"""




def cross_modal_dedup(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """Cross-modal agreement: text near-dup candidate pairs (MinHash
    LSH, τ=0.3) scored by embedding cosine for the ids that carry
    embeddings (doc_id ≡ vec_id on the shared prefix). Disagreement
    (high Jaccard, low cosine) is the standard embedding-quality QA
    signal in dedup pipelines. Composes two subsystems → rows-only.

    ``pairs`` lets a caller share one LSH candidate pass across several
    consumers (see ``lsh_cross_modal``) instead of recomputing the
    shingle→signature→band pipeline per consumer."""
    emb = load_table(spark, sf_dir, "embeddings")
    if pairs is None:
        docs = load_table(spark, sf_dir, "documents")
        pairs = dd.lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=32,
                                       bands=8, rows_per_band=4,
                                       jaccard_threshold=0.3)
    v = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    joined = (
        pairs.join(v.withColumnsRenamed({"vec_id": "id_a", "v": "va"}), "id_a")
        .join(v.withColumnsRenamed({"vec_id": "id_b", "v": "vb"}), "id_b")
    )
    out = joined.select(
        "id_a", "id_b", "jaccard",
        F.round(sim.cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
    )
    return out.withColumn(
        "agree", (F.col("cosine") >= 0.2).cast("int")
    )


# ------------------------------------------------ regex tokenization

def token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-pretokenizer-style regex token counts (letters / digits /
    single marks) next to whitespace token counts."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tx.token_count(t).alias("n_ws_tokens"),
        tx.regex_token_count(t).alias("n_bpe_tokens"),
        F.size(F.array_distinct(tx.regex_tokens(t))).cast("long").alias("n_bpe_distinct"),
    )


TOKEN_REGEX_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::BIGINT AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')))::BIGINT
         AS n_bpe_distinct
FROM documents
"""


# ------------------------------------- embedding-cosine near-dedup

_PCA_COMPONENTS = 2
_PCA_ITERS = 12
#: whitened-space pair threshold: in the 2-component whitened plane
#: cosines concentrate near ±1, so the near-dup cut sits much higher
#: than the raw-space 0.4 (τ chosen to keep a non-trivial,
#: non-degenerate pair population at both driver SFs)
_PCA_TAU = 0.995


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs over a deterministic corpus slice
    (vec_id % 4 = 0), space-tagged:

    - 'raw': exact all-pairs cosine ≥ 0.4 — the oracle anchor for the
      pruned (LSH / IVF / PQ) scale paths.
    - r8 PCA whitening (``operators/pca.py``): 'mean' / 'comp' /
      'eig' rows expose the power-iteration fit (per-dim mean, the 2
      component loadings, the 2 eigenvalues — every number of the
      trained model hash-checks), and 'white' rows are the near-dup
      pairs ≥ τ in the 2-d WHITENED plane — the SemDeDup-style
      preprocessing decision (which pairs count as semantic dups
      after variance equalization) verified end-to-end. The oracle
      re-derives the covariance in SQL and re-runs the same unrolled
      matvec/normalize power iterations — the fit is RETRAINED, not
      spliced.
    """
    from ..operators import pca

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 4 == 0
    )
    raw = sim.cosine_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.4
    ).select(F.lit("raw").alias("space"), "id_a", "id_b", "cosine")
    means, comps, eigs = pca.pca_whiten_fit(
        emb, "embedding", n_components=_PCA_COMPONENTS, iters=_PCA_ITERS
    )
    model_rows = (
        [("mean", i, -1, mu) for i, mu in enumerate(means)]
        + [
            ("comp", c, i, x)
            for c, comp in enumerate(comps)
            for i, x in enumerate(comp)
        ]
        + [("eig", c, -1, lam) for c, lam in enumerate(eigs)]
    )
    model = spark.createDataFrame(
        model_rows, "space string, id_a long, id_b long, cosine double"
    )
    z = pca.whiten_project(emb, "embedding", means, comps, eigs)
    white = sim.cosine_neardup_pairs(
        z, "vec_id", "z", threshold=_PCA_TAU
    ).select(F.lit("white").alias("space"), "id_a", "id_b", "cosine")
    return raw.unionByName(model).unionByName(white)


def _pca_blocks(dim: int, n_comp: int, iters: int) -> str:
    """SQL fragment re-deriving the power-iteration PCA fit from the
    ``e(vec_id, v)`` CTE: per-dim means, rounded covariance, then per
    component ``iters`` unrolled matvec/normalize steps (6-dp-rounded
    vectors — the same numbers ``operators/pca.py`` produces on the
    driver), Rayleigh eigenvalue, and deflation. Emits CTEs
    ``pm`` (means), ``fv{c}`` (component rows), ``p{c}lam``
    (eigenvalue scalars), and ``wz`` (whitened 2-d projection)."""
    v0 = repr(round_half_away(1.0 / math.sqrt(dim), 6))
    parts = [f"""
pm AS MATERIALIZED (
  SELECT i, round(avg(v[i]), 6) AS mu
  FROM e CROSS JOIN range(1, {dim + 1}) r(i) GROUP BY i
),
cv0 AS MATERIALIZED (
  SELECT ii.i AS i, jj.i AS j,
         round(sum((e.v[ii.i] - mi.mu) * (e.v[jj.i] - mj.mu))
               / (SELECT count(*) FROM e), 6) AS c
  FROM e
  CROSS JOIN range(1, {dim + 1}) ii(i)
  CROSS JOIN range(1, {dim + 1}) jj(i)
  JOIN pm mi ON mi.i = ii.i
  JOIN pm mj ON mj.i = jj.i
  GROUP BY ii.i, jj.i
)"""]
    # Matvec/norm/Rayleigh sums are ORDER-PINNED via
    # list_sum(list_transform(...)) over list(... ORDER BY ...) — the
    # driver code sums in ascending index order, and a GROUP-BY SUM's
    # engine-chosen order could flip a 6-dp rounding midpoint and
    # cascade through every later iteration (r8 review). The
    # covariance itself remains a group-sum over ROWS in both engines
    # (unordered on both sides, 6-dp rounded — the k-means-means
    # accepted class).
    mv = (f"list_sum(list_transform(range(1, {dim + 1}),"
          f" j -> r.crow[j] * vv.vl[j]))")
    for c in range(n_comp):
        parts.append(f"""
cvl{c} AS MATERIALIZED (
  SELECT i, list(c ORDER BY j) AS crow FROM cv{c} GROUP BY i
),
p{c}v0 AS (SELECT i, {v0} AS x FROM range(1, {dim + 1}) r(i))""")
        for t in range(iters):
            # every step MATERIALIZED: v{t+1} references w{t} twice
            # (values + the norm scalar) — DuckDB inlines plain CTEs,
            # so an unrolled chain would double its expression tree
            # per iteration (2^iters blowup; same reason the k-means
            # oracle materializes its heavily-referenced CTEs)
            parts.append(f"""
p{c}w{t} AS MATERIALIZED (
  SELECT r.i, {mv} AS w
  FROM cvl{c} r,
       (SELECT list(x ORDER BY i) AS vl FROM p{c}v{t}) vv
),
p{c}n{t} AS MATERIALIZED (
  SELECT sqrt(list_sum(list_transform(wl, x -> x * x))) AS nrm
  FROM (SELECT list(w ORDER BY i) AS wl FROM p{c}w{t})
),
p{c}v{t + 1} AS MATERIALIZED (
  SELECT i, round(w / (SELECT nrm FROM p{c}n{t}), 6) AS x
  FROM p{c}w{t}
)""")
        parts.append(f"""
fv{c} AS MATERIALIZED (SELECT i, x FROM p{c}v{iters}),
p{c}wf AS MATERIALIZED (
  SELECT r.i, {mv} AS w
  FROM cvl{c} r,
       (SELECT list(x ORDER BY i) AS vl FROM fv{c}) vv
),
p{c}lam AS MATERIALIZED (
  SELECT round(list_sum(list_transform(range(1, {dim + 1}),
               i -> vl.vl[i] * wl.wl[i])), 6) AS lam
  FROM (SELECT list(x ORDER BY i) AS vl FROM fv{c}) vl,
       (SELECT list(w ORDER BY i) AS wl FROM p{c}wf) wl
)""")
        if c + 1 < n_comp:
            parts.append(f"""
cv{c + 1} AS MATERIALIZED (
  SELECT a.i, a.j,
         round(a.c - (SELECT lam FROM p{c}lam) * vi.x * vj.x, 6) AS c
  FROM cv{c} a
  JOIN fv{c} vi ON vi.i = a.i
  JOIN fv{c} vj ON vj.i = a.j
)""")
    z_cols = ", ".join(
        f"round(list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> (e.v[i] - lm.mu[i]) * lc{c}.c[i]))"
        f" / sqrt((SELECT lam FROM p{c}lam)), 6) AS z{c}"
        for c in range(n_comp)
    )
    z_lists = ", ".join(
        f"(SELECT list(x ORDER BY i) AS c FROM fv{c}) lc{c}"
        for c in range(n_comp)
    )
    parts.append(f"""
wz AS MATERIALIZED (
  SELECT e.vec_id, {z_cols}
  FROM e, (SELECT list(mu ORDER BY i) AS mu FROM pm) lm, {z_lists}
)""")
    return ",".join(parts)


def _embedding_neardup_oracle(dim: int = EMBEDDING_DIM,
                              n_comp: int = _PCA_COMPONENTS,
                              iters: int = _PCA_ITERS,
                              tau: float = _PCA_TAU) -> str:
    blocks = _pca_blocks(dim, n_comp, iters)
    comp_rows = "\n  UNION ALL ".join(
        f"SELECT 'comp' AS space, {c} AS id_a, i - 1 AS id_b, x AS cosine"
        f" FROM fv{c}"
        for c in range(n_comp)
    )
    eig_rows = "\n  UNION ALL ".join(
        f"SELECT 'eig', {c}, -1, lam FROM p{c}lam" for c in range(n_comp)
    )
    wn = (" + ".join(f"a.z{c} * a.z{c}" for c in range(n_comp)),
          " + ".join(f"b.z{c} * b.z{c}" for c in range(n_comp)))
    wdot = " + ".join(f"a.z{c} * b.z{c}" for c in range(n_comp))
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 4 = 0
),{blocks},
raw_pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
),
white_pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(({wdot}) / (sqrt({wn[0]}) * sqrt({wn[1]})), 6) AS cosine
  FROM wz a JOIN wz b ON a.vec_id < b.vec_id
)
SELECT 'raw' AS space, id_a, id_b, cosine FROM raw_pairs WHERE cosine >= 0.4
UNION ALL
SELECT 'mean', i - 1, -1, mu FROM pm
UNION ALL
{comp_rows}
UNION ALL
{eig_rows}
UNION ALL
SELECT 'white', id_a, id_b, cosine FROM white_pairs WHERE cosine >= {tau}
"""


EMBEDDING_NEARDUP_ORACLE = _embedding_neardup_oracle()


_KMEANS_K = 6
_KMEANS_ITERS = 4
#: SemDeDup within-cluster cosine threshold — matches the
#: embedding-neardup entry's τ (the synthetic embeddings carry no
#: high-cosine planted pairs; 0.4 yields a non-trivial, non-degenerate
#: pair population at both sf0.01 and sf0.1, measured r6)
_SEMDEDUP_TAU = 0.4


def kmeans_clusters(spark: SparkSession, sf_dir: str,
                    include_semdedup: bool = True) -> DataFrame:
    """Iterative algorithm surface: 4 Lloyd's iterations over the
    embeddings (one distributed pass each; only k·dim floats return to
    the driver between iterations), then final cluster sizes + mean
    in-cluster squared distance.

    Round 3: init is the k lowest-vec_id embeddings (no RNG) and each
    iteration's centroids round to 6 dp, so the whole fit is
    reproducible from the data alone — the DuckDB oracle below re-runs
    the SAME 4 unrolled Lloyd's iterations in SQL and every output
    value hash-checks (round 2 this was rows-only).

    Round 6 adds the SemDeDup stage on the same fit
    (``operators/similarity.py:semdedup_stats``): within-cluster
    cosine pairs at τ=0.4, duplicate groups via connected components,
    per-cluster pair count / mean cosine / would-drop count as the
    sd_* columns — the oracle re-derives all three from its own
    unrolled Lloyd's assignment plus a recursive-closure component
    pass, so the semantic-dedup decision itself is hash-checked.
    ``include_semdedup=False`` is the r5-equivalent sub-plan.

    k is PINNED at 6 here — a bench-scale choice, not the production
    rule: the differential oracle unrolls Lloyd's into static SQL, so
    k is baked into the CTE text and cannot follow the data (sf0.01's
    500 vectors ÷ 6 ≈ 83/cluster; sf0.1's 2000 ÷ 6 ≈ 333 — the
    quadratic SemDeDup stage is still tiny). At corpus scale the
    plan is O(n²/k); production callers derive k from the corpus via
    ``operators/similarity.semdedup_k`` (population-constant k∝n —
    the contract SCALE.md measures head-on)."""
    emb = load_table(spark, sf_dir, "embeddings")
    init_rows = (
        emb.filter(F.col("vec_id") < _KMEANS_K)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    init = [[float(x) for x in r[0]] for r in init_rows]
    cents, _hist = sim.kmeans_fit(
        emb, "embedding", k=_KMEANS_K, iters=_KMEANS_ITERS,
        init_vectors=init, round_dp=6,
    )
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cl = sim.mat_lit(cents)
    d2s = F.transform(
        cl,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        ),
    )
    best_d2 = F.array_min(d2s)
    best_cid = F.array_position(d2s, best_d2) - 1  # first min = lowest cid
    assigned = emb.select(
        "vec_id", v.alias("v"),
        best_cid.cast("long").alias("cluster"), best_d2.alias("d2"),
    )
    stats = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("d2"), 6).alias("mean_sq_dist"),
    )
    if not include_semdedup:
        return stats
    sd = sim.semdedup_stats(assigned, "vec_id", "v", "cluster",
                            threshold=_SEMDEDUP_TAU)
    return stats.join(sd, "cluster", "left").select(
        "cluster", "n_vectors", "mean_sq_dist",
        F.coalesce("sd_n_pairs", F.lit(0)).alias("sd_n_pairs"),
        "sd_avg_cos",
        F.coalesce("sd_n_dropped", F.lit(0)).alias("sd_n_dropped"),
        (F.col("n_vectors")
         - F.coalesce("sd_n_dropped", F.lit(0))).alias("sd_n_kept"),
    )


def _lloyd_blocks(k: int, iters: int, dim: int, prefix: str = "c",
                  src: str = "e") -> tuple[str, str]:
    """Shared SQL generator for deterministic Lloyd's k-means over the
    ``src(vec_id, v)`` CTE: init = k lowest vec_ids, each iteration a
    CTE pair (assign by argmin squared-L2 with cluster-id tiebreak →
    per-component means rounded to 6 dp; empty clusters keep the
    previous centroid via the left join). Returns (sql_fragment,
    final_centroid_cte) — used by the k-means entry, the trained-IVF
    quantizer inside the ANN oracle, and (r8, via ``src``) the m
    per-subspace PQ codebook retrainings."""
    d2 = (f"list_sum(list_transform(range(1, {dim + 1}),"
          f" i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))")
    parts = [f"""
{prefix}0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
  FROM {src} WHERE vec_id < {k}
)"""]
    prev = f"{prefix}0"
    for t in range(iters):
        parts.append(f"""
{prefix}a{t} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cid) AS rn
    FROM {src} e CROSS JOIN {prev} c
  ) WHERE rn = 1
),
{prefix}m{t} AS (
  SELECT cid, i, round(avg(v[i]), 6) AS m
  FROM {prefix}a{t}, range(1, {dim + 1}) AS r(i)
  GROUP BY cid, i
),
{prefix}{t + 1} AS (
  SELECT p.cid, coalesce(n.c, p.c) AS c
  FROM {prev} p
  LEFT JOIN (SELECT cid, list(m ORDER BY i) AS c
             FROM {prefix}m{t} GROUP BY cid) n
    ON n.cid = p.cid
)""")
        prev = f"{prefix}{t + 1}"
    return ",".join(parts), prev


def _kmeans_oracle(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS,
                   dim: int = EMBEDDING_DIM,
                   tau: float = _SEMDEDUP_TAU) -> str:
    """SQL twin of ``kmeans_clusters`` (see ``_lloyd_blocks``), plus
    the same final assignment stats and (r6) the SemDeDup stage:
    within-cluster cosine pairs at τ, duplicate groups via the
    recursive transitive closure (same pattern as the n-gram cluster
    oracle), per-cluster would-drop = members − components. Heavily
    referenced CTEs are MATERIALIZED — DuckDB inlines CTEs by default,
    and `final` (the argmin assignment) is referenced three times."""
    blocks, final_c = _lloyd_blocks(k, iters, dim)
    d2 = (f"list_sum(list_transform(range(1, {dim + 1}),"
          f" i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))")
    return f"""
WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),{blocks},
final AS MATERIALIZED (
  SELECT vec_id, v, cid, d2 FROM (
    SELECT e.vec_id, e.v, c.cid, {d2} AS d2,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2}, c.cid) AS rn
    FROM e CROSS JOIN {final_c} c
  ) WHERE rn = 1
),
sd_pairs AS MATERIALIZED (
  SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM final a JOIN final b ON a.cid = b.cid AND a.vec_id < b.vec_id
),
sd_q AS MATERIALIZED (SELECT * FROM sd_pairs WHERE cosine >= {tau}),
sd_edges AS MATERIALIZED (
  SELECT id_a AS ea, id_b AS eb FROM sd_q
  UNION
  SELECT id_b, id_a FROM sd_q
),
sd_reach(ea, eb) AS (
  SELECT ea, eb FROM sd_edges
  UNION
  SELECT r.ea, x.eb FROM sd_reach r JOIN sd_edges x ON r.eb = x.ea
),
sd_comp AS (
  SELECT ea AS node, least(ea, min(eb)) AS component
  FROM sd_reach GROUP BY ea
),
sd_grp AS (
  SELECT f.cid,
         CAST(count(*) - count(DISTINCT c.component) AS BIGINT)
           AS sd_n_dropped
  FROM sd_comp c JOIN final f ON f.vec_id = c.node
  GROUP BY f.cid
),
sd_ps AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS sd_n_pairs,
         round(avg(cosine), 6) AS sd_avg_cos
  FROM sd_q GROUP BY cid
)
SELECT f.cid::BIGINT AS cluster, count(*) AS n_vectors,
       round(avg(f.d2), 6) AS mean_sq_dist,
       coalesce(any_value(sd_ps.sd_n_pairs), 0) AS sd_n_pairs,
       any_value(sd_ps.sd_avg_cos) AS sd_avg_cos,
       coalesce(any_value(sd_grp.sd_n_dropped), 0) AS sd_n_dropped,
       count(*) - coalesce(any_value(sd_grp.sd_n_dropped), 0) AS sd_n_kept
FROM final f
LEFT JOIN sd_ps ON sd_ps.cid = f.cid
LEFT JOIN sd_grp ON sd_grp.cid = f.cid
GROUP BY f.cid
"""


KMEANS_ORACLE = _kmeans_oracle()


def _train_ivf_cents(emb: DataFrame) -> list[list[float]]:
    """The ANN entry's trained coarse quantizer: Lloyd's k-means
    (k=8, 4 iterations, deterministic init = lowest vec_ids,
    6-dp-rounded centroids)."""
    init_rows = (
        emb.filter(F.col("vec_id") < _ANN_LISTS)
        .orderBy("vec_id").select("embedding").collect()
    )
    init = [[float(x) for x in r[0]] for r in init_rows]
    cents, _hist = sim.kmeans_fit(
        emb, "embedding", k=_ANN_LISTS, iters=_KMEANS_ITERS,
        init_vectors=init, round_dp=6,
    )
    return cents


def similarity_ivf(spark: SparkSession, sf_dir: str,
                   cents: list[list[float]] | None = None,
                   emb: DataFrame | None = None) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: Lloyd's k-means (k=8,
    4 iterations, deterministic init = lowest vec_ids, 6-dp-rounded
    centroids) partitions the corpus; queries probe their 2
    cosine-nearest lists and re-score exactly. Training lifts recall@5
    from ~0.35 (random centroids) to ≥0.85 at ~25% of the corpus
    scanned — the quantizer quality IS the IVF recall knob. Pass
    ``cents`` to reuse an already-trained quantizer (the ANN entry
    trains once and shares it with the IVFADC composition)."""
    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    if cents is None:
        cents = _train_ivf_cents(emb)
    return sim.ivf_topk(emb, queries, "vec_id", "embedding", k=5,
                        n_lists=_ANN_LISTS, n_probe=_ANN_PROBE,
                        centroids=cents, dim=EMBEDDING_DIM)


# ------------------------------------------------ multimodal columns

def multimodal_meta(spark: SparkSession, sf_dir: str,
                    stages: tuple = ("stub", "png", "wav", "jpeg",
                                     "webp", "avi", "avi_mjpg")) -> DataFrame:
    """Binary-column pipeline end-to-end, tagged by stage:

    - 'stub': deterministic fake decode of an opaque payload — the
      plumbing check for formats whose codecs need external libraries.
    - 'png': REAL image decode — a valid PNG is synthesized per doc
      (md5-derived dims, per-row scanline filter) and decoded for real
      (chunk CRCs, zlib inflate, un-filtering); ``total_bytes`` is the
      DECODED raster size, so only a correct decoder matches.
    - 'wav': REAL audio decode via the stdlib ``wave`` PCM codec;
      width carries the framerate, n_bytes the PCM byte count.
    - 'jpeg' (round 4): REAL baseline JPEG decode (``operators/
      jpeg.py``: canonical Huffman from DHT, dequantize, exact IDCT,
      grayscale AND interleaved YCbCr-4:2:0 MCUs — the layout
      alternates per row); ``n_bytes`` is the reconstructed luma
      raster size, dims are the parsed SOF0 frame dims.
    - 'webp' (round 5): REAL WebP-lossless decode (``operators/
      vp8l.py``: RIFF/VP8L framing, canonical prefix codes incl. the
      code-length code, color cache, inverse subtract-green and
      predictor transforms — the per-row option mix exercises each);
      ``n_bytes`` is the reconstructed RGBA raster size (4·w·h).
    - 'avi' (round 10): REAL video container decode (``operators/
      video.py``: RIFF/AVI header parse, movi chunk walk verified
      against the idx1 index, uncompressed-DIB frame decode incl.
      stride padding); ``n_bytes`` is the total decoded raster across
      an md5-derived VARIABLE frame count (2–8), so only a correct
      container parse + every-frame decode matches.
    - 'avi_mjpg' (round 11): the MJPEG ('00dc') container branch at
      METADATA grain — real per-frame JPEG encode at synthesis, then
      a header+idx1 parse with NO JPEG decode; ``n_bytes`` is the
      parsed frame count, ``format`` the parsed stream fourcc.

    Dims/rates derive from the same md5 bytes in every stage, so the
    whole six-codec pipeline shares one exact SQL oracle.

    ``stages=("stub",)`` is the round-2-equivalent sub-plan (the real
    codecs landed in round 3), timed under the bench "extras" section
    so cross-round numbers stay like-for-like."""
    from ..operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents")
    agg = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 4).alias("avg_width"),
        F.round(F.avg("height"), 4).alias("avg_height"),
    ]
    stub = (
        mm.decode_metadata(mm.attach_binary_payload(docs, "doc_id", "text"))
        .groupBy("format").agg(*agg)
        .select(F.lit("stub").alias("stage"), "*")
    )
    # The codec stages are Python-bound, so their wall-clock is the
    # scan's task count — and the small-sf parquet is a one-row-group
    # file (1 task). Spread the slim (id, text) rows before entering
    # Arrow, but at HALF the cores: each task must carry enough rows to
    # amortize its Python-worker roundtrip (measured at sf0.1: 16
    # partitions 0.71 s vs 32 partitions 1.23 s for the PNG stage). At
    # warehouse scale the source is already many-partitioned and this
    # repartition drops out.
    spread = docs.select("doc_id", "text").repartition(
        max(spark.sparkContext.defaultParallelism // 2, 4)
    )
    png = (
        mm.decode_metadata(
            mm.synthesize_png_payload(spread, "doc_id", "text"),
            decode_fn=mm.png_decode_meta,
        )
        .groupBy("format").agg(*agg)
        .select(F.lit("png").alias("stage"), "*")
    )
    wav = (
        mm.decode_metadata(
            mm.synthesize_wav_payload(spread, "doc_id", "text"),
            decode_fn=mm.wav_decode_meta,
        )
        .groupBy("format").agg(*agg)
        .select(F.lit("wav").alias("stage"), "*")
    )
    jpg = (
        mm.decode_metadata(
            mm.synthesize_jpeg_payload(spread, "doc_id", "text"),
            decode_fn=mm.jpeg_decode_meta,
        )
        .groupBy("format").agg(*agg)
        .select(F.lit("jpeg").alias("stage"), "*")
    )
    webp = (
        mm.decode_metadata(
            mm.synthesize_webp_payload(spread, "doc_id", "text"),
            decode_fn=mm.webp_decode_meta,
        )
        .groupBy("format").agg(*agg)
        .select(F.lit("webp").alias("stage"), "*")
    )
    avi = (
        mm.decode_metadata(
            vd.synthesize_avi_payload(spread, "doc_id", "text"),
            decode_fn=vd.avi_decode_meta,
        )
        .groupBy("format").agg(*agg)
        .select(F.lit("avi").alias("stage"), "*")
    )
    # 'avi_mjpg' (round 11): the parser's '00dc'/MJPG branch under the
    # driver's eye at CONTAINER-metadata grain — synthesize REAL MJPEG
    # clips (each frame through the in-tree JPEG encoder), then parse
    # headers + idx1 WITHOUT decoding any JPEG payload. n_bytes
    # carries the frame count (entropy-coded chunk lengths are
    # content-dependent — the lossy pixel bounds stay in pytest);
    # format carries the parsed stream fourcc.
    avim = (
        mm.decode_metadata(
            vd.synthesize_avi_payload(spread, "doc_id", "text",
                                      codec="MJPG"),
            decode_fn=vd.avi_mjpeg_meta,
        )
        .groupBy("format").agg(*agg)
        .select(F.lit("avi_mjpg").alias("stage"), "*")
    )
    parts = {"stub": stub, "png": png, "wav": wav, "jpeg": jpg,
             "webp": webp, "avi": avi, "avi_mjpg": avim}
    out = None
    for st in stages:
        out = parts[st] if out is None else out.unionByName(parts[st])
    return out


# payload = unhex(md5(text)); byte k = hex pair 2k+1..2k+2 of the md5.
_HEXVAL = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
_B0 = f"({_HEXVAL.format(p=1)} * 16 + {_HEXVAL.format(p=2)})"
_B1 = f"({_HEXVAL.format(p=3)} * 16 + {_HEXVAL.format(p=4)})"
_B2 = f"({_HEXVAL.format(p=5)} * 16 + {_HEXVAL.format(p=6)})"
_B3 = f"({_HEXVAL.format(p=7)} * 16 + {_HEXVAL.format(p=8)})"

MULTIMODAL_ORACLE = f"""
WITH hx AS (SELECT doc_id, md5(text) AS h FROM documents),
meta AS (
  SELECT doc_id,
         16::BIGINT AS n_bytes,
         CASE {_B0} % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
         64 + {_B0} % 64 AS width,
         64 + {_B1} % 64 AS height,
         8000 + ({_B2} % 8) * 1000 AS framerate,
         256 + {_B3} AS n_frames
  FROM hx
)
SELECT 'stub' AS stage, format,
       count(*) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(width), 4) AS avg_width,
       round(avg(height), 4) AS avg_height
FROM meta GROUP BY format
UNION ALL
SELECT 'png', 'png', count(*),
       CAST(sum((16 + {_B0} % 16) * (16 + {_B1} % 16)) AS BIGINT),
       round(avg(16 + {_B0} % 16), 4), round(avg(16 + {_B1} % 16), 4)
FROM hx
UNION ALL
SELECT 'wav', 'wav', count(*),
       CAST(sum(n_frames * 2) AS BIGINT),
       round(avg(framerate), 4), round(avg(1), 4)
FROM meta
UNION ALL
SELECT 'jpeg', 'jpeg', count(*),
       CAST(sum((16 + {_B0} % 16) * (16 + {_B1} % 16)) AS BIGINT),
       round(avg(16 + {_B0} % 16), 4), round(avg(16 + {_B1} % 16), 4)
FROM hx
UNION ALL
-- webp: n_bytes is the RGBA raster, 4 bytes a pixel
SELECT 'webp', 'webp', count(*),
       CAST(sum((16 + {_B0} % 16) * (16 + {_B1} % 16) * 4) AS BIGINT),
       round(avg(16 + {_B0} % 16), 4), round(avg(16 + {_B1} % 16), 4)
FROM hx
UNION ALL
-- avi: n_bytes is the total decoded raster across the md5-derived
-- variable frame count (2 + byte2 % 7 frames of w*h each)
SELECT 'avi', 'avi', count(*),
       CAST(sum((2 + {_B2} % 7) * (16 + {_B0} % 16) * (16 + {_B1} % 16))
            AS BIGINT),
       round(avg(16 + {_B0} % 16), 4), round(avg(16 + {_B1} % 16), 4)
FROM hx
UNION ALL
-- avi_mjpg: CONTAINER-metadata grain for the MJPEG path — n_bytes is
-- the parsed frame count (2 + byte2 % 7; JPEG chunk byte lengths are
-- entropy-coded and not asserted cross-engine), format the parsed
-- stream fourcc, dims the parsed header dims
SELECT 'avi_mjpg', 'avi-mjpg', count(*),
       CAST(sum(2 + {_B2} % 7) AS BIGINT),
       round(avg(16 + {_B0} % 16), 4), round(avg(16 + {_B1} % 16), 4)
FROM hx
"""


# --------------------------------------------- deterministic splits

# Target mixture: srcN gets fraction ((N % 4) + 1)/8 ∈ {.125,.25,.375,.5}
# — a literal dict on the Spark side, the same closed-form rule in the
# oracle SQL. Unlisted domains default to 0 (excluded).
MIXTURE_FRACTIONS = {f"src{i}": ((i % 4) + 1) / 8 for i in range(20)}


def split_train_val(spark: SparkSession, sf_dir: str,
                    include_leakage: bool = True) -> DataFrame:
    """Dataset-composition surface in one entry, tagged by stage:

    - 'split': stable 90/5/5 train/val/test membership by md5 of
      doc_id — reproducible across engines/runs/cluster sizes
      (unlike ``df.sample``), which is what makes re-processed corpora
      keep their split.
    - 'mixture_exact': per-domain exact-quota selection under
      MIXTURE_FRACTIONS (hash-ranked within domain; one window pass).
    - 'mixture_threshold': the scan-only approximate-quota path (hash
      bucket under per-domain cutoff; no shuffle).
    - 'leakage' + 'split_safe' (r5): LEAKAGE-SAFE splitting — the
      train/eval-contamination rule real corpora need: near/exact
      duplicates of a training page must not land in the eval split,
      so membership is decided by the duplicate GROUP's representative
      (min doc_id of the normalized-URL group — the synthesis plants
      real collisions), not by each doc. The 'leakage' row measures
      the problem and the fix on the same data: n_docs = multi-doc
      groups, min_id = groups a NAIVE per-doc split scatters across
      splits (> 0), max_id = groups the safe split scatters (0 BY
      CONSTRUCTION — and the oracle recomputes rather than assumes
      it). 'split_safe' rows are the resulting per-split doc counts.

    All stages hash-checked against the DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    agg = lambda g: [  # noqa: E731 — shared 3-metric summary
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    ]
    split = (
        docs.select("doc_id", tx.train_val_test_split(F.col("doc_id")).alias("label"))
        .groupBy("label")
        .agg(*agg("label"))
        .select(F.lit("split").alias("stage"), "label", "n_docs", "min_id", "max_id")
    )
    ex = (
        sampling.mixture_sample_exact(docs, "source", "doc_id", MIXTURE_FRACTIONS)
        .groupBy(F.col("source").alias("label"))
        .agg(*agg("source"))
        .select(F.lit("mixture_exact").alias("stage"), "label",
                "n_docs", "min_id", "max_id")
    )
    th = (
        sampling.mixture_sample_threshold(docs, "source", "doc_id", MIXTURE_FRACTIONS)
        .groupBy(F.col("source").alias("label"))
        .agg(*agg("source"))
        .select(F.lit("mixture_threshold").alias("stage"), "label",
                "n_docs", "min_id", "max_id")
    )

    base = split.unionByName(ex).unionByName(th)
    if not include_leakage:
        return base  # round-4-equivalent sub-plan (bench extras)

    grp_w = Window.partitionBy("grp")
    lab = docs.select(
        "doc_id",
        tx.normalize_url(_messy_url(F.col("doc_id"), F.col("source")))
        .alias("grp"),
    ).select(
        "doc_id", "grp",
        tx.train_val_test_split(F.col("doc_id")).alias("naive"),
        tx.train_val_test_split(
            F.min("doc_id").over(grp_w)
        ).alias("safe"),
    )
    per_group = lab.groupBy("grp").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct("naive").alias("nn"),
        F.countDistinct("safe").alias("ns"),
    )
    leak = per_group.filter(F.col("sz") > 1).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("nn") > 1).cast("long")).alias("min_id"),
        F.sum((F.col("ns") > 1).cast("long")).alias("max_id"),
    ).select(
        F.lit("leakage").alias("stage"),
        F.lit("url_groups").alias("label"),
        "n_docs", "min_id", "max_id",
    )
    safe_counts = (
        lab.groupBy(F.col("safe").alias("label"))
        .agg(*agg("safe"))
        .select(F.lit("split_safe").alias("stage"), "label",
                "n_docs", "min_id", "max_id")
    )
    return base.unionByName(leak).unionByName(safe_counts)


# The oracle's per-domain fractions come from the SAME dict the Spark
# side uses (injected as a VALUES list), so adding/renaming a domain in
# MIXTURE_FRACTIONS can never silently diverge the two engines; domains
# absent from the dict get default_fraction=0 on the Spark side and
# drop out of the inner join here — the same empty selection.
_FRAC_VALUES = ",\n         ".join(
    f"('{d}', {f!r})" for d, f in MIXTURE_FRACTIONS.items()
)

SPLIT_ORACLE = f"""
WITH hx AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents),
lbl AS (
  SELECT doc_id,
         CASE WHEN {_B0_DOC} % 256 < 13 THEN 'test'
              WHEN {_B0_DOC} % 256 < 26 THEN 'val'
              ELSE 'train' END AS label
  FROM hx
),
mf(source, frac) AS (
  VALUES {_FRAC_VALUES}
),
ranked AS (
  SELECT d.source, d.doc_id, mf.frac,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(d.doc_id::VARCHAR), d.doc_id) AS rk,
         count(*) OVER (PARTITION BY d.source) AS n_d
  FROM documents d JOIN mf USING (source)
),
bkt AS (
  SELECT d.source, d.doc_id, mf.frac, md5(d.doc_id::VARCHAR) AS h
  FROM documents d JOIN mf USING (source)
)
SELECT 'split' AS stage, label, count(*) AS n_docs,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM lbl GROUP BY label
UNION ALL
SELECT 'mixture_exact' AS stage, source AS label, count(*) AS n_docs,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM ranked
WHERE rk <= floor(frac * n_d + 0.5)
GROUP BY source
UNION ALL
SELECT 'mixture_threshold' AS stage, source AS label, count(*) AS n_docs,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM bkt
WHERE {_B0_DOC} % 256 < floor(frac * 256 + 0.5)
GROUP BY source
UNION ALL
-- leakage-safe split: naive vs group-representative membership over
-- the planted URL-collision groups
SELECT 'leakage', 'url_groups', count(*),
       CAST(sum(CASE WHEN nn > 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM (
  SELECT grp, count(*) AS sz,
         count(DISTINCT naive) AS nn, count(DISTINCT safe) AS ns
  FROM ({{LEAK_LABELS}}) GROUP BY grp
) WHERE sz > 1
UNION ALL
SELECT 'split_safe', safe, count(*), min(doc_id), max(doc_id)
FROM ({{LEAK_LABELS}}) GROUP BY safe
"""

# per-doc naive/safe labels over the URL-collision groups: the hash
# rule is the SAME first-md5-hex-byte bucket as the 'split' stage,
# applied to doc_id (naive) and to the group's min doc_id (safe)
_LEAK_LABELS_SQL = f"""
WITH ug AS (SELECT doc_id, {{URL_NORM}} AS grp FROM documents),
ur AS (SELECT doc_id, grp,
              min(doc_id) OVER (PARTITION BY grp) AS rep
       FROM ug),
uh AS (SELECT doc_id, grp,
              md5(doc_id::VARCHAR) AS h, md5(rep::VARCHAR) AS hr
       FROM ur)
SELECT doc_id, grp,
       CASE WHEN {_B0_DOC} % 256 < 13 THEN 'test'
            WHEN {_B0_DOC} % 256 < 26 THEN 'val'
            ELSE 'train' END AS naive,
       CASE WHEN {_B0_DOC.replace("h,", "hr,")} % 256 < 13 THEN 'test'
            WHEN {_B0_DOC.replace("h,", "hr,")} % 256 < 26 THEN 'val'
            ELSE 'train' END AS safe
FROM uh
"""

SPLIT_ORACLE = SPLIT_ORACLE.replace(
    "{LEAK_LABELS}", _LEAK_LABELS_SQL.replace("{URL_NORM}", _URL_NORM_SQL)
)


# DSIR target distribution = the curated domains (the mixture dict's
# 0.5-fraction sources) — the paper's setup: target is identified by
# provenance (a trusted corpus), raw is everything. One literal list,
# injected into BOTH engines so it can never diverge.
DSIR_TARGET_SOURCES = tuple(f"src{i}" for i in range(20) if i % 4 == 3)
DSIR_SELECT_FRAC = 0.25


def text_profile(spark: SparkSession, sf_dir: str,
                 include_fingerprint: bool = True,
                 include_lm: bool = True,
                 include_bpe: bool = True,
                 include_dsir: bool = True,
                 include_lrq: bool = True,
                 include_ulm: bool = True,
                 include_wp: bool = True) -> DataFrame:
    """Per-document text analysis in one entry: lexical stats (token
    counts, TTR, stopwords), BPE-pretokenizer regex token counts, and
    the canonical md5 fingerprint with its dupe-group size — ONE
    projection over one scan (a self-join on doc_id would read the
    corpus twice and shuffle it once for nothing; the group size is a
    window count over the fingerprint, not an aggregate-and-join-back);
    all JVM-side expressions, all values hash-checked. Formerly two
    registry entries (profile + fingerprint); merged onto one scan.
    ``include_fingerprint=False`` is the round-2-equivalent sub-plan
    (pre-merge), timed under the bench "extras" section.

    r5 adds the corpus-trained bigram-LM quality score
    (``operators/text.py:bigram_lm_scores`` — the KenLM-filter shape:
    count bigrams, prune to top-200 with a deterministic tie-break,
    broadcast, score each doc's mean smoothed log-probability). The
    DuckDB oracle retrains the identical model and must reproduce the
    score to 1e-6 — model training AND scoring are differentially
    checked, not just the plumbing. ``include_lm=False`` is the
    round-4-equivalent sub-plan for the bench extras.

    r6 adds DSIR data selection (``operators/text.py:dsir_importance``
    — Xie et al. 2023): hashed-bigram importance weights
    ln p_target/p_raw with target = the curated DSIR_TARGET_SOURCES
    domains, trained in ONE corpus scan (both models from one
    groupBy(bucket)), scored through a broadcast ≤256-row model, and
    the top 25 % per source selected via a PARTITIONED rank window.
    The oracle retrains both models and re-ranks — weights to 1e-6 AND
    the exact per-domain selection set are differentially checked.
    ``include_dsir=False`` is the round-6-entry equivalent sub-plan.

    r6 also adds the TRAINED quality classifier
    (``operators/classifier.py:logreg_quality``): logistic regression
    on the same hashed-bigram features with the same weak provenance
    labels, 3 unrolled full-batch GD epochs (per-epoch 8-dp weight
    rounding — the k-means cross-engine discipline), scored back over
    every document. The oracle RETRAINS the full descent and re-scores;
    ``include_lrq=False`` excludes it for the bench twin.

    r6 adds the distributed BPE subword-tokenizer training stage
    (``operators/bpe.py``): k=8 merges trained on the corpus's
    word-frequency table (one corpus scan, then vocabulary-sized
    jobs with scalar-only driver traffic), documents re-encoded via a
    broadcast join against the trained word->symbols table. The
    DuckDB oracle RETRAINS the identical merges (k unrolled
    recursive-CTE stages) — the learned merge sequence is stamped as
    the constant ``bpe_merges`` column so training is checked
    symbol-for-symbol, and ``bpe_n_tokens`` checks the encoding.
    ``include_bpe=False`` is the round-5-equivalent sub-plan.

    r9 adds the SECOND published subword trainer beside BPE: the
    SentencePiece-style unigram LM (``operators/unigram.py``, Kudo
    2018) — soft-EM piece probabilities over a deterministic seeded
    candidate vocabulary (2 iterations, per-step 6-dp rounding, the
    BPE/k-means retrain discipline), scored back per document as
    total-segmentation NLL + expected piece count. The DuckDB oracle
    RETRAINS the EM end-to-end (sliding-window recursive-CTE α/β
    passes per iteration) and the learned model is stamped as the
    constant ``ulm_vocab`` column — piece-for-piece, probability-for-
    probability. ``include_ulm=False`` is the round-8-equivalent
    sub-plan.

    r10 completes the tokenizer-family triad with WordPiece
    (``operators/wordpiece.py``, Schuster & Nakajima 2012 / the BERT
    trainer): 6 merges chosen by the likelihood-ratio score
    ``count(ab)/(count(a)·count(b))`` over ##-prefixed continuation
    symbols, re-encoded per document. The oracle RETRAINS every
    merge (pair + symbol counts, score argmax, the greedy fold) —
    the learned sequence is the constant ``wp_merges`` column.
    ``include_wp=False`` is the round-9-equivalent sub-plan."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    base = docs.select(
        "doc_id",
        tx.token_count(t).alias("n_tokens"),
        tx.distinct_token_count(t).alias("n_distinct"),
        F.round(tx.type_token_ratio(t), 6).alias("ttr"),
        F.round(tx.avg_token_length(t), 6).alias("avg_token_len"),
        tx.stopword_count(t, "en").alias("n_stopwords_en"),
        tx.token_count(t).alias("n_ws_tokens"),
        tx.regex_token_count(t).alias("n_bpe_tokens"),
        F.size(F.array_distinct(tx.regex_tokens(t))).cast("long").alias("n_bpe_distinct"),
        tx.fingerprint(t).alias("fp"),
    )
    if not include_fingerprint:
        return base.drop("fp")
    prof = base.withColumn(
        "group_size",
        F.count(F.lit(1)).over(Window.partitionBy("fp")),
    )
    # r16: the trained stages are INDEPENDENT of each other (each
    # derives from `docs` alone), but each runs 1–3 eager driver
    # round-trip jobs at build time (LM top-k checkpoint, DSIR model
    # collect, 3 logreg epoch collects, trainer vocabulary collects).
    # Serially those barriers were most of this entry's wall-clock at
    # bench scale and leave the cluster idle per barrier at any scale
    # — so the stage builds OVERLAP in a thread pool (guide §2.6),
    # and the tokenizer trainers share their corpus scans: BPE and
    # WordPiece train on the SAME (word, count) table (collected
    # once, `bpe.collect_word_counts`), and the unigram scorer's
    # distinct-word set is exactly its trainer's vocabulary keys.
    # Join order and every model are unchanged, so the result is
    # byte-identical to the serial build.
    from concurrent.futures import ThreadPoolExecutor

    def _label(name):
        # overlapped builders run on plain pool threads, which under
        # pinned-thread PySpark do not inherit driver thread-locals —
        # label inside the worker so its jobs attribute correctly in
        # the UI (guide §1.5; r16 ADVICE)
        spark.sparkContext.setJobDescription(f"text_profile: {name}")

    def _lm_track():
        _label("bigram-LM track")
        return tx.bigram_lm_scores(docs, "doc_id", "text", top_k=200)

    def _bpe_wp_track():
        _label("BPE/WordPiece track")
        wc = bpe.collect_word_counts(docs, "text")
        got = {}
        if include_bpe:
            got["bpe"] = bpe.train_bpe(docs, "text", num_merges=8,
                                       word_counts=wc)
        if include_wp:
            got["wp"] = wpc.train_wordpiece(docs, "text", num_merges=6,
                                            word_counts=wc)
        return got

    def _dsir_track():
        _label("DSIR track")
        return tx.dsir_importance(
            docs, "doc_id", "text",
            target_flag=F.col("source").isin(*DSIR_TARGET_SOURCES),
            n_buckets=256, select_frac=DSIR_SELECT_FRAC,
            domain_col="source",
        )

    def _lrq_track():
        _label("logreg-quality track")
        return clf.logreg_quality(
            docs, "doc_id", "text",
            label_flag=F.col("source").isin(*DSIR_TARGET_SOURCES),
            n_buckets=256, epochs=3, lr=0.5,
        )

    def _ulm_track():
        _label("unigram-LM track")
        wc = ug.collect_word_counts(docs, "text")
        uprobs = ug.train_unigram(docs, "text", vocab_size=40,
                                  max_len=3, iters=2, word_counts=wc)
        usc = ug.doc_unigram_scores(
            docs, uprobs, "doc_id", "text",
            words=[w for w, _ in wc] if wc is not None else None,
        )
        return uprobs, usc

    tracks = {}
    if include_lm:
        tracks["lm"] = _lm_track
    if include_bpe or include_wp:
        tracks["bpe_wp"] = _bpe_wp_track
    if include_dsir:
        tracks["dsir"] = _dsir_track
    if include_lrq:
        tracks["lrq"] = _lrq_track
    if include_ulm:
        tracks["ulm"] = _ulm_track
    built = {}
    if tracks:
        with ThreadPoolExecutor(len(tracks)) as ex:
            futs = {k: ex.submit(fn) for k, fn in tracks.items()}
            errs = []
            for k, f in futs.items():
                try:
                    built[k] = f.result()
                except BaseException as e:  # noqa: BLE001
                    errs.append(e)
            if errs:
                # r17 (r16 ADVICE): siblings that already materialized
                # release their checkpoints before the raise — the
                # _modality_pairs discipline
                release_checkpoints_in(built)
                raise errs[0]
    if include_lm:
        prof = prof.join(built["lm"], "doc_id", "left")
    if include_bpe:
        vocab, merges = built["bpe_wp"]["bpe"]
        enc = bpe.encode_token_counts(docs, vocab, "doc_id", "text")
        prof = prof.join(enc, "doc_id", "left").withColumn(
            "bpe_merges", F.lit(bpe.merges_tag(merges))
        )
    if include_dsir:
        prof = prof.join(built["dsir"], "doc_id", "left").withColumn(
            "dsir_selected", F.coalesce("dsir_selected", F.lit(False))
        )
    if include_lrq:
        prof = prof.join(built["lrq"], "doc_id", "left")
    if include_ulm:
        uprobs, usc = built["ulm"]
        prof = prof.join(usc, "doc_id", "left").withColumn(
            "ulm_vocab", F.lit(ug.vocab_tag(uprobs))
        )
    if include_wp:
        wvocab, wmerges = built["bpe_wp"]["wp"]
        wenc = wpc.encode_token_counts(docs, wvocab, "doc_id", "text")
        prof = prof.join(wenc, "doc_id", "left").withColumn(
            "wp_merges", F.lit(wpc.merges_tag(wmerges))
        )
    return prof


TEXT_PROFILE_ORACLE = f"""
WITH RECURSIVE ts AS ({TEXT_STATS_ORACLE}),
{bpe.bpe_oracle_ctes(num_merges=8)},
{ug.unigram_oracle_ctes(vocab_size=40, max_len=3, iters=2)},
{wpc.wordpiece_oracle_ctes(num_merges=6)},
tr AS ({TOKEN_REGEX_ORACLE}),
fp AS (
  SELECT doc_id,
         substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 16) AS fp
  FROM documents
),
-- bigram-LM stage: retrain the identical model (top-200 bigrams,
-- ties broken count desc then bigram asc; add-one smoothing over the
-- full unigram table + vocab size) and re-score every document
lmtoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
lmbg AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1
  FROM (SELECT doc_id,
               unnest([tk[i] || ' ' || tk[i + 1]
                       for i in range(1, len(tk))]) AS bg
        FROM lmtoks)
),
lmtop AS (
  SELECT bg, count(*) AS cb FROM lmbg GROUP BY bg
  ORDER BY cb DESC, bg LIMIT 200
),
lmuni AS (
  SELECT w, count(*) AS cu
  FROM (SELECT unnest(tk) AS w FROM lmtoks) GROUP BY w
),
lmv AS (SELECT count(*) AS v FROM lmuni),
lmsc AS (
  SELECT doc_id,
         round(avg(ln((COALESCE(t.cb, 0) + 1)::DOUBLE
                      / (u.cu + lmv.v)::DOUBLE)), 6) AS lm_score,
         count(*) AS n_bigrams,
         CAST(sum(CASE WHEN t.bg IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov_bigrams
  FROM lmbg LEFT JOIN lmtop t USING (bg)
  JOIN lmuni u ON lmbg.w1 = u.w
  CROSS JOIN lmv
  GROUP BY doc_id
),
-- DSIR stage: retrain BOTH hashed-bigram models (target = curated
-- domains, raw = whole corpus; one-hex-byte md5 bucket, add-one
-- smoothing over the 256-bucket space), re-score every document's
-- log importance weight, and re-rank the per-domain top-25% selection
dsb AS (
  SELECT l.doc_id, ({_B0} % 256) AS bkt,
         d.source IN ({", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)}) AS is_t
  FROM (SELECT doc_id, bg, md5(bg) AS h FROM lmbg) l
  JOIN documents d USING (doc_id)
),
dsm AS (
  SELECT bkt, count(*) AS cr,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
  FROM dsb GROUP BY bkt
),
dst AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM dsm),
dsmodel AS (
  SELECT bkt,
         ln((ct + 1)::DOUBLE / (nt + 256)::DOUBLE)
         - ln((cr + 1)::DOUBLE / (nr + 256)::DOUBLE) AS logratio
  FROM dsm CROSS JOIN dst
),
dsw AS (
  SELECT doc_id, round(sum(logratio), 6) AS dsir_logw
  FROM dsb JOIN dsmodel USING (bkt) GROUP BY doc_id
),
dssel AS (
  SELECT doc_id, dsir_logw,
         rk <= ceil({DSIR_SELECT_FRAC} * nd) AS dsir_selected
  FROM (
    SELECT w.doc_id, w.dsir_logw,
           row_number() OVER (PARTITION BY d.source
                              ORDER BY w.dsir_logw DESC, w.doc_id) AS rk,
           count(*) OVER (PARTITION BY d.source) AS nd
    FROM dsw w JOIN documents d USING (doc_id)
  )
),
-- trained-quality-classifier stage: RETRAIN the logistic regression
-- (same hashed-bigram buckets as DSIR, same weak provenance labels,
-- 3 unrolled GD epochs with 8-dp per-epoch weight rounding) and
-- re-score every document
{clf.logreg_oracle_ctes(
    label_sql="d.source IN ("
    + ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES) + ")",
    bucket_rows_sql="SELECT doc_id, bkt FROM dsb",
    n_buckets=256, epochs=3, lr=0.5,
)}
SELECT ts.*, tr.n_ws_tokens, tr.n_bpe_tokens, tr.n_bpe_distinct,
       fp.fp, count(*) OVER (PARTITION BY fp.fp) AS group_size,
       lmsc.lm_score, lmsc.n_bigrams, lmsc.n_oov_bigrams,
       bpe_enc.bpe_n_tokens,
       (SELECT tag FROM bpe_merge_tag) AS bpe_merges,
       dssel.dsir_logw,
       COALESCE(dssel.dsir_selected, false) AS dsir_selected,
       lrq.lrq_score, lrq.lrq_pred,
       ulm.ulm_nll, ulm.ulm_exp_tokens,
       (SELECT tag FROM ulm_tag) AS ulm_vocab,
       wp_enc.wp_n_tokens,
       (SELECT tag FROM wp_merge_tag) AS wp_merges
FROM ts JOIN tr USING (doc_id) JOIN fp USING (doc_id)
LEFT JOIN lmsc USING (doc_id)
LEFT JOIN bpe_enc USING (doc_id)
LEFT JOIN dssel USING (doc_id)
LEFT JOIN lrq USING (doc_id)
LEFT JOIN ulm USING (doc_id)
LEFT JOIN wp_enc USING (doc_id)
"""


def chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → training-batch preparation: fixed-size overlapping
    token chunks (64/stride 56) per document, joined to the packed
    training-window assignment (capacity 512, corpus concatenated in
    doc_id order). The packing side runs the two-level prefix scan
    (``operators/chunking.py``) whose plain-cumsum DuckDB twin makes
    this entry a differential test of the segmented-scan rewrite."""
    from ..operators import chunking as ck

    docs = load_table(spark, sf_dir, "documents")
    chunks = ck.chunk_text_tokens(docs, "doc_id", "text", chunk_tokens=64, stride=56)
    stats = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("chunk_tokens_total"),
        F.max("n_tokens").alias("max_chunk_tokens"),
        F.max(F.struct("chunk_idx", "n_tokens"))["n_tokens"].alias("__last_len"),
    )
    # n_tokens reconstructs exactly from the chunk stats — the last
    # chunk starts at stride·(n_chunks−1) — so packing rides the SAME
    # scan instead of re-reading the corpus
    stats = stats.withColumn(
        "n_tokens",
        (56 * (F.col("n_chunks") - 1) + F.col("__last_len")).cast("long"),
    )
    packed = ck.pack_training_windows(
        stats, "doc_id", "n_tokens", capacity=512, shard_width=64
    )
    # final layout step: deterministic seeded-hash shard + in-shard
    # position (what write_training_shards materializes on disk)
    laid_out = sharding.training_order(packed, "doc_id", seed="r2", n_shards=8)
    return laid_out.select(
        "doc_id", "n_chunks", "chunk_tokens_total", "max_chunk_tokens",
        "n_tokens", "win_id", "win_offset",
        F.col("tshard").cast("long").alias("tshard"),
        F.col("tshard_pos").cast("long").alias("tshard_pos"),
    )


CHUNK_PACK_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
starts AS (
  SELECT doc_id, len(toks) AS n_tok,
         unnest(range(1, greatest(len(toks), 1) + 1, 56)) AS s
  FROM t
),
chunks AS (
  SELECT doc_id, least(64, n_tok - s + 1) AS chunk_len FROM starts
),
stats AS (
  SELECT doc_id,
         count(*) AS n_chunks,
         CAST(sum(chunk_len) AS BIGINT) AS chunk_tokens_total,
         CAST(max(chunk_len) AS BIGINT) AS max_chunk_tokens
  FROM chunks GROUP BY doc_id
),
p AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         CAST(coalesce(sum(len(toks)) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS before
  FROM t
)
, packed AS (
SELECT stats.doc_id, stats.n_chunks, stats.chunk_tokens_total,
       stats.max_chunk_tokens, p.n_tokens,
       CAST(before // 512 AS BIGINT) AS win_id,
       CAST(before % 512 AS BIGINT) AS win_offset
FROM stats JOIN p USING (doc_id)
),
keyed AS (
  SELECT *, md5('r2:' || doc_id::VARCHAR) AS tkey FROM packed
)
SELECT doc_id, n_chunks, chunk_tokens_total, max_chunk_tokens, n_tokens,
       win_id, win_offset,
       CAST(((strpos('0123456789abcdef', substr(tkey, 1, 1)) - 1) * 16
        + strpos('0123456789abcdef', substr(tkey, 2, 1)) - 1) % 8 AS BIGINT)
         AS tshard,
       CAST(row_number() OVER (
         PARTITION BY ((strpos('0123456789abcdef', substr(tkey, 1, 1)) - 1) * 16
                       + strpos('0123456789abcdef', substr(tkey, 2, 1)) - 1) % 8
         ORDER BY tkey, doc_id) - 1 AS BIGINT) AS tshard_pos
FROM keyed
"""


_ANN_K = 5
_ANN_TABLES = 8   # sign-LSH hash tables (recall knob)
_ANN_PLANES = 4   # hyperplanes per table (bucket-size knob)
_ANN_LISTS = 8    # IVF coarse-quantizer lists
_ANN_PROBE = 2    # IVF lists probed per query
_PQ_M = 4         # PQ subspaces (64 dims -> 4 x 16)
_PQ_KSUB = 8      # codes per subspace codebook
# ADC shortlist for the exact re-rank stage, as a COUNT: C·k
# candidates per query, CORPUS-INDEPENDENT (r8 verdict task: a
# fraction-of-corpus shortlist means 10⁹ exact re-ranks per query at
# 10¹⁰ vectors — the published shape keeps re-rank cost O(C·k·d) per
# query regardless of corpus size; C=10 is the conventional
# shortlist multiplier). At k=5 this is 50 — byte-identical to the
# value every prior round benched, gate-tested below.
_PQ_RERANK_C = 10
_PQ_RERANK = _PQ_RERANK_C * _ANN_K
# NN-descent graph family (r11): degree and fixed iteration count.
# k=8 / 3 rounds is the smallest config whose clustered-slice
# recall@5 reaches 1.0 (= IVF's, the regime graphs exist for);
# structure-free high-dim gaussians are the family's documented
# adversarial floor (Dong et al. 2011 §5: recall degrades with
# intrinsic dimension) and its measured number there is reported,
# not hidden — the mirror image of the quantizer family's story.
_NND_K = 8
_NND_ITERS = 3
# Hierarchical SERVING on the NN-descent graph (r15 — the r14 verdict's
# #1: the path SCALE.md steers users to, held to the same hash bar as
# the build). The operating point is the measured 200 k knee
# (SCALE.md serve matrix): beam 8, 4 coarse + 4 full hops, 4 entries
# handed down, IVF-navigated coarse layer. frac=8 keeps the bench-scale
# coarse layer meaningful (~n/8 members) — production uses the build's
# core_frac (64); the DESCENT SEMANTICS hash-checked here are
# frac-independent.
_SERVE_FRAC = 8
_SERVE_BEAM = 8
_SERVE_HOPS = 4      # per layer: the measured 4+4 knee
_SERVE_NENTRY = 4


def similarity_pq(spark: SparkSession, sf_dir: str,
                  emb: DataFrame | None = None) -> tuple:
    """Product-quantization paths (``operators/quantization.py``,
    Jégou et al. 2011): train m=4 × ksub=8 subspace codebooks (same
    deterministic Lloyd's discipline as the IVF quantizer), encode
    the corpus to 4 code ids per vector, score queries by asymmetric
    distance (exact query vs per-subspace centroids). TWO rankings
    come back (both schemas match the other ANN methods — the cosine
    column is the exact cosine of each chosen neighbor):

    - 'pq' (raw ADC): top-5 by (adc_d2 asc, neighbor_id). Its recall
      row QUANTIFIES the cost of ranking by 64×-compressed geometry
      alone — deliberately reported, not hidden.
    - 'pq_rr' (ADC shortlist → exact re-rank): the published
      production shape — ADC keeps the top ``_PQ_RERANK`` = C·k
      candidates per query (a corpus-independent COUNT, not a
      fraction: the compressed scan does the pruning, the exact
      cosine re-ranks a fixed-size shortlist to top-5 no matter how
      big the corpus is). Recall measures how often the true top-5
      survive the shortlist.

    Returns (topk_raw, topk_rerank, codes_df, codebooks)."""
    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    books = pq.pq_train(
        emb, "embedding", dim=EMBEDDING_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        iters=_KMEANS_ITERS,
    )
    codes = pq.pq_encode(emb, "embedding", books)
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    adc = pq.pq_adc_scores(codes, queries, books).withColumn(
        "__ar", F.row_number().over(w)
    )
    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__nv")
    )
    cos = F.round(
        sim.cosine(
            sim._as_double(F.col("__qv")), sim._as_double(F.col("__nv"))
        ), 6,
    )
    topk_raw = (
        adc.filter(F.col("__ar") <= _ANN_K)
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id", F.col("__ar").alias("rank"), "neighbor_id",
            cos.alias("cosine"),
        )
    )
    wrr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    topk_rr = (
        adc.filter(F.col("__ar") <= _PQ_RERANK)
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(wrr))
        .filter(F.col("rank") <= _ANN_K)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
    return topk_raw, topk_rr, codes, books


def normalized_embeddings(frame: DataFrame) -> DataFrame:
    """(vec_id, embedding) with each vector scaled to unit L2 norm —
    the sq8n input representation. A ZERO vector normalizes to the
    zero vector (not NaN): Spark's max ranks NaN greatest while
    DuckDB's ignores it, so an unguarded 0/0 would silently diverge
    the trained bounds between engines the first time a null-ish
    embedding appears. The oracle carries the same CASE guard."""
    raw = sim._as_double(F.col("embedding"))
    nrm = F.sqrt(sim.dot(raw, raw))
    return frame.select(
        "vec_id",
        F.transform(
            raw,
            lambda x: F.when(nrm == 0, F.lit(0.0)).otherwise(x / nrm),
        ).alias("embedding"),
    )


def similarity_ann(spark: SparkSession, sf_dir: str,
                   emb: DataFrame | None = None,
                   include_nnd: bool = True,
                   include_serve: bool = True) -> DataFrame:
    """The bucketed/compressed ANN scale paths in one entry, tagged by
    stage and method: sign-LSH (hyperplane buckets), IVF (coarse
    quantizer, 2-probe), and (r8) product-quantization ADC detail rows
    ('topk'), plus per-(method, query) recall@5 against the exact
    top-k computed in the same query ('recall' rows — the quantified
    answer to "how approximate is the scale path?") and the PQ
    codebook-population/reconstruction-error stage ('encode' rows:
    one per (subspace, code) with member count + mean recon error, so
    every vector's code assignment is hash-checked, not just the
    scored ones).

    Round 3: the hyperplanes and IVF centroids are deterministic
    literals shared with the oracle generator, and the scoring fold
    matches DuckDB's list_dot_product evaluation order, so the ENTIRE
    entry — buckets, probes, ranks, cosines, recalls — hash-checks
    against the SQL oracle below (round 2 this was rows-only).
    Round 8: the oracle RETRAINS the four PQ subspace codebooks via
    the same unrolled-Lloyd's blocks and re-derives codes, ADC ranks,
    and recon errors — plus the 'ivfpq' method: the full published
    IVFADC composition (Jégou et al.) where the SHARED trained coarse
    quantizer prunes which (query, vector) pairs are scored at all
    and PQ codes make each surviving score a lookup; its recall row
    isolates what the coarse pruning adds on top of raw ADC.

    Round 9 adds 'ivfpq_res': the RESIDUAL-encoded IVFADC of the same
    paper's §IV-A — PQ codebooks are trained on ``x − c(x)`` (what the
    coarse quantizer cannot express), every corpus vector's residual
    is encoded, and each query is compared as ``q − c(L)`` per probed
    list L. The residual distribution is far tighter than the raw
    vectors, so the same 4×8 codebooks quantize it with less error;
    the recall gate in tests asserts ivfpq_res ≥ ivfpq on the same
    queries. The oracle RETRAINS the residual codebooks end-to-end
    (residual CTE → sliced Lloyd's → codes → per-list ADC), so every
    rank and cosine hash-checks. Residual encode stays row-local: one
    k·d centroid literal, zip_with subtraction, no shuffle.

    Round 10 adds 'sq8': 8-bit SCALAR quantization (the FAISS SQ8
    family) — per-dim affine uint8 codes from one min/max aggregation,
    row-local encode/ADC, micro-exact order-free distance sums — and
    'sq8l': the IVF composition with PER-LIST bounds (the coarse list
    join prunes what is scored; each vector reconstructs against its
    own list's min/max — the residual-PQ insight applied to scalar
    quantization). Measured recall: sq8 1.0 / sq8l 0.925 (= ivf's
    pruning ceiling exactly) on structure-free gaussians; BOTH 0.775
    on the clustered slice — and the in-round diagnosis matters:
    ranking by EXACT L2 also scores 0.775 there, i.e. SQ quantization
    is rank-lossless (gate-asserted: both methods return exactly the
    exact-L2 top-5) and the drop is the L2-vs-cosine METRIC gap on
    tight clusters with varying norms. The diagnosis's prediction is
    itself shipped and gate-tested as 'sq8n' — normalize-then-
    quantize (one row-local fold; the sq8 machinery verbatim on unit
    vectors, where L2 rank ≡ cosine rank): measured recall 1.0 on
    BOTH regimes, confirming the gap was metric semantics, not
    quantization precision.

    Round 15 adds 'nnd_serve': the graph family's RECOMMENDED serving
    path (``operators/nndescent.nnd_search_hier`` — the SCALE.md serve
    matrix's winner) at the measured knee (beam 8, 4 coarse + 4 full
    hops, 4 entries handed down), with the coarse layer's entries
    navigated by THIS entry's shared trained IVF quantizer. The
    oracle re-derives the md5-sampled layer, retrains the coarse
    graph, and replays both beam descents hop by hop — so the path
    users are steered to is hash-checked end to end, not just
    pytest-pinned (r14 verdict #1). Self-matches are dropped before
    the rank so the recall row compares against the same
    self-excluded exact top-k as every other method; measured
    clustered-slice recall 1.0 (gate-asserted ≥ the 'nnd'
    member-adjacency rows), structure-free floor 0.45.

    ``emb`` overrides the corpus for every stage (r9): the clustered-
    vector recall eval injects a deterministic mixture-of-gaussians
    slice through this exact pipeline, so its recall numbers measure
    the code the registry ships, not a test-only reimplementation."""
    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    lsh = similarity_lsh(spark, sf_dir, emb=emb).withColumn(
        "method", F.lit("signlsh")
    )
    cents = _train_ivf_cents(emb)  # trained ONCE, shared ivf + ivfpq
    ivf = similarity_ivf(spark, sf_dir, cents=cents, emb=emb).withColumn(
        "method", F.lit("ivf")
    )
    pq_raw, pq_rr, pq_codes, pq_books = similarity_pq(spark, sf_dir,
                                                      emb=emb)

    # IVFADC: coarse-list candidate pairs (corpus list ∈ the query's
    # probed lists) restrict the ADC scoring; rank by (adc, id)
    cassign = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        sim.nearest_centroid_lists(
            sim._as_double(F.col("embedding")), cents, 1
        )[0]["list_id"].alias("list_id"),
    )
    qassign = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.transform(
                sim.nearest_centroid_lists(
                    sim._as_double(F.col("embedding")), cents, _ANN_PROBE
                ),
                lambda s: s["list_id"],
            )
        ).alias("list_id"),
    )
    pairs = cassign.join(F.broadcast(qassign), "list_id").select(
        "query_id", "neighbor_id"
    )
    wiv = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qv")
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__nv")
    )
    ivfpq = (
        pq.pq_adc_scores(pq_codes, queries, pq_books, pairs=pairs)
        .withColumn("rank", F.row_number().over(wiv))
        .filter(F.col("rank") <= _ANN_K)
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(
                sim.cosine(
                    sim._as_double(F.col("__qv")),
                    sim._as_double(F.col("__nv")),
                ), 6,
            ).alias("cosine"),
        )
    )

    # Residual IVFADC ('ivfpq_res'): PQ over x − c(x). The residual
    # frame, codebook training, and encoding reuse the raw-PQ
    # machinery on the residual representation; the query side is the
    # per-(query, probed-list) residual q − c(L). All model state
    # (cents + residual codebooks) rides the plan as literals.
    res = pq.residual_frame(emb, "embedding", cents)
    res_books = pq.pq_train(
        res, "residual", dim=EMBEDDING_DIM, m=_PQ_M, ksub=_PQ_KSUB,
        iters=_KMEANS_ITERS,
    )
    res_codes = pq.pq_encode(
        res, "residual", res_books, keep_cols=("list_id",)
    )
    qres = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            sim._as_double(F.col("embedding")).alias("__qv0"),
            F.explode(
                F.transform(
                    sim.nearest_centroid_lists(
                        sim._as_double(F.col("embedding")), cents,
                        _ANN_PROBE,
                    ),
                    lambda s: s["list_id"],
                )
            ).alias("list_id"),
        )
        .select(
            "query_id", "list_id",
            F.zip_with(
                F.col("__qv0"),
                F.element_at(sim.mat_lit(cents), F.col("list_id") + 1),
                lambda x, c: x - c,
            ).alias("qres"),
        )
    )
    ivfpq_res = (
        pq.pq_adc_scores_residual(res_codes, qres, res_books)
        .withColumn("rank", F.row_number().over(wiv))
        .filter(F.col("rank") <= _ANN_K)
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(
                sim.cosine(
                    sim._as_double(F.col("__qv")),
                    sim._as_double(F.col("__nv")),
                ), 6,
            ).alias("cosine"),
        )
    )

    # 8-bit scalar quantization ('sq8', r10 — the FAISS SQ8 family):
    # per-dim affine uint8 codes, 4× compression at near-exact recall
    # — the mild end of the compression spectrum next to PQ's 64×.
    # Train = one map-side-combinable min/max agg (2·d doubles to the
    # driver); encode and ADC are row-local literal arithmetic; the
    # rank window is the method's only shuffle. The oracle RE-DERIVES
    # the bounds with min()/max() (exact data values, no arithmetic)
    # and every code and micro-exact distance.
    sq_mins, sq_maxs = pq.sq_train(emb, "embedding", EMBEDDING_DIM)
    sq_codes = pq.sq_encode(emb, "embedding", sq_mins, sq_maxs)
    wsq = Window.partitionBy("query_id").orderBy("sq_d2", "neighbor_id")
    sq8 = (
        pq.sq_adc_scores(sq_codes, queries, sq_mins, sq_maxs)
        .withColumn("rank", F.row_number().over(wsq))
        .filter(F.col("rank") <= _ANN_K)
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(
                sim.cosine(
                    sim._as_double(F.col("__qv")),
                    sim._as_double(F.col("__nv")),
                ), 6,
            ).alias("cosine"),
        )
    )

    # Per-list SQ8 ('sq8l', r10): the coarse quantizer prunes WHICH
    # vectors are scored (the list join — the ivfpq composition) AND
    # tightens the bounds each is reconstructed against (per-list
    # min/max, the residual-PQ insight applied to scalar
    # quantization) — the production fix for sq8's clustered-recall
    # inversion. Bounds ride as one n_lists×d literal matrix.
    embl = cassign.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    sql_mins, sql_maxs = pq.sq_train_per_list(
        embl, "embedding", EMBEDDING_DIM, n_lists=_ANN_LISTS,
    )
    sql_codes = pq.sq_encode_per_list(
        embl, "embedding", sql_mins, sql_maxs, id_col="neighbor_id",
    )
    qprobe = queries.select(
        F.col("vec_id").alias("query_id"),
        sim._as_double(F.col("embedding")).alias("__qpv"),
        F.explode(
            F.transform(
                sim.nearest_centroid_lists(
                    sim._as_double(F.col("embedding")), cents, _ANN_PROBE
                ),
                lambda s: s["list_id"],
            )
        ).alias("list_id"),
    )
    sq8l = (
        pq.sq_adc_scores_per_list(
            sql_codes, qprobe, sql_mins, sql_maxs,
            id_col="neighbor_id", query_vec_col="__qpv",
        )
        .withColumn("rank", F.row_number().over(wsq))
        .filter(F.col("rank") <= _ANN_K)
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(
                sim.cosine(
                    sim._as_double(F.col("__qv")),
                    sim._as_double(F.col("__nv")),
                ), 6,
            ).alias("cosine"),
        )
    )

    # Normalize-then-quantize ('sq8n', r10): the PREDICTION test of
    # the clustered-recall diagnosis. On unit vectors L2 order ≡
    # cosine order (d² = 2 − 2cos), so if sq8's clustered drop really
    # is the metric gap — not quantization — sq8n must recover it.
    # Normalization is one row-local fold (the `sim.dot` order DuckDB
    # reproduces with list_dot_product); everything downstream reuses
    # the sq8 machinery verbatim on the normalized frame.
    nemb = normalized_embeddings(emb)
    sqn_mins, sqn_maxs = pq.sq_train(nemb, "embedding", EMBEDDING_DIM)
    sqn_codes = pq.sq_encode(nemb, "embedding", sqn_mins, sqn_maxs)
    sq8n = (
        pq.sq_adc_scores(sqn_codes, normalized_embeddings(queries),
                         sqn_mins, sqn_maxs)
        .withColumn("rank", F.row_number().over(wsq))
        .filter(F.col("rank") <= _ANN_K)
        .join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id", "rank", "neighbor_id",
            F.round(
                sim.cosine(
                    sim._as_double(F.col("__qv")),
                    sim._as_double(F.col("__nv")),
                ), 6,
            ).alias("cosine"),
        )
    )

    # NN-descent graph ('nnd', r11 — Dong et al. 2011): the GRAPH ANN
    # family rep. The k-NN graph is built once (deterministic
    # hash-ring init, 3 local-join rounds, oracle-RETRAINED edge by
    # edge) and a member query answers from its adjacency list alone
    # — no scoring pass. The graph family wins on clustered corpora
    # (neighbor-of-neighbor expansion stays inside a cluster where
    # quantizer cells straddle boundaries): measured recall 1.0 on
    # the clustered slice (= ivf) vs the documented structure-free
    # floor (high intrinsic dimension is the family's published weak
    # regime — reported, not hidden).
    nndq = None
    serveq = None
    if include_nnd:
        graph = nnd_op.nnd_graph(
            emb, "embedding", "vec_id", k=_NND_K, iters=_NND_ITERS,
        )
        try:
            # queries·k rows — materialize at build (the KMV
            # discipline: its window never enters the entry's final
            # plan) and release the graph checkpoint it supersedes
            nndq = nnd_op.nnd_topk(
                graph,
                queries.select(F.col("vec_id").alias("query_id")),
                _ANN_K,
            ).select(
                "query_id", "rank", "neighbor_id",
                F.col("cos").alias("cosine"),
            ).localCheckpoint(eager=True)

            if include_serve:
                # 'nnd_serve' (r15): the RECOMMENDED serving path
                # (``nnd_search_hier`` — SCALE.md serve matrix,
                # ``operators/nndescent.py`` docstring guidance) held
                # to the same hash bar as the build: a 1/frac
                # md5-sampled coarse layer gets its own NN-descent
                # graph, the already-trained IVF quantizer navigates
                # queries to per-cell layer representatives (coarse
                # entries), and the two-layer beam descent runs at the
                # measured knee (4+4 hops, beam 8). The oracle
                # re-derives layer, coarse graph, entries, and BOTH
                # descents hop by hop.
                layer = nnd_op.nnd_sample_layer(
                    emb, "embedding", "vec_id", frac=_SERVE_FRAC)
                g1 = nnd_op.nnd_graph(
                    layer, "embedding", "vec_id",
                    k=_NND_K, iters=_NND_ITERS)
                try:
                    reps = (
                        cassign.join(
                            layer.select(
                                F.col("vec_id").alias("neighbor_id")),
                            "neighbor_id",
                        )
                        .groupBy("list_id")
                        .agg(F.min("neighbor_id").alias("nid"))
                    )
                    entries1 = (
                        qassign.join(F.broadcast(reps), "list_id")
                        .select("query_id", "nid")
                        .distinct()
                    )
                    served = nnd_op.nnd_search_hier(
                        graph, emb, g1, layer,
                        queries.select(
                            F.col("vec_id").alias("query_id"),
                            "embedding"),
                        k=_SERVE_BEAM, beam=_SERVE_BEAM,
                        hops0=_SERVE_HOPS, hops1=_SERVE_HOPS,
                        n_entry=_SERVE_NENTRY, entry_df1=entries1,
                    )
                finally:
                    release_local_checkpoint(g1)
                # member queries find themselves at cos 1.0 — drop the
                # self-match and re-rank so recall compares against the
                # same self-excluded exact top-k every other method uses
                wsv = Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), "neighbor_id")
                serveq = (
                    served.filter(
                        F.col("neighbor_id") != F.col("query_id"))
                    .withColumn("rank", F.row_number().over(wsv))
                    .filter(F.col("rank") <= _ANN_K)
                    .select("query_id", "rank", "neighbor_id",
                            F.col("cos").alias("cosine"))
                    .localCheckpoint(eager=True)
                )
                release_local_checkpoint(served)
        finally:
            release_local_checkpoint(graph)

    ann = (
        lsh.unionByName(ivf)
        .unionByName(pq_raw.withColumn("method", F.lit("pq")))
        .unionByName(pq_rr.withColumn("method", F.lit("pq_rr")))
        .unionByName(ivfpq.withColumn("method", F.lit("ivfpq")))
        .unionByName(ivfpq_res.withColumn("method", F.lit("ivfpq_res")))
        .unionByName(sq8.withColumn("method", F.lit("sq8")))
        .unionByName(sq8l.withColumn("method", F.lit("sq8l")))
        .unionByName(sq8n.withColumn("method", F.lit("sq8n")))
    )
    if nndq is not None:
        ann = ann.unionByName(nndq.withColumn("method", F.lit("nnd")))
    if serveq is not None:
        ann = ann.unionByName(
            serveq.withColumn("method", F.lit("nnd_serve")))
    exact = sim.cosine_topk(emb, queries, "vec_id", "embedding", k=_ANN_K)

    topk = ann.select(
        F.lit("topk").alias("stage"), "method", "query_id", "rank",
        "neighbor_id", "cosine", F.lit(None).cast("double").alias("recall"),
    )
    encode = (
        pq_codes.select(
            "recon_err", F.posexplode("codes").alias("__j", "__code")
        )
        .groupBy("__j", "__code")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            # exact-integer micro-units, then one division: a float
            # AVG here would sum 6-dp doubles in engine-specific
            # order (the known midpoint flake class); the long sum is
            # order-exact in both engines (the dedup-stage exact-cents
            # discipline)
            (
                F.sum(F.round(F.col("recon_err") * 1e6).cast("long"))
                / F.lit(1e6)
            ).alias("__err"),
        )
        .select(
            F.lit("encode").alias("stage"), F.lit("pq").alias("method"),
            F.col("__j").cast("long").alias("query_id"),
            F.col("__code").alias("rank"),
            F.col("__n").alias("neighbor_id"),
            F.col("__err").alias("cosine"),
            F.lit(None).cast("double").alias("recall"),
        )
    )
    methods = spark.createDataFrame(
        [("signlsh",), ("ivf",), ("pq",), ("pq_rr",), ("ivfpq",),
         ("ivfpq_res",), ("sq8",), ("sq8l",), ("sq8n",)]
        + ([("nnd",)] if nndq is not None else [])
        + ([("nnd_serve",)] if serveq is not None else []),
        "method string",
    )
    grid = queries.select(F.col("vec_id").alias("query_id")).crossJoin(
        F.broadcast(methods)
    )
    hits = (
        ann.join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("method", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    recall = grid.join(hits, ["method", "query_id"], "left").select(
        F.lit("recall").alias("stage"), "method", "query_id",
        F.lit(None).cast("int").alias("rank"),
        F.lit(None).cast("long").alias("neighbor_id"),
        F.lit(None).cast("double").alias("cosine"),
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / _ANN_K, 6).alias("recall"),
    )
    return topk.unionByName(recall).unionByName(encode)


def _vec_sql(vals: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vals) + "]::DOUBLE[]"


def _nnd_blocks(k: int, iters: int, tag: str = "",
                src: str = "e") -> tuple[str, str]:
    """SQL twin of ``operators/nndescent.nnd_graph``: RETRAINS the
    k-NN graph iteration by iteration (the ``_lloyd_blocks``
    discipline) — hash-ring init over row_number in md5 order, then
    per round: general neighborhood (UNION ALL of both edge
    directions), local join on the shared center, rounded cosine on
    the distinct candidates, and the per-node top-k window. Returns
    (cte_sql, final_graph_name). ``tag``/``src`` (r15) build the same
    graph over an alternate corpus CTE exposing (vec_id, v) — the
    serve oracle's 1/frac coarse layer — without CTE-name collisions;
    the defaults are byte-identical to the r11 shape."""
    cosab = ("list_dot_product(x.v, y.v)"
             " / (sqrt(list_dot_product(x.v, x.v))"
             " * sqrt(list_dot_product(y.v, y.v)))")
    blocks = [f"""n{tag}perm AS MATERIALIZED (
  SELECT vec_id AS nid, v,
         row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS rn
  FROM {src}
),
nnd{tag}g0 AS MATERIALIZED (
  SELECT x.nid AS src, y.nid AS dst, round({cosab}, 6) AS cos
  FROM n{tag}perm x
  CROSS JOIN range(1, {k + 1}) jt
  JOIN n{tag}perm y
    ON y.rn = (x.rn - 1 + jt.range) % (SELECT count(*) FROM {src}) + 1
)"""]
    for i in range(1, iters + 1):
        p = f"nnd{tag}g{i - 1}"
        blocks.append(f""",
nnd{tag}u{i} AS (SELECT src AS c, dst AS nid FROM {p}
            UNION ALL SELECT dst, src FROM {p}),
nnd{tag}c{i} AS (SELECT DISTINCT a.nid AS src, b.nid AS dst
            FROM nnd{tag}u{i} a JOIN nnd{tag}u{i} b
              ON a.c = b.c AND a.nid < b.nid),
nnd{tag}d{i} AS (SELECT c.src, c.dst, round({cosab}, 6) AS cos
            FROM nnd{tag}c{i} c
            JOIN n{tag}perm x ON x.nid = c.src
            JOIN n{tag}perm y ON y.nid = c.dst),
nnd{tag}g{i} AS MATERIALIZED (
  SELECT src, dst, cos FROM (
    SELECT src, dst, cos,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos DESC, dst) AS rn
    FROM (SELECT src, dst, cos FROM {p}
          UNION SELECT src, dst, cos FROM nnd{tag}d{i}
          UNION SELECT dst, src, cos FROM nnd{tag}d{i})
  ) WHERE rn <= {k}
)""")
    return "".join(blocks), f"nnd{tag}g{iters}"


def _beam_blocks(pref: str, graph: str, src: str, entry: str,
                 hops: int, beam: int) -> str:
    """SQL twin of ``operators/nndescent.nnd_search``'s beam descent
    over ONE graph (r15): score the entry frontier, then per hop
    expand by graph neighbors (UNION the kept beam, DISTINCT — the
    Spark ``expanded`` shape), re-score the rounded cosine against the
    query vector, and keep the best ``beam`` per query by
    (cos DESC, nid). ``src`` is the corpus CTE (vec_id, v) legal for
    this graph's nodes; ``entry`` supplies (query_id, nid). The final
    kept beam is ``{pref}b{hops}``."""
    sc = ("round(list_dot_product(q.qv, x.v)"
          " / (sqrt(list_dot_product(q.qv, q.qv))"
          " * sqrt(list_dot_product(x.v, x.v))), 6)")
    score = f"""  SELECT query_id, nid, cos FROM (
    SELECT query_id, nid, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, nid) AS rn
    FROM (SELECT en.query_id, en.nid, {sc} AS cos
          FROM {{frontier}} en
          JOIN {src} x ON x.vec_id = en.nid
          JOIN q ON q.query_id = en.query_id)
  ) WHERE rn <= {beam}"""
    blocks = [f"""{pref}b0 AS MATERIALIZED (
{score.format(frontier=entry)}
)"""]
    for i in range(1, hops + 1):
        blocks.append(f""",
{pref}e{i} AS (
  SELECT DISTINCT query_id, nid FROM (
    SELECT b.query_id, g.dst AS nid
    FROM {pref}b{i - 1} b JOIN {graph} g ON g.src = b.nid
    UNION ALL SELECT query_id, nid FROM {pref}b{i - 1})
),
{pref}b{i} AS MATERIALIZED (
{score.format(frontier=f'{pref}e{i}')}
)""")
    return "".join(blocks)


def _serve_blocks(nnd_final: str, k: int = _ANN_K,
                  gk: int = _NND_K, giters: int = _NND_ITERS,
                  beam: int = _SERVE_BEAM, hops: int = _SERVE_HOPS,
                  n_entry: int = _SERVE_NENTRY,
                  frac: int = _SERVE_FRAC) -> str:
    """SQL twin of the 'nnd_serve' method — ``nnd_search_hier`` end to
    end: the 1/frac md5-sampled coarse layer (``nnd_sample_layer``'s
    15-hex-digit conv), its OWN retrained NN-descent graph
    (``_nnd_blocks`` tag 'c'), IVF-navigated coarse entries (the
    shared trained quantizer's cassign/qassign, min-id rep per cell
    among LAYER members — queries whose probed cells are ALL rep-less
    fall back to the layer's global md5-least ``n_entry`` entries,
    mirroring ``nnd_search(cover_missing=True)``'s r16 safe default;
    at gate scale every cell has layer members, so the UNION arm is
    empty and hashes carry the r15 lineage), ``hops`` beam hops on
    the coarse graph, the
    top-``n_entry`` coarse winners handed down as full-graph entries,
    ``hops`` more hops on the full graph, then the self-match dropped
    and the top-``k`` re-ranked (member queries find themselves at
    cos 1.0; every method's recall compares against the same
    self-excluded exact top-k)."""
    cg_sql, cg_final = _nnd_blocks(gk, giters, tag="c", src="slay")
    coarse = _beam_blocks("sc", cg_final, "slay", "sentry", hops, beam)
    full = _beam_blocks("sf", nnd_final, "e", "sl1", hops, beam)
    return f"""slay AS MATERIALIZED (
  SELECT vec_id, v FROM e
  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT
        % {frac} = 0
),
{cg_sql},
sreps AS (
  SELECT ca.list_id, min(ca.neighbor_id) AS nid
  FROM cassign ca JOIN slay l ON l.vec_id = ca.neighbor_id
  GROUP BY ca.list_id
),
scov AS (
  SELECT DISTINCT qa.query_id, r.nid
  FROM qassign qa JOIN sreps r USING (list_id)
),
sentry AS (
  SELECT query_id, nid FROM scov
  UNION ALL
  SELECT qq.query_id, d.nid
  FROM (SELECT query_id FROM q
        EXCEPT SELECT query_id FROM scov) qq
  CROSS JOIN (SELECT nid FROM ncperm WHERE rn <= {n_entry}) d
),
{coarse},
sl1 AS (
  SELECT query_id, nid FROM (
    SELECT query_id, nid,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, nid) AS rk
    FROM scb{hops}
  ) WHERE rk <= {n_entry}
),
{full},
serve_topk AS (
  SELECT query_id, rank, nid AS neighbor_id, cos FROM (
    SELECT query_id, nid, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, nid) AS rank
    FROM sfb{hops} WHERE nid <> query_id
  ) WHERE rank <= {k}
)"""


def _ann_oracle(k: int = _ANN_K, n_planes: int = _ANN_PLANES,
                n_tables: int = _ANN_TABLES,
                n_lists: int = _ANN_LISTS, n_probe: int = _ANN_PROBE,
                dim: int = EMBEDDING_DIM,
                m: int = _PQ_M, ksub: int = _PQ_KSUB,
                rerank: int = _PQ_RERANK) -> str:
    """SQL twin of ``similarity_ann``: the same multi-table hyperplane
    sign buckets (plane literals from the same deterministic generator
    the Spark builder uses), the same TRAINED coarse quantizer (Lloyd's
    re-run in SQL via ``_lloyd_blocks``) with cosine-nearest 2-probe
    lists, the same rank windows, and recall joined against the exact
    top-k. r8: RETRAINS the m per-subspace PQ codebooks (``_lloyd_
    blocks`` over sliced-vector CTEs), re-derives every vector's codes
    + reconstruction error, and re-ranks the ADC top-k."""
    planes_all = sim.hyperplanes(dim, n_tables * n_planes, seed=7)
    tables = [
        planes_all[t * n_planes:(t + 1) * n_planes] for t in range(n_tables)
    ]

    def cos(v: str, lit: str) -> str:
        return (f"list_dot_product({v}, {lit})"
                f" / (sqrt(list_dot_product({v}, {v}))"
                f" * sqrt(list_dot_product({lit}, {lit})))")

    def bucket(v: str, planes: list) -> str:
        bits = " || ".join(
            f"CASE WHEN list_dot_product({v}, {_vec_sql(p)}) >= 0"
            " THEN '1' ELSE '0' END"
            for p in planes
        )
        return f"({bits})"

    cb_cols = ",\n       ".join(
        f"{bucket('cv', tp)} AS b{t}" for t, tp in enumerate(tables)
    )
    qb_cols = ",\n       ".join(
        f"{bucket('qv', tp)} AS b{t}" for t, tp in enumerate(tables)
    )
    table_hits = "\n      UNION ALL\n".join(
        f"      SELECT qb.query_id, cb.neighbor_id"
        f" FROM cb JOIN qb ON cb.b{t} = qb.b{t}"
        for t in range(n_tables)
    )
    lloyd, final_c = _lloyd_blocks(n_lists, _KMEANS_ITERS, dim, prefix="qc")
    nnd_sql, nnd_final = _nnd_blocks(_NND_K, _NND_ITERS)
    serve_sql = _serve_blocks(nnd_final, k=k)

    dsub = dim // m
    pq_slices, pq_lloyds, pq_assigns, pq_finals = [], [], [], []
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        pq_slices.append(
            f"pe{j} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e)"
        )
        blk, fin = _lloyd_blocks(
            ksub, _KMEANS_ITERS, dsub, prefix=f"p{j}c", src=f"pe{j}"
        )
        pq_lloyds.append(blk)
        pq_finals.append(fin)
        d2j = (f"list_sum(list_transform(range(1, {dsub + 1}),"
               f" i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))")
        pq_assigns.append(f"""
pqa{j} AS (
  SELECT vec_id, cid AS code, d2 FROM (
    SELECT e.vec_id, c.cid, {d2j} AS d2,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2j}, c.cid) AS rn
    FROM pe{j} e CROSS JOIN {fin} c
  ) WHERE rn = 1
)""")
    recon = " + ".join(f"a{j}.d2" for j in range(m))
    code_cols = ", ".join(f"a{j}.code AS c{j}" for j in range(m))
    code_joins = " ".join(
        f"JOIN pqa{j} a{j} USING (vec_id)" for j in range(1, m)
    )
    adc_terms = " + ".join(
        f"list_sum(list_transform(range(1, {dsub + 1}),"
        f" i -> (q.qv[{j * dsub} + i] - f{j}.c[i])"
        f" * (q.qv[{j * dsub} + i] - f{j}.c[i])))"
        for j in range(m)
    )
    adc_joins = " ".join(
        f"JOIN {pq_finals[j]} f{j} ON f{j}.cid = t.c{j}" for j in range(m)
    )
    enc_unpivot = "\n    UNION ALL ".join(
        f"SELECT {j} AS j, c{j} AS code, recon_err FROM pqcodes"
        for j in range(m)
    )

    # r9: residual-encoded IVFADC — retrain the m codebooks on
    # x − c(x) (resid CTE), encode, and ADC against q − c(L) per
    # probed list. Same unrolled-Lloyd's discipline, prefix r{j}c.
    res_slices, res_lloyds, res_assigns, res_finals = [], [], [], []
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        res_slices.append(
            f"rpe{j} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM resid)"
        )
        blk, fin = _lloyd_blocks(
            ksub, _KMEANS_ITERS, dsub, prefix=f"r{j}c", src=f"rpe{j}"
        )
        res_lloyds.append(blk)
        res_finals.append(fin)
        d2j = (f"list_sum(list_transform(range(1, {dsub + 1}),"
               f" i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))")
        res_assigns.append(f"""
rpqa{j} AS (
  SELECT vec_id, cid AS code FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2j}, c.cid) AS rn
    FROM rpe{j} e CROSS JOIN {fin} c
  ) WHERE rn = 1
)""")
    res_code_cols = ", ".join(f"a{j}.code AS c{j}" for j in range(m))
    res_code_joins = " ".join(
        f"JOIN rpqa{j} a{j} USING (vec_id)" for j in range(1, m)
    )
    res_adc_terms = " + ".join(
        f"list_sum(list_transform(range(1, {dsub + 1}),"
        f" i -> (q.qrv[{j * dsub} + i] - rf{j}.c[i])"
        f" * (q.qrv[{j * dsub} + i] - rf{j}.c[i])))"
        for j in range(m)
    )
    res_adc_joins = " ".join(
        f"JOIN {res_finals[j]} rf{j} ON rf{j}.cid = t.c{j}"
        for j in range(m)
    )
    res_sql = f"""resid AS MATERIALIZED (
  SELECT ca.neighbor_id AS vec_id, ca.list_id,
         list_transform(range(1, {dim + 1}),
                        i -> ca.cv[i] - ct.cc[i]) AS v
  FROM cassign ca JOIN cents ct ON ct.list_id = ca.list_id
),{",".join(res_slices)},{",".join(res_lloyds)},{",".join(res_assigns)},
rescodes AS MATERIALIZED (
  SELECT a0.vec_id, r.list_id, {res_code_cols}
  FROM rpqa0 a0 {res_code_joins} JOIN resid r USING (vec_id)
),
qres AS (
  SELECT qa.query_id, qa.list_id,
         list_transform(range(1, {dim + 1}),
                        i -> qa.qv[i] - ct.cc[i]) AS qrv
  FROM qassign qa JOIN cents ct ON ct.list_id = qa.list_id
),
rpqadc AS (
  SELECT q.query_id, t.vec_id AS neighbor_id,
         round({res_adc_terms}, 6) AS adc_d2
  FROM rescodes t {res_adc_joins}
  JOIN qres q ON q.list_id = t.list_id
  WHERE q.query_id <> t.vec_id
),
ivfpq_res_topk AS (
  SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT a.query_id, a.neighbor_id,
           row_number() OVER (PARTITION BY a.query_id
                              ORDER BY a.adc_d2, a.neighbor_id) AS rank,
           list_dot_product(q.qv, c.cv)
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(c.cv, c.cv))) AS cos
    FROM rpqadc a
    JOIN q ON q.query_id = a.query_id
    JOIN c ON c.neighbor_id = a.neighbor_id
  ) WHERE rank <= {k}
)"""
    pq_sql = f"""{",".join(pq_slices)},{",".join(pq_lloyds)},{",".join(pq_assigns)},
pqcodes AS MATERIALIZED (
  SELECT a0.vec_id, {code_cols}, round({recon}, 6) AS recon_err
  FROM pqa0 a0 {code_joins}
),
pqadc AS (
  SELECT q.query_id, t.vec_id AS neighbor_id,
         round({adc_terms}, 6) AS adc_d2
  FROM pqcodes t {adc_joins} CROSS JOIN q
  WHERE q.query_id <> t.vec_id
),
pqranked AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id,
         row_number() OVER (PARTITION BY a.query_id
                            ORDER BY a.adc_d2, a.neighbor_id) AS ar,
         list_dot_product(q.qv, c.cv)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM pqadc a
  JOIN q ON q.query_id = a.query_id
  JOIN c ON c.neighbor_id = a.neighbor_id
),
pq_topk AS (
  SELECT query_id, ar AS rank, neighbor_id, cos FROM pqranked
  WHERE ar <= {k}
),
pq_rr_topk AS (
  SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM (SELECT query_id, neighbor_id, round(cos, 6) AS cos
          FROM pqranked WHERE ar <= {rerank}) s
  ) WHERE rank <= {k}
),
ivfpq_topk AS (
  SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT a.query_id, a.neighbor_id,
           row_number() OVER (PARTITION BY a.query_id
                              ORDER BY a.adc_d2, a.neighbor_id) AS rank,
           list_dot_product(qa.qv, ca.cv)
             / (sqrt(list_dot_product(qa.qv, qa.qv))
                * sqrt(list_dot_product(ca.cv, ca.cv))) AS cos
    FROM pqadc a
    JOIN cassign ca ON ca.neighbor_id = a.neighbor_id
    JOIN qassign qa ON qa.query_id = a.query_id
                   AND qa.list_id = ca.list_id
  ) WHERE rank <= {k}
),
pq_enc AS (
  SELECT j, code, count(*) AS n,
         CAST(sum(CAST(round(recon_err * 1e6) AS BIGINT)) AS DOUBLE)
           / 1e6 AS err
  FROM (
    {enc_unpivot}
  ) GROUP BY j, code
),
{res_sql}"""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e),
cb AS (SELECT neighbor_id, cv,
       {cb_cols}
       FROM c),
qb AS (SELECT query_id, qv,
       {qb_cols}
       FROM q),
lsh_cand AS (
  SELECT DISTINCT query_id, neighbor_id FROM (
{table_hits}
  ) WHERE query_id <> neighbor_id
),
lsh_topk AS (
  SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM (
      SELECT d.query_id, d.neighbor_id,
             list_dot_product(qb.qv, cb.cv)
               / (sqrt(list_dot_product(qb.qv, qb.qv))
                  * sqrt(list_dot_product(cb.cv, cb.cv))) AS cos
      FROM lsh_cand d
      JOIN cb ON cb.neighbor_id = d.neighbor_id
      JOIN qb ON qb.query_id = d.query_id
    )
  ) WHERE rank <= {k}
),{lloyd},
cents AS MATERIALIZED (SELECT cid AS list_id, c AS cc FROM {final_c}),
cassign AS MATERIALIZED (
  SELECT neighbor_id, cv, list_id FROM (
    SELECT c.neighbor_id, c.cv, cents.list_id,
           row_number() OVER (PARTITION BY c.neighbor_id
                              ORDER BY -({cos('c.cv', 'cents.cc')}),
                                       cents.list_id) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
),
qassign AS MATERIALIZED (
  SELECT query_id, qv, list_id FROM (
    SELECT q.query_id, q.qv, cents.list_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY -({cos('q.qv', 'cents.cc')}),
                                       cents.list_id) AS rn
    FROM q CROSS JOIN cents
  ) WHERE rn <= {n_probe}
),
ivf_topk AS (
  SELECT query_id, rank, neighbor_id, cos FROM (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM (
      SELECT qa.query_id, ca.neighbor_id,
             list_dot_product(qa.qv, ca.cv)
               / (sqrt(list_dot_product(qa.qv, qa.qv))
                  * sqrt(list_dot_product(ca.cv, ca.cv))) AS cos
      FROM cassign ca JOIN qassign qa USING (list_id)
      WHERE qa.query_id <> ca.neighbor_id
    )
  ) WHERE rank <= {k}
),
{pq_sql},
-- sq8 (r10): per-dim min/max RE-DERIVED from the corpus, affine
-- uint8 codes, micro-exact asymmetric distances (per-dim term rounded
-- to int64 micro-units, summed order-free — the Spark side's exact
-- discipline), ranked by (distance, neighbor_id)
sqd AS MATERIALIZED (
  SELECT neighbor_id, unnest(range(1, {dim} + 1)) AS j, cv FROM c
),
sqmm AS MATERIALIZED (
  SELECT j, min(cv[j]) AS mn, max(cv[j]) AS mx FROM sqd GROUP BY j
),
sqcodes AS MATERIALIZED (
  SELECT d.neighbor_id, d.j,
         CASE WHEN m.mx = m.mn THEN 0
              ELSE least(255, greatest(0,
                round((d.cv[d.j] - m.mn) * 255 / (m.mx - m.mn))::BIGINT))
         END AS code
  FROM sqd d JOIN sqmm m USING (j)
),
sqmicro AS (
  SELECT q.query_id, s.neighbor_id,
         sum(round(
           (q.qv[s.j] - (m.mn + s.code * (m.mx - m.mn) / 255.0))
           * (q.qv[s.j] - (m.mn + s.code * (m.mx - m.mn) / 255.0))
           * 1e6)::BIGINT) AS micro
  FROM sqcodes s
  JOIN sqmm m USING (j)
  CROSS JOIN q
  WHERE q.query_id <> s.neighbor_id
  GROUP BY 1, 2
),
sq_topk AS (
  SELECT t.query_id, t.rank, t.neighbor_id,
         list_dot_product(q.qv, c.cv)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY micro, neighbor_id) AS rank
    FROM sqmicro
  ) t
  JOIN q ON q.query_id = t.query_id
  JOIN c ON c.neighbor_id = t.neighbor_id
  WHERE t.rank <= {k}
),
-- sq8n (r10): normalize-then-quantize — the sq8 pipeline verbatim on
-- unit vectors (x / sqrt(x·x), the list_dot_product order the Spark
-- fold mirrors); on unit vectors L2 rank ≡ cosine rank
sqnc AS MATERIALIZED (
  SELECT neighbor_id,
         list_transform(cv, x -> CASE WHEN list_dot_product(cv, cv) = 0
                                      THEN 0.0
                                      ELSE x / sqrt(list_dot_product(cv, cv))
                                 END) AS nv
  FROM c
),
sqnq AS MATERIALIZED (
  SELECT query_id,
         list_transform(qv, x -> CASE WHEN list_dot_product(qv, qv) = 0
                                      THEN 0.0
                                      ELSE x / sqrt(list_dot_product(qv, qv))
                                 END) AS nqv
  FROM q
),
sqnd AS MATERIALIZED (
  SELECT neighbor_id, unnest(range(1, {dim} + 1)) AS j, nv FROM sqnc
),
sqnmm AS MATERIALIZED (
  SELECT j, min(nv[j]) AS mn, max(nv[j]) AS mx FROM sqnd GROUP BY j
),
sqncodes AS MATERIALIZED (
  SELECT d.neighbor_id, d.j,
         CASE WHEN m.mx = m.mn THEN 0
              ELSE least(255, greatest(0,
                round((d.nv[d.j] - m.mn) * 255 / (m.mx - m.mn))::BIGINT))
         END AS code
  FROM sqnd d JOIN sqnmm m USING (j)
),
sqnmicro AS (
  SELECT q2.query_id, s.neighbor_id,
         sum(round(
           (q2.nqv[s.j] - (m.mn + s.code * (m.mx - m.mn) / 255.0))
           * (q2.nqv[s.j] - (m.mn + s.code * (m.mx - m.mn) / 255.0))
           * 1e6)::BIGINT) AS micro
  FROM sqncodes s
  JOIN sqnmm m USING (j)
  CROSS JOIN sqnq q2
  WHERE q2.query_id <> s.neighbor_id
  GROUP BY 1, 2
),
sqn_topk AS (
  SELECT t.query_id, t.rank, t.neighbor_id,
         list_dot_product(q.qv, c.cv)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY micro, neighbor_id) AS rank
    FROM sqnmicro
  ) t
  JOIN q ON q.query_id = t.query_id
  JOIN c ON c.neighbor_id = t.neighbor_id
  WHERE t.rank <= {k}
),
-- sq8l (r10): PER-COARSE-LIST bounds (the clustered-recall fix) +
-- the list join as coarse pruning — bounds re-derived per (list, dim)
-- from the shared trained cassign, scored only for probed lists
sq8ld AS MATERIALIZED (
  SELECT neighbor_id, list_id, unnest(range(1, {dim} + 1)) AS j, cv
  FROM cassign
),
sq8lmm AS MATERIALIZED (
  SELECT list_id, j, min(cv[j]) AS mn, max(cv[j]) AS mx
  FROM sq8ld GROUP BY 1, 2
),
sq8lcodes AS MATERIALIZED (
  SELECT d.neighbor_id, d.list_id, d.j,
         CASE WHEN m.mx = m.mn THEN 0
              ELSE least(255, greatest(0,
                round((d.cv[d.j] - m.mn) * 255 / (m.mx - m.mn))::BIGINT))
         END AS code
  FROM sq8ld d JOIN sq8lmm m USING (list_id, j)
),
sq8lmicro AS (
  SELECT qa.query_id, s.neighbor_id,
         sum(round(
           (qa.qv[s.j] - (m.mn + s.code * (m.mx - m.mn) / 255.0))
           * (qa.qv[s.j] - (m.mn + s.code * (m.mx - m.mn) / 255.0))
           * 1e6)::BIGINT) AS micro
  FROM sq8lcodes s
  JOIN sq8lmm m USING (list_id, j)
  JOIN qassign qa ON qa.list_id = s.list_id
  WHERE qa.query_id <> s.neighbor_id
  GROUP BY 1, 2
),
sq8l_topk AS (
  SELECT t.query_id, t.rank, t.neighbor_id,
         list_dot_product(q.qv, c.cv)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.cv, c.cv))) AS cos
  FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY micro, neighbor_id) AS rank
    FROM sq8lmicro
  ) t
  JOIN q ON q.query_id = t.query_id
  JOIN c ON c.neighbor_id = t.neighbor_id
  WHERE t.rank <= {k}
),
{nnd_sql},
nnd_topk AS (
  SELECT src AS query_id, rank, dst AS neighbor_id, cos FROM (
    SELECT src, dst, cos,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos DESC, dst) AS rank
    FROM {nnd_final} WHERE src < 8
  ) WHERE rank <= {k}
),
{serve_sql},
ann AS (
  SELECT 'signlsh' AS method, query_id, rank, neighbor_id, cos FROM lsh_topk
  UNION ALL
  SELECT 'ivf', query_id, rank, neighbor_id, cos FROM ivf_topk
  UNION ALL
  SELECT 'pq', query_id, rank, neighbor_id, cos FROM pq_topk
  UNION ALL
  SELECT 'pq_rr', query_id, rank, neighbor_id, cos FROM pq_rr_topk
  UNION ALL
  SELECT 'ivfpq', query_id, rank, neighbor_id, cos FROM ivfpq_topk
  UNION ALL
  SELECT 'ivfpq_res', query_id, rank, neighbor_id, cos
  FROM ivfpq_res_topk
  UNION ALL
  SELECT 'sq8', query_id, rank, neighbor_id, cos FROM sq_topk
  UNION ALL
  SELECT 'sq8l', query_id, rank, neighbor_id, cos FROM sq8l_topk
  UNION ALL
  SELECT 'sq8n', query_id, rank, neighbor_id, cos FROM sqn_topk
  UNION ALL
  SELECT 'nnd', query_id, rank, neighbor_id, cos FROM nnd_topk
  UNION ALL
  SELECT 'nnd_serve', query_id, rank, neighbor_id, cos FROM serve_topk
),
exact_topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.qv, c.cv)
                                / (sqrt(list_dot_product(q.qv, q.qv))
                                   * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                                       c.neighbor_id) AS rank
    FROM q CROSS JOIN c
    WHERE q.query_id <> c.neighbor_id
  ) WHERE rank <= {k}
),
grid AS (
  SELECT m.method, q.query_id
  FROM (SELECT 'signlsh' AS method UNION ALL SELECT 'ivf'
        UNION ALL SELECT 'pq' UNION ALL SELECT 'pq_rr'
        UNION ALL SELECT 'ivfpq' UNION ALL SELECT 'ivfpq_res'
        UNION ALL SELECT 'sq8' UNION ALL SELECT 'sq8l'
        UNION ALL SELECT 'sq8n' UNION ALL SELECT 'nnd'
        UNION ALL SELECT 'nnd_serve') m
  CROSS JOIN q
),
hits AS (
  SELECT a.method, a.query_id, count(*) AS n_hits
  FROM ann a
  JOIN exact_topk e
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
  GROUP BY 1, 2
)
SELECT 'topk' AS stage, method, query_id, rank::INT AS rank, neighbor_id,
       round(cos, 6) AS cosine, NULL::DOUBLE AS recall
FROM ann
UNION ALL
SELECT 'recall', g.method, g.query_id, NULL::INT, NULL::BIGINT, NULL::DOUBLE,
       round(coalesce(h.n_hits, 0) / {k}.0, 6)
FROM grid g LEFT JOIN hits h ON h.method = g.method AND h.query_id = g.query_id
UNION ALL
SELECT 'encode', 'pq', j::BIGINT, code::INT, n::BIGINT, err, NULL::DOUBLE
FROM pq_enc
"""


ANN_ORACLE = _ann_oracle()


def doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document signature surface in one entry: 64-bit SimHash (as
    a hex string) joined to winnowing/MOSS fingerprint counts plus the
    corpus-wide shared-fingerprint count. Round 2 this was rows-only
    (xxhash64 has no DuckDB twin); both signatures now ride the
    engine-portable md5 family (``simhash_hex_portable`` /
    ``winnowing_fingerprints_portable``), so every value hash-checks
    against the SQL oracle. The xxhash64 variants remain for hot paths
    that don't need an oracle (property tests keep covering them).

    r6 adds substring-level duplication coverage
    (``operators/dedup.py:dup_span_coverage`` — the distributed
    k-gram-anchor approximation of Lee et al. 2022 exact-substring
    dedup): per document, how many token positions sit inside a
    5-token window that repeats anywhere in the corpus, and the
    covered fraction. The oracle re-derives the gram stream, the
    corpus-wide window counts, and the per-doc interval-union
    arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dd.simhash_hex_portable(docs, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )
    fps = dd.winnowing_fingerprints_portable(docs, "doc_id", "text", k=4, window=5)
    per_doc = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fps"))
    shared = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs")).filter(
        F.col("n_docs") > 1
    )
    n_shared = shared.agg(F.count(F.lit(1)).alias("n_shared_fps"))
    spans = dd.dup_span_coverage(docs, "doc_id", "text", gram_len=5)
    return (
        sh.join(per_doc, "doc_id")
        .join(F.broadcast(n_shared), how="cross")
        .join(spans, "doc_id")
    )


def _doc_signatures_oracle(k: int = 4, window: int = 5) -> str:
    """SQL twin of ``doc_signatures``: per-bit SimHash majority votes
    over md5 hex digits, winnowing window minima over 60-bit md5-prefix
    k-gram hashes — generated, so the bit/digit formulas are written
    once per engine."""
    hexval = "(strpos('0123456789abcdef', substr(m, {p}, 1)) - 1)"
    digs = ",\n         ".join(
        f"{hexval.format(p=d + 1)} AS d{d}" for d in range(16)
    )
    votes = ",\n         ".join(
        f"sum(CASE WHEN (d{j // 4} // {2 ** (3 - j % 4)}) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS b{j}"
        for j in range(64)
    )
    hex_chars = " || ".join(
        "substr('0123456789abcdef', "
        + " + ".join(
            f"CASE WHEN b{4 * d + j4} > 0 THEN {2 ** (3 - j4)} ELSE 0 END"
            for j4 in range(4)
        )
        + " + 1, 1)"
        for d in range(16)
    )
    gram = " || ' ' || ".join(f"toks[pos + {j}]" if j else "toks[pos]"
                              for j in range(k))
    span_len = 5
    gram5 = " || ' ' || ".join(f"toks[pos + {j}]" if j else "toks[pos]"
                               for j in range(span_len))
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
hv AS (
  SELECT doc_id,
         {digs}
  FROM (SELECT doc_id, md5(tk) AS m FROM tok)
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hv GROUP BY doc_id
),
sim AS (SELECT doc_id, {hex_chars} AS simhash_hex FROM votes),
kgp AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks) - {k} + 1, 0) + 1)) AS pos
  FROM t
),
kg AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5({gram}), 1, 15))::BIGINT AS g
  FROM kgp
),
wm AS (
  SELECT doc_id,
         min(g) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp
  FROM kg
),
fps AS (SELECT DISTINCT doc_id, fp FROM wm),
per_doc AS (SELECT doc_id, count(*) AS n_fps FROM fps GROUP BY doc_id),
shared AS (
  SELECT count(*) AS n_shared_fps
  FROM (SELECT fp FROM fps GROUP BY fp HAVING count(*) > 1)
),
-- substring-duplication coverage: 5-token gram stream, corpus-wide
-- occurrence counts, per-doc interval union via the lag arithmetic
dsp AS (
  SELECT doc_id, toks, len(toks) AS n_tokens,
         unnest(range(1, greatest(len(toks) - {span_len} + 1, 0) + 1)) AS pos
  FROM t
),
dsg AS (
  SELECT doc_id, n_tokens, pos, substr(md5({gram5}), 1, 16) AS g
  FROM dsp
),
dsd AS (
  SELECT doc_id, n_tokens, pos FROM (
    SELECT doc_id, n_tokens, pos,
           count(*) OVER (PARTITION BY g) AS cnt
    FROM dsg
  ) WHERE cnt > 1
),
dsc AS (
  SELECT doc_id,
         CAST(sum(least({span_len},
                        pos - coalesce(prev, pos - {span_len})))
              AS BIGINT) AS dup_span_tokens,
         any_value(n_tokens) AS nt
  FROM (SELECT doc_id, n_tokens, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dsd)
  GROUP BY doc_id
)
SELECT sim.doc_id, sim.simhash_hex, per_doc.n_fps, shared.n_shared_fps,
       COALESCE(dsc.dup_span_tokens, 0) AS dup_span_tokens,
       COALESCE(round(dsc.dup_span_tokens / dsc.nt::DOUBLE, 6), 0.0)
         AS dup_span_frac
FROM sim JOIN per_doc USING (doc_id) CROSS JOIN shared
LEFT JOIN dsc USING (doc_id)
"""


DOC_SIGNATURES_ORACLE = _doc_signatures_oracle()


def image_phash_stage(spark: SparkSession, sf_dir: str,
                      pairs: DataFrame | None = None) -> DataFrame:
    """Image-CONTENT near-dup pairs via DCT perceptual hash over REAL
    decoded pixels (`operators/phash.py`): token-grid image → real PNG
    encode → real decode → fixed-point 8×8 DCT → 64-bit pHash →
    Hamming-banded candidates → exact-Hamming verify (≤12/64 bits).
    Emitted in the cross-modal schema: the ``jaccard`` slot carries
    the image similarity ``1 − hamming/64`` (documented overload — the
    union needs one similarity column per stage), ``cosine`` is the
    embedding cosine for pairs that carry embeddings (LEFT join: an
    image-dup pair without embeddings survives with null cosine), and
    ``agree`` mirrors the cross_modal stage's ``cosine ≥ 0.2`` QA bit
    — image-content dup CONFIRMED (or not) by embedding space.

    ``pairs`` lets a caller that computes BOTH modality signatures in
    one fused crossing (``lsh_cross_modal``) hand the verified pair
    frame in, the same sharing seam as ``cross_modal_dedup(pairs=)``."""
    if pairs is None:
        docs = load_table(spark, sf_dir, "documents")
        # materialize=True (r16): the operator checkpoints its
        # rep-grain group table for the three internal consumers (band
        # explode + both Hamming-verify sides — the group table, one
        # agg above the signatures, is the real sharing point; the
        # former signature-level checkpoint still re-derived the group
        # agg per consumer), materializes the verified pair frame, and
        # releases the internal checkpoint
        pairs = ph.phash_candidate_pairs(ph.image_phash_signatures(
            docs, "doc_id", "text",
            parallelism=spark.sparkContext.defaultParallelism,
        ), materialize=True)
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id",
                   F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    joined = (
        pairs
        .join(v.withColumnsRenamed({"vec_id": "id_a", "v": "va"}), "id_a", "left")
        .join(v.withColumnsRenamed({"vec_id": "id_b", "v": "vb"}), "id_b", "left")
    )
    cos = F.round(sim.cosine(F.col("va"), F.col("vb")), 6)
    return joined.select(
        F.lit("image_phash").alias("stage"), "id_a", "id_b",
        F.round(F.lit(1.0) - F.col("hamming") / F.lit(64.0), 6).alias("jaccard"),
        cos.alias("cosine"),
        (cos >= 0.2).cast("int").alias("agree"),
    )


def audio_fp_stage(spark: SparkSession, sf_dir: str,
                   pairs: DataFrame | None = None) -> DataFrame:
    """Audio-CONTENT near-dup pairs via Haitsma–Kalker-style spectral
    fingerprints over REALLY-decoded WAV samples
    (`operators/audiofp.py`): token-mixture clip → real 16-bit PCM WAV
    encode → real decode → fixed-point frame-DFT band energies →
    sign-of-delta-derivative 64-bit fingerprint → the SAME
    Hamming-banded candidate operator as the image stage
    (`phash.phash_candidate_pairs`). Same schema conventions as
    ``image_phash_stage``: ``jaccard`` carries ``1 − hamming/64``,
    embedding cosine LEFT-joins on, ``agree`` is the ≥ 0.2 QA bit;
    ``pairs`` is the fused-crossing sharing seam."""
    if pairs is None:
        docs = load_table(spark, sf_dir, "documents")
        # same internal group-table materialization as
        # image_phash_stage (phash_candidate_pairs materialize=True)
        pairs = ph.phash_candidate_pairs(
            afp.audio_fingerprint_signatures(
                docs, "doc_id", "text",
                parallelism=spark.sparkContext.defaultParallelism,
            ),
            max_hamming=afp.DEFAULT_MAX_HAMMING, materialize=True)
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id",
                   F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    joined = (
        pairs
        .join(v.withColumnsRenamed({"vec_id": "id_a", "v": "va"}), "id_a", "left")
        .join(v.withColumnsRenamed({"vec_id": "id_b", "v": "vb"}), "id_b", "left")
    )
    cos = F.round(sim.cosine(F.col("va"), F.col("vb")), 6)
    return joined.select(
        F.lit("audio_fp").alias("stage"), "id_a", "id_b",
        F.round(F.lit(1.0) - F.col("hamming") / F.lit(64.0), 6).alias("jaccard"),
        cos.alias("cosine"),
        (cos >= 0.2).cast("int").alias("agree"),
    )


def video_fp_stage(spark: SparkSession, sf_dir: str,
                   pairs: DataFrame | None = None) -> DataFrame:
    """Video-CONTENT near-dup pairs via per-frame DCT perceptual
    hashes of REALLY container-decoded frames (`operators/video.py`):
    per-frame token-grid rasters → real AVI/DIB encode → real strict
    parse + decode (idx1-verified chunk walk) → per-frame 64-bit
    pHash → ONE `phash_candidate_pairs` pass on composite
    (video·4 + frame) ids → temporal-offset voting to video grain
    (≥ 2 of 4 frames matching at the winning offset). Same schema
    conventions as ``image_phash_stage``: the ``jaccard`` slot
    carries the video score ``n_match / n_frames``, embedding cosine
    LEFT-joins on, ``agree`` is the ≥ 0.2 QA bit; ``pairs`` is the
    shared-crossing seam (a video-grain (id_a, id_b, score) frame)."""
    if pairs is None:
        docs = load_table(spark, sf_dir, "documents")
        # same internal group-table materialization as the image/audio
        # stages (video_pair_matches materialize=True — passes through
        # to phash_candidate_pairs and materializes the voting output)
        pairs = vd.video_pair_matches(vd.video_phash_signatures(
            docs, "doc_id", "text",
            parallelism=spark.sparkContext.defaultParallelism,
        ), materialize=True)
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id",
                   F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    joined = (
        pairs
        .join(v.withColumnsRenamed({"vec_id": "id_a", "v": "va"}), "id_a", "left")
        .join(v.withColumnsRenamed({"vec_id": "id_b", "v": "vb"}), "id_b", "left")
    )
    cos = F.round(sim.cosine(F.col("va"), F.col("vb")), 6)
    return joined.select(
        F.lit("video_fp").alias("stage"), "id_a", "id_b",
        F.col("score").alias("jaccard"),
        cos.alias("cosine"),
        (cos >= 0.2).cast("int").alias("agree"),
    )


def lsh_cross_modal(spark: SparkSession, sf_dir: str,
                    include_image_stage: bool = True,
                    include_audio_stage: bool = True,
                    include_video_stage: bool = True) -> DataFrame:
    """MinHash-LSH near-dup candidates (τ=0.5) plus the cross-modal
    agreement pass (τ=0.3 candidates scored by embedding cosine),
    tagged by stage — the candidate stage carries null cosine/agree.

    Round 9 (semver 3): + the ``image_phash`` stage — image-content
    near-dup pairs from DCT perceptual hashes of REALLY-decoded PNG
    pixels — and the ``audio_fp`` stage — audio-content near-dup
    pairs from spectral fingerprints of REALLY-decoded WAV samples —
    both cross-checked against embedding cosine (see
    ``image_phash_stage`` / ``audio_fp_stage``). All content flags
    False is the r8-equivalent plan for the bench twin.

    Round 10 (semver 4): + the ``video_fp`` stage — video-content
    near-dup pairs from per-frame pHashes of REALLY
    container-decoded AVI/DIB frames, lifted to video grain by
    temporal-offset voting (see ``video_fp_stage``).
    ``include_video_stage=False`` is the r9-equivalent twin.

    The LSH threshold only gates the final verified-Jaccard filter, so
    ONE candidate pass at τ=0.3 feeds both stages (τ=0.5 is a filter of
    it). r16: that sharing is now a MATERIALIZED candidate frame
    (eager localCheckpoint) instead of a shared subplan — the r15 plan
    showed ZERO ReusedExchange nodes (the pushed-down τ=0.5 filter
    de-canonicalizes the second branch), so the whole
    shingle→signature→band→verify pipeline was statically duplicated
    and EXECUTED TWICE per run; the pair frame is (id, id, double),
    trivially resident at any scale.

    r16 also OVERLAPS the independent builder-time jobs (guide §2.6:
    concurrent jobs back-fill each other's stragglers): the text-LSH
    candidate pass runs concurrently with the fused codec crossing,
    and the three modality pair builds (independent given the fused
    signatures) run concurrently with each other. Results are
    byte-identical — the same frames are materialized, just not
    serially.

    Round 3: runs on the engine-portable md5 minhash family
    (``lsh_candidate_pairs_portable``) so the ENTIRE pipeline —
    signatures, banding, bucket expansion, exact-Jaccard verification,
    cosine scoring — hash-checks against the DuckDB oracle below
    (round 2 it was rows-only; the plan shape is unchanged)."""
    from concurrent.futures import ThreadPoolExecutor

    docs = load_table(spark, sf_dir, "documents")

    def _lsh_pairs() -> DataFrame:
        # materialize=True: the operator materializes its shared
        # signature table (3 internal consumers), materializes the
        # returned pair frame, and releases the internal table
        spark.sparkContext.setJobDescription("lsh_cross_modal: text LSH pass")
        return dd.lsh_candidate_pairs_portable(
            docs, "doc_id", "text", num_hashes=32, bands=8,
            rows_per_band=4, jaccard_threshold=0.3, materialize=True,
        )

    def _out_from(pairs: DataFrame) -> DataFrame:
        cand = pairs.filter(F.col("jaccard") >= 0.5).select(
            F.lit("candidates").alias("stage"), "id_a", "id_b", "jaccard",
            F.lit(None).cast("double").alias("cosine"),
            F.lit(None).cast("int").alias("agree"),
        )
        cm = cross_modal_dedup(spark, sf_dir, pairs=pairs).select(
            F.lit("cross_modal").alias("stage"), "id_a", "id_b", "jaccard",
            "cosine", "agree",
        )
        return cand.unionByName(cm)

    if include_image_stage and include_audio_stage:
        # all included modalities read the same (id, text) rows — fuse
        # the codec crossings into ONE (scan + repartition + Arrow
        # round trip + checkpoint paid once), slice back to
        # per-modality signatures, and hand the verified pair frames
        # to the stages. r10: the video frames ride the same crossing
        # as 16 vf{f}b{k} columns, exploded back to frame grain
        # JVM-side before the banded pass.
        def _modality_pairs():
            spark.sparkContext.setJobDescription(
                "lsh_cross_modal: fused codec crossing")
            fused = afp.fused_multimodal_signatures(
                docs, "doc_id", "text",
                parallelism=spark.sparkContext.defaultParallelism,
                include_video=include_video_stage,
            ).localCheckpoint(eager=True)
            done = []
            try:
                isig = fused.select(
                    "id",
                    *[F.col(f"ib{k}").alias(f"b{k}") for k in range(4)])
                asig = fused.select(
                    "id",
                    *[F.col(f"ab{k}").alias(f"b{k}") for k in range(4)])
                builds = [
                    lambda: ph.phash_candidate_pairs(
                        isig, materialize=True),
                    lambda: ph.phash_candidate_pairs(
                        asig, max_hamming=afp.DEFAULT_MAX_HAMMING,
                        materialize=True),
                ]
                if include_video_stage:
                    vsig = fused.select(
                        "id",
                        F.explode(F.array(*[
                            F.struct(
                                F.lit(f).alias("frame"),
                                *[F.col(f"vf{f}b{k}").alias(f"b{k}")
                                  for k in range(4)])
                            for f in range(vd.N_FRAMES)
                        ])).alias("s"),
                    ).select(
                        "id", "s.frame",
                        *[F.col(f"s.b{k}").alias(f"b{k}") for k in range(4)])
                    builds.append(lambda: vd.video_pair_matches(
                        vsig, materialize=True))
                with ThreadPoolExecutor(len(builds)) as ex:
                    futs = [ex.submit(b) for b in builds]
                    # collect every outcome before raising, so a
                    # failed sibling can't leak the materialized ones
                    results, errs = [], []
                    for f in futs:
                        try:
                            results.append(f.result())
                        except BaseException as e:  # noqa: BLE001
                            errs.append(e)
                    done = list(results)
                    if errs:
                        raise errs[0]
            except BaseException:
                for frame in done:
                    release_local_checkpoint(frame)
                raise
            finally:
                release_local_checkpoint(fused)
            if include_video_stage:
                return results[0], results[1], results[2]
            return results[0], results[1], None

        with ThreadPoolExecutor(2) as ex:
            f_lsh = ex.submit(_lsh_pairs)
            f_mm = ex.submit(_modality_pairs)
            lsh_err = mm_err = None
            try:
                pairs = f_lsh.result()
            except BaseException as e:  # noqa: BLE001
                lsh_err = e
            try:
                ipairs, apairs, vpairs = f_mm.result()
            except BaseException as e:  # noqa: BLE001
                mm_err = e
            if lsh_err is not None or mm_err is not None:
                if lsh_err is None:
                    release_local_checkpoint(pairs)
                if mm_err is None:
                    for frame in (ipairs, apairs, vpairs):
                        if frame is not None:
                            release_local_checkpoint(frame)
                raise lsh_err if lsh_err is not None else mm_err
        out = _out_from(pairs)
        out = out.unionByName(image_phash_stage(spark, sf_dir, pairs=ipairs))
        out = out.unionByName(audio_fp_stage(spark, sf_dir, pairs=apairs))
        if include_video_stage:
            out = out.unionByName(
                video_fp_stage(spark, sf_dir, pairs=vpairs))
        return out
    out = _out_from(_lsh_pairs())
    if include_image_stage:
        out = out.unionByName(image_phash_stage(spark, sf_dir))
    elif include_audio_stage:
        out = out.unionByName(audio_fp_stage(spark, sf_dir))
    if include_video_stage:
        out = out.unionByName(video_fp_stage(spark, sf_dir))
    return out


def lsh_cross_modal_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only twin of ``lsh_cross_modal`` on the PRODUCTION hash
    family (xxhash64 shingles + murmur3 minhash permutations,
    ``lsh_candidate_pairs``) instead of the md5-portable family the
    oracle-checked registry entry runs. Identical plan shape and
    parameters; only the per-shingle hash cost differs, so timing both
    separates "cost of the algorithm" from "cost of oracle
    portability". Not registered: md5 can't be beaten for
    DuckDB-checkability, xxhash64 can't be reproduced there.

    r16: the shared candidate pass is materialized (eager
    localCheckpoint) exactly like the headline entry, so the twin
    keeps pricing ONLY the hash-family delta."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=32,
                                   bands=8, rows_per_band=4,
                                   jaccard_threshold=0.3,
                                   materialize=True)
    cand = pairs.filter(F.col("jaccard") >= 0.5).select(
        F.lit("candidates").alias("stage"), "id_a", "id_b", "jaccard",
        F.lit(None).cast("double").alias("cosine"),
        F.lit(None).cast("int").alias("agree"),
    )
    cm = cross_modal_dedup(spark, sf_dir, pairs=pairs).select(
        F.lit("cross_modal").alias("stage"), "id_a", "id_b", "jaccard",
        "cosine", "agree",
    )
    return cand.unionByName(cm)


def _lsh_cross_modal_oracle(
    num_hashes: int = 32, bands: int = 8, rows_per_band: int = 4,
    tau_all: float = 0.3, tau_cand: float = 0.5, max_bucket: int = 10_000,
    shingle_n: int = 3,
) -> str:
    """SQL twin of ``lsh_cross_modal``: the same md5-prefix shingle
    integers, the same (a_i·x + b_i·y + i) mod P minhash family
    (coefficients injected from ``dedup.lsh_hash_coeffs`` — one source
    of truth), the same banded buckets with the hot-bucket cap, exact
    Jaccard over distinct g1 ids, and cosine over the embeddings.

    Round 9: + the ``image_phash`` stage re-derived END-TO-END in SQL
    — the token-histogram pixels from the same md5-prefix integers,
    the 2×2 block sums, the fixed-point DCT against the SAME
    integerized basis the Spark side uses (``phash.dct_basis_int()``
    injected as a VALUES table — one source of truth), the lower-
    median threshold as a k-th order statistic, the 4×16-bit bands,
    the capped band join, and exact Hamming via bit_count(xor). The
    one thing SQL cannot re-derive is the PNG encode→decode round
    trip in the middle of the Spark plan; that step is pixel-identity
    by construction (lossless codec) and is pinned by the round-trip
    pytest (`tests/test_phash.py`) — the oracle checks the math on
    the same pixels the decoder reproduced.

    Round 10: + the ``video_fp`` stage — the same pixel/DCT/band
    pipeline per FRAME at composite ``fid = doc_id·4 + frame`` ids
    (token i -> frame (i-1) % 4), fid-grain banded candidates and
    Hamming, then temporal-offset voting (most matching frames; ties
    to smallest |offset|, then offset) lifted to video grain. The
    AVI/DIB container round trip is the pixel-identity step here,
    pinned by `tests/test_video.py`."""
    p = dd._LSH_P
    mins = ",\n         ".join(
        f"min((({a} * (g1 % {p})) % {p} + ({b} * (g2 % {p})) % {p} + {i}) % {p})"
        f" AS h{i}"
        for i, (a, b) in enumerate(dd.lsh_hash_coeffs(num_hashes))
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, concat_ws('|', "
        + ", ".join(f"h{b * rows_per_band + j}" for j in range(rows_per_band))
        + ") AS sig FROM mh"
        for b in range(bands)
    )
    gram = " || ' ' || ".join(f"toks[i + {j}]" if j else "toks[i]"
                              for j in range(shingle_n))
    cos_rows = ",".join(
        f"({u},{x},{c})"
        for u, row in enumerate(ph.dct_basis_int()) for x, c in enumerate(row)
    )
    n_cells = ph.GRID * ph.GRID
    wave_rows = ",".join(
        f"({i},{v})" for i, v in enumerate(afp.wave_table_int()))
    afp_cos, afp_sin = afp.dft_basis_int()
    acq_rows = ",".join(f"({b},{t},{v})" for b, row in enumerate(afp_cos)
                        for t, v in enumerate(row))
    asq_rows = ",".join(f"({b},{t},{v})" for b, row in enumerate(afp_sin)
                        for t, v in enumerate(row))
    return f"""
WITH cosq(u, x, c) AS (VALUES {cos_rows}),
wv(i, v) AS (VALUES {wave_rows}),
acq(b, t, v) AS (VALUES {acq_rows}),
asq(b, t, v) AS (VALUES {asq_rows}),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, len(toks) - {shingle_n - 2}),
             i -> {gram}))) AS gram
  FROM t WHERE len(toks) >= {shingle_n}
),
gh AS (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 15))::BIGINT AS g1,
         ('0x' || substr(md5(gram), 17, 15))::BIGINT AS g2
  FROM g
),
mh AS (
  SELECT doc_id,
         {mins}
  FROM gh GROUP BY doc_id
),
bands AS (
{band_rows}
),
bc AS (SELECT band, sig, count(*) AS n FROM bands GROUP BY 1, 2),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
  JOIN bc ON bc.band = x.band AND bc.sig = x.sig
  WHERE bc.n <= {max_bucket}
),
sizes AS (SELECT doc_id, count(DISTINCT g1) AS n_sh FROM gh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(DISTINCT a.g1) AS n_common
  FROM cand c
  JOIN gh a ON a.doc_id = c.id_a
  JOIN gh b ON b.doc_id = c.id_b AND b.g1 = a.g1
  GROUP BY 1, 2
),
verified AS (
  SELECT c.id_a, c.id_b,
         round(coalesce(n_common, 0)::DOUBLE
               / (sa.n_sh + sb.n_sh - coalesce(n_common, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN common USING (id_a, id_b)
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cm AS (
  SELECT v2.id_a, v2.id_b, v2.jaccard,
         round(list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v))
                  * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
  FROM verified v2
  JOIN e ea ON ea.vec_id = v2.id_a
  JOIN e eb ON eb.vec_id = v2.id_b
  WHERE v2.jaccard >= {tau_all}
),
ptok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
pcell AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT % {n_cells} AS cell
  FROM ptok
),
pcnt AS (SELECT doc_id, cell, count(*) AS cnt FROM pcell GROUP BY 1, 2),
pgrid AS (
  SELECT d.doc_id, g.cell, coalesce(pc.cnt, 0) AS cnt
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range(0, {n_cells})) AS cell) g
  LEFT JOIN pcnt pc ON pc.doc_id = d.doc_id AND pc.cell = g.cell
),
ppix AS (
  SELECT doc_id, least(255, cnt * {ph.PIXEL_GAIN}) AS p,
         (cell // {ph.GRID}) // 2 AS by, (cell % {ph.GRID}) // 2 AS bx
  FROM pgrid
),
pblk AS (SELECT doc_id, by, bx, sum(p)::BIGINT AS s FROM ppix GROUP BY 1, 2, 3),
pdct AS (
  SELECT b.doc_id, cu.u AS u, cv.u AS v, sum(b.s * cu.c * cv.c)::BIGINT AS f
  FROM pblk b JOIN cosq cu ON cu.x = b.by JOIN cosq cv ON cv.x = b.bx
  GROUP BY 1, 2, 3
),
pmed AS (
  SELECT doc_id, list_sort(list(f))[{ph.N_BITS // 2}] AS med
  FROM pdct GROUP BY 1
),
pbit AS (
  SELECT d.doc_id, (d.u * {ph.DCT_N} + d.v) AS i, (d.f > m.med)::BIGINT AS bit
  FROM pdct d JOIN pmed m ON m.doc_id = d.doc_id
),
psig AS (
  SELECT doc_id, (i // {ph.BAND_BITS}) AS band,
         sum(bit << (i % {ph.BAND_BITS}))::BIGINT AS val
  FROM pbit GROUP BY 1, 2
),
pbc AS (SELECT band, val, count(*) AS n FROM psig GROUP BY 1, 2),
pcand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM psig x
  JOIN psig y ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id
  JOIN pbc ON pbc.band = x.band AND pbc.val = x.val
  WHERE pbc.n <= {ph.DEFAULT_MAX_BUCKET}
),
pham AS (
  SELECT c.id_a, c.id_b, sum(bit_count(xor(sa.val, sb.val)))::BIGINT AS ham
  FROM pcand c
  JOIN psig sa ON sa.doc_id = c.id_a
  JOIN psig sb ON sb.doc_id = c.id_b AND sb.band = sa.band
  GROUP BY 1, 2
),
pimg AS (
  SELECT h.id_a, h.id_b, round(1 - h.ham / 64.0, 6) AS jaccard,
         round(list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v))
                  * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
  FROM pham h
  LEFT JOIN e ea ON ea.vec_id = h.id_a
  LEFT JOIN e eb ON eb.vec_id = h.id_b
  WHERE h.ham <= {ph.DEFAULT_MAX_HAMMING}
),
atok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
afq AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {afp.N_FREQS} + 1 AS k,
         (('0x' || substr(md5(tok), 1, 15))::BIGINT // {afp.N_FREQS})
             % {afp.AM_PERIOD} AS phase
  FROM atok
),
tg AS (SELECT unnest(range(0, {afp.N_SAMPLES})) AS ts),
araw AS (
  SELECT f.doc_id, g.ts,
         sum(w.v * (1 + (g.ts // {afp.FRAME} + f.phase)
                        % {afp.AM_PERIOD}))::BIGINT AS s
  FROM afq f
  CROSS JOIN tg g
  JOIN wv w ON w.i = (f.k * g.ts) % 64
  GROUP BY 1, 2
),
asamp AS (
  SELECT doc_id, ts, greatest(-32768, least(32767, s)) AS s FROM araw
),
aeng AS (
  SELECT a.doc_id, a.ts // {afp.FRAME} AS f, acq.b,
         sum(a.s * acq.v)::BIGINT AS re, sum(a.s * asq.v)::BIGINT AS im
  FROM asamp a
  JOIN acq ON acq.t = a.ts % {afp.FRAME}
  JOIN asq ON asq.b = acq.b AND asq.t = acq.t
  GROUP BY 1, 2, 3
),
ae AS (SELECT doc_id, f, b, re * re + im * im AS en FROM aeng),
ad AS (
  SELECT x.doc_id, x.f, x.b, x.en - y.en AS d
  FROM ae x
  JOIN ae y ON y.doc_id = x.doc_id AND y.f = x.f
           AND y.b = (x.b + 1) % {afp.N_BINS}
),
abit AS (
  SELECT c.doc_id, (c.f - 1) * {afp.N_BINS} + c.b AS i,
         (c.d - p.d > 0)::BIGINT AS bit
  FROM ad c
  JOIN ad p ON p.doc_id = c.doc_id AND p.f = c.f - 1 AND p.b = c.b
  WHERE c.f BETWEEN 1 AND 8
),
asig AS (
  SELECT doc_id, (i // {ph.BAND_BITS}) AS band,
         sum(bit << (i % {ph.BAND_BITS}))::BIGINT AS val
  FROM abit GROUP BY 1, 2
),
abc AS (SELECT band, val, count(*) AS n FROM asig GROUP BY 1, 2),
acand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM asig x
  JOIN asig y ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id
  JOIN abc ON abc.band = x.band AND abc.val = x.val
  WHERE abc.n <= {ph.DEFAULT_MAX_BUCKET}
),
aham AS (
  SELECT c.id_a, c.id_b, sum(bit_count(xor(sa.val, sb.val)))::BIGINT AS ham
  FROM acand c
  JOIN asig sa ON sa.doc_id = c.id_a
  JOIN asig sb ON sb.doc_id = c.id_b AND sb.band = sa.band
  GROUP BY 1, 2
),
aimg AS (
  SELECT h.id_a, h.id_b, round(1 - h.ham / 64.0, 6) AS jaccard,
         round(list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v))
                  * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
  FROM aham h
  LEFT JOIN e ea ON ea.vec_id = h.id_a
  LEFT JOIN e eb ON eb.vec_id = h.id_b
  WHERE h.ham <= {afp.DEFAULT_MAX_HAMMING}
),
-- video_fp (r10): per-frame token grids (token i -> frame (i-1) % nf
-- at COMPOSITE fid = doc_id*nf + frame), the image stage's pixel/
-- DCT/median/band pipeline at fid grain, fid-grain banded candidates,
-- exact Hamming, then temporal-offset voting to video grain. The
-- AVI/DIB container round trip in the Spark plan is pixel-identity
-- (pinned by tests/test_video.py) — the oracle checks the math on
-- the same rasters the parser reproduced.
vpos AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t
),
vtok AS (
  SELECT doc_id * {vd.N_FRAMES} + ((i - 1) % {vd.N_FRAMES}) AS fid,
         toks[i] AS tok
  FROM vpos
),
vcnt AS (
  SELECT fid,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {ph.GRID * ph.GRID}
           AS cell,
         count(*) AS cnt
  FROM vtok GROUP BY 1, 2
),
vfids AS (
  SELECT doc_id * {vd.N_FRAMES} + f AS fid
  FROM documents, (SELECT unnest(range(0, {vd.N_FRAMES})) AS f)
),
vgrid AS (
  SELECT v.fid, g.cell, coalesce(c.cnt, 0) AS cnt
  FROM vfids v
  CROSS JOIN (SELECT unnest(range(0, {ph.GRID * ph.GRID})) AS cell) g
  LEFT JOIN vcnt c ON c.fid = v.fid AND c.cell = g.cell
),
vpix AS (
  SELECT fid, least(255, cnt * {ph.PIXEL_GAIN}) AS p,
         (cell // {ph.GRID}) // 2 AS by, (cell % {ph.GRID}) // 2 AS bx
  FROM vgrid
),
vblk AS (SELECT fid, by, bx, sum(p)::BIGINT AS s FROM vpix GROUP BY 1, 2, 3),
vdct AS (
  SELECT b.fid, cu.u AS u, cv.u AS v, sum(b.s * cu.c * cv.c)::BIGINT AS f
  FROM vblk b JOIN cosq cu ON cu.x = b.by JOIN cosq cv ON cv.x = b.bx
  GROUP BY 1, 2, 3
),
vmed AS (
  SELECT fid, list_sort(list(f))[{ph.N_BITS // 2}] AS med
  FROM vdct GROUP BY 1
),
vbit AS (
  SELECT d.fid, (d.u * {ph.DCT_N} + d.v) AS i, (d.f > m.med)::BIGINT AS bit
  FROM vdct d JOIN vmed m ON m.fid = d.fid
),
vsig AS (
  SELECT fid, (i // {ph.BAND_BITS}) AS band,
         sum(bit << (i % {ph.BAND_BITS}))::BIGINT AS val
  FROM vbit GROUP BY 1, 2
),
vbc AS (SELECT band, val, count(*) AS n FROM vsig GROUP BY 1, 2),
vcand AS (
  SELECT DISTINCT x.fid AS fa, y.fid AS fb
  FROM vsig x
  JOIN vsig y ON x.band = y.band AND x.val = y.val AND x.fid < y.fid
  JOIN vbc ON vbc.band = x.band AND vbc.val = x.val
  WHERE vbc.n <= {ph.DEFAULT_MAX_BUCKET}
),
vham AS (
  SELECT c.fa, c.fb, sum(bit_count(xor(sa.val, sb.val)))::BIGINT AS ham
  FROM vcand c
  JOIN vsig sa ON sa.fid = c.fa
  JOIN vsig sb ON sb.fid = c.fb AND sb.band = sa.band
  GROUP BY 1, 2
),
vfm AS (
  SELECT fa // {vd.N_FRAMES} AS va, fb // {vd.N_FRAMES} AS vb,
         (fa % {vd.N_FRAMES}) - (fb % {vd.N_FRAMES}) AS off
  FROM vham
  WHERE ham <= {ph.DEFAULT_MAX_HAMMING}
    AND fa // {vd.N_FRAMES} != fb // {vd.N_FRAMES}
),
vvote AS (
  SELECT va, vb, off, count(*) AS n_match FROM vfm GROUP BY 1, 2, 3
),
vbest AS (
  SELECT va, vb, off, n_match,
         row_number() OVER (PARTITION BY va, vb
                            ORDER BY n_match DESC, abs(off), off) AS rn
  FROM vvote
),
vfin AS (
  SELECT b.va AS id_a, b.vb AS id_b,
         round(b.n_match / {vd.N_FRAMES}.0, 6) AS jaccard,
         round(list_dot_product(ea.v, eb.v)
               / (sqrt(list_dot_product(ea.v, ea.v))
                  * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
  FROM vbest b
  LEFT JOIN e ea ON ea.vec_id = b.va
  LEFT JOIN e eb ON eb.vec_id = b.vb
  WHERE b.rn = 1 AND b.n_match >= {vd.DEFAULT_MIN_FRAMES}
)
SELECT 'candidates' AS stage, id_a, id_b, jaccard,
       NULL::DOUBLE AS cosine, NULL::INT AS agree
FROM verified WHERE jaccard >= {tau_cand}
UNION ALL
SELECT 'cross_modal', id_a, id_b, jaccard, cosine,
       (cosine >= 0.2)::INT
FROM cm
UNION ALL
SELECT 'image_phash', id_a, id_b, jaccard, cosine,
       (cosine >= 0.2)::INT
FROM pimg
UNION ALL
SELECT 'audio_fp', id_a, id_b, jaccard, cosine,
       (cosine >= 0.2)::INT
FROM aimg
UNION ALL
SELECT 'video_fp', id_a, id_b, jaccard, cosine,
       (cosine >= 0.2)::INT
FROM vfin
"""


LSH_CROSS_MODAL_ORACLE = _lsh_cross_modal_oracle()


QUERIES = {
    "ns_dedup_exact": Query(dedup_exact, DEDUP_EXACT_ORACLE),
    "ns_split_train_val": Query(split_train_val, SPLIT_ORACLE),
    "ns_dedup_embedding_cosine": Query(embedding_neardup, EMBEDDING_NEARDUP_ORACLE),
    "ns_kmeans_clusters": Query(kmeans_clusters, KMEANS_ORACLE),
    "ns_multimodal_meta": Query(multimodal_meta, MULTIMODAL_ORACLE),
    # ns_text_profile absorbs the former ns_fingerprint entry (same
    # scan, window count for the group size); ns_lang_quality absorbs
    # ns_lang_char_ngram (both lang-ID families in one projection) —
    # the builders fingerprint_q / lang_char_ngram remain for direct use
    "ns_text_profile": Query(text_profile, TEXT_PROFILE_ORACLE),
    "ns_lang_quality": Query(lang_quality, LANG_QUALITY_ORACLE),
    "ns_similarity_topk": Query(similarity_topk, SIMILARITY_ORACLE),
    "ns_ngram_jaccard": Query(ngram_jaccard, NGRAM_JACCARD_ORACLE),
    "ns_chunk_pack": Query(chunk_pack, CHUNK_PACK_ORACLE),
    "ns_similarity_ann": Query(similarity_ann, ANN_ORACLE),
    "ns_doc_signatures": Query(doc_signatures, DOC_SIGNATURES_ORACLE),
    "ns_dedup_lsh_cross_modal": Query(lsh_cross_modal, LSH_CROSS_MODAL_ORACLE),
}
