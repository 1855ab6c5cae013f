"""WordPiece subword-tokenizer training — the third published
vocabulary-learning family beside BPE (``operators/bpe.py``) and the
unigram LM (``operators/unigram.py``).

Public method (Schuster & Nakajima 2012, "Japanese and Korean Voice
Search"; the BERT/GNMT tokenizer — Wu et al. 2016 §4.1 describes the
selection rule; the de-facto open reference is the HuggingFace
`tokenizers` WordPiece trainer): like BPE, repeatedly merge an
adjacent symbol pair — but instead of the most FREQUENT pair, pick
the pair that maximizes the corpus unigram-LM likelihood gain,

    score(a, b) = count(ab) / (count(a) · count(b)),

i.e. frequent-together relative to frequent-apart. Non-initial
symbols carry the ``##`` continuation prefix and keep it through
merges (``merge('a', '##b') = 'ab'``, ``merge('##a', '##b') =
'##ab'``); inference segments unseen words greedily
longest-match-first against the final vocabulary
(``wordpiece_segment``), emitting ``[UNK]`` when stuck.

Spark-first shape — the ``train_bpe`` two-phase discipline exactly:
ONE corpus-scale word-frequency aggregation, then the merge loop over
the vocabulary-sized table (driver-side under ``driver_vocab_cap``,
fully distributed above it with one pair-count + one symbol-count
aggregation per merge, scalar-only driver traffic,
localCheckpoint-truncated generations released as superseded).

Cross-engine exactness: pair and symbol counts are exact int64s;
``score`` is the ONE division both engines compute on the same ints
(an IEEE double — bit-identical), ties broken (score DESC, a, b). The
denominator multiplies counts AS DOUBLES — two int64 counts can
overflow an int64 product at web scale, and the doubles are exact
anyway below 2^26 each (beyond that the score comparison tolerates
the shared rounding because both engines round identically). The
DuckDB oracle (``wordpiece_oracle_ctes``) RETRAINS every merge —
pair counts, symbol counts, the score argmax, the greedy
left-to-right fold with the overlap rule — and re-encodes every
document.

Reference parity: no reference implementation (charter extension —
SURVEY §2.2 tokenizer family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.caching import eager_checkpoint, release_local_checkpoint
from .bpe import WORD_RE, _trainable_words

CONT = "##"
UNK = "[UNK]"


def _init_syms_py(w: str) -> list[str]:
    return [w[0]] + [CONT + ch for ch in w[1:]]


def _merged_sym(a: str, b: str) -> str:
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def _merge_fold_py(syms: list, a: str, b: str) -> list:
    """Greedy left-to-right single-pair merge with the BPE overlap
    rule, producing the prefix-preserving WordPiece merged symbol."""
    out: list = []
    ab = _merged_sym(a, b)
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = ab
        else:
            out.append(s)
    return out


def _merge_fold(syms_col, a: str, b: str):
    """Column twin of ``_merge_fold_py`` (the ``bpe._merge_fold``
    fold shape with an explicit merged symbol)."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(_merged_sym(a, b))),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _best_pair_py(words: dict, counts: dict):
    pc: dict = {}
    sc: dict = {}
    for w, syms in words.items():
        c = counts[w]
        for s in syms:
            sc[s] = sc.get(s, 0) + c
        for i in range(len(syms) - 1):
            k = (syms[i], syms[i + 1])
            pc[k] = pc.get(k, 0) + c
    if not pc:
        return None
    best = min(
        pc.items(),
        key=lambda kv: (
            -(kv[1] / (float(sc[kv[0][0]]) * float(sc[kv[0][1]]))),
            kv[0],
        ),
    )
    return best[0][0], best[0][1], best[1]


def _train_local(word_counts: list, num_merges: int):
    words = {w: _init_syms_py(w) for w, _ in word_counts}
    counts = dict(word_counts)
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        got = _best_pair_py(words, counts)
        if got is None:
            raise ValueError(
                f"corpus exhausted adjacent pairs after {len(merges)} "
                f"merges; num_merges={num_merges} is too large for "
                f"this corpus"
            )
        a, b, c = got
        merges.append((a, b, int(c)))
        words = {w: _merge_fold_py(s, a, b) for w, s in words.items()}
    return [(w, counts[w], s) for w, s in words.items()], merges


def train_wordpiece(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 6,
    driver_vocab_cap: int = 1_000_000,
    word_counts: list[tuple[str, int]] | None = None,
):
    """Train ``num_merges`` WordPiece merges; returns ``(words,
    merges)`` shaped exactly like ``bpe.train_bpe`` (``words`` =
    (w, cnt, syms) with ##-prefixed continuation symbols).

    Driver fast path under the vocab cap (identical algorithm,
    equivalence pytest-pinned); above it the distributed loop runs
    one pair-count job and one symbol-count job per merge — both
    vocabulary-sized, map-side combinable, scalar-only driver
    traffic — with the BPE generation-checkpoint release discipline
    (incl. the error path).

    ``word_counts`` (r16): a pre-collected ``bpe.collect_word_counts``
    list — WordPiece trains on EXACTLY the same (word, count) table as
    BPE, so a caller running both collects it once and passes it to
    each trainer (identical results by construction)."""
    from .bpe import collect_word_counts

    if word_counts is None and driver_vocab_cap > 0:
        word_counts = collect_word_counts(docs, text_col, driver_vocab_cap)
    if word_counts is not None:
        rows, merges = _train_local(word_counts, num_merges)
        words = docs.sparkSession.createDataFrame(
            rows, "w string, cnt long, syms array<string>"
        )
        return words, merges
    counts_df = (
        _trainable_words(docs, text_col)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))
    init = F.transform(
        chars,
        lambda ch, i: F.when(i == 0, ch).otherwise(F.concat(F.lit(CONT), ch)),
    )
    # stat-less generation leaves, lazy materialization — see the BPE
    # loop's note (r13 verdict #5: per-merge origin-stats inheritance
    # would compound size estimates across thousands of generations)
    words = eager_checkpoint(
        counts_df.withColumn("syms", init), eager=False)
    merges: list[tuple[str, str, int]] = []
    prev: DataFrame | None = None
    try:
        for it in range(num_merges):
            n1 = F.size("syms") - 1
            pairs = (
                words.select(
                    "cnt",
                    F.explode(
                        F.when(
                            n1 < 1,
                            F.array().cast(
                                "array<struct<a:string,b:string>>"
                            ),
                        ).otherwise(
                            F.zip_with(
                                F.slice("syms", 1, n1),
                                F.slice("syms", 2, n1),
                                lambda x, y: F.struct(
                                    x.alias("a"), y.alias("b")
                                ),
                            )
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("c"))
            )
            syms = (
                words.select("cnt", F.explode("syms").alias("s"))
                .groupBy("s")
                .agg(F.sum("cnt").alias("sc"))
            )
            best = (
                pairs
                .join(syms.withColumnsRenamed({"s": "a", "sc": "ca"}), "a")
                .join(syms.withColumnsRenamed({"s": "b", "sc": "cb"}), "b")
                .select(
                    "a", "b", "c",
                    (F.col("c") / (F.col("ca").cast("double")
                                   * F.col("cb").cast("double")))
                    .alias("score"),
                )
                .orderBy(F.col("score").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                raise ValueError(
                    f"corpus exhausted adjacent pairs after "
                    f"{len(merges)} merges; num_merges={num_merges} "
                    f"is too large for this corpus"
                )
            a, b, c = best[0]["a"], best[0]["b"], best[0]["c"]
            merges.append((a, b, int(c)))
            if prev is not None:
                release_local_checkpoint(prev)
            prev = words
            words = eager_checkpoint(words.select(
                "w", "cnt", _merge_fold(F.col("syms"), a, b).alias("syms")
            ), eager=it == num_merges - 1)
    except BaseException:
        for frame in (prev, words):
            if frame is not None:
                release_local_checkpoint(frame)
        raise
    if prev is not None:
        release_local_checkpoint(prev)
    return words, merges


def encode_token_counts(
    docs: DataFrame,
    trained_words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, wp_n_tokens): per-document WordPiece token count via a
    broadcast join of the trained (w -> syms) table — the
    ``bpe.encode_token_counts`` shape."""
    occ = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w").rlike(WORD_RE))
    enc = occ.join(
        F.broadcast(trained_words.select("w", F.size("syms").alias("__n"))),
        "w",
    )
    return enc.groupBy(id_col).agg(
        F.sum("__n").cast("long").alias("wp_n_tokens")
    )


def merges_tag(merges: list[tuple[str, str, int]]) -> str:
    """The learned merge sequence as a constant column value, so the
    oracle checks training symbol-for-symbol."""
    return ",".join(f"{a}+{b}" for a, b, _ in merges)


def wordpiece_segment(word: str, vocab: set[str]) -> list[str]:
    """Published WordPiece INFERENCE (the BERT tokenizer's greedy
    longest-match-first): repeatedly take the longest vocabulary
    piece that prefixes the remainder (##-prefixed after the first),
    [UNK] for the whole word when stuck."""
    out: list[str] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = CONT + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        pos = end
    return out


def wordpiece_oracle_ctes(num_merges: int = 6, src: str = "documents",
                          text_col: str = "text") -> str:
    """DuckDB CTE block that RETRAINS the same ``num_merges``
    WordPiece merges and re-encodes every document — the
    ``bpe_oracle_ctes`` structure with a per-stage symbol-count CTE
    and the likelihood-ratio argmax. Symbol sequences are strings
    shaped ``' a ##b ##c '``; the greedy merge reuses the recursive
    (done, todo) scan with the ##-stripped merged symbol. Emits
    wp_w0..wp_wK, wp_b1..wp_bK, wp_merge_tag, wp_enc. Must be
    spliced into a WITH RECURSIVE."""
    parts = [f"""
wp_tw AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(lower({text_col}), ' ')) AS w
    FROM {src}
  ) WHERE regexp_matches(w, '^[a-z]+$')
),
wp_w0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         ' ' || substr(w, 1, 1) || ' '
             || regexp_replace(substr(w, 2), '(.)', '##\\1 ', 'g') AS seq
  FROM wp_tw GROUP BY w
)"""]
    for i in range(1, num_merges + 1):
        p = i - 1
        parts.append(f"""
wp_p{i} AS MATERIALIZED (
  SELECT string_split(pr, ' ')[1] AS a, string_split(pr, ' ')[2] AS b,
         sum(cnt) AS c
  FROM (
    SELECT cnt,
           unnest([l[j] || ' ' || l[j + 1] for j in range(1, len(l))]) AS pr
    FROM (SELECT cnt, string_split(trim(seq), ' ') AS l FROM wp_w{p})
  ) GROUP BY a, b
),
wp_s{i} AS MATERIALIZED (
  SELECT s, sum(cnt) AS sc FROM (
    SELECT cnt, unnest(string_split(trim(seq), ' ')) AS s FROM wp_w{p}
  ) GROUP BY s
),
wp_b{i} AS MATERIALIZED (
  SELECT p.a, p.b, p.c
  FROM wp_p{i} p
  JOIN wp_s{i} sa ON sa.s = p.a
  JOIN wp_s{i} sb ON sb.s = p.b
  ORDER BY p.c / (sa.sc::DOUBLE * sb.sc::DOUBLE) DESC, p.a, p.b
  LIMIT 1
),
wp_m{i} AS (
  SELECT w, cnt, '' AS done, seq AS todo FROM wp_w{p}
  UNION ALL
  SELECT m.w, m.cnt,
         m.done || substr(m.todo, 1, strpos(m.todo, x.pat) - 1)
                || ' ' || x.mrg,
         substr(m.todo, strpos(m.todo, x.pat) + length(x.pat) - 1)
  FROM wp_m{i} m,
       (SELECT ' ' || a || ' ' || b || ' ' AS pat,
               a || CASE WHEN b LIKE '##%' THEN substr(b, 3) ELSE b END
                 AS mrg
        FROM wp_b{i}) x
  WHERE strpos(m.todo, x.pat) > 0
),
wp_w{i} AS MATERIALIZED (
  SELECT w, cnt, done || todo AS seq FROM wp_m{i}
  WHERE strpos(todo, coalesce(
          (SELECT ' ' || a || ' ' || b || ' ' FROM wp_b{i}), chr(1))) = 0
)""")
    tag = " || ',' || ".join(
        f"(SELECT a || '+' || b FROM wp_b{i})"
        for i in range(1, num_merges + 1)
    )
    parts.append(f"""
wp_merge_tag AS (SELECT {tag} AS tag),
wp_enc AS MATERIALIZED (
  SELECT t.doc_id,
         CAST(sum(len(string_split(trim(v.seq), ' '))) AS BIGINT)
           AS wp_n_tokens
  FROM wp_tw t JOIN wp_w{num_merges} v USING (w)
  GROUP BY t.doc_id
)""")
    return ",".join(parts)
