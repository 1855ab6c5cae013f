"""Audio spectral-fingerprint dedup (`operators/audiofp.py`).

Mirrors `test_phash.py`'s claim structure for the audio modality:
WAV round-trip identity (the oracle's license to skip the codec),
independent-loop + DuckDB re-derivations of the integer math,
similarity preservation with the calibrated threshold, and the shared
banded-Hamming candidate join finding a planted pair.
"""
from __future__ import annotations

import struct

import duckdb

from training_datawarehouse_spark.operators import audiofp as afp
from training_datawarehouse_spark.operators import phash as ph

BASE = ("the quick brown fox jumps over the lazy dog while the spark "
        "catalyst optimizer prunes columns and pushes filters into the "
        "parquet scan before the shuffle boundary every single time "
        "because declarative plans let the engine choose the strategy")
NEAR = BASE.replace("lazy dog", "lazy cat").replace("every single", "each")
FAR = ("completely unrelated content about sourdough hydration ratios "
       "and the maillard reaction temperature curve during the bake "
       "with steam injected for the first twenty minutes of oven time "
       "then vented to crisp the crust before the final cooling rack")


def _ref_fingerprint(samples: list[int]) -> list[int]:
    """Independent pure-Python loop reimplementation (no numpy, no
    shared code beyond the basis tables — the deliberate single
    source of truth)."""
    cos, sin = afp.dft_basis_int()
    e = [[0] * afp.N_BINS for _ in range(afp.N_FRAMES)]
    for f in range(afp.N_FRAMES):
        for b in range(afp.N_BINS):
            re = sum(samples[afp.FRAME * f + t] * cos[b][t]
                     for t in range(afp.FRAME))
            im = sum(samples[afp.FRAME * f + t] * sin[b][t]
                     for t in range(afp.FRAME))
            e[f][b] = re * re + im * im
    bands = [0] * afp.N_BANDS
    for f in range(1, 9):
        for b in range(afp.N_BINS):
            d1 = e[f][b] - e[f][(b + 1) % afp.N_BINS]
            d0 = e[f - 1][b] - e[f - 1][(b + 1) % afp.N_BINS]
            i = (f - 1) * afp.N_BINS + b
            if d1 - d0 > 0:
                bands[i // 16] |= 1 << (i % 16)
    return bands


def _hamming(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_wav_round_trip_is_sample_identity():
    """16-bit PCM WAV is lossless: decode must reproduce the exact
    samples — the oracle's license to skip the codec step."""
    samples = afp.token_wave_samples(BASE)
    wav = afp.encode_wav(samples)
    pcm = afp.decode_wav(wav)["pcm"]
    assert list(struct.unpack(f"<{afp.N_SAMPLES}h", pcm)) == samples


def test_synthesis_is_deterministic_and_clamped():
    s1, s2 = afp.token_wave_samples(BASE), afp.token_wave_samples(BASE)
    assert s1 == s2
    assert all(-32768 <= v <= 32767 for v in s1)
    assert any(v != 0 for v in s1)


def test_fingerprint_matches_independent_reference():
    for text in (BASE, NEAR, FAR, "", "one", "a b  c"):
        s = afp.token_wave_samples(text)
        assert afp.fingerprint_bands(s) == _ref_fingerprint(s)


def test_all_four_bands_carry_signal():
    """The AM period (7) is coprime with the carrier's 4-frame period
    precisely so frames don't repeat — without it bands 0/2 and 1/3
    collapse to copies and the fingerprint has 32 effective bits."""
    seen = set()
    for text in (BASE, NEAR, FAR):
        b = afp.fingerprint_bands(afp.token_wave_samples(text))
        assert len(set(b)) == afp.N_BANDS, b  # all bands distinct
        seen.add(tuple(b))
    assert len(seen) == 3


def test_fingerprint_matches_duckdb_rederivation():
    """The oracle's SQL block (token carriers → AM mixture → clamp →
    frame DFT energies → delta-derivative signs → bands) reproduces
    the Python fingerprint bit-for-bit."""
    texts = {1: BASE, 2: NEAR, 3: FAR}
    wave_rows = ",".join(f"({i},{v})"
                         for i, v in enumerate(afp.wave_table_int()))
    cos, sin = afp.dft_basis_int()
    acq = ",".join(f"({b},{t},{v})" for b, row in enumerate(cos)
                   for t, v in enumerate(row))
    asq = ",".join(f"({b},{t},{v})" for b, row in enumerate(sin)
                   for t, v in enumerate(row))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({k}, '{v}')" for k, v in texts.items())
        + ") t(doc_id, text)")
    rows = con.execute(f"""
WITH wv(i, v) AS (VALUES {wave_rows}),
acq(b, t, v) AS (VALUES {acq}),
asq(b, t, v) AS (VALUES {asq}),
atok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
afq AS (SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT
                   % {afp.N_FREQS} + 1 AS k,
               (('0x' || substr(md5(tok), 1, 15))::BIGINT // {afp.N_FREQS})
                   % {afp.AM_PERIOD} AS phase
        FROM atok),
tg AS (SELECT unnest(range(0, {afp.N_SAMPLES})) AS ts),
araw AS (SELECT f.doc_id, g.ts,
                sum(w.v * (1 + (g.ts // {afp.FRAME} + f.phase)
                               % {afp.AM_PERIOD}))::BIGINT AS s
         FROM afq f CROSS JOIN tg g JOIN wv w ON w.i = (f.k * g.ts) % 64
         GROUP BY 1, 2),
asamp AS (SELECT doc_id, ts, greatest(-32768, least(32767, s)) AS s
          FROM araw),
aeng AS (SELECT a.doc_id, a.ts // {afp.FRAME} AS f, acq.b,
                sum(a.s * acq.v)::BIGINT AS re,
                sum(a.s * asq.v)::BIGINT AS im
         FROM asamp a
         JOIN acq ON acq.t = a.ts % {afp.FRAME}
         JOIN asq ON asq.b = acq.b AND asq.t = acq.t
         GROUP BY 1, 2, 3),
ae AS (SELECT doc_id, f, b, re * re + im * im AS en FROM aeng),
ad AS (SELECT x.doc_id, x.f, x.b, x.en - y.en AS d
       FROM ae x JOIN ae y ON y.doc_id = x.doc_id AND y.f = x.f
                          AND y.b = (x.b + 1) % {afp.N_BINS}),
abit AS (SELECT c.doc_id, (c.f - 1) * {afp.N_BINS} + c.b AS i,
                (c.d - p.d > 0)::BIGINT AS bit
         FROM ad c JOIN ad p ON p.doc_id = c.doc_id AND p.f = c.f - 1
                            AND p.b = c.b
         WHERE c.f BETWEEN 1 AND 8),
asig AS (SELECT doc_id, (i // 16) AS band,
                sum(bit << (i % 16))::BIGINT AS val
         FROM abit GROUP BY 1, 2)
SELECT doc_id, band, val FROM asig ORDER BY doc_id, band
""").fetchall()
    got = {}
    for did, band, val in rows:
        got.setdefault(did, [0] * afp.N_BANDS)[band] = val
    for did, text in texts.items():
        assert got[did] == afp.fingerprint_bands(
            afp.token_wave_samples(text)), did


def test_similarity_preservation_and_threshold():
    fb = afp.fingerprint_bands(afp.token_wave_samples(BASE))
    fn = afp.fingerprint_bands(afp.token_wave_samples(NEAR))
    ff = afp.fingerprint_bands(afp.token_wave_samples(FAR))
    assert _hamming(fb, fn) <= afp.DEFAULT_MAX_HAMMING
    assert _hamming(fb, ff) > 2 * afp.DEFAULT_MAX_HAMMING


def test_fused_crossing_matches_separate_signatures(spark):
    """`fused_multimodal_signatures` (one Arrow crossing for both
    modalities) must slice back to byte-identical per-modality
    signatures — the parity that lets `lsh_cross_modal` pay one scan
    and one checkpoint instead of two."""
    import pyspark.sql.functions as F
    rows = [(1, BASE), (2, NEAR), (3, FAR), (4, ""), (5, "one token")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fused = afp.fused_multimodal_signatures(df, "doc_id", "text")
    isig = {r["id"]: [r[f"ib{k}"] for k in range(4)]
            for r in fused.collect()}
    asig = {r["id"]: [r[f"ab{k}"] for k in range(4)]
            for r in fused.collect()}
    for r in ph.image_phash_signatures(df, "doc_id", "text").collect():
        assert isig[r["id"]] == [r[f"b{k}"] for k in range(4)]
    for r in afp.audio_fingerprint_signatures(df, "doc_id", "text").collect():
        assert asig[r["id"]] == [r[f"b{k}"] for k in range(4)]
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1  # genuinely ONE crossing


def test_planted_near_dup_found_by_shared_banded_join(spark):
    """The audio signatures ride `phash.phash_candidate_pairs`
    unchanged — one banded-Hamming operator for both modalities."""
    decoys = [
        f"decoy document number {i} with tokens drawn from vocabulary "
        f"slice {i % 7} plus padding words alpha beta gamma delta "
        f"epsilon zeta eta theta iota kappa row{i}"
        for i in range(20)
    ]
    rows = ([(1, BASE), (2, NEAR), (3, FAR)]
            + [(10 + i, t) for i, t in enumerate(decoys)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = afp.audio_fingerprint_signatures(df, "doc_id", "text")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in ph.phash_candidate_pairs(
                 sig, max_hamming=afp.DEFAULT_MAX_HAMMING).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= afp.DEFAULT_MAX_HAMMING
    assert all(3 not in p for p in pairs)

    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan
    assert "Exchange" not in plan  # signatures are row-local
