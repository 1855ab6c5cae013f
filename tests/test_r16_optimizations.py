"""r16 optimization-round parity gates.

Every optimization this round must keep results BYTE-IDENTICAL; these
tests pin the ones that changed operator internals:

- the vectorized synthesis/fingerprint kernels (token grids, wave
  mixture, batch DFT fingerprint) against their pre-r16 per-element
  reference loops, re-implemented here verbatim as the fixed point;
- the trainers' shared-scan ``word_counts`` injection against the
  self-collecting path;
- ``doc_unigram_scores(words=...)`` against its self-collecting path.

The composite-level guarantees (lsh_cross_modal's materialized pair
pass, text_profile's overlapped stage builds, similarity_topk's shared
cosine pass, windowed_batch's persisted funnel) are covered by the
oracle sweep — the plans changed, the rows may not.
"""
from __future__ import annotations

import numpy as np
import pytest

from training_datawarehouse_spark.operators import (
    audiofp as afp,
    bpe,
    phash as ph,
    unigram as ug,
    video as vd,
    wordpiece as wpc,
)

TEXTS = [
    "",
    "single",
    "a b c a b a",
    "the quick brown fox jumps over the lazy dog",
    "dup dup dup dup dup dup dup dup dup dup dup dup",
    "x " * 300 + "tail",
    "mixed CASE And 123 numbers 456 with, punctuation!",
]


# ------------------------- pre-r16 reference loops (the fixed point)

def _ref_grid(text, params=ph.DEFAULT_PARAMS):
    ncells = params.grid * params.grid
    counts = [0] * ncells
    for tok in text.split(" "):
        counts[ph._token_cell(tok, ncells)] += 1
    return bytes(min(255, params.pixel_gain * c) for c in counts)


def _ref_wave(text):
    s = np.zeros(afp.N_SAMPLES, dtype=np.int64)
    for tok in text.split(" "):
        k, phase = afp.token_freq_phase(tok)
        s += (afp._WAVE_NP[(k * afp._T) % 64]
              * (1 + (afp._AM_FRAME + phase) % afp.AM_PERIOD))
    return np.clip(s, -32768, 32767).tolist()


def _ref_fingerprint(samples):
    cos, sin = afp.dft_basis_int()
    s = np.asarray(samples, dtype=np.int64).reshape(afp.N_FRAMES, afp.FRAME)
    c = np.array(cos, dtype=np.int64)
    sn = np.array(sin, dtype=np.int64)
    re = s @ c.T
    im = s @ sn.T
    e = re * re + im * im
    d = e - np.roll(e, -1, axis=1)
    bits = (d[1:9] - d[0:8]) > 0
    flat = bits.reshape(-1)
    bands = [0] * afp.N_BANDS
    for i, bit in enumerate(flat):
        if bit:
            bands[i // afp.BAND_BITS] |= 1 << (i % afp.BAND_BITS)
    return bands


def _ref_frame_grids(text, n_frames=vd.N_FRAMES, params=ph.DEFAULT_PARAMS):
    ncells = params.grid * params.grid
    counts = [[0] * ncells for _ in range(n_frames)]
    for i, tok in enumerate(text.split(" ")):
        counts[i % n_frames][ph._token_cell(tok, ncells)] += 1
    return [bytes(min(255, params.pixel_gain * c) for c in row)
            for row in counts]


def test_token_grid_pixels_matches_reference_loop():
    for t in TEXTS:
        assert ph.token_grid_pixels(t) == _ref_grid(t), t[:40]


def test_token_wave_samples_matches_reference_loop():
    for t in TEXTS:
        got = afp.token_wave_samples(t)
        assert got == _ref_wave(t), t[:40]
        assert all(isinstance(v, int) for v in got[:4])


def test_fingerprint_bands_scalar_and_batch_match_reference():
    clips = np.array([_ref_wave(t) for t in TEXTS], dtype=np.int64)
    batch = afp.fingerprint_bands_batch(clips)
    for j, t in enumerate(TEXTS):
        ref = _ref_fingerprint(clips[j])
        assert afp.fingerprint_bands(clips[j].tolist()) == ref, t[:40]
        assert batch[j].tolist() == ref, t[:40]


def test_frame_token_grids_matches_reference_loop():
    for t in TEXTS:
        assert vd.frame_token_grids(t) == _ref_frame_grids(t), t[:40]


def test_pixel_gain_saturation_still_clamps_at_255():
    # 300 identical tokens in one cell: gain·count far above 255
    t = "same " * 300
    pix = ph.token_grid_pixels(t.strip())
    assert max(pix) == 255
    assert ph.token_grid_pixels(t.strip()) == _ref_grid(t.strip())


# --------------------------------- trainer shared-scan injection

@pytest.fixture()
def docs(spark):
    rows = [
        (0, "aa bb aa cc dd aa bb"),
        (1, "bb cc bb aa ee ff gg"),
        (2, "hh aa bb cc hh hh aa"),
        (3, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_collect_word_counts_matches_trainer_scan(docs):
    wc = bpe.collect_word_counts(docs, "text")
    assert wc is not None
    assert dict(wc)["aa"] == 6
    # over-cap returns None (the distributed-loop signal)
    assert bpe.collect_word_counts(docs, "text", driver_vocab_cap=3) is None


def test_train_bpe_word_counts_injection_parity(docs):
    wc = bpe.collect_word_counts(docs, "text")
    w1, m1 = bpe.train_bpe(docs, "text", num_merges=4)
    w2, m2 = bpe.train_bpe(docs, "text", num_merges=4, word_counts=wc)
    assert m1 == m2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))


def test_train_wordpiece_word_counts_injection_parity(docs):
    wc = bpe.collect_word_counts(docs, "text")
    w1, m1 = wpc.train_wordpiece(docs, "text", num_merges=3)
    w2, m2 = wpc.train_wordpiece(docs, "text", num_merges=3, word_counts=wc)
    assert m1 == m2
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))


def test_lsh_pair_materialize_parity(spark):
    """materialize=True must return the identical pair set (it only
    changes WHERE the shared signature table is computed), release its
    internal checkpoint, and work for both hash families."""
    from training_datawarehouse_spark.operators import dedup as dd

    rows = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 7} "
                f"w{i % 3} w{(i + 1) % 3} filler{i % 11}")
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (dd.lsh_candidate_pairs, dd.lsh_candidate_pairs_portable):
        lazy = fn(docs, "doc_id", "text", num_hashes=8, bands=4,
                  rows_per_band=2, jaccard_threshold=0.2).collect()
        mat = fn(docs, "doc_id", "text", num_hashes=8, bands=4,
                 rows_per_band=2, jaccard_threshold=0.2,
                 materialize=True).collect()
        assert sorted(map(tuple, lazy)) == sorted(map(tuple, mat)), fn


def test_phash_pair_materialize_and_fused_expansion_parity(spark):
    """The fused within/across pair expansion + materialize=True must
    reproduce the two-branch union's pair multiset exactly, for both
    cap grains, including a planted identical-fingerprint group (the
    within-group C(g,2) path) and near-dup reps (the across path)."""
    from training_datawarehouse_spark.operators import phash as ph

    rows = []
    for i in range(12):
        rows.append((i, 0xAAAA, 0x1111, 0x2222, 0x3333))  # exact group
    rows.append((100, 0xAAAB, 0x1111, 0x2222, 0x3333))    # 2-bit neighbor
    rows.append((101, 0xAAAA, 0x1113, 0x2222, 0x3333))
    rows.append((200, 0x0F0F, 0xF0F0, 0x00FF, 0xFF00))    # far away
    sig = spark.createDataFrame(
        rows, "id long, b0 int, b1 int, b2 int, b3 int")
    for grain in ("doc", "rep"):
        lazy = ph.phash_candidate_pairs(sig, cap_grain=grain).collect()
        mat = ph.phash_candidate_pairs(
            sig, cap_grain=grain, materialize=True).collect()
        assert sorted(map(tuple, lazy)) == sorted(map(tuple, mat)), grain
        assert len(lazy) > 0


def test_video_pair_matches_materialize_parity(spark):
    from training_datawarehouse_spark.operators import video as vd

    rows = []
    for vid in range(6):
        for f in range(4):
            # videos 0 and 1 share frame fingerprints at offset 0
            base = 0x100 * (vid if vid > 1 else 0)
            rows.append((vid, f, base + f, 7 * f, 3 * f, f))
    sig = spark.createDataFrame(
        rows, "id long, frame int, b0 int, b1 int, b2 int, b3 int")
    lazy = vd.video_pair_matches(sig).collect()
    mat = vd.video_pair_matches(sig, materialize=True).collect()
    assert sorted(map(tuple, lazy)) == sorted(map(tuple, mat))
    assert len(lazy) > 0


def test_unigram_word_counts_and_words_injection_parity(docs):
    wc = ug.collect_word_counts(docs, "text")
    assert wc is not None
    p1 = ug.train_unigram(docs, "text", vocab_size=12, max_len=3, iters=2)
    p2 = ug.train_unigram(docs, "text", vocab_size=12, max_len=3, iters=2,
                          word_counts=wc)
    assert p1 == p2
    s1 = ug.doc_unigram_scores(docs, p1, "doc_id", "text").collect()
    s2 = ug.doc_unigram_scores(docs, p1, "doc_id", "text",
                               words=[w for w, _ in wc]).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
