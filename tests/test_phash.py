"""DCT perceptual-hash image dedup (`operators/phash.py`).

Covers the four claims the registry entry leans on:
- the PNG encode→decode round trip inside the plan is pixel-identity
  (that is the step the SQL oracle cannot re-derive — pinned here),
- the fixed-point DCT/threshold math matches an independent
  pure-Python reimplementation (different code path than the numpy
  matmul) and a direct DuckDB re-derivation,
- planted near-duplicate images hash within the Hamming threshold and
  are FOUND by the banded candidate join; unrelated ones are not,
- the signature computation stays row-local (one Arrow crossing, no
  exchange before banding).
"""
from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

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


def _ref_phash(pixels: bytes) -> list[int]:
    """Independent O(n^4) loop reimplementation of the fixed-point
    pHash — no numpy, no shared code with `phash_bands` beyond the
    basis table (which is the deliberate single source of truth)."""
    c = ph.dct_basis_int()
    blk = [[0] * ph.DCT_N for _ in range(ph.DCT_N)]
    for y in range(ph.GRID):
        for x in range(ph.GRID):
            blk[y // 2][x // 2] += pixels[y * ph.GRID + x]
    f = [
        sum(blk[r][col] * c[u][r] * c[v][col]
            for r in range(ph.DCT_N) for col in range(ph.DCT_N))
        for u in range(ph.DCT_N) for v in range(ph.DCT_N)
    ]
    med = sorted(f)[ph.N_BITS // 2 - 1]
    bands = [0] * ph.N_BANDS
    for i, coef in enumerate(f):
        if coef > med:
            bands[i // ph.BAND_BITS] |= 1 << (i % ph.BAND_BITS)
    return bands


def _hamming(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_png_round_trip_is_pixel_identity():
    """Every scanline filter type must reproduce the exact raster —
    the oracle's license to skip the codec step."""
    pix = ph.token_grid_pixels(BASE)
    for ft in range(5):
        png = ph.encode_png(ph.GRID, ph.GRID, pix, filter_type=ft)
        assert ph.decode_png(png)["pixels"] == pix


def test_dct_basis_values():
    """Spot-check the integerized basis against its definition."""
    c = ph.dct_basis_int()
    assert c[0] == [ph.DCT_SCALE] * ph.DCT_N          # u=0: cos(0)=1
    assert c[4][0] == round(math.cos(math.pi / 4) * 1024) == 724
    assert all(len(r) == ph.DCT_N for r in c)


def test_phash_matches_independent_reference():
    for text in (BASE, NEAR, FAR, "", "one", "a b  c"):
        pix = ph.token_grid_pixels(text)
        assert ph.phash_bands(pix) == _ref_phash(pix)


def test_phash_matches_duckdb_rederivation():
    """The oracle's SQL block (pixels → blocks → DCT → median → bands)
    reproduces the Python hash bit-for-bit on the same texts."""
    texts = {1: BASE, 2: NEAR, 3: FAR}
    cos_rows = ",".join(
        f"({u},{x},{c})"
        for u, row in enumerate(ph.dct_basis_int()) for x, c in enumerate(row))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({k}, '{v}')" for k, v in texts.items())
        + ") t(doc_id, text)")
    n = ph.GRID * ph.GRID
    rows = con.execute(f"""
WITH cosq(u, x, c) AS (VALUES {cos_rows}),
ptok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
pcell AS (SELECT doc_id,
                 ('0x' || substr(md5(tok), 1, 15))::BIGINT % {n} AS cell
          FROM ptok),
pcnt AS (SELECT doc_id, cell, count(*) AS cnt FROM pcell GROUP BY 1, 2),
pgrid AS (
  SELECT d.doc_id, g.cell, coalesce(pc.cnt, 0) AS cnt
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range(0, {n})) AS cell) g
  LEFT JOIN pcnt pc ON pc.doc_id = d.doc_id AND pc.cell = g.cell),
ppix AS (SELECT doc_id, least(255, cnt * {ph.PIXEL_GAIN}) AS p,
                (cell // {ph.GRID}) // 2 AS by, (cell % {ph.GRID}) // 2 AS bx
         FROM pgrid),
pblk AS (SELECT doc_id, by, bx, sum(p)::BIGINT AS s FROM ppix GROUP BY 1, 2, 3),
pdct AS (SELECT b.doc_id, cu.u AS u, cv.u AS v,
                sum(b.s * cu.c * cv.c)::BIGINT AS f
         FROM pblk b JOIN cosq cu ON cu.x = b.by JOIN cosq cv ON cv.x = b.bx
         GROUP BY 1, 2, 3),
pmed AS (SELECT doc_id, list_sort(list(f))[{ph.N_BITS // 2}] AS med
         FROM pdct GROUP BY 1),
pbit AS (SELECT d.doc_id, (d.u * {ph.DCT_N} + d.v) AS i,
                (d.f > m.med)::BIGINT AS bit
         FROM pdct d JOIN pmed m ON m.doc_id = d.doc_id),
psig AS (SELECT doc_id, (i // {ph.BAND_BITS}) AS band,
                sum(bit << (i % {ph.BAND_BITS}))::BIGINT AS val
         FROM pbit GROUP BY 1, 2)
SELECT doc_id, band, val FROM psig ORDER BY doc_id, band
""").fetchall()
    got = {}
    for did, band, val in rows:
        got.setdefault(did, [0] * ph.N_BANDS)[band] = val
    for did, text in texts.items():
        assert got[did] == ph.phash_bands(ph.token_grid_pixels(text)), did


def test_similarity_preservation_and_threshold():
    """Near-dup text => <= DEFAULT_MAX_HAMMING bits; unrelated text
    lands well above it (the calibration the default encodes)."""
    hb = ph.phash_bands(ph.token_grid_pixels(BASE))
    hn = ph.phash_bands(ph.token_grid_pixels(NEAR))
    hf = ph.phash_bands(ph.token_grid_pixels(FAR))
    assert _hamming(hb, hn) <= ph.DEFAULT_MAX_HAMMING
    assert _hamming(hb, hf) > 2 * ph.DEFAULT_MAX_HAMMING
    assert ph.phash_bands(ph.token_grid_pixels(BASE)) == hb  # deterministic


def test_token_cell_convention_matches_dedup_family():
    """Cells use the exact md5-prefix integer convention of
    `dedup.hashed_shingles_portable` — the property the shared oracle
    depends on."""
    tok = "catalyst"
    h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
    pix = ph.token_grid_pixels(tok)
    assert pix[h % 256] == ph.PIXEL_GAIN
    assert sum(pix) == ph.PIXEL_GAIN


def test_phash_robust_across_lossy_codec():
    """The defining property of a PERCEPTUAL hash: the same image
    through a lossy codec (the in-tree REAL baseline JPEG at q=85,
    which perturbs pixels) must hash within the near-dup threshold of
    its lossless PNG twin — while a different image stays far. Exact
    hashes (md5-style) lose this the moment one pixel moves."""
    from training_datawarehouse_spark.operators import jpeg

    pix = ph.token_grid_pixels(BASE)
    png_pixels = ph.decode_png(
        ph.encode_png(ph.GRID, ph.GRID, pix, filter_type=2))["pixels"]
    jpg = jpeg.encode_jpeg(ph.GRID, ph.GRID, pix, quality=85,
                           subsample=False)
    jpg_pixels = jpeg.decode_jpeg(jpg)["pixels"]
    assert jpg_pixels != png_pixels          # lossy really perturbed it
    h_png = ph.phash_bands(png_pixels)
    h_jpg = ph.phash_bands(jpg_pixels)
    assert 0 < _hamming(h_png, h_jpg) <= ph.DEFAULT_MAX_HAMMING
    h_far = ph.phash_bands(ph.token_grid_pixels(FAR))
    # the unrelated image must stay ABOVE the dedup threshold even
    # against the codec-perturbed hash (it sits at 2x here — sparse
    # spike images are JPEG's worst case, which eats some margin)
    assert _hamming(h_jpg, h_far) > ph.DEFAULT_MAX_HAMMING


def test_planted_near_dup_found_by_banded_join(spark):
    """End-to-end on Spark: plant a near-dup pair and an unrelated doc
    among decoys; the banded candidate join must surface exactly the
    planted pair, with the codec round trip in the plan."""
    decoys = [
        f"decoy document number {i} with tokens drawn from vocabulary "
        f"slice {i % 7} plus padding words alpha beta gamma delta "
        f"epsilon zeta eta theta iota kappa row{i}"
        for i in range(20)
    ]
    rows = ([(1, BASE), (2, NEAR), (3, FAR)]
            + [(10 + i, t) for i, t in enumerate(decoys)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = ph.image_phash_signatures(df, "doc_id", "text")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in ph.phash_candidate_pairs(sig).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= ph.DEFAULT_MAX_HAMMING
    assert all(3 not in p for p in pairs)

    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan
    assert "Exchange" not in plan  # signatures are row-local


def test_phash_incremental_index_cross_generation(spark):
    """Generational dedup: a stored (band, val, id, b0..b3) index
    probed by a new ingest batch must surface cross-generation
    near-dups (Hamming verified from the INDEX's stored signatures —
    no corpus re-decode) and in-batch pairs, and nothing for
    unrelated content."""
    gen0 = [(1, BASE), (2, FAR)] + [
        (10 + i,
         f"decoy document number {i} with padding words alpha beta "
         f"gamma delta epsilon zeta eta theta iota kappa row{i}")
        for i in range(10)
    ]
    in_batch_a = ("fresh content about shuffle partitions and adaptive "
                  "query execution tuning broadcast thresholds and skew "
                  "salting under the catalyst optimizer regime with whole "
                  "stage codegen spans widened and the exchange reuse rule "
                  "applied to every branch of the union today")
    in_batch_b = in_batch_a.replace("today", "yesterday")  # hamming 4
    gen1 = [(100, NEAR),              # cross-gen near-dup of doc 1
            (101, in_batch_a), (102, in_batch_b),  # in-batch pair
            (103, "entirely novel text regarding basalt columns and "
                  "tidal erosion patterns on volcanic coastlines")]
    df0 = spark.createDataFrame(gen0, "doc_id long, text string")
    df1 = spark.createDataFrame(gen1, "doc_id long, text string")
    index = ph.phash_band_index(
        ph.image_phash_signatures(df0, "doc_id", "text"))
    pairs = {(r.new_id, r.old_id): r.hamming
             for r in ph.phash_probe_index(
                 index,
                 ph.image_phash_signatures(df1, "doc_id", "text"),
             ).collect()}
    assert (100, 1) in pairs and pairs[(100, 1)] <= ph.DEFAULT_MAX_HAMMING
    assert (101, 102) in pairs
    assert all(103 not in p for p in pairs)
    assert all(2 not in p for p in pairs)  # FAR pairs with nothing


# ----------------------------------------- r11: production envelope

def _ref_phash_params(pixels: bytes, p: ph.PhashParams) -> list[int]:
    """The independent loop reimplementation, geometry-generic."""
    c = ph.dct_basis_int(p.dct_n)
    blk = [[0] * p.dct_n for _ in range(p.dct_n)]
    for y in range(p.grid):
        for x in range(p.grid):
            blk[y // 2][x // 2] += pixels[y * p.grid + x]
    f = [
        sum(blk[r][col] * c[u][r] * c[v][col]
            for r in range(p.dct_n) for col in range(p.dct_n))
        for u in range(p.dct_n) for v in range(p.dct_n)
    ]
    med = sorted(f)[p.n_bits // 2 - 1]
    order = p.bit_order()   # PRODUCTION scatters bits across bands
    bands = [0] * p.n_bands
    for pos in range(p.n_bits):
        if f[order[pos]] > med:
            bands[pos // p.band_bits] |= 1 << (pos % p.band_bits)
    return bands


def test_production_params_geometry():
    p = ph.PRODUCTION_PARAMS
    assert (p.grid, p.dct_n) == (32, 16)
    assert p.n_bits == 256 and p.n_bands == 16
    assert p.band_cols == [f"b{k}" for k in range(16)]
    # proportional threshold: 6/64 -> 24/256
    assert ph.scaled_max_hamming(ph.DEFAULT_PARAMS) == 6
    assert ph.scaled_max_hamming(p) == 24


def test_production_phash_matches_reference_and_batch():
    """256-bit scalar path == the independent loop reimplementation ==
    the batched einsum, on the calibration corpus."""
    import numpy as np
    p = ph.PRODUCTION_PARAMS
    pix = [ph.token_grid_pixels(t, p) for t in (BASE, NEAR, FAR)]
    scalar = [ph.phash_bands(px, p) for px in pix]
    ref = [_ref_phash_params(px, p) for px in pix]
    assert scalar == ref
    batch = ph.phash_bands_batch(
        np.frombuffer(b"".join(pix), dtype=np.uint8), p)
    assert [list(b) for b in batch] == scalar
    assert all(0 <= v < (1 << p.band_bits) for b in scalar for v in b)


def test_production_hamming_separation():
    """The planted near-dup/unrelated separation transfers to the
    256-bit envelope at the proportionally scaled threshold."""
    p = ph.PRODUCTION_PARAMS

    def dist(a, b):
        sa = ph.phash_bands(ph.token_grid_pixels(a, p), p)
        sb = ph.phash_bands(ph.token_grid_pixels(b, p), p)
        return sum(bin(x ^ y).count("1") for x, y in zip(sa, sb))

    tau = ph.scaled_max_hamming(p)
    assert dist(BASE, NEAR) <= tau
    assert dist(BASE, FAR) > tau


def test_production_planted_near_dup_found_by_banded_join(spark):
    """End-to-end at the PRODUCTION envelope: 16-band candidate join +
    scaled threshold surfaces exactly the planted pair; the signature
    crossing stays row-local. (The registry keeps the 64-bit default;
    this pins the parameterized path the SCALE.md r10 prescription
    calls for at >=10^6 items/modality.)"""
    p = ph.PRODUCTION_PARAMS
    decoys = [
        f"decoy document number {i} with tokens drawn from vocabulary "
        f"slice {i % 7} plus padding words alpha beta gamma delta "
        f"epsilon zeta eta theta iota kappa row{i}"
        for i in range(20)
    ]
    rows = ([(1, BASE), (2, NEAR), (3, FAR)]
            + [(10 + i, t) for i, t in enumerate(decoys)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = ph.image_phash_signatures(df, "doc_id", "text", params=p)
    assert sig.columns == ["id"] + p.band_cols
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in ph.phash_candidate_pairs(
                 sig, max_hamming=ph.scaled_max_hamming(p),
                 n_bands=p.n_bands).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= ph.scaled_max_hamming(p)
    assert all(3 not in pr for pr in pairs)
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # signatures stay row-local


def test_cap_grain_rep_recovers_mega_group_neighbors(spark):
    """r12 (r11 probe residual): an identical-fingerprint MEGA-GROUP
    under the doc-weight cap takes its whole bucket — including its
    DISTINCT near-dup neighbor — out of the candidate set; under the
    rep-grain cap the bucket survives, the neighbor pairs with the
    group's REP, and the group's quadratic C(g,2) doc expansion never
    materializes (exact dups resolve via the collapse membership)."""
    mega = [(i, 1, 1, 1, 1) for i in range(30)]     # one fingerprint
    near = [(100, 1, 1, 1, 3)]                      # Hamming 1, shares b0..b2
    far = [(200, 21845, 13107, 3855, 255)]          # unrelated
    sig = spark.createDataFrame(
        mega + near + far, "id long, b0 int, b1 int, b2 int, b3 int"
    )
    doc_pairs = {(r["id_a"], r["id_b"]) for r in ph.phash_candidate_pairs(
        sig, max_bucket=10).collect()}
    rep_pairs = {(r["id_a"], r["id_b"]) for r in ph.phash_candidate_pairs(
        sig, max_bucket=10, cap_grain="rep").collect()}
    # doc-weight cap: every bucket holding the mega group is over cap
    # (weight 30 or 31 > 10) -> the true near-dup is lost
    assert doc_pairs == set()
    # rep cap: bucket weight is 2 distinct fingerprints -> the rep
    # (min id 0) pairs with the neighbor; NO within-group pairs
    assert rep_pairs == {(0, 100)}


def test_cap_grain_rep_small_groups_unchanged(spark):
    """Groups within the cap keep the full doc-grain expansion in rep
    mode — the guard only bites mega-groups."""
    sig = spark.createDataFrame(
        [(1, 7, 7, 7, 7), (2, 7, 7, 7, 7), (3, 7, 7, 7, 5)],
        "id long, b0 int, b1 int, b2 int, b3 int",
    )
    for grain in ("doc", "rep"):
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in ph.phash_candidate_pairs(
                     sig, max_bucket=10, cap_grain=grain).collect()}
        assert pairs == {(1, 2): 0, (1, 3): 1, (2, 3): 1}, grain
