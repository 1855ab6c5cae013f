"""The checkpoint helpers (`functions/caching.py`) — the r13 stats
fix, generalized (r13 verdict #5/#7).

`eager_checkpoint` exists because Spark 4's `localCheckpoint` copies
the origin plan's size estimate into the resulting LogicalRDD: an
iterative operator that checkpoints one generation per round and
self-joins it inherits a size estimate that SQUARES per generation,
and after tens of rounds the optimizer grinds the driver inside
BigInteger.multiply (diagnosed live at the r13 200 k NN-descent
probe). These tests pin (a) the compounding really happens on the
plain path, (b) the rewrap really stops it, (c) the fallback path is
VISIBLE (warns once + counts) instead of silently reintroducing the
time bomb, and (d) the lazy mode used by the tokenizer training loops
round-trips data and releases correctly.
"""
from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from training_datawarehouse_spark.functions import caching
from training_datawarehouse_spark.functions.caching import (
    eager_checkpoint, release_local_checkpoint,
)


def _size_est(df) -> int:
    """Catalyst's size-in-bytes estimate of the optimized plan."""
    # py4j auto-converts small BigInts to int; huge ones need str()
    return int(str(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ))


def _self_join_gen(g):
    # the iterative-operator shape: generation t+1 reads generation t
    # on BOTH sides of a join (CC's pointer jump, descent's local
    # join, PageRank's contrib+dangling double read)
    return (
        g.alias("l")
        .join(g.alias("r"), F.col("l.id") == F.col("r.id"))
        .select(F.col("l.id").alias("id"), F.col("l.v").alias("v"))
    )


def test_plain_checkpoint_chain_compounds_stats(spark):
    """The disease, pinned: under plain localCheckpoint the join
    estimate grows multiplicatively per checkpointed generation
    (each generation's leaf inherits the previous JOIN's product
    estimate), so the bit-length of the estimate climbs round over
    round — the curve that ends in driver-minutes of
    BigInteger.multiply at high iteration counts."""
    g = spark.range(16).select("id", F.lit(1).alias("v")) \
        .localCheckpoint(eager=True)
    frames = [g]
    ests = []
    for _ in range(3):
        j = _self_join_gen(g)
        ests.append(_size_est(j))
        g = j.localCheckpoint(eager=True)
        frames.append(g)
    # strictly compounding: every generation's join estimate is at
    # least the square-ish of the last (allow slack — row-width
    # accounting differs per version; the SHAPE is what we pin).
    # Gated on the OBSERVED inheritance (ADVICE r14): this pins
    # Spark-internal behavior (SPARK-39900 stats preservation), and a
    # future Spark that drops it makes the disease impossible — the
    # library then degrades to correct-by-construction, and only the
    # fix-side tests below stay load-bearing.
    if not ests[1] > 4 * ests[0]:
        for f in frames:
            release_local_checkpoint(f)
        pytest.skip(
            "this Spark does not inherit origin stats through "
            "localCheckpoint; the compounding disease cannot occur")
    assert ests[2] > 4 * ests[1]
    for f in frames:
        release_local_checkpoint(f)


def test_eager_checkpoint_chain_stats_stay_bounded(spark):
    """The fix, pinned (r13 verdict #5's regression test): through
    eager_checkpoint every generation is a stat-less leaf, so the
    join estimate is the SAME for generation 1 and generation 4 —
    no compounding — and the data still round-trips exactly."""
    base = spark.range(16).select("id", F.lit(1).alias("v"))
    g = eager_checkpoint(base)
    first_join_est = None
    frames = [g]
    for i in range(4):
        j = _self_join_gen(g)
        if first_join_est is None:
            first_join_est = _size_est(j)
        else:
            assert _size_est(j) == first_join_est
        g = eager_checkpoint(j)
        frames.append(g)
    assert [r["id"] for r in g.orderBy("id").collect()] == list(range(16))
    for f in frames:
        release_local_checkpoint(f)


def test_eager_checkpoint_fallback_warns_once_and_counts(spark, monkeypatch):
    """r13 verdict #7 / ADVICE: if the private internalCreateDataFrame
    seam moves in a future Spark, the fallback to the stats-inheriting
    checkpoint must be DIAGNOSABLE — one RuntimeWarning on first use,
    a counter probes can read — never silent."""
    def _boom(ck, origin):
        raise RuntimeError("seam moved")

    monkeypatch.setattr(caching, "_rewrap_statless", _boom)
    monkeypatch.setattr(caching, "_warned", False)
    before = caching.FALLBACK_COUNT
    df = spark.range(8)
    with pytest.warns(RuntimeWarning, match="stat-less LogicalRDD rewrap"):
        ck1 = eager_checkpoint(df)
    assert ck1.count() == 8          # fallback is still a working checkpoint
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # second call must NOT warn again
        ck2 = eager_checkpoint(df)
    assert caching.FALLBACK_COUNT == before + 2
    # r14 verdict #6 / r15 ADVICE: the count must also be readable
    # OFF-process — a spark-submit'd job checks the session conf
    # post-run instead of grepping executor logs for the
    # once-per-process warning — and it is PER-SESSION (a
    # read-modify-write of this session's own conf, seeded here to
    # prove it increments rather than mirroring the process-wide
    # FALLBACK_COUNT, which may include other sessions' fallbacks).
    try:
        assert spark.conf.get(caching.FALLBACK_CONF_KEY) == "2"
        spark.conf.set(caching.FALLBACK_CONF_KEY, "5")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ck3 = eager_checkpoint(df)
        assert spark.conf.get(caching.FALLBACK_CONF_KEY) == "6"
    finally:
        spark.conf.unset(caching.FALLBACK_CONF_KEY)
    for f in (ck1, ck2, ck3):
        release_local_checkpoint(f)


def test_eager_checkpoint_lazy_mode_roundtrip_and_release(spark):
    """eager=False (the BPE/WordPiece loop shape): no job at checkpoint
    time is hard to assert cheaply, but the frame must materialize on
    first action, hash out the same rows, and release through the
    remembered checkpoint source."""
    base = spark.range(32).select(
        "id", (F.col("id") * 3).alias("v"))
    lz = eager_checkpoint(base, eager=False)
    assert lz.agg(F.sum("v")).first()[0] == 3 * sum(range(32))
    # the rewrapped frame released via its _graft_ck_source
    assert getattr(lz, "_graft_ck_source", None) is not None
    assert release_local_checkpoint(lz)


def test_tune_for_iterative_sets_the_three_knobs(spark):
    from training_datawarehouse_spark.session import tune_for_iterative

    saved = {}
    keys = [
        "spark.sql.defaultSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
    ]
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        tune_for_iterative(spark)
        assert spark.conf.get("spark.sql.defaultSizeInBytes") == str(
            64 * 1024 * 1024)
        assert spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize"
        ) == "64k"
        assert spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled") == "false"
        # re-exported next to the operators (r13 ADVICE #4)
        from training_datawarehouse_spark.operators.nndescent import (
            tune_for_iterative as reexported,
        )
        assert reexported is tune_for_iterative
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_recursive_build_survives_all_core_corpus(spark):
    """r13 ADVICE #1: on a corpus whose ids ALL hash to the core
    level (every wave batch empty), the returned graph IS the core
    graph — the post-loop release must not unpersist the blocks
    behind it (before the fix this collect() died with
    missing-checkpoint-block errors)."""
    import hashlib

    import numpy as np

    from training_datawarehouse_spark.operators.nndescent import (
        nnd_graph_recursive,
    )

    # ids at level L for core_frac=2: md5(str(id))[:15] even
    ids = [i for i in range(200)
           if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
           % 2 == 0][:24]
    assert len(ids) == 24
    rng = np.random.RandomState(7)
    pts = rng.standard_normal((24, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in np.round(p, 6)])
         for i, p in zip(ids, pts)],
        "vec_id long, embedding array<double>",
    )
    g, cents = nnd_graph_recursive(
        df, k=4, core_frac=2, core_iters=2, refine_iters=1,
        n_lists=4, kmeans_iters=2)
    rows = g.collect()               # would raise on released blocks
    assert len(rows) == 24 * 4
    assert all(r["src"] != r["dst"] for r in rows)
    release_local_checkpoint(g)


def test_iterative_tuning_scoped_restores_confs(spark):
    """r14 verdict #3: the context-manager form must put every knob
    back on exit — including on exception — so a mixed session that
    builds a graph keeps runtime bloom-filter injection (a feature
    test_plan_quality.py proves cuts fact scans) for the relational
    queries that follow."""
    from training_datawarehouse_spark.session import (
        ITERATIVE_CONFS, iterative_tuning,
    )

    before = {k: spark.conf.get(k) for k in ITERATIVE_CONFS}
    # runtime bloom filters are ON before (the default this scoping
    # exists to protect)
    assert before["spark.sql.optimizer.runtime.bloomFilter.enabled"] == "true"
    with iterative_tuning(spark):
        for k, v in ITERATIVE_CONFS.items():
            assert spark.conf.get(k) == v
    assert {k: spark.conf.get(k) for k in ITERATIVE_CONFS} == before

    # exception-safe: the finally must still restore
    with pytest.raises(RuntimeError, match="boom"):
        with iterative_tuning(spark):
            raise RuntimeError("boom")
    assert {k: spark.conf.get(k) for k in ITERATIVE_CONFS} == before

    # nesting a user-set prior value: restore to the USER's value,
    # not the Spark default
    key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    spark.conf.set(key, "2m")
    try:
        with iterative_tuning(spark):
            assert spark.conf.get(key) == "64k"
        assert spark.conf.get(key) == "2m"
    finally:
        spark.conf.set(key, before[key])
