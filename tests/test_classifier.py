"""Trained logistic-regression quality classifier: differential check
against a plain-Python reimplementation of the exact contract, plus a
learning-sanity check on separable planted labels."""

import hashlib
import math

from pyspark.sql import functions as F

from training_datawarehouse_spark.operators.classifier import logreg_quality


def _python_logreg(rows, n_buckets=256, epochs=3, lr=0.5):
    """Reference fit: hashed-bigram counts + bias feature, full-batch
    GD with per-epoch 8-dp weight rounding — mirrors the operator."""
    def bkt(bg):
        return int(hashlib.md5(bg.encode()).hexdigest()[:2], 16) % n_buckets

    feats = {}
    for did, text, y in rows:
        tk = text.split(" ")
        counts = {}
        for a, b in zip(tk, tk[1:]):
            k = bkt(f"{a} {b}")
            counts[k] = counts.get(k, 0) + 1.0
        counts[n_buckets] = 1.0  # bias
        feats[did] = counts
    n = len(rows)
    w = [0.0] * (n_buckets + 1)
    for _ in range(epochs):
        grad = [0.0] * (n_buckets + 1)
        for did, _, y in rows:
            m = sum(w[k] * x for k, x in feats[did].items())
            r = y - 1.0 / (1.0 + math.exp(-m))
            for k, x in feats[did].items():
                grad[k] += x * r
        for k in range(n_buckets + 1):
            if grad[k] != 0.0:
                w[k] = round(w[k] + lr / n * grad[k], 8)
    out = {}
    for did, _, y in rows:
        m = sum(w[k] * x for k, x in feats[did].items())
        s = round(1.0 / (1.0 + math.exp(-m)), 6)
        out[did] = (s, s >= 0.5)
    return out


def test_logreg_quality_matches_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", 1),
        (2, "the quick brown fox naps under the old tree", 1),
        (3, "lorem ipsum dolor sit amet consectetur", 0),
        (4, "zz yy xx ww vv uu tt ss", 0),
        (5, "the quick brown fox jumps again today", 1),
        (6, "single", 0),   # no bigrams: bias-only features
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    got = {
        r["doc_id"]: r
        for r in logreg_quality(
            df, "doc_id", "text", label_flag=F.col("y") == 1,
            n_buckets=256, epochs=3, lr=0.5,
        ).collect()
    }
    want = _python_logreg(rows)
    assert set(got) == set(want)
    for did, (s, p) in want.items():
        assert abs(got[did]["lrq_score"] - s) < 1e-6, did
        assert got[did]["lrq_pred"] == p, did


def test_logreg_quality_learns_separable_labels(spark):
    """On a cleanly separable corpus (disjoint vocabularies) three
    epochs must already rank every positive above every negative."""
    pos = "training data quality matters for language models"
    neg = "random noise tokens without any shared structure"
    rows = [(i, pos + f" v{i % 3}", 1) for i in range(12)] + [
        (100 + i, neg + f" w{i % 3}", 0) for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    out = logreg_quality(
        df, "doc_id", "text", label_flag=F.col("y") == 1
    ).collect()
    pos_scores = [r["lrq_score"] for r in out if r["doc_id"] < 100]
    neg_scores = [r["lrq_score"] for r in out if r["doc_id"] >= 100]
    assert min(pos_scores) > max(neg_scores)


def test_logreg_quality_all_jvm_and_cache_released(spark):
    """The whole fit + scoring stays JVM-side (no Python row crossing)
    and the training cache is released before the scored frame returns
    — the returned plan is fresh lineage, so executing it after the
    unpersist can't silently recompute through a dropped cache."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 2, i % 2) for i in range(8)],
        "doc_id long, text string, y int",
    )
    def persistent_ids() -> set:
        # id SET, not size: raw counts are polluted by other tests'
        # lingering checkpoint blocks (the r6-advisor order-dependence
        # — `pytest tests/test_bpe.py tests/test_classifier.py` tripped
        # the old `after <= before`), so assert on the DELTA instead.
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    before = persistent_ids()
    out = logreg_quality(df, "doc_id", "text", label_flag=F.col("y") == 1)
    new_ids = persistent_ids() - before
    # exactly one new retained entry is legal: the returned frame's own
    # eager localCheckpoint. The training persist must be gone.
    assert len(new_ids) <= 1, (
        f"training persist leaked past the fit: {sorted(new_ids)}"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert out.count() == 8
