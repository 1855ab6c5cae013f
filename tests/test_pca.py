"""PCA whitening (operators/pca.py): distributed moments vs numpy,
power iteration vs known eigensystems, whitened projection semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from training_datawarehouse_spark.operators import pca


def _df(spark, arr):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(arr)],
        "vec_id long, embedding array<double>",
    )


def test_moments_match_numpy(spark):
    rng = np.random.RandomState(11)
    arr = rng.standard_normal((60, 6)).round(3)
    df = _df(spark, arr)
    means = pca.dim_means(df, "embedding")
    assert means == pytest.approx(arr.mean(axis=0), abs=2e-6)
    cov = pca.covariance_matrix(df, "embedding", means)
    want = np.cov(arr.T, bias=True)  # /n, matching the operator
    assert np.allclose(np.array(cov), want, atol=5e-6)


def test_power_iteration_on_diagonal_covariance():
    """A diagonal covariance's top components are coordinate axes and
    the eigenvalues are the diagonal entries — exactly recoverable."""
    cov = [[4.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.25]]
    comps, eigs = pca.power_iteration_components(
        cov, n_components=2, iters=30
    )
    assert eigs[0] == pytest.approx(4.0, abs=1e-5)
    assert eigs[1] == pytest.approx(1.0, abs=1e-5)
    assert abs(comps[0][0]) == pytest.approx(1.0, abs=1e-4)
    assert abs(comps[1][1]) == pytest.approx(1.0, abs=1e-4)


def test_full_fit_matches_numpy_eigh(spark):
    """On anisotropic data the 12-iteration fit must land on numpy's
    top-2 eigenpairs (eigenvalue ≈, |cos(component)| ≈ 1)."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((200, 5))
    stretch = np.diag([5.0, 2.0, 0.5, 0.3, 0.1])
    arr = (base @ stretch).round(3)
    df = _df(spark, arr)
    means, comps, eigs = pca.pca_whiten_fit(
        df, "embedding", n_components=2, iters=25
    )
    c = np.cov(arr.T, bias=True)
    w, v = np.linalg.eigh(c)
    order = np.argsort(w)[::-1]
    for k in range(2):
        assert eigs[k] == pytest.approx(w[order[k]], rel=1e-3)
        cosang = abs(float(np.dot(comps[k], v[:, order[k]])))
        assert cosang == pytest.approx(1.0, abs=1e-3)


def test_whiten_project_unit_variance_and_rowlocal(spark):
    """Whitened coordinates have ~unit variance along each component,
    and the projection plan is JVM-only with no shuffle (the model is
    literals)."""
    rng = np.random.RandomState(3)
    arr = (rng.standard_normal((150, 4)) @ np.diag([3.0, 1.5, 0.4, 0.2]))
    arr = arr.round(3)
    df = _df(spark, arr)
    means, comps, eigs = pca.pca_whiten_fit(
        df, "embedding", n_components=2, iters=20
    )
    z = pca.whiten_project(df, "embedding", means, comps, eigs)
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # row-local: literals, no join
    zz = np.array([r["z"] for r in z.orderBy("vec_id").collect()])
    assert zz.shape == (150, 2)
    assert zz.var(axis=0) == pytest.approx([1.0, 1.0], abs=0.05)
    # z0 must be the centered projection onto comp0 scaled by 1/sqrt(λ)
    manual = (arr - np.array(means)) @ np.array(comps[0]) / np.sqrt(eigs[0])
    assert np.allclose(zz[:, 0], manual, atol=2e-6)


def test_power_iteration_degenerate_raises():
    """r8 review: zero covariance (all-identical vectors) must fail
    loudly, not ZeroDivisionError; whitening with a ≤0 eigenvalue must
    refuse rather than emit NaN/Inf coordinates."""
    zero = [[0.0] * 3 for _ in range(3)]
    with pytest.raises(ValueError, match="collapsed"):
        pca.power_iteration_components(zero, n_components=1, iters=3)


def test_whiten_project_rejects_nonpositive_eigenvalue(spark):
    df = _df(spark, np.eye(3))
    with pytest.raises(ValueError, match="strictly positive"):
        pca.whiten_project(
            df, "embedding", [0.0, 0.0, 0.0],
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], [1.0, 0.0],
        )


def test_covariance_rejects_ragged_vectors(spark):
    """r8 ADVICE: a wrong-dim vector null-pads through zip_with and its
    null products silently drop from the sums — the fit must refuse
    instead of skewing the covariance."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0]), (2, [7.0, 8.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged or wrong-dim"):
        pca.covariance_matrix(df, "embedding", [0.0, 0.0, 0.0])
