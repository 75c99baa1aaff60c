"""PCA/whitening: recovers a planted principal direction, JVM
projection matches numpy, whitening yields unit variance, training is
sample-bounded. Tolerance-gated (eigensolve has no cross-engine
oracle), like the streaming family."""

from __future__ import annotations

import math
import random

import pytest

from nosql_to_sql_migration_tool_spark.operators.pca import (
    fit_pca,
    project_embeddings,
)


def _planted(n: int = 400, d: int = 8, seed: int = 7):
    """Points = mean + t*v + small noise: top component must be ~v."""
    rng = random.Random(seed)
    v = [1.0 / math.sqrt(d)] * d
    mean = [float(i) for i in range(d)]
    rows = []
    for i in range(n):
        t = rng.gauss(0, 5.0)
        noise = [rng.gauss(0, 0.1) for _ in range(d)]
        rows.append(
            (i, [mean[j] + t * v[j] + noise[j] for j in range(d)])
        )
    return rows, v


def test_pca_recovers_planted_direction(spark):
    rows, v = _planted()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = fit_pca(df, k=3, train_limit=None)
    top = model.components[0]
    cos = abs(sum(a * b for a, b in zip(top, v)))
    assert cos > 0.99, cos
    # eigenvalues descending, dominant one carries ~all the variance
    assert model.eigenvalues[0] >= model.eigenvalues[1] >= model.eigenvalues[2]
    assert model.eigenvalues[0] > 10 * model.eigenvalues[1]


def test_projection_matches_numpy_and_whitening_unit_variance(spark):
    np = pytest.importorskip("numpy")
    rows, _ = _planted()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = fit_pca(df, k=2, train_limit=None)

    got = {
        r["vec_id"]: r["pca"]
        for r in project_embeddings(df, model).collect()
    }
    mean = np.asarray(model.mean)
    comps = np.asarray(model.components)
    for i, vec in rows[:50]:
        want = comps @ (np.asarray(vec) - mean)
        assert np.allclose(got[i], want, atol=1e-9), i

    whitened = np.asarray(
        [r["pca"] for r in project_embeddings(df, model, whiten=True).collect()]
    )
    var = whitened.var(axis=0)
    assert np.allclose(var, 1.0, atol=0.15), var


def test_fit_is_sample_bounded_and_deterministic(spark):
    rows, _ = _planted(n=300)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m1 = fit_pca(df, k=2, train_limit=64)
    m2 = fit_pca(df, k=2, train_limit=64)
    assert m1.mean == m2.mean and m1.components == m2.components
    # a different bound trains on a different md5-ranked prefix
    m3 = fit_pca(df, k=2, train_limit=128)
    assert m3.mean != m1.mean
