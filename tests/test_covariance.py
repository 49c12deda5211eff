"""Exact scatter matrix + PCA laws (functions/similarity.py)."""

from __future__ import annotations

import math
import random

import numpy as np


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_scatter_matches_exact_integer_reference(spark):
    """gram and scatter computed by transparent python big-int arithmetic
    over the same micro quantization — must match bit for bit."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        embedding_covariance,
    )

    rng = random.Random(5)
    vecs = [[rng.uniform(-1, 1) for _ in range(5)] for _ in range(40)]
    # identical quantization chain: float32 -> float64 -> micro
    q = [
        [int(math.floor(float(np.float32(x)) * 1_000_000 + 0.5)) for x in v]
        for v in vecs
    ]
    n = len(q)
    rows = embedding_covariance(_emb_df(spark, vecs)).collect()
    assert len(rows) == 5 * 6 // 2
    for r in rows:
        i, j = r["i"], r["j"]
        gram = sum(v[i] * v[j] for v in q)
        s_i = sum(v[i] for v in q)
        s_j = sum(v[j] for v in q)
        assert r["n_vecs"] == n
        assert r["gram_micro2"] == gram, (i, j)
        assert r["scatter_micro2"] == n * gram - s_i * s_j, (i, j)


def test_scatter_partition_invariant(spark):
    """The mapInPandas partial-Gram reduce must not depend on layout."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        embedding_covariance,
    )

    rng = random.Random(9)
    vecs = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(30)]
    df = _emb_df(spark, vecs)
    a = {
        (r["i"], r["j"]): (r["gram_micro2"], r["scatter_micro2"])
        for r in embedding_covariance(df).collect()
    }
    b = {
        (r["i"], r["j"]): (r["gram_micro2"], r["scatter_micro2"])
        for r in embedding_covariance(df.repartition(7, "vec_id")).collect()
    }
    assert a == b


def test_pca_recovers_dominant_direction(spark):
    """Data generated along one axis + tiny noise: the first component
    must align with that axis and dominate explained variance."""
    from adtech_log_data_pipeline_spark.functions.similarity import (
        pca_components,
    )

    rng = random.Random(3)
    axis = np.zeros(6)
    axis[2] = 1.0
    vecs = [
        (rng.gauss(0, 1.0) * axis + rng.gauss(0, 0.01) * np.ones(6)).tolist()
        for _ in range(200)
    ]
    comps, explained = pca_components(_emb_df(spark, vecs), k=3)
    assert comps.shape == (3, 6)
    # descending variance, top component explains nearly everything
    assert explained[0] >= explained[1] >= explained[2] >= 0
    assert explained[0] > 0.95
    assert abs(comps[0][2]) > 0.99
    # sign normalization: dominant entry positive
    assert comps[0][np.argmax(np.abs(comps[0]))] > 0
    # orthonormal rows
    g = comps @ comps.T
    assert np.allclose(g, np.eye(3), atol=1e-9)


def test_pca_empty_input(spark):
    from adtech_log_data_pipeline_spark.functions.similarity import (
        pca_components,
    )

    comps, explained = pca_components(
        _emb_df(spark, []).filter("vec_id < 0"), k=2
    )
    assert comps.shape == (0, 0) and explained.shape == (0,)
