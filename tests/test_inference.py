"""Inference contract — ports judge __Test12/__Test14 semantics: exact
argmax with ties toward the smallest index (Predictions.java getArgMax
:38-46), score at 1e-4, determinism across partitionings, and the modulo
feature slots (PredictionUtils.java:50-52)."""

import numpy as np
import pandas as pd

from adtech_log_data_pipeline_spark.operators.inference import (
    FEATURE_DIM,
    MODULO_SLOTS,
    build_vectors,
    predict,
    _model_weights,
)

FI_SCHEMA = (
    "os string, uuid string, first_at long, app_count int, intersect_app long,"
    " intersect_purchaser long, intersect_amount long,"
    " f486 double, f586 double, f686 double, f777 double"
)


def fi_row(uuid="ABCDEF00-1111-2222-3333-444444444444", first_at=12345):
    return ("ANDROID", uuid, first_at, 3, 2, 15, 300, 0.5, 0.88, 0.5, 0.94)


def test_vector_shape_and_slots():
    pdf = pd.DataFrame(
        [fi_row()],
        columns=["os", "uuid", "first_at", "app_count", "intersect_app",
                 "intersect_purchaser", "intersect_amount", "f486", "f586", "f686", "f777"],
    )
    x = build_vectors(pdf)
    assert x.shape == (1, FEATURE_DIM) and x.dtype == np.float64
    assert x[0, 486] == 0.5
    assert x[0, 586] == 0.88
    assert x[0, 777] == 0.94
    for i in MODULO_SLOTS:
        assert x[0, i] == (12345 % i) / float(i)


def test_argmax_tie_breaks_to_smallest_index():
    # all-zero features -> logits all zero -> argmax must be class 0
    x = np.zeros((1, FEATURE_DIM))
    logits = np.round(x @ _model_weights(), 6)
    assert logits.argmax(axis=1)[0] == 0


def test_predict_schema_and_determinism(spark):
    rows = [fi_row(uuid=f"{i:08X}-1111-2222-3333-444444444444", first_at=100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, FI_SCHEMA)
    out1 = {r["uuid"]: (r["prediction"], r["score"]) for r in predict(df).collect()}
    # different physical partitioning must not change results
    out2 = {
        r["uuid"]: (r["prediction"], r["score"])
        for r in predict(df.repartition(7)).collect()
    }
    assert out1 == out2
    assert all(0 <= p <= 9 for p, _ in out1.values())


def test_model_weights_env_seam(tmp_path, monkeypatch):
    """$SPARK_GRAFT_MODEL_WEIGHTS loads a trained (784, 10) npy; a wrong
    shape is rejected; unset falls back to the formula matrix."""
    import adtech_log_data_pipeline_spark.operators.inference as inf

    rng = np.random.default_rng(7)
    w = rng.standard_normal((FEATURE_DIM, 10))
    p = tmp_path / "w.npy"
    np.save(p, w)
    monkeypatch.setenv(inf.MODEL_WEIGHTS_ENV, str(p))
    monkeypatch.setattr(inf, "_MODEL", None)
    assert np.array_equal(inf._model_weights(), w)

    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((3, 3)))
    monkeypatch.setenv(inf.MODEL_WEIGHTS_ENV, str(bad))
    monkeypatch.setattr(inf, "_MODEL", None)
    import pytest

    with pytest.raises(ValueError, match="shape"):
        inf._model_weights()

    monkeypatch.delenv(inf.MODEL_WEIGHTS_ENV)
    monkeypatch.setattr(inf, "_MODEL", None)
    formula = inf._model_weights()
    assert formula.shape == (FEATURE_DIM, 10)
    assert formula[0, 0] == ((0 * 31 + 0 * 17) % 101 - 50) / 50.0
    # leave the module global back at the formula matrix for later tests
    monkeypatch.setattr(inf, "_MODEL", None)


def test_scores_match_numpy_reference(spark):
    rows = [fi_row()]
    df = spark.createDataFrame(rows, FI_SCHEMA)
    got = predict(df).collect()[0]
    pdf = pd.DataFrame(rows, columns=df.columns)
    logits = np.round(build_vectors(pdf) @ _model_weights(), 6)
    assert got["prediction"] == int(logits.argmax(axis=1)[0])
    assert abs(got["score"] - float(logits.max(axis=1)[0])) < 1e-4
