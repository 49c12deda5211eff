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
    shape is rejected; unset falls back to the formula matrix. The cache
    is keyed by path, so switching artifacts never serves stale weights."""
    import adtech_log_data_pipeline_spark.operators.inference as inf

    rng = np.random.default_rng(7)
    w = rng.standard_normal((FEATURE_DIM, 10))
    p = tmp_path / "w.npy"
    np.save(p, w)
    monkeypatch.setenv(inf.MODEL_WEIGHTS_ENV, str(p))
    assert np.array_equal(inf._model_weights(), w)

    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((3, 3)))
    monkeypatch.setenv(inf.MODEL_WEIGHTS_ENV, str(bad))
    import pytest

    with pytest.raises(ValueError, match="shape"):
        inf._model_weights()

    monkeypatch.delenv(inf.MODEL_WEIGHTS_ENV)
    formula = inf._model_weights()
    assert formula.shape == (FEATURE_DIM, 10)
    assert formula[0, 0] == ((0 * 31 + 0 * 17) % 101 - 50) / 50.0


def _train_softmax(n: int = 512, steps: int = 200, lr: float = 0.5) -> np.ndarray:
    """Actually TRAIN a (784, 10) softmax regression on synthetic data
    (plain numpy gradient descent, fixed seed) — a real optimized
    artifact, not a random matrix."""
    rng = np.random.default_rng(42)
    x = rng.random((n, FEATURE_DIM))
    w_true = rng.standard_normal((FEATURE_DIM, 10))
    y = (x @ w_true).argmax(axis=1)
    onehot = np.eye(10)[y]
    w = np.zeros((FEATURE_DIM, 10))
    for _ in range(steps):
        logits = x @ w
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(axis=1, keepdims=True)
        w -= lr * x.T @ (p - onehot) / n
    # the model must have actually learned something before we ship it
    assert ((x @ w).argmax(axis=1) == y).mean() > 0.9
    return w


def test_prediction_job_with_trained_model_end_to_end(spark, tmp_path, monkeypatch):
    """The full prediction job (profiles -> blacklist -> sample ->
    features -> batched inference) run TWICE over sf0.001: once with the
    formula stand-in, once with a genuinely trained softmax shipped
    through $SPARK_GRAFT_MODEL_WEIGHTS. The trained run's outputs must
    match a driver-side numpy reference computed with the same trained
    weights (the path travels through the task closure into the Arrow
    workers), and must differ from the stand-in run somewhere."""
    import adtech_log_data_pipeline_spark.operators.inference as inf
    from adtech_log_data_pipeline_spark.plans.queries import (
        QUERY_THRESHOLDS,
        q_feature_inputs,
    )

    w = _train_softmax()
    p = tmp_path / "trained.npy"
    np.save(p, w)

    # sf0.01: the smallest SF where the sample+blacklist funnel leaves a
    # non-empty device set (the thresholds are tuned to sf0.01 activity)
    fi = q_feature_inputs(spark, "/root/testdata/sf0.01")
    fi_rows = fi.collect()
    assert len(fi_rows) > 0
    base = {r["uuid"]: (r["prediction"], r["score"]) for r in predict(fi).collect()}

    monkeypatch.setenv(inf.MODEL_WEIGHTS_ENV, str(p))
    trained = {
        r["uuid"]: (r["prediction"], r["score"]) for r in predict(fi).collect()
    }
    monkeypatch.delenv(inf.MODEL_WEIGHTS_ENV)

    # driver-side reference with the SAME trained weights
    pdf = pd.DataFrame([r.asDict() for r in fi_rows])
    logits = np.round(build_vectors(pdf) @ w, 6)
    expect = {
        u: (int(c), float(s))
        for u, c, s in zip(
            pdf["uuid"], logits.argmax(axis=1), logits.max(axis=1)
        )
    }
    assert set(trained) == set(expect)
    for u in expect:
        assert trained[u][0] == expect[u][0]
        assert abs(trained[u][1] - expect[u][1]) < 1e-6
    # a trained model is not the stand-in: some score must move
    assert trained != base


def test_scores_match_numpy_reference(spark):
    rows = [fi_row()]
    df = spark.createDataFrame(rows, FI_SCHEMA)
    got = predict(df).collect()[0]
    pdf = pd.DataFrame(rows, columns=df.columns)
    logits = np.round(build_vectors(pdf) @ _model_weights(), 6)
    assert got["prediction"] == int(logits.argmax(axis=1)[0])
    assert abs(got["score"] - float(logits.max(axis=1)[0])) < 1e-4


def test_weight_artifact_digest_and_dtype_checks(tmp_path, monkeypatch):
    """The checked-artifact seam: a digest mismatch (wrong/corrupted file)
    and a non-float dtype both fail loudly before any prediction is
    served; a correct pinned digest passes."""
    import pytest

    import adtech_log_data_pipeline_spark.operators.inference as inf

    rng = np.random.default_rng(11)
    w = rng.standard_normal((FEATURE_DIM, 10))
    p = tmp_path / "w.npy"
    np.save(p, w)
    good = inf._file_sha256(str(p))

    # correct digest: loads; wrong digest: refuses BEFORE deserializing
    assert np.array_equal(inf._load_weights(str(p), good), w)
    inf._MODEL_CACHE.clear()
    with pytest.raises(ValueError, match="sha256"):
        inf._load_weights(str(p), "0" * 64)

    # integer matrix: right shape, wrong dtype — rejected
    ints = tmp_path / "ints.npy"
    np.save(ints, np.zeros((FEATURE_DIM, 10), dtype=np.int64))
    with pytest.raises(ValueError, match="dtype"):
        inf._load_weights(str(ints))

    # env pin: predict() raises at PLAN BUILD time on a digest mismatch
    # (the check precedes mapInPandas, so no DataFrame is needed to hit it)
    monkeypatch.setenv(inf.MODEL_DIGEST_ENV, "f" * 64)
    with pytest.raises(ValueError, match="pinned"):
        inf.predict(None, weights_path=str(p))
    inf._MODEL_CACHE.clear()


def test_predictions_carry_model_id(spark, tmp_path):
    """Provenance column: formula runs stamp formula-v1; artifact runs
    stamp the file digest prefix — switching the artifact is visible in
    the OUTPUT, not just in logs."""
    import adtech_log_data_pipeline_spark.operators.inference as inf

    fi = spark.createDataFrame([fi_row()], FI_SCHEMA)
    assert predict(fi).select("model_id").distinct().collect()[0][0] == "formula-v1"

    w = np.random.default_rng(3).standard_normal((FEATURE_DIM, 10))
    p = tmp_path / "w.npy"
    np.save(p, w)
    expected = "npy-sha256:" + inf._file_sha256(str(p))[:12]
    got = predict(fi, weights_path=str(p)).select("model_id").distinct().collect()
    assert [r[0] for r in got] == [expected]
    inf._MODEL_CACHE.clear()
