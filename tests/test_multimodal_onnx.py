"""image_embed's real-model seam (round-11: the R4 ONNX loader extended
to the embedding path) + TensorProto typed-storage acceptance.

Mirrors test_inference_onnx.py's laws at the multimodal seam: the same
checked artifact formats (.onnx single MatMul/Gemm via the engine's wire
codec, .npy), sha256 pinning, driver-resolved env routing, per-worker
cache — against image_embed's (doc_id, emb array<bigint>) contract."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from adtech_log_data_pipeline_spark.functions.multimodal import (
    EMBED_DIMS,
    EMBED_MODEL_ENV,
    EMBED_MODEL_SHA256_ENV,
    _blob_features,
    image_embed,
    with_blob_column,
)

from tests.test_inference_onnx import _gemm_model_bytes, _matmul_model_bytes


def _docs(spark):
    rows = [(i, f"document number {i} with some text", "en", "web", 30)
            for i in range(12)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _proj(seed: int = 3, out_dim: int = 4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((EMBED_DIMS, out_dim)).astype(np.float64)


def _expected(blobs: list[bytes], w: np.ndarray, b: np.ndarray) -> dict:
    x = np.asarray([_blob_features(bl) for bl in blobs], np.float64) / 1e6
    y = np.rint((x @ w + b) * 1e6).astype(np.int64)
    return {bl: [int(v) for v in row] for bl, row in zip(blobs, y)}


def test_default_path_is_the_md5_formula(spark):
    out = image_embed(with_blob_column(_docs(spark))).collect()
    assert len(out) == 12
    for r in out:
        blob = f"document number {r['doc_id']} with some text".encode()
        assert r["emb"] == _blob_features(blob)


def test_onnx_and_npy_projections_agree_exactly(spark, tmp_path):
    w = _proj()
    npy = tmp_path / "proj.npy"
    np.save(npy, w)
    onnx = tmp_path / "proj.onnx"
    onnx.write_bytes(_matmul_model_bytes(w))

    blobs = with_blob_column(_docs(spark))
    texts = [f"document number {i} with some text".encode() for i in range(12)]
    want = _expected(texts, w, np.zeros(w.shape[1]))
    for path in (str(npy), str(onnx)):
        got = {r["doc_id"]: r["emb"] for r in image_embed(blobs, path).collect()}
        assert len(got) == 12
        for i in range(12):
            assert got[i] == want[texts[i]], path
            assert len(got[i]) == 4  # model output dim, not EMBED_DIMS


def test_gemm_bias_shifts_embeddings(spark, tmp_path):
    w = _proj(seed=5, out_dim=3)
    bias = np.array([0.25, -0.5, 1.0])
    p = tmp_path / "proj_gemm.onnx"
    p.write_bytes(_gemm_model_bytes(w, bias, trans_b=1))
    blobs = with_blob_column(_docs(spark))
    texts = [f"document number {i} with some text".encode() for i in range(12)]
    want = _expected(texts, w, bias)
    got = {r["doc_id"]: r["emb"] for r in image_embed(blobs, str(p)).collect()}
    for i in range(12):
        assert got[i] == want[texts[i]]


def test_wrong_input_dim_and_digest_fail_loudly(spark, tmp_path):
    bad = tmp_path / "bad.onnx"
    bad.write_bytes(_matmul_model_bytes(_proj()[: EMBED_DIMS - 2]))
    blobs = with_blob_column(_docs(spark))
    with pytest.raises(Exception, match="input dim"):
        image_embed(blobs, str(bad)).collect()

    good = tmp_path / "good.onnx"
    good.write_bytes(_matmul_model_bytes(_proj()))
    with pytest.raises(Exception, match="sha256"):
        image_embed(blobs, str(good), expect_digest="0" * 64).collect()
    # correct digest passes
    digest = hashlib.sha256(good.read_bytes()).hexdigest()
    assert image_embed(blobs, str(good), expect_digest=digest).count() == 12


def test_env_var_routing(spark, tmp_path, monkeypatch):
    w = _proj(seed=9)
    p = tmp_path / "env.onnx"
    p.write_bytes(_matmul_model_bytes(w))
    monkeypatch.setenv(EMBED_MODEL_ENV, str(p))
    monkeypatch.setenv(
        EMBED_MODEL_SHA256_ENV, hashlib.sha256(p.read_bytes()).hexdigest()
    )
    blobs = with_blob_column(_docs(spark))
    texts = [f"document number {i} with some text".encode() for i in range(12)]
    want = _expected(texts, w, np.zeros(w.shape[1]))
    got = {r["doc_id"]: r["emb"] for r in image_embed(blobs).collect()}
    for i in range(12):
        assert got[i] == want[texts[i]]


def test_typed_tensor_storage_accepted(tmp_path):
    """TensorProto float_data/double_data (onnx.helper raw=False) parse
    identically to raw_data — the round-10 ADVICE gap."""
    from adtech_log_data_pipeline_spark.operators.inference import (
        _load_onnx_linear,
        _onnx_specs,
    )
    from adtech_log_data_pipeline_spark.sources.protowire import encode_message

    w64 = _proj(seed=11, out_dim=2)
    w32 = w64.astype(np.float32)
    for data_type, mat, field in ((1, w32, "float_data"), (11, w64, "double_data")):
        model = {
            "ir_version": 8,
            "producer_name": "t",
            "graph": {
                "node": [{
                    "input": ["x", "W"], "output": ["y"],
                    "name": "l", "op_type": "MatMul", "domain": "",
                }],
                "name": "g",
                "initializer": [{
                    "dims": list(mat.shape),
                    "data_type": data_type,
                    "name": "W",
                    field: [float(v) for v in mat.reshape(-1)],
                }],
            },
            "opset_import": [{"domain": "", "version": 13}],
        }
        p = tmp_path / f"typed_{data_type}.onnx"
        p.write_bytes(encode_message(model, _onnx_specs()))
        got, bias = _load_onnx_linear(str(p))
        np.testing.assert_array_equal(got, mat)

    # dims/typed-count mismatch still fails loudly
    model["graph"]["initializer"][0]["double_data"] = [1.0, 2.0]
    p = tmp_path / "short.onnx"
    p.write_bytes(encode_message(model, _onnx_specs()))
    with pytest.raises(ValueError, match="typed values inconsistent"):
        _load_onnx_linear(str(p))
