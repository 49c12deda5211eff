"""Image-text pair-alignment laws (functions/multimodal.py::text_embed /
pair_alignment — the CLIP-filtering shape): the shared-space law (a
matched pair scores exactly 1e6), the centered-feature law (the round-12
formula collapsed every vector into one orthant, cosine ~1 for ALL
pairs), the threshold verdict, and the text tower's checked linear seam
(same ONNX/npy + sha256 contract as image_embed)."""

from __future__ import annotations

import numpy as np
import pytest

from adtech_log_data_pipeline_spark.functions.multimodal import (
    ALIGN_THRESHOLD_MICRO,
    EMBED_DIMS,
    _blob_features,
    image_embed,
    pair_alignment,
    text_embed,
)

from tests.test_inference_onnx import _gemm_model_bytes
from tests.test_multimodal_onnx import _docs, _proj


def _pairs(spark, n=12, swap_mod=4):
    """Labeled pairs: caption swapped to the next doc for doc_id %
    swap_mod == 0."""
    rows = []
    for i in range(n):
        cap_src = (i + 1) % n if i % swap_mod == 0 else i
        rows.append(
            (
                i,
                f"document number {i} with some text".encode(),
                f"document number {cap_src} with some text",
                i % swap_mod != 0,
            )
        )
    return spark.createDataFrame(
        rows, "doc_id long, blob binary, caption string, is_match boolean"
    )


def test_text_embed_shares_the_image_space(spark):
    """text_embed(text) == image_embed(utf-8 bytes of text): the two
    towers land matched content on the SAME point — the deterministic
    stand-in for CLIP's trained shared space."""
    docs = _docs(spark)
    txt = {r["doc_id"]: r["emb"] for r in text_embed(docs).collect()}
    for doc_id, emb in txt.items():
        blob = f"document number {doc_id} with some text".encode()
        assert emb == _blob_features(blob)


def test_features_are_centered(spark):
    """The featurizer must span both signs (the alignment screen is
    meaningless in a single orthant): across a small corpus, positive
    and negative components both appear, within [-1e6, 1e6)."""
    vals = [
        v
        for r in text_embed(_docs(spark)).collect()
        for v in r["emb"]
    ]
    assert min(vals) < 0 < max(vals)
    assert all(-1_000_000 <= v < 1_000_000 for v in vals)


def test_matched_pairs_score_exactly_one(spark):
    pairs = _pairs(spark)
    got = {r["doc_id"]: r for r in pair_alignment(pairs).collect()}
    labels = {r["doc_id"]: r["is_match"] for r in pairs.collect()}
    for doc_id, is_match in labels.items():
        if is_match:
            assert got[doc_id]["align_micro"] == 1_000_000
            assert got[doc_id]["hit"]
        else:
            assert got[doc_id]["align_micro"] < 1_000_000
        assert got[doc_id]["hit"] == (
            got[doc_id]["align_micro"] >= ALIGN_THRESHOLD_MICRO
        )


def test_mismatched_pairs_are_decorrelated(spark):
    """With centered md5 features the swapped captions must NOT all
    clear the threshold (the regression the centering fixed: the
    all-negative formula made every cosine ~1.0)."""
    pairs = _pairs(spark, n=40, swap_mod=2)  # 20 mismatched
    joined = (
        pair_alignment(pairs)
        .join(pairs.select("doc_id", "is_match"), "doc_id")
        .collect()
    )
    mism = [r["align_micro"] for r in joined if not r["is_match"]]
    assert len(mism) == 20
    assert sum(1 for v in mism if v < ALIGN_THRESHOLD_MICRO) >= 10


def test_text_model_seam_matches_manual_forward(spark, tmp_path):
    """The text tower's .onnx Gemm path: y = x @ W + b in float64 over
    the scaled features, rint to micros — bit-identical to the manual
    computation (the image_embed seam contract, same loader)."""
    w = _proj(seed=11, out_dim=4)
    b = np.arange(4, dtype=np.float64) / 7
    path = tmp_path / "tproj.onnx"
    path.write_bytes(_gemm_model_bytes(w, b))
    docs = _docs(spark)
    got = {
        r["doc_id"]: r["emb"]
        for r in text_embed(docs, model_path=str(path)).collect()
    }
    for doc_id, emb in got.items():
        feats = _blob_features(
            f"document number {doc_id} with some text".encode()
        )
        x = np.asarray(feats, np.float64) / 1e6
        want = [int(v) for v in np.rint((x @ w + b) * 1e6).astype(np.int64)]
        assert emb == want


def test_text_model_wrong_digest_fails(spark, tmp_path):
    w = _proj(seed=5, out_dim=2)
    path = tmp_path / "tproj.npy"
    np.save(path, w)
    with pytest.raises(Exception, match="sha256|digest"):
        text_embed(
            _docs(spark), model_path=str(path), expect_digest="0" * 64
        ).collect()
