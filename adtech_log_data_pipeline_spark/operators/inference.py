"""Feature-vector assembly + batched model inference (reference:
utils/PredictionUtils.java:35-57 for the 784-float vector, transforms/
Predictions.java:129-225 for the batched TF inference; SURVEY.md §2 R2-R4).

The reference loads a TensorFlow SavedModel once per worker (@Setup) and
buffers <=60 inputs per session.run. The Spark-native equivalent is an
Arrow-batched ``mapInPandas``: the model lives in a module-level global
(one load per Python worker process), and each Arrow batch is one
vectorized matrix multiply — the same amortization, expressed through the
engine's batching instead of hand-rolled buffers.

The model itself is a deterministic stand-in (fixed integer-formula weight
matrix) preserving the reference's contract: 10 logits, score = max,
prediction = argmax with ties broken toward the smallest index
(Predictions.java getArgMax:38-46 — np.argmax has the same tie rule).
The 15 base images are likewise engine-owned deterministic constants, NOT
copies of the reference's hardcoded image data.

Oracle reproducibility: every value in the pipeline is derived by integer
arithmetic followed by ONE double division (base pixels m/997, modulo
slots m/i, weights m/50 — each exactly rounded identically by any IEEE-754
engine), and the logits are rounded to 1e-6 before argmax/score so a
summation-order difference between numpy's pairwise matmul and the DuckDB
oracle's sequential list_sum can never flip a rank or a hash bit (the same
convention the similarity family uses for cosine ranking).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 784
N_CLASSES = 10
N_BASE_IMAGES = 15

# Ratio-feature slots (PredictionUtils.java:44-47) and the modulo slots
# feature[i] = (first_at % i) / i for i = 100, 140, ..., 700 (:50-52).
SLOT_F486, SLOT_F586, SLOT_F686, SLOT_F777 = 486, 586, 686, 777
MODULO_SLOTS = tuple(range(100, 701, 40))

# per-process weight cache keyed by source path (None = formula stand-in):
# one load per Python worker process per model artifact, the reference's
# @Setup SavedModel amortization (Predictions.java:146-169)
_MODEL_CACHE: dict[str | None, tuple[np.ndarray, np.ndarray]] = {}
_BASES: np.ndarray | None = None


def _base_images() -> np.ndarray:
    """15 deterministic 784-float base images in [0, 1), float64: pixel
    (k, i) = ((k+1)(i+1)·2654435761 mod 997) / 997 — exact integer work
    plus one exactly-rounded double division, restated verbatim in the
    DuckDB oracle."""
    global _BASES
    if _BASES is None:
        k = np.arange(N_BASE_IMAGES, dtype=np.int64)[:, None]
        i = np.arange(FEATURE_DIM, dtype=np.int64)[None, :]
        _BASES = ((k + 1) * (i + 1) * 2654435761) % 997 / 997.0
    return _BASES


MODEL_WEIGHTS_ENV = "SPARK_GRAFT_MODEL_WEIGHTS"
MODEL_DIGEST_ENV = "SPARK_GRAFT_MODEL_WEIGHTS_SHA256"
FORMULA_MODEL_ID = "formula-v1"


def _file_sha256(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


# --- ONNX model-file support (public onnx.proto field numbers) ------------
#
# A REAL serialized ONNX model is accepted at the same seam as .npy: the
# engine parses the protobuf itself with the repo's wire codec
# (sources/protowire.py), so no onnxruntime is required to SERVE a pure
# linear model — and when onnxruntime IS importable, tests cross-check the
# parsed weights against a real session run (tests/test_inference_onnx.py).
# Accepted graph shape: exactly one MatMul (y = x @ W) or plain Gemm
# (y = x @ W' + C — the skl2onnx/PyTorch Linear export) node with a
# (784, 10)-equivalent float/double weight initializer — anything else
# fails loudly (a model with activations must run under a real runtime,
# never be silently approximated by its first layer).
#
# Field numbers from the public onnx/onnx.proto:
#   ModelProto: ir_version=1, producer_name=2, graph=7, opset_import=8
#   GraphProto: node=1, name=2, initializer=5, input=11, output=12
#   NodeProto:  input=1, output=2, name=3, op_type=4, attribute=5, domain=7
#   AttributeProto: name=1, f=2 (float), i=3 (int64), type=20
#   TensorProto: dims=1, data_type=2, float_data=4, name=8, raw_data=9,
#                double_data=10   (data_type: FLOAT=1, DOUBLE=11)


def _onnx_specs():
    from ..sources.protowire import Field, Spec

    tensor = Spec("TensorProto", (
        Field(1, "dims", "packed_int64"),
        Field(2, "data_type", "int32"),
        Field(4, "float_data", "packed_float"),
        Field(8, "name", "string"),
        Field(9, "raw_data", "bytes"),
        Field(10, "double_data", "packed_double"),
    ))
    # AttributeProto.f is a single fixed32 float; the codec's packed_float
    # kind accepts the unpacked I32 wire form, so f decodes as a 0/1-item
    # list (read f[0], default 1.0 when absent)
    attr = Spec("AttributeProto", (
        Field(1, "name", "string"),
        Field(2, "f", "packed_float"),
        Field(3, "i", "int64"),
        Field(20, "type", "int32"),
    ))
    node = Spec("NodeProto", (
        Field(1, "input", "string", repeated=True),
        Field(2, "output", "string", repeated=True),
        Field(3, "name", "string"),
        Field(4, "op_type", "string"),
        Field(5, "attribute", "message", repeated=True, message=attr),
        Field(7, "domain", "string"),
    ))
    graph = Spec("GraphProto", (
        Field(1, "node", "message", repeated=True, message=node),
        Field(2, "name", "string"),
        Field(5, "initializer", "message", repeated=True, message=tensor),
    ))
    opset = Spec("OperatorSetIdProto", (
        Field(1, "domain", "string"),
        Field(2, "version", "int64"),
    ))
    model = Spec("ModelProto", (
        Field(1, "ir_version", "int64"),
        Field(2, "producer_name", "string"),
        Field(7, "graph", "message", message=graph),
        Field(8, "opset_import", "message", repeated=True, message=opset),
    ))
    return model


def _onnx_tensor(path: str, t: dict, want_rank: int) -> np.ndarray:
    """Materialize a TensorProto initializer. Both proto storage forms
    are accepted: ``raw_data`` (the onnx.helper raw=True default and
    what real exporters emit) and the typed repeated fields
    ``float_data``/``double_data`` (helper raw=False)."""
    dims = tuple(t["dims"])
    np_type = {1: np.dtype("<f4"), 11: np.dtype("<f8")}.get(t["data_type"])
    if np_type is None:
        raise ValueError(
            f"{path!r}: initializer {t['name']!r} data_type"
            f" {t['data_type']} is not FLOAT(1)/DOUBLE(11)"
        )
    n = 1
    for d in dims:
        n *= d
    raw = t["raw_data"]
    typed = t["float_data"] if t["data_type"] == 1 else t["double_data"]
    if raw and typed:
        raise ValueError(
            f"{path!r}: initializer {t['name']!r} carries BOTH raw_data"
            " and typed data storage"
        )
    if not raw and typed:
        if len(dims) != want_rank or len(typed) != n:
            raise ValueError(
                f"{path!r}: initializer {t['name']!r} dims {dims} /"
                f" {len(typed)} typed values inconsistent (want rank"
                f" {want_rank})"
            )
        return np.asarray(typed, dtype=np_type).reshape(dims)
    if len(dims) != want_rank or len(raw) != np_type.itemsize * n:
        raise ValueError(
            f"{path!r}: initializer {t['name']!r} dims {dims} / raw_data"
            f" {len(raw)} bytes inconsistent (want rank {want_rank},"
            f" {np_type})"
        )
    return np.frombuffer(raw, dtype=np_type).reshape(dims)


def _load_onnx_linear(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Extract (W, bias) from a serialized ONNX LINEAR model — a single
    default-domain node that is either

      MatMul:  y = x @ W                         (W: (784, 10))
      Gemm:    y = alpha * x @ W' + beta * C     (the skl2onnx/PyTorch
               Linear export; only alpha=1, beta=1, transA=0 accepted;
               transB=0 takes W as (784, 10), transB=1 as (10, 784)
               transposed; C optional, (10,) or (1, 10))

    Unknown fields (doc strings, value infos, metadata) are skipped by
    the wire decoder, so models exported by real tools parse fine; a
    graph that is anything else — extra nodes, activations, scaled
    alpha/beta — raises instead of being silently linearized."""
    with open(path, "rb") as f:
        buf = f.read()
    from ..sources.protowire import decode_message

    model = decode_message(buf, _onnx_specs())
    graph = model.get("graph")
    if not graph:
        raise ValueError(f"{path!r}: ONNX ModelProto has no graph")
    nodes = graph["node"]
    if len(nodes) != 1 or nodes[0]["domain"] or nodes[0]["op_type"] not in (
        "MatMul",
        "Gemm",
    ):
        raise ValueError(
            f"{path!r}: expected a single default-domain MatMul/Gemm node,"
            " got " + str([(n["op_type"], n["domain"]) for n in nodes])
        )
    node = nodes[0]
    inits = {t["name"]: t for t in graph["initializer"]}
    w_name = node["input"][1] if len(node["input"]) > 1 else None
    if w_name not in inits:
        raise ValueError(
            f"{path!r}: {node['op_type']}'s second input {w_name!r} has no"
            " initializer"
        )
    trans_b = 0
    if node["op_type"] == "Gemm":
        attrs = {a["name"]: a for a in node["attribute"]}
        alpha = attrs["alpha"]["f"][0] if attrs.get("alpha", {}).get("f") else 1.0
        beta = attrs["beta"]["f"][0] if attrs.get("beta", {}).get("f") else 1.0
        trans_a = attrs["transA"]["i"] if "transA" in attrs else 0
        trans_b = attrs["transB"]["i"] if "transB" in attrs else 0
        if alpha != 1.0 or beta != 1.0 or trans_a:
            raise ValueError(
                f"{path!r}: Gemm with alpha={alpha} beta={beta}"
                f" transA={trans_a} is not a plain linear layer"
            )
    w = _onnx_tensor(path, inits[w_name], want_rank=2)
    if trans_b:
        w = np.ascontiguousarray(w.T)
    bias = np.zeros(w.shape[1], dtype=np.float64)
    if node["op_type"] == "Gemm" and len(node["input"]) > 2:
        c_name = node["input"][2]
        if c_name not in inits:
            raise ValueError(
                f"{path!r}: Gemm bias input {c_name!r} has no initializer"
            )
        t = inits[c_name]
        c = _onnx_tensor(path, t, want_rank=len(tuple(t["dims"])))
        c = np.asarray(c).reshape(-1)
        if c.shape[0] != w.shape[1]:
            raise ValueError(
                f"{path!r}: Gemm bias length {c.shape[0]} != {w.shape[1]}"
            )
        bias = c.astype(np.float64)
    return w, bias


def _load_model(
    path: str | None, expect_digest: str | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """((784, 10) float64 weights, (10,) float64 bias), cached per
    (process, path).

    ``path`` names a trained model — a ``.npy`` (784, 10) matrix (bias
    zero) or a serialized single-MatMul/Gemm ``.onnx`` model (see
    _load_onnx_linear; Gemm carries the bias); it must be worker-visible
    (shared FS or --files-shipped). ``None`` selects the deterministic
    formula stand-in w[i, j] = ((31i + 17j mod 101) - 50) / 50 in
    [-1, 1], bias zero (the sandbox has no TF; the batching/argmax/score
    contract is identical either way).

    A wrong artifact fails LOUDLY, never silently: shape and float dtype
    are checked (np.load's allow_pickle=False default already rejects
    object payloads), and when ``expect_digest`` is given (sha256 hex,
    usually pinned via $SPARK_GRAFT_MODEL_WEIGHTS_SHA256) the file bytes
    are verified per worker process BEFORE deserialization — a stale or
    divergent copy on a non-shared filesystem raises instead of serving
    different predictions on different executors."""
    cached = _MODEL_CACHE.get(path)
    if cached is None:
        if path:
            cached = load_linear_artifact(
                path,
                expect_digest=expect_digest,
                want_shape=(FEATURE_DIM, N_CLASSES),
                env_label=MODEL_WEIGHTS_ENV,
            )
        else:
            i = np.arange(FEATURE_DIM, dtype=np.int64)[:, None]
            j = np.arange(N_CLASSES, dtype=np.int64)[None, :]
            w = ((i * 31 + j * 17) % 101 - 50) / 50.0
            cached = (w, np.zeros(N_CLASSES, dtype=np.float64))
        _MODEL_CACHE[path] = cached
    return cached


def load_linear_artifact(
    path: str,
    expect_digest: str | None = None,
    want_shape: tuple[int, int] | None = None,
    env_label: str = "model",
) -> tuple[np.ndarray, np.ndarray]:
    """The checked model-artifact seam, shared by every linear model
    consumer (predict's R4 classifier, multimodal.image_embed's
    projection head): sha256-verify the file bytes BEFORE
    deserialization when a digest is pinned, parse ``.onnx``
    (single MatMul/Gemm, engine wire codec) or ``.npy``, enforce float
    dtype and — when given — the exact (in, out) shape. Returns
    (float64 W, float64 bias); bias is zero for bias-less formats.
    Callers cache per (process, path) themselves."""
    if expect_digest:
        actual = _file_sha256(path)
        if actual != expect_digest.lower():
            raise ValueError(
                f"{env_label} file {path!r} sha256 {actual}"
                f" != expected {expect_digest}"
            )
    if path.endswith(".onnx"):
        w, b = _load_onnx_linear(path)
    else:
        w = np.load(path)
        b = np.zeros(w.shape[1] if w.ndim == 2 else 0, dtype=np.float64)
    if want_shape is not None and w.shape != want_shape:
        raise ValueError(
            f"{env_label} file {path!r} has shape {w.shape},"
            f" expected {want_shape}"
        )
    if not np.issubdtype(w.dtype, np.floating):
        raise ValueError(
            f"{env_label} file {path!r} has dtype {w.dtype},"
            " expected a float matrix"
        )
    return w.astype(np.float64), b.astype(np.float64)


def _load_weights(path: str | None, expect_digest: str | None = None) -> np.ndarray:
    """Weight matrix only — see _load_model (kept as the stable seam for
    callers/tests that don't care about the bias)."""
    return _load_model(path, expect_digest)[0]


def _model_weights() -> np.ndarray:
    """Weights per the CURRENT process's ``$SPARK_GRAFT_MODEL_WEIGHTS``.
    ``predict()`` resolves the env var on the DRIVER and ships the path in
    the task closure instead of calling this in workers — the job is
    configured where it is launched, and executors only need the file to
    be reachable, not the env var to be set."""
    import os

    return _load_weights(os.environ.get(MODEL_WEIGHTS_ENV))


def build_vectors(pdf: pd.DataFrame) -> np.ndarray:
    """Vectorized R2: (n, 784) float64 from the feature_inputs columns."""
    base_idx = (
        pdf["uuid"].str.upper().str.slice(0, 1).map(lambda ch: ord(ch) if ch else 0)
        % N_BASE_IMAGES
    ).to_numpy()
    x = _base_images()[base_idx].copy()
    x[:, SLOT_F486] = pdf["f486"].to_numpy(np.float64)
    x[:, SLOT_F586] = pdf["f586"].to_numpy(np.float64)
    x[:, SLOT_F686] = pdf["f686"].to_numpy(np.float64)
    x[:, SLOT_F777] = pdf["f777"].to_numpy(np.float64)
    first_at = pdf["first_at"].to_numpy(np.int64)
    for i in MODULO_SLOTS:
        x[:, i] = (first_at % i) / float(i)
    return x


def predict(
    feature_inputs: DataFrame, weights_path: str | None = None
) -> DataFrame:
    """R2+R3+R4 fused: feature assembly and batched inference in one
    Arrow-batched pass (no shuffle of 784-float arrays). Output matches the
    reference's BigQuery schema (PredictionJob.java:88-92):
      os string, uuid string, prediction int, score double
    Logits are rounded to 1e-6 before argmax/max (see module docstring).

    The model artifact path ($SPARK_GRAFT_MODEL_WEIGHTS, or the
    ``weights_path`` arg) is resolved HERE on the driver and shipped in
    the task closure; each worker process loads the file once
    (_load_weights cache).

    Provenance: every output row carries ``model_id`` — "formula-v1" for
    the deterministic stand-in, "npy-sha256:<12 hex>" /
    "onnx-sha256:<12 hex>" for a file artifact (.npy matrix or serialized
    single-MatMul/Gemm ONNX model). The digest is computed on the DRIVER at plan-build time
    (fails fast on a missing/wrong file) and shipped to workers as the
    expected digest, so every worker process verifies its local copy's
    bytes before serving predictions from it; pin an external expectation
    via $SPARK_GRAFT_MODEL_WEIGHTS_SHA256 to also catch a wrong file
    reaching the driver itself."""
    import os

    if weights_path is None:
        weights_path = os.environ.get(MODEL_WEIGHTS_ENV)
    expect_digest = None
    model_id = FORMULA_MODEL_ID
    if weights_path:
        expect_digest = _file_sha256(weights_path)
        pinned = os.environ.get(MODEL_DIGEST_ENV)
        if pinned and pinned.lower() != expect_digest:
            raise ValueError(
                f"{MODEL_WEIGHTS_ENV} file {weights_path!r} sha256"
                f" {expect_digest} != pinned {MODEL_DIGEST_ENV}={pinned}"
            )
        kind = "onnx" if weights_path.endswith(".onnx") else "npy"
        model_id = f"{kind}-sha256:{expect_digest[:12]}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, b = _load_model(weights_path, expect_digest)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = build_vectors(pdf)
            # float64 matmul (+ Gemm bias; zero for npy/formula),
            # order-insensitive after rounding
            logits = np.round(x @ w + b, 6)
            yield pd.DataFrame(
                {
                    "os": pdf["os"],
                    "uuid": pdf["uuid"],
                    "prediction": logits.argmax(axis=1).astype(np.int32),
                    "score": logits.max(axis=1),
                    "model_id": model_id,
                }
            )

    return feature_inputs.mapInPandas(
        run,
        schema="os string, uuid string, prediction int, score double,"
        " model_id string",
    )
