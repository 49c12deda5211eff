"""Protobuf WIRE-FORMAT codec (S3/S4 at full fidelity).

The reference persists newline-delimited Base64-encoded protobuf messages
and decodes them with a malformed-row-dropping try/catch
(utils/ProtoUtils.java:22-59, decode use at transforms/Features.java:62-79).
`codecs.py` ships the same framing with a JSON payload; this module speaks
the real protobuf *wire format* for the reference's message schemas
(proto field numbers below match the .proto sources exactly), so data
written by the reference's Java pipeline is readable by this engine and
vice versa — without requiring protoc, the google.protobuf package, or the
spark-protobuf jar, none of which this environment provides.

Two paths, same semantics:

  * preferred (when the optional spark-protobuf jar + a compiled descriptor
    set ARE available): `pyspark.sql.protobuf.functions.from_protobuf` /
    `to_protobuf` — JVM-side, vectorized; see `have_spark_protobuf()` and
    `read_b64_proto_jvm()`.
  * fallback (always works): a pure-Python wire codec run through
    Arrow-batched `mapInPandas`. This is a sanctioned boundary codec —
    the blobs enter/leave the engine exactly once, the hot path stays
    columnar Parquet — not a per-row UDF in an analytic plan.

Message schemas (field numbers from the reference protos):

  DeviceId              os=1 (enum), uuid=2            common.proto:11-19
  DeviceProfile         device_id=1, app=5, first_at=9,
                        last_at=10, geo=11             profile.proto:53-82
    .AppActivity        bundle=1, first_at=2, last_at=3,
                        count_per_exchange=6 (map)     profile.proto:66-75
    .GeoActivity        country=1, region=2            profile.proto:77-81
  AppProfile            bundle=1, user_count=2,
                        _user_count_per_exchange=3     profile.proto:129-145
  InAppPurchaseProfile  bundle=1, num_purchasers=2,
                        total_amount=3                 profile.proto:44-51
  PredictionData        id=1, prediction=2, score=3    data.proto:18-25

Malformed handling mirrors protobuf-java `parseFrom`: truncated varints /
payloads, wire-type mismatches on known fields, and invalid UTF-8 raise —
and the reading wrappers drop those rows (ProtoUtils.decodeMessageBase64
returns null on InvalidProtocolBufferException; Features.java drops nulls).
Unknown fields are skipped, not errors (proto3 semantics).
"""

from __future__ import annotations

import base64
import struct as _struct
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


class WireError(ValueError):
    """Malformed wire bytes (the InvalidProtocolBufferException analogue)."""


# ---------------------------------------------------------------------------
# message specs


@dataclass(frozen=True)
class Field:
    number: int
    name: str
    # int32|int64|enum|string|double|message|map_i32_i32|bytes|
    # packed_int64|packed_float|packed_double|map_str_msg (the packed/map
    # kinds exist for tf.train.Example — sources/tfexample.py — and the
    # ONNX TensorProto float_data/double_data storage)
    kind: str
    repeated: bool = False
    message: "Spec | None" = None


@dataclass(frozen=True)
class Spec:
    name: str
    fields: tuple[Field, ...]

    @property
    def by_number(self) -> dict[int, Field]:
        return {f.number: f for f in self.fields}

    def default(self) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for f in self.fields:
            if f.repeated or f.kind in (
                "packed_int64", "packed_float", "packed_double"
            ):
                out[f.name] = []
            elif f.kind in ("map_i32_i32", "map_str_msg"):
                out[f.name] = {}
            elif f.kind == "message":
                out[f.name] = None
            elif f.kind == "bytes":
                out[f.name] = b""
            elif f.kind in ("string",):
                out[f.name] = ""
            elif f.kind == "double":
                out[f.name] = 0.0
            else:
                out[f.name] = 0
        return out


DEVICE_ID = Spec("DeviceId", (
    Field(1, "os", "enum"),
    Field(2, "uuid", "string"),
))

GEO_ACTIVITY = Spec("GeoActivity", (
    Field(1, "country", "string"),
    Field(2, "region", "string"),
))

APP_ACTIVITY = Spec("AppActivity", (
    Field(1, "bundle", "string"),
    Field(2, "first_at", "int64"),
    Field(3, "last_at", "int64"),
    Field(6, "count_per_exchange", "map_i32_i32"),
))

DEVICE_PROFILE = Spec("DeviceProfile", (
    Field(1, "device_id", "message", message=DEVICE_ID),
    Field(5, "app", "message", repeated=True, message=APP_ACTIVITY),
    Field(9, "first_at", "int64"),
    Field(10, "last_at", "int64"),
    Field(11, "geo", "message", repeated=True, message=GEO_ACTIVITY),
))

APP_PROFILE = Spec("AppProfile", (
    Field(1, "bundle", "string"),
    Field(2, "user_count", "int32"),
    Field(3, "user_count_per_exchange", "map_i32_i32"),
))

IN_APP_PURCHASE_PROFILE = Spec("InAppPurchaseProfile", (
    Field(1, "bundle", "string"),
    Field(2, "num_purchasers", "int64"),
    Field(3, "total_amount", "int64"),
))

PREDICTION_DATA = Spec("PredictionData", (
    Field(1, "id", "message", message=DEVICE_ID),
    Field(2, "prediction", "int32"),
    Field(3, "score", "double"),
))

OS_TO_NAME = {0: "UNKNOWN_OS_TYPE", 1: "ANDROID", 2: "IOS"}
NAME_TO_OS = {v: k for k, v in OS_TO_NAME.items()}

# BidLog (bid.proto:12-40) with the OpenRTB BidRequest SUBSET the pipeline
# actually reads (SURVEY §1.2: 6 leaves; reads at BidLogUtils.java:82-96,
# 126-132). Unknown-field skipping means full OpenRTB payloads written by
# the reference decode fine here — the other ~2900 proto lines are dead
# weight we never model. Field numbers from vendor/openrtb.proto:
# BidRequest{id=1, app=4, device=5}, App{bundle=8},
# Device{geo=4, os=14, ifa=20}, Geo{country=3, region=4}.

RTB_GEO = Spec("Geo", (
    Field(3, "country", "string"),
    Field(4, "region", "string"),
))

RTB_APP = Spec("App", (
    Field(8, "bundle", "string"),
))

RTB_DEVICE = Spec("Device", (
    Field(4, "geo", "message", message=RTB_GEO),
    Field(14, "os", "string"),
    Field(20, "ifa", "string"),
))

BID_REQUEST = Spec("BidRequest", (
    Field(1, "id", "string"),
    Field(4, "app", "message", message=RTB_APP),
    Field(5, "device", "message", message=RTB_DEVICE),
))

BID_LOG = Spec("BidLog", (
    Field(1, "bid_request", "message", message=BID_REQUEST),
    Field(2, "exchange", "enum"),
    Field(3, "received_at", "int64"),
    Field(4, "processed_at", "int64"),
    Field(5, "bid_result", "enum"),
    Field(6, "bid_price", "int32"),
))

_MAP_ENTRY = Spec("MapEntry", (
    Field(1, "key", "int32"),
    Field(2, "value", "int32"),
))


def _str_msg_entry(value_spec: "Spec") -> "Spec":
    """Synthetic entry spec for a map<string, Message> field."""
    return Spec("StrMsgEntry", (
        Field(1, "key", "string"),
        Field(2, "value", "message", message=value_spec),
    ))


# ---------------------------------------------------------------------------
# wire primitives


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise WireError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift >= 70:
            raise WireError("varint too long")
    return result, pos


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:  # int32/int64 negatives are 10-byte two's-complement
        value &= (1 << 64) - 1
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def _signed32(value: int) -> int:
    value &= (1 << 64) - 1  # java int32 fields travel as 64-bit varints
    value &= (1 << 32) - 1
    return value - (1 << 32) if value >= (1 << 31) else value


def _skip(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == _WIRE_VARINT:
        _, pos = _read_varint(buf, pos)
    elif wire_type == _WIRE_I64:
        pos += 8
    elif wire_type == _WIRE_LEN:
        n, pos = _read_varint(buf, pos)
        pos += n
    elif wire_type == _WIRE_I32:
        pos += 4
    else:
        raise WireError(f"unsupported wire type {wire_type}")
    if pos > len(buf):
        raise WireError("truncated field")
    return pos


# ---------------------------------------------------------------------------
# decode / encode


def decode_message(buf: bytes, spec: Spec) -> dict[str, Any]:
    """Parse wire bytes into a plain dict (proto3 defaults filled in).
    Raises WireError on malformed input — callers drop the row."""
    msg = spec.default()
    by_number = spec.by_number
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if fno == 0:
            raise WireError("field number 0")
        f = by_number.get(fno)
        if f is None:
            pos = _skip(buf, pos, wt)
            continue
        if f.kind in ("int32", "int64", "enum"):
            if wt != _WIRE_VARINT:
                raise WireError(f"{spec.name}.{f.name}: expected varint")
            raw, pos = _read_varint(buf, pos)
            msg[f.name] = _signed32(raw) if f.kind == "int32" else _signed64(raw)
        elif f.kind == "double":
            if wt != _WIRE_I64:
                raise WireError(f"{spec.name}.{f.name}: expected fixed64")
            if pos + 8 > len(buf):
                raise WireError("truncated double")
            msg[f.name] = _struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif f.kind == "packed_int64" and wt == _WIRE_VARINT:
            # unpacked element of a packed-able field (proto3 parsers
            # accept both encodings)
            raw, pos = _read_varint(buf, pos)
            msg[f.name].append(_signed64(raw))
        elif f.kind == "packed_float" and wt == _WIRE_I32:
            if pos + 4 > len(buf):
                raise WireError("truncated float")
            msg[f.name].append(_struct.unpack_from("<f", buf, pos)[0])
            pos += 4
        elif f.kind == "packed_double" and wt == _WIRE_I64:
            if pos + 8 > len(buf):
                raise WireError("truncated double")
            msg[f.name].append(_struct.unpack_from("<d", buf, pos)[0])
            pos += 8
        elif wt != _WIRE_LEN:
            raise WireError(f"{spec.name}.{f.name}: expected length-delimited")
        else:
            n, pos = _read_varint(buf, pos)
            if pos + n > len(buf):
                raise WireError("truncated payload")
            payload = bytes(buf[pos:pos + n])
            pos += n
            if f.kind == "string":
                try:
                    s = payload.decode("utf-8")
                except UnicodeDecodeError as e:
                    raise WireError("invalid UTF-8") from e
                if f.repeated:
                    msg[f.name].append(s)
                else:
                    msg[f.name] = s
            elif f.kind == "bytes":
                if f.repeated:
                    msg[f.name].append(payload)
                else:
                    msg[f.name] = payload
            elif f.kind == "packed_int64":
                p = 0
                while p < len(payload):
                    raw, p = _read_varint(payload, p)
                    msg[f.name].append(_signed64(raw))
            elif f.kind == "packed_float":
                if len(payload) % 4:
                    raise WireError("packed float payload not 4-aligned")
                msg[f.name].extend(
                    _struct.unpack(f"<{len(payload) // 4}f", payload)
                )
            elif f.kind == "packed_double":
                if len(payload) % 8:
                    raise WireError("packed double payload not 8-aligned")
                msg[f.name].extend(
                    _struct.unpack(f"<{len(payload) // 8}d", payload)
                )
            elif f.kind == "map_i32_i32":
                entry = decode_message(payload, _MAP_ENTRY)
                msg[f.name][entry["key"]] = entry["value"]
            elif f.kind == "map_str_msg":
                entry = decode_message(payload, _str_msg_entry(f.message))
                msg[f.name][entry["key"]] = entry["value"]
            elif f.kind == "message":
                sub = decode_message(payload, f.message)
                if f.repeated:
                    msg[f.name].append(sub)
                else:
                    msg[f.name] = sub
            else:  # pragma: no cover
                raise WireError(f"unhandled kind {f.kind}")
    return msg


def encode_message(msg: dict[str, Any], spec: Spec) -> bytes:
    """Serialize a dict to canonical proto3 wire bytes: default values are
    omitted, fields in field-number order, map entries sorted by key (the
    deterministic-serialization convention)."""
    out = bytearray()
    for f in spec.fields:
        v = msg.get(f.name)
        if f.kind in ("int32", "int64", "enum"):
            if v:
                _write_varint(out, f.number << 3 | _WIRE_VARINT)
                _write_varint(out, int(v))
        elif f.kind == "double":
            if v:
                _write_varint(out, f.number << 3 | _WIRE_I64)
                out += _struct.pack("<d", float(v))
        elif f.kind == "string":
            vals = (v or []) if f.repeated else ([v] if v else [])
            for s in vals:
                raw = s.encode("utf-8")
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, len(raw))
                out += raw
        elif f.kind == "bytes":
            raws = (v or []) if f.repeated else ([v] if v else [])
            for raw in raws:
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, len(raw))
                out += bytes(raw)
        elif f.kind == "packed_int64":
            if v:
                body = bytearray()
                for x in v:
                    _write_varint(body, int(x))
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, len(body))
                out += body
        elif f.kind == "packed_float":
            if v:
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, 4 * len(v))
                out += _struct.pack(f"<{len(v)}f", *v)
        elif f.kind == "packed_double":
            if v:
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, 8 * len(v))
                out += _struct.pack(f"<{len(v)}d", *v)
        elif f.kind == "map_i32_i32":
            for k in sorted(v or {}):
                entry = encode_message({"key": k, "value": v[k]}, _MAP_ENTRY)
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, len(entry))
                out += entry
        elif f.kind == "map_str_msg":
            entry_spec = _str_msg_entry(f.message)
            for k in sorted(v or {}):
                entry = encode_message({"key": k, "value": v[k]}, entry_spec)
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, len(entry))
                out += entry
        elif f.kind == "message":
            subs = (v or []) if f.repeated else ([] if v is None else [v])
            for sub in subs:
                raw = encode_message(sub, f.message)
                _write_varint(out, f.number << 3 | _WIRE_LEN)
                _write_varint(out, len(raw))
                out += raw
    return bytes(out)


def is_default_instance(msg: dict[str, Any], spec: Spec) -> bool:
    """True iff the message equals the proto default instance — the
    reference drops these (F7, Features.java:75-77, 96-98)."""
    return not encode_message(msg, spec)


# ---------------------------------------------------------------------------
# engine-schema mapping for DeviceProfile (proto dict <-> flat columns)

DEVICE_PROFILE_SQL_SCHEMA = (
    "os string, uuid string, first_at long, last_at long,"
    " apps array<struct<bundle:string, first_at:long, last_at:long,"
    " count_per_exchange:map<int,int>>>,"
    " geos array<struct<country:string, region:string>>"
)


def device_profile_to_row(msg: dict[str, Any]) -> dict[str, Any]:
    did = msg["device_id"] or DEVICE_ID.default()
    return {
        "os": OS_TO_NAME.get(did["os"], "UNKNOWN_OS_TYPE"),
        "uuid": did["uuid"],
        "first_at": msg["first_at"],
        "last_at": msg["last_at"],
        "apps": [
            {"bundle": a["bundle"], "first_at": a["first_at"],
             "last_at": a["last_at"],
             "count_per_exchange": a["count_per_exchange"]}
            for a in msg["app"]
        ],
        "geos": [{"country": g["country"], "region": g["region"]}
                 for g in msg["geo"]],
    }


def _aslist(v: Any) -> list:
    # Arrow batches hand list columns to pandas as numpy arrays, whose
    # truthiness is ambiguous — test for None explicitly.
    return [] if v is None else list(v)


def row_to_device_profile(row: dict[str, Any]) -> dict[str, Any]:
    return {
        "device_id": {"os": NAME_TO_OS.get(row["os"], 0), "uuid": row["uuid"]},
        "first_at": row["first_at"],
        "last_at": row["last_at"],
        "app": [
            {"bundle": a["bundle"], "first_at": a["first_at"],
             "last_at": a["last_at"],
             "count_per_exchange": dict(_aslist(a["count_per_exchange"]))
             if not isinstance(a["count_per_exchange"], dict)
             else dict(a["count_per_exchange"])}
            for a in _aslist(row["apps"])
        ],
        "geo": [{"country": g["country"], "region": g["region"]}
                for g in _aslist(row["geos"])],
    }


BID_LOG_SQL_SCHEMA = (
    "bid_id string, exchange int, bid_result int, bid_price int,"
    " received_at long, processed_at long, device_os string,"
    " device_ifa string, app_bundle string, geo_country string,"
    " geo_region string"
)


def bidlog_to_row(msg: dict[str, Any]) -> dict[str, Any]:
    """Flatten a decoded BidLog to the engine's bid_logs schema — the same
    6-leaf projection BidLogUtils.getDeviceProfile performs."""
    br = msg["bid_request"] or BID_REQUEST.default()
    dev = br["device"] or RTB_DEVICE.default()
    app = br["app"] or RTB_APP.default()
    geo = dev["geo"] or RTB_GEO.default()
    return {
        "bid_id": br["id"],
        "exchange": msg["exchange"],
        "bid_result": msg["bid_result"],
        "bid_price": msg["bid_price"],
        "received_at": msg["received_at"],
        "processed_at": msg["processed_at"],
        "device_os": dev["os"],
        "device_ifa": dev["ifa"],
        "app_bundle": app["bundle"],
        "geo_country": geo["country"],
        "geo_region": geo["region"],
    }


def row_to_bidlog(row: dict[str, Any]) -> dict[str, Any]:
    return {
        "bid_request": {
            "id": row["bid_id"],
            "app": {"bundle": row["app_bundle"]},
            "device": {
                "geo": {"country": row["geo_country"],
                        "region": row["geo_region"]},
                "os": row["device_os"],
                "ifa": row["device_ifa"],
            },
        },
        "exchange": row["exchange"],
        "received_at": row["received_at"],
        "processed_at": row["processed_at"],
        "bid_result": row["bid_result"],
        "bid_price": row["bid_price"],
    }


# ---------------------------------------------------------------------------
# Spark integration (Arrow-batched boundary codec)


def read_b64_proto(
    spark: SparkSession,
    path: str,
    spec: Spec,
    out_schema: str,
    to_row: Callable[[dict[str, Any]], dict[str, Any]],
    drop_default_instance: bool = True,
) -> DataFrame:
    """Text source of Base64(proto-wire) lines -> typed DataFrame, dropping
    malformed rows (S2+S3 with real proto payloads)."""
    raw = spark.read.text(path)
    return decode_b64_proto(raw, spec, out_schema, to_row, drop_default_instance)


def decode_b64_proto(
    df: DataFrame,
    spec: Spec,
    out_schema: str,
    to_row: Callable[[dict[str, Any]], dict[str, Any]],
    drop_default_instance: bool = True,
) -> DataFrame:
    """`value` string column of Base64(wire bytes) -> typed rows."""
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(out_schema)
    names = [f.name for f in schema.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for v in pdf["value"]:
                try:
                    raw = base64.b64decode(v, validate=True)
                    msg = decode_message(raw, spec)
                except (WireError, ValueError):
                    continue  # malformed-drop (ProtoUtils try/catch)
                if drop_default_instance and is_default_instance(msg, spec):
                    continue  # F7 default-instance filter
                rows.append(to_row(msg))
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(batches, schema=schema)


def encode_b64_proto(
    df: DataFrame,
    spec: Spec,
    from_row: Callable[[dict[str, Any]], dict[str, Any]],
) -> DataFrame:
    """Typed rows -> one Base64(wire bytes) text column named `value`
    (the TextIO shape — IOUtils.encodeB64AndWrite)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals = [
                base64.b64encode(
                    encode_message(from_row(rec), spec)
                ).decode("ascii")
                for rec in pdf.to_dict("records")
            ]
            yield pd.DataFrame({"value": vals})

    return df.mapInPandas(batches, schema="value string")


def _fast_batch_encoder(spec: Spec, from_row) -> Callable | None:
    """Vectorized whole-batch encoder for the fixed hot shapes
    (sources/_wirevec.py), resolved AT CLOSURE-CREATION TIME on the
    driver (the pickled spec copy inside a Python worker would fail an
    identity check). Returns None when no fast path exists; a fast
    encoder itself returns None for a batch whose dtypes it cannot prove
    clean, and the caller falls back to the scalar path — so semantics
    (including error behavior on dirty input) stay exactly scalar."""
    if spec is BID_LOG and from_row is row_to_bidlog:
        from ._wirevec import encode_bidlog_rows

        return encode_bidlog_rows
    return None


def encode_wire_proto(
    df: DataFrame,
    spec: Spec,
    from_row: Callable[[dict[str, Any]], dict[str, Any]],
) -> DataFrame:
    """Typed rows -> one raw wire-bytes binary column named `payload` —
    the TFRecord-sink shape (each payload becomes one framed record via
    sources/tfrecord.py::write_tfrecord_partitioned). Arrow-batched;
    blobs are produced in place and never shuffle. Known specs encode
    through the vectorized lockstep path (guide §4.2, bit-identical —
    see _wirevec.py)."""
    fast = _fast_batch_encoder(spec, from_row)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals = fast(pdf) if fast is not None else None
            if vals is None:
                vals = [
                    encode_message(from_row(rec), spec)
                    for rec in pdf.to_dict("records")
                ]
            yield pd.DataFrame({"payload": vals})

    return df.mapInPandas(batches, schema="payload binary")


def write_b64_proto(
    df: DataFrame,
    path: str,
    spec: Spec,
    from_row: Callable[[dict[str, Any]], dict[str, Any]],
    single_file: bool = False,
) -> None:
    """Base64 proto text sink (S4). `single_file` mirrors withNumShards(1)
    locally; never at scale."""
    out = encode_b64_proto(df, spec, from_row)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# optional JVM path (spark-protobuf)


def have_spark_protobuf(spark: SparkSession) -> bool:
    """True when the optional spark-protobuf jar is on the classpath (it is
    a separate artifact, not bundled with pyspark)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:
        return False


def decode_b64_proto_jvm(
    df: DataFrame, message_name: str, desc_file: str
) -> DataFrame:
    """JVM-side decode via pyspark.sql.protobuf for deployments that ship
    the spark-protobuf jar and a `protoc --descriptor_set_out` file; the
    plan shape matches decode_b64_proto (unbase64 -> parse -> drop
    malformed) with mode=PERMISSIVE yielding null structs for bad rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.protobuf.functions import from_protobuf

    parsed = df.select(
        from_protobuf(
            F.expr("try_to_binary(value, 'base64')"),
            message_name,
            descFilePath=desc_file,
            options={"mode": "PERMISSIVE"},
        ).alias("r")
    )
    return parsed.filter(F.col("r").isNotNull()).select("r.*")


def decode_b64_proto_auto(
    df: DataFrame,
    spec: Spec,
    out_schema: str,
    to_row: Callable[[dict[str, Any]], dict[str, Any]],
    message_name: str | None = None,
    desc_file: str | None = None,
    drop_default_instance: bool = True,
) -> DataFrame:
    """Capability-routed proto decode (reference: ProtoUtils.java:22-42):
    when the spark-protobuf jar is on the classpath AND the caller supplies
    a compiled descriptor set (``protoc --descriptor_set_out``), decode
    JVM-side with ``from_protobuf`` — codegen'd, no Python in the hot
    path; otherwise fall back to the Arrow-batched wire-format decoder,
    which needs no jar and no compiled protos. Both paths drop malformed
    records rather than failing the job."""
    spark = df.sparkSession
    if message_name and desc_file and have_spark_protobuf(spark):
        return decode_b64_proto_jvm(df, message_name, desc_file)
    return decode_b64_proto(
        df, spec, out_schema, to_row, drop_default_instance=drop_default_instance
    )
