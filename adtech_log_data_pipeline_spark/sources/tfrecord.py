"""TFRecord(gzip) source — S1 at full fidelity.

The reference's job-1 input is gzip'd TFRecord files of serialized BidLog
protos (`TFRecordIO.read().from(glob)` at jobs1/BidLogJob.java:135, glob
`input/bidlog*.tfrecord.gz` at utils/PathConfigs.java:31-33). The
spark-tensorflow-connector is not available in this environment, so this
module implements the (public, simple) TFRecord framing directly:

    per record:  uint64 length (LE) | uint32 masked_crc32c(length_bytes)
                 | payload bytes    | uint32 masked_crc32c(payload)
    masked_crc = ((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff
    crc32c polynomial (reflected): 0x82F63B78

Spark-first shape: `spark.read.format("binaryFile")` parallelizes at file
granularity — the correct unit, since gzip streams are not splittable
(TFRecordIO has the same property) — and an Arrow-batched `mapInPandas`
unframes each file into one `payload: binary` row per record. Composes
with `protowire.decode_proto_payloads` for the reference's exact input
path: bidlog*.tfrecord.gz -> BidLog rows with malformed-proto drop.

Corrupt framing (bad CRC, truncated record) raises TFRecordError and fails
the read, matching TFRecordIO's IOException — framing corruption is a
data-integrity event, unlike a malformed *payload*, which is dropped
row-wise (ProtoUtils semantics).

At 100 TB: one task per file; throughput scales with file count. The
driver-side `write_tfrecord` exists for fixtures/interop; a distributed
sink would be `df.foreachPartition` writing one shard per partition, which
`write_tfrecord_partitioned` provides.
"""

from __future__ import annotations

import glob as _glob
import gzip as _gzip
import io
import os
import struct as _struct
from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .protowire import Spec, WireError, decode_message, is_default_instance


class TFRecordError(IOError):
    """Corrupt TFRecord framing (truncation or CRC mismatch)."""


# crc32c (Castagnoli), reflected polynomial 0x82F63B78 — table-driven.
def _make_table() -> np.ndarray:
    poly = 0x82F63B78
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table[i] = crc
    return table


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    table = _TABLE
    for b in data:
        crc = int(table[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def _frame_record(payload: bytes) -> bytes:
    header = _struct.pack("<Q", len(payload))
    return (
        header
        + _struct.pack("<I", masked_crc32c(header))
        + payload
        + _struct.pack("<I", masked_crc32c(payload))
    )


def iter_tfrecords(stream: io.BufferedIOBase, verify_crc: bool = True) -> Iterator[bytes]:
    """Yield payloads from a TFRecord byte stream; raise on corrupt framing."""
    while True:
        header = stream.read(12)
        if not header:
            return
        if len(header) < 12:
            raise TFRecordError("truncated record header")
        (length,) = _struct.unpack_from("<Q", header, 0)
        (len_crc,) = _struct.unpack_from("<I", header, 8)
        if verify_crc and masked_crc32c(header[:8]) != len_crc:
            raise TFRecordError("length CRC mismatch")
        # A corrupt header can declare any 64-bit length; bound it BEFORE
        # read() so the lenient (verify_crc=False) path raises TFRecordError
        # instead of OverflowError / a giant allocation. 1 GiB is far above
        # any real record and far below anything read() could satisfy here.
        if length > (1 << 30):
            raise TFRecordError(f"unreasonable record length {length}")
        payload = stream.read(length)
        if len(payload) < length:
            raise TFRecordError("truncated payload")
        tail = stream.read(4)
        if len(tail) < 4:
            raise TFRecordError("truncated payload CRC")
        if verify_crc and masked_crc32c(payload) != _struct.unpack("<I", tail)[0]:
            raise TFRecordError("payload CRC mismatch")
        yield payload


def write_tfrecord(path: str, payloads: list[bytes], compress: bool | None = None) -> None:
    """Driver-side TFRecord writer (fixtures / interop). `compress=None`
    infers gzip from a `.gz` suffix."""
    if compress is None:
        compress = path.endswith(".gz")
    opener = _gzip.open if compress else open
    with opener(path, "wb") as f:
        for p in payloads:
            f.write(_frame_record(p))


def write_tfrecord_partitioned(
    df: DataFrame, directory: str, column: str = "payload", compress: bool = True
) -> None:
    """Distributed TFRecord sink: one `part-<pid>.tfrecord[.gz]` shard per
    partition (the runner-chosen-shards analogue of withNumShards(0)).

    DataFrame-native: the shard index comes from a spark_partition_id()
    column and the per-partition write is an Arrow-batched mapInPandas
    whose generator spans the whole partition (payloads accumulate across
    batches, one file write at partition end) — no drop to the RDD API."""
    from pyspark.sql import functions as F

    os.makedirs(directory, exist_ok=True)
    suffix = ".tfrecord.gz" if compress else ".tfrecord"

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payloads: list[bytes] = []
        pid = None
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iloc[0])
                payloads.extend(bytes(b) for b in pdf[column])
        if payloads:
            write_tfrecord(
                os.path.join(directory, f"part-{pid:05d}{suffix}"),
                payloads,
                compress=compress,
            )
        return iter(())

    (
        df.select(F.col(column), F.spark_partition_id().alias("__pid"))
        .mapInPandas(write_partition, schema="n long")
        .count()
    )


def read_tfrecord(
    spark: SparkSession, path_glob: str, verify_crc: bool = True
) -> DataFrame:
    """TFRecord source -> DataFrame[path string, payload binary].

    binaryFile gives (path, content) per file — one task per file, the
    natural parallelism for non-splittable gzip members. Unframing runs in
    Arrow batches; blobs never shuffle."""

    def unframe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if path.endswith(".gz"):
                    raw = _gzip.decompress(raw)
                payloads = list(iter_tfrecords(io.BytesIO(raw), verify_crc))
                yield pd.DataFrame(
                    {"path": [path] * len(payloads), "payload": payloads}
                )

    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("path", "content").mapInPandas(
        unframe, schema="path string, payload binary"
    )


def read_tfrecord_proto(
    spark: SparkSession,
    path_glob: str,
    spec: Spec,
    out_schema: str,
    to_row: Callable[[dict[str, Any]], dict[str, Any]],
    drop_default_instance: bool = True,
) -> DataFrame:
    """The reference's full input path: TFRecord(gzip) of serialized protos
    -> typed rows, dropping malformed payloads (BidLogJob.java:135 +
    the parse try/catch at jobs1/BidLogJob.java:112-117)."""
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(out_schema)
    names = [f.name for f in schema.fields]
    records = read_tfrecord(spark, path_glob)

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for payload in pdf["payload"]:
                try:
                    msg = decode_message(bytes(payload), spec)
                except WireError:
                    continue
                if drop_default_instance and is_default_instance(msg, spec):
                    continue
                rows.append(to_row(msg))
            yield pd.DataFrame(rows, columns=names)

    return records.mapInPandas(decode, schema=schema)


def local_tfrecord_paths(path_glob: str) -> list[str]:
    """Expand a local glob (fixture helper)."""
    return sorted(_glob.glob(path_glob))
