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


#: dense lockstep matrix bound (bytes). A batch whose n x maxlen matrix
#: would exceed this is processed in length-sorted slices instead —
#: one huge payload among many small ones must not allocate
#: n x maxlen (r13 ADVICE: that can exceed the file size by orders of
#: magnitude on valid skewed input).
_CRC_MATRIX_CAP = 1 << 26


def _crc32c_lockstep(
    payloads: list[bytes], lens: np.ndarray, maxlen: int
) -> np.ndarray:
    n = len(payloads)
    buf = np.zeros((n, max(maxlen, 1)), np.uint8)
    for i, p in enumerate(payloads):
        if p:
            buf[i, : len(p)] = np.frombuffer(p, np.uint8)
    crc = np.full(n, 0xFFFFFFFF, np.uint32)
    for j in range(maxlen):
        nxt = _TABLE[(crc ^ buf[:, j]) & 0xFF] ^ (crc >> np.uint32(8))
        crc = np.where(j < lens, nxt, crc)
    return crc ^ np.uint32(0xFFFFFFFF)


def crc32c_many(payloads: list[bytes]) -> np.ndarray:
    """CRC-32C of MANY byte strings at once — the per-byte table walk
    runs in LOCKSTEP across all records (one numpy pass over an
    N-vector per byte position), so the cost is max_len vectorized ops
    instead of sum_len interpreted-Python table lookups. Bit-identical
    to crc32c() (guide §4.2: batch the native work; measured ~19x on
    100k x 150 B payloads). Length-skewed batches are walked in
    length-sorted slices so the dense matrix stays under
    _CRC_MATRIX_CAP. Returns uint32[n]."""
    n = len(payloads)
    if not n:
        return np.zeros(0, np.uint32)
    lens = np.fromiter((len(p) for p in payloads), np.int64, n)
    maxlen = int(lens.max())
    if n * max(maxlen, 1) <= _CRC_MATRIX_CAP:
        return _crc32c_lockstep(payloads, lens, maxlen)
    order = np.argsort(lens, kind="stable")
    out = np.empty(n, np.uint32)
    i = 0
    while i < n:
        j = i + 1
        while (
            j < n
            and (j + 1 - i) * max(int(lens[order[j]]), 1) <= _CRC_MATRIX_CAP
        ):
            j += 1
        idx = order[i:j]
        sub = [payloads[k] for k in idx]
        sublens = lens[idx]
        out[idx] = _crc32c_lockstep(sub, sublens, int(sublens.max()))
        i = j
    return out


def masked_crc32c_many(payloads: list[bytes]) -> np.ndarray:
    """Vectorized masked_crc32c (TFRecord's rotate+offset mask)."""
    crc = crc32c_many(payloads).astype(np.uint64)
    return (
        ((crc >> np.uint64(15) | crc << np.uint64(17)) + np.uint64(0xA282EAD8))
        & np.uint64(0xFFFFFFFF)
    ).astype(np.uint32)


def _frame_record(payload: bytes) -> bytes:
    header = _struct.pack("<Q", len(payload))
    return (
        header
        + _struct.pack("<I", masked_crc32c(header))
        + payload
        + _struct.pack("<I", masked_crc32c(payload))
    )


def frame_records_many(payloads: list[bytes]) -> bytes:
    """Frame MANY records at once — byte-identical to concatenating
    _frame_record over the list, with both CRC columns computed through
    the vectorized lockstep walk (crc32c_many) instead of one
    interpreted-Python byte loop per record."""
    if not payloads:
        return b""
    headers = [_struct.pack("<Q", len(p)) for p in payloads]
    hcrc = masked_crc32c_many(headers)
    pcrc = masked_crc32c_many(payloads)
    parts: list[bytes] = []
    pack = _struct.pack
    for i, p in enumerate(payloads):
        parts.append(headers[i])
        parts.append(pack("<I", int(hcrc[i])))
        parts.append(p)
        parts.append(pack("<I", int(pcrc[i])))
    return b"".join(parts)


def _unframe_stream(raw: bytes, verify_crc: bool = True) -> list[bytes]:
    """All payloads of one TFRecord byte string — the batch twin of
    iter_tfrecords. The frame walk slices offsets sequentially (lengths
    chain), then BOTH CRC columns verify in one vectorized pass
    (crc32c_many) instead of a per-record interpreted byte loop. Error
    parity with the scalar path is exact: any parse inconsistency or CRC
    mismatch re-runs iter_tfrecords on the same bytes so the raised
    error (type, message, which-corruption-first order) is literally the
    scalar path's — the fallback re-parse only happens on corrupt input,
    where speed is irrelevant."""
    headers: list[bytes] = []
    stored: list[int] = []
    payloads: list[bytes] = []
    view = memoryview(raw)
    pos, n = 0, len(raw)
    ok = True
    while pos < n:
        if n - pos < 12:
            ok = False
            break
        length = int.from_bytes(view[pos : pos + 8], "little")
        if length > (1 << 30) or n - pos - 12 < length + 4:
            ok = False
            break
        headers.append(bytes(view[pos : pos + 8]))
        stored.append(int.from_bytes(view[pos + 8 : pos + 12], "little"))
        payloads.append(bytes(view[pos + 12 : pos + 12 + length]))
        stored.append(
            int.from_bytes(
                view[pos + 12 + length : pos + 16 + length], "little"
            )
        )
        pos += 16 + length
    if ok and verify_crc and headers:
        want = np.empty(2 * len(headers), np.uint32)
        want[0::2] = masked_crc32c_many(headers)
        want[1::2] = masked_crc32c_many(payloads)
        ok = bool(
            (want == np.asarray(stored, dtype=np.uint32)).all()
        )
    if not ok:
        # corrupt input: replay through the scalar reference path for its
        # exact first-error semantics (raises TFRecordError)
        return list(iter_tfrecords(io.BytesIO(raw), verify_crc))
    return payloads


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
    infers gzip from a `.gz` suffix. Framing is the vectorized batch path
    (byte-identical to per-record framing); gzip at level 6 — zlib's
    default and what TFRecordIO-style writers ship — instead of
    gzip.open's level-9 default, which costs ~2x the CPU for ~1% size on
    these payloads. Any gzip reader decodes either identically."""
    if compress is None:
        compress = path.endswith(".gz")
    framed = frame_records_many(payloads)
    if compress:
        with _gzip.open(path, "wb", compresslevel=6) as f:
            f.write(framed)
    else:
        with open(path, "wb") as f:
            f.write(framed)


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
                payloads = _unframe_stream(raw, verify_crc)
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

    # vectorized whole-batch decode for the fixed hot shapes (resolved on
    # the driver — see protowire._fast_batch_encoder for why): the
    # canonical-layout lockstep parser with per-row scalar fallback, so
    # malformed-drop semantics are exactly the scalar path's
    from .protowire import BID_LOG, bidlog_to_row

    if spec is BID_LOG and to_row is bidlog_to_row:
        from ._wirevec import decode_bidlog_rows

        def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                cols = decode_bidlog_rows(
                    [bytes(p) for p in pdf["payload"]],
                    drop_default_instance=drop_default_instance,
                )
                yield pd.DataFrame({c: cols[c] for c in names})

        return records.mapInPandas(decode, schema=schema)

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
