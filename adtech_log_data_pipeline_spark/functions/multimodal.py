"""Multimodal-column plumbing — image/audio/video as opaque binary columns
with typed metadata (BASELINE.json north star).

The Spark-side machinery is REAL and tested: binary columns flow through
Arrow into `mapInPandas` batches, the decode UDF sees `bytes` objects, and
the output schema is typed metadata. The actual media decode is STUBBED —
this container has no image/audio libraries — behind `decode_media`,
which raises NotImplementedError for real formats and provides a
deterministic md5-derived fake for the synthetic corpus (so the pipeline
is end-to-end testable and oracle-checkable).

At 100 TB: binary payloads dominate row size, so these stages must be
map-only (they are), partition counts must track bytes not rows
(spark.sql.files.maxPartitionBytes), and metadata extraction should run
BEFORE any shuffle so downstream stages move 20-byte metadata rows, not
megabyte blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FORMATS = ("png", "jpeg", "webp")


def with_blob_column(documents: DataFrame) -> DataFrame:
    """Synthesize an opaque binary payload per document (utf-8 bytes of the
    text). A real pipeline reads these from object storage; the engine
    treats the bytes as opaque either way."""
    # repartition: blob tables should parallelize by bytes, and the synthetic
    # source arrives as a single parquet partition. Cap the fan-out — each
    # partition spins a Python worker (pandas import + Arrow channel), so
    # tiny corpora should not pay 32 worker cold-starts.
    sc = documents.sparkSession.sparkContext
    n_parts = min(8, sc.defaultParallelism)
    return documents.repartition(n_parts, "doc_id").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decode: dimensions and format
    derived from the payload's md5. Mirrors the oracle SQL formula
    (conv(substr(md5(...), ...))) exactly."""
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[0:4], 16) % 448
    height = 64 + int(h[4:8], 16) % 448
    fmt = FORMATS[int(h[8:10], 16) % len(FORMATS)]
    return width, height, fmt


def decode_media(payload: bytes, fake: bool = True) -> tuple[int, int, str]:
    """Decode entry point. Real decode (PIL/ffmpeg) is unavailable in this
    environment — the seam is here."""
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg; not available in this build"
        )
    return _fake_decode(payload)


def decode_image_metadata(blobs: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over (doc_id, blob):
    (doc_id, n_bytes, width, height, format). Map-only; the blob never
    crosses a shuffle boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = [decode_media(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return blobs.mapInPandas(
        run, schema="doc_id long, n_bytes long, width int, height int, format string"
    )
