"""Multimodal binary-column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.  The
Spark-side plumbing — schema, Arrow batching, partitioning, UDF signatures —
is real and tested; the actual pixel/sample decode is STUBBED (the image and
audio libraries are not available in this environment): `decode_image`
raises NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder parses the 8-byte header we synthesize.

Synthesized blob layout: ``u32 width, u32 height`` (little-endian) header +
the UTF-8 document text as the fake pixel payload, with
``width = (doc_id * 37) % 1024 + 1`` and ``height = (doc_id * 73) % 768 + 1``
— arithmetic an ANSI-SQL oracle can reproduce.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthesize_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, blob binary) with the fake image header."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    width = (F.col("doc_id") * 37) % 1024 + 1
    height = (F.col("doc_id") * 73) % 768 + 1

    def le_bytes(col):
        # 4-byte little-endian: bytes are value, value>>8, value>>16, value>>24
        parts = [F.unhex(F.lpad(F.hex(
            F.shiftright(col.cast("long"), 8 * i).bitwiseAND(255)), 2, "0"))
            for i in range(4)]
        return F.concat(*parts)

    return docs.select(
        "doc_id",
        F.concat(le_bytes(width), le_bytes(height),
                 F.encode("text", "utf-8")).alias("blob"))


def decode_image(blob: bytes, fake: bool = True):
    """Decode an image blob.  Real decode requires an image library that is
    not present in this environment — STUB."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires an image library (PIL/opencv); "
            "not available in this environment")
    width, height = struct.unpack("<II", blob[:8])
    payload = blob[8:]
    return width, height, len(payload)


def decode_meta(spark_df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column via
    mapInPandas — the real scale path for multimodal feature extraction."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, payload_sizes = [], [], []
            for blob in pdf["blob"]:
                w, h, n = decode_image(bytes(blob), fake=True)
                widths.append(w)
                heights.append(h)
                payload_sizes.append(n)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "payload_bytes": pd.Series(payload_sizes, dtype="int64"),
            })

    return spark_df.mapInPandas(
        kernel, "doc_id bigint, width bigint, height bigint, payload_bytes bigint")


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synthesize blobs -> Arrow-batched decode -> typed meta."""
    return decode_meta(synthesize_blobs(spark, sf_dir))


MULTIMODAL_META_SQL = """
SELECT doc_id,
       (doc_id * 37) % 1024 + 1 AS width,
       (doc_id * 73) % 768 + 1 AS height,
       octet_length(encode(text)) AS payload_bytes
FROM documents
"""
