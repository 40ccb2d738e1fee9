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


# ---------------------------------------------------------------------------
# resize (image), frame sampling (video), audio metadata
# ---------------------------------------------------------------------------

RESIZE_MAX_DIM = 256
VIDEO_FPS = 24


def image_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-fit planning over the binary column: target box
    RESIZE_MAX_DIM, aspect preserved, integer math (floor) so the SQL
    oracle reproduces it exactly.  The pixel resample itself is the stubbed
    step; the Arrow batching, header decode, and output schema are the real
    scale path."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ow, oh, scaled = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, _ = decode_image(bytes(blob), fake=True)
                m = w if w > h else h
                if m > RESIZE_MAX_DIM:
                    out_w = max(1, (w * RESIZE_MAX_DIM) // m)
                    out_h = max(1, (h * RESIZE_MAX_DIM) // m)
                    did_scale = True
                else:
                    out_w, out_h = w, h
                    did_scale = False
                ids.append(doc_id)
                ow.append(out_w)
                oh.append(out_h)
                scaled.append(did_scale)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "out_width": pd.Series(ow, dtype="int64"),
                "out_height": pd.Series(oh, dtype="int64"),
                "scaled": pd.Series(scaled, dtype="bool"),
            })

    return synthesize_blobs(spark, sf_dir).mapInPandas(
        kernel,
        "doc_id bigint, out_width bigint, out_height bigint, scaled boolean")


IMAGE_RESIZE_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         (doc_id * 37) % 1024 + 1 AS w,
         (doc_id * 73) % 768 + 1 AS h
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(w, h) > {RESIZE_MAX_DIM}
            THEN greatest(1, (w * {RESIZE_MAX_DIM}) // greatest(w, h))
            ELSE w END AS out_width,
       CASE WHEN greatest(w, h) > {RESIZE_MAX_DIM}
            THEN greatest(1, (h * {RESIZE_MAX_DIM}) // greatest(w, h))
            ELSE h END AS out_height,
       greatest(w, h) > {RESIZE_MAX_DIM} AS scaled
FROM dims
"""


def synthesize_video_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, blob) with a fake video header:
    u32 n_frames (doc_id % 240 + 1), u32 fps (24)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_frames = F.col("doc_id") % 240 + 1

    def le_bytes(col):
        parts = [F.unhex(F.lpad(F.hex(
            F.shiftright(col.cast("long"), 8 * i).bitwiseAND(255)), 2, "0"))
            for i in range(4)]
        return F.concat(*parts)

    return docs.select(
        "doc_id",
        F.concat(le_bytes(n_frames), le_bytes(F.lit(VIDEO_FPS)),
                 F.encode("text", "utf-8")).alias("blob"))


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One sampled frame index per second of fake video (stride = fps):
    each blob expands to ceil(n_frames / fps) rows.  The frame DECODE is
    the stubbed step; the explode-inside-Arrow-kernel shape (one input row
    -> many output rows, no JVM explode of decoded frames) is the real
    scale pattern for frame extraction."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        for pdf in batches:
            ids, idxs, stamps = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_frames, fps = _struct.unpack("<II", b[:8])
                for frame_idx in range(0, n_frames, fps):
                    ids.append(doc_id)
                    idxs.append(frame_idx)
                    stamps.append(frame_idx * 1000 // fps)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "ts_ms": pd.Series(stamps, dtype="int64"),
            })

    return synthesize_video_blobs(spark, sf_dir).mapInPandas(
        kernel, "doc_id bigint, frame_idx bigint, ts_ms bigint")


VIDEO_FRAME_SAMPLE_SQL = f"""
WITH vids AS (
  SELECT doc_id, doc_id % 240 + 1 AS n_frames FROM documents
)
SELECT doc_id,
       unnest(generate_series(0, n_frames - 1, {VIDEO_FPS})) AS frame_idx,
       unnest(generate_series(0, n_frames - 1, {VIDEO_FPS})) * 1000
         // {VIDEO_FPS} AS ts_ms
FROM vids
"""


AUDIO_SAMPLE_RATE = 16000


def audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata over fake blobs (u32 sample_rate, u32 n_samples):
    duration in integer milliseconds.  Sample decode stubbed; plumbing
    real."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_samples = (F.col("doc_id") * 997) % 480000 + AUDIO_SAMPLE_RATE

    def le_bytes(col):
        parts = [F.unhex(F.lpad(F.hex(
            F.shiftright(col.cast("long"), 8 * i).bitwiseAND(255)), 2, "0"))
            for i in range(4)]
        return F.concat(*parts)

    blobs = docs.select(
        "doc_id",
        F.concat(le_bytes(F.lit(AUDIO_SAMPLE_RATE)), le_bytes(n_samples))
        .alias("blob"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        for pdf in batches:
            ids, rates, counts, durs = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                rate, n = _struct.unpack("<II", bytes(blob)[:8])
                ids.append(doc_id)
                rates.append(rate)
                counts.append(n)
                durs.append(n * 1000 // rate)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "sample_rate": pd.Series(rates, dtype="int64"),
                "n_samples": pd.Series(counts, dtype="int64"),
                "duration_ms": pd.Series(durs, dtype="int64"),
            })

    return blobs.mapInPandas(
        kernel, "doc_id bigint, sample_rate bigint, n_samples bigint, "
                "duration_ms bigint")


AUDIO_META_SQL = f"""
SELECT doc_id,
       {AUDIO_SAMPLE_RATE} AS sample_rate,
       (doc_id * 997) % 480000 + {AUDIO_SAMPLE_RATE} AS n_samples,
       ((doc_id * 997) % 480000 + {AUDIO_SAMPLE_RATE}) * 1000
         // {AUDIO_SAMPLE_RATE} AS duration_ms
FROM documents
"""
