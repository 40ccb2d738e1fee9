"""Multimodal binary-column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.  The
Spark-side plumbing — schema, Arrow batching, partitioning, UDF signatures —
is real and tested, and the blobs now carry REAL container headers:

* images: a valid PNG signature + IHDR chunk (even doc_ids) or a valid
  JPEG SOI/APP0/SOF0 marker stream (odd doc_ids); the decoder parses the
  actual format bytes (big-endian IHDR dims / SOF0 dims) with stdlib
  ``struct`` only,
* audio: a valid RIFF/WAVE header (fmt + data chunks, little-endian); the
  decoder walks the chunk list like a real WAV reader.

Only the pixel/sample DECODE is stubbed (`decode_image(..., fake=False)`
raises NotImplementedError — no image/audio codec libraries exist in this
environment); header parsing is real.  Dimensions remain deterministic
functions of doc_id (``width = (doc_id * 37) % 1024 + 1``,
``height = (doc_id * 73) % 768 + 1``), so the ANSI-SQL oracle reproduces
the parsed metadata without reading the bytes.

Video blobs keep a synthetic ``u32 n_frames, u32 fps`` framing (no real
container format is parseable without a demuxer library).
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# IHDR tail after width/height: bit depth 8, color type 6 (RGBA),
# compression 0, filter 0, interlace 0 — then a placeholder CRC (header
# readers parse fields; CRC verification needs the zlib table pass a real
# reader would do on trusted-length chunks only)
PNG_IHDR_TAIL = b"\x08\x06\x00\x00\x00" + b"\x00\x00\x00\x00"
JPEG_SOI_APP0 = (b"\xff\xd8"                      # SOI
                 b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00"
                 b"\x00\x01\x00\x01\x00\x00")     # APP0, length 16
# SOF0 tail after height/width: 3 components (YCbCr), id/sampling/quant
JPEG_SOF0_TAIL = b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"


def _be4(col):
    """Big-endian u32 bytes of an int column (hex() is big-endian)."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))


def _be2(col):
    return F.unhex(F.lpad(F.hex(col.cast("long")), 4, "0"))


def _le4(col):
    parts = [F.unhex(F.lpad(F.hex(
        F.shiftright(col.cast("long"), 8 * i).bitwiseAND(255)), 2, "0"))
        for i in range(4)]
    return F.concat(*parts)


def synthesize_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, blob binary): a real PNG (even doc_ids) or a
    real JPEG marker stream (odd doc_ids) whose header encodes the
    deterministic dims; the UTF-8 document text rides along as the fake
    pixel payload (IDAT-/entropy-segment stand-in)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    width = (F.col("doc_id") * 37) % 1024 + 1
    height = (F.col("doc_id") * 73) % 768 + 1

    png = F.concat(
        F.lit(PNG_SIG),
        F.lit(b"\x00\x00\x00\x0dIHDR"),        # chunk length 13 + type
        _be4(width), _be4(height),
        F.lit(PNG_IHDR_TAIL),
        F.encode("text", "utf-8"))
    jpeg = F.concat(
        F.lit(JPEG_SOI_APP0),
        F.lit(b"\xff\xc0\x00\x11\x08"),        # SOF0, length 17, precision 8
        _be2(height), _be2(width),             # JPEG: height FIRST
        F.lit(JPEG_SOF0_TAIL),
        F.encode("text", "utf-8"))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg).alias("blob"))


def parse_image_header(blob: bytes) -> Tuple[int, int, int]:
    """REAL header parse: (width, height, payload_bytes) from actual PNG
    or JPEG bytes, stdlib-only.

    PNG: signature + IHDR (always the first chunk per the spec) — dims are
    big-endian u32 at offsets 16/20.  JPEG: walk the marker segments until
    a SOF0-SOF15 frame header; dims are big-endian u16 (height first).
    payload_bytes counts everything after the parsed header segments (the
    stand-in for the IDAT/entropy data a pixel decoder would consume)."""
    if blob[:8] == PNG_SIG:
        length, ctype = struct.unpack(">I4s", blob[8:16])
        if ctype != b"IHDR":
            raise ValueError("PNG: first chunk is not IHDR")
        width, height = struct.unpack(">II", blob[16:24])
        header_end = 16 + length + 4  # chunk data + CRC
        return width, height, len(blob) - header_end
    if blob[:2] == b"\xff\xd8":  # JPEG SOI
        pos = 2
        while pos + 4 <= len(blob):
            if blob[pos] != 0xFF:
                raise ValueError("JPEG: bad marker alignment")
            marker = blob[pos + 1]
            seg_len = struct.unpack(">H", blob[pos + 2:pos + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                # SOFn: precision u8, height u16, width u16 (big-endian)
                height, width = struct.unpack(">HH", blob[pos + 5:pos + 9])
                return width, height, len(blob) - (pos + 2 + seg_len)
            pos += 2 + seg_len
        raise ValueError("JPEG: no SOF marker found")
    raise ValueError("unknown image container")


def decode_image(blob: bytes, fake: bool = True):
    """Image decode.  The header parse is real (PNG IHDR / JPEG SOF);
    the pixel decode requires a codec library that is not present in this
    environment — STUB behind fake=True, which returns the parsed
    (width, height, payload_bytes) metadata."""
    if not fake:
        raise NotImplementedError(
            "real pixel decode requires an image codec (PIL/opencv); "
            "not available in this environment")
    return parse_image_header(blob)


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
    """End-to-end: real-container blobs -> Arrow-batched header parse ->
    typed meta."""
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
    oracle reproduces it exactly.  Dims come from the REAL PNG/JPEG header
    parse; the pixel resample itself is the stubbed step."""

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


MP4_TIMESCALE = VIDEO_FPS  # 1 movie-timescale unit == 1 frame at 24 fps
# ftyp box (isom major brand) + moov header + mvhd prefix: version 0,
# flags 0, creation/modification time 0 — duration (u32 frames at the
# frame-rate timescale) is spliced in per row
MP4_FTYP = struct.pack(">I4s4sI4s", 20, b"ftyp", b"isom", 0x200, b"isom")
MP4_MVHD_PRE = (struct.pack(">I4s", 8 + 108, b"moov")
                + struct.pack(">I4s", 108, b"mvhd")
                + b"\x00\x00\x00\x00"            # version + flags
                + struct.pack(">II", 0, 0))      # creation/modification
# mvhd tail after duration: rate 1.0, volume 1.0, reserved, identity
# matrix, predefined, next_track_id
MP4_MVHD_TAIL = (struct.pack(">IHH", 0x00010000, 0x0100, 0)
                 + b"\x00" * 8
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))


def synthesize_video_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, blob) with a REAL MP4 header: ftyp box +
    moov/mvhd carrying timescale = 24 (1 unit per frame) and duration =
    n_frames (doc_id % 240 + 1) — the fields a real demuxer reads for
    clip length.  Track/sample tables (and frame decode) stay out of
    scope: those need a codec library."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_frames = F.col("doc_id") % 240 + 1
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.concat(F.lit(MP4_FTYP + MP4_MVHD_PRE),
                 _be4(F.lit(MP4_TIMESCALE)), _be4(n_frames),
                 F.lit(MP4_MVHD_TAIL),
                 # the fake sample data rides in a well-formed mdat box
                 _be4(F.octet_length(payload) + 8), F.lit(b"mdat"),
                 payload).alias("blob"))


def parse_mp4_header(blob: bytes) -> Tuple[int, int]:
    """REAL MP4 box walk: returns (timescale, duration) from the
    moov/mvhd box, stdlib-only (ISO/IEC 14496-12 box layout)."""
    def walk(buf, start, end, path):
        pos = start
        while pos + 8 <= end:
            size, btype = struct.unpack(">I4s", buf[pos:pos + 8])
            if size < 8:
                raise ValueError("mp4: bad box size")
            if btype == path[0]:
                if len(path) == 1:
                    return pos
                return walk(buf, pos + 8, pos + size, path[1:])
            pos += size
        raise ValueError("mp4: box not found: %r" % (path,))

    mvhd = walk(blob, 0, len(blob), [b"moov", b"mvhd"])
    version = blob[mvhd + 8]
    if version == 0:
        timescale, duration = struct.unpack(
            ">II", blob[mvhd + 20:mvhd + 28])
    else:  # version 1: 64-bit times
        timescale = struct.unpack(">I", blob[mvhd + 28:mvhd + 32])[0]
        duration = struct.unpack(">Q", blob[mvhd + 32:mvhd + 40])[0]
    return timescale, duration


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One sampled frame index per second of fake video (stride = fps):
    each blob expands to ceil(n_frames / fps) rows.  The frame DECODE is
    the stubbed step; the explode-inside-Arrow-kernel shape (one input row
    -> many output rows, no JVM explode of decoded frames) is the real
    scale pattern for frame extraction."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, stamps = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                # real mvhd parse: timescale = fps (1 unit per frame), so
                # the movie duration IS the frame count
                fps, n_frames = parse_mp4_header(bytes(blob))
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
WAV_BLOCK_ALIGN = 2  # mono, 16-bit PCM


def synthesize_audio_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, blob) with a REAL RIFF/WAVE header: canonical
    44-byte layout (fmt chunk: PCM, mono, 16-bit at AUDIO_SAMPLE_RATE;
    data chunk sized n_samples * block_align, body elided — the sample
    decode is the stubbed step)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_samples = (F.col("doc_id") * 997) % 480000 + AUDIO_SAMPLE_RATE
    data_size = n_samples * WAV_BLOCK_ALIGN
    byte_rate = AUDIO_SAMPLE_RATE * WAV_BLOCK_ALIGN
    fmt_chunk = (b"fmt " + struct.pack("<IHH", 16, 1, 1)
                 + struct.pack("<II", AUDIO_SAMPLE_RATE, byte_rate)
                 + struct.pack("<HH", WAV_BLOCK_ALIGN, 16))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit(b"RIFF"), _le4(data_size + 36), F.lit(b"WAVE"),
            F.lit(fmt_chunk),
            F.lit(b"data"), _le4(data_size)).alias("blob"))


def parse_wav_header(blob: bytes) -> Tuple[int, int]:
    """REAL RIFF/WAVE chunk walk: returns (sample_rate, n_samples) from
    the fmt and data chunks, stdlib-only."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = block_align = data_size = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack("<4sI", blob[pos:pos + 8])
        if cid == b"fmt ":
            (_fmt, _ch, sample_rate, _brate,
             block_align, _bits) = struct.unpack(
                "<HHIIHH", blob[pos + 8:pos + 24])
        elif cid == b"data":
            data_size = size
            break  # sample payload elided; size field carries the count
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, data_size // block_align


def audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata over real WAV headers: duration in integer
    milliseconds from the parsed fmt/data chunks.  Sample decode stubbed;
    header parse + Arrow plumbing real."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, counts, durs = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                rate, n = parse_wav_header(bytes(blob))
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

    return synthesize_audio_blobs(spark, sf_dir).mapInPandas(
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
