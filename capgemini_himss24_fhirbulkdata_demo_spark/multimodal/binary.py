"""Binary media columns over mapInPandas (SURVEY brief: multimodal).

Design for 100 TB of media:
- payloads live in a ``binary`` column (or at extreme sizes, a path
  column + ranged reads) with a typed ``meta`` struct alongside —
  filters/pruning on meta never touch bytes (column pruning keeps the
  binary column out of scans that don't need it);
- all per-item work is ``mapInPandas`` (Arrow batches, pandas zero
  NaN-copies on binary) so Python crosses the boundary per *batch*,
  not per row; ``spark.sql.execution.arrow.maxRecordsPerBatch`` and
  ``maxPartitionBytes`` bound executor memory against payload size;
- decode is deterministic & dependency-gated: the synthetic ``FAKE``
  container decodes with numpy only; real formats raise
  NotImplementedError unless PIL is importable (it is not baked into
  this container).

FAKE container layout (deterministic from a seed id):
  b"FAKE" | kind:1 (I/V) | width:u16 | height:u16 | n_frames:u16 |
  pixel bytes = md5 keystream over (id, frame) — frame f pixel block
  of width*height bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, payload BINARY, "
    "meta STRUCT<format: STRING, width: INT, height: INT, n_frames: INT>"
)

DECODED_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_frames INT, "
    "mean_pixel DOUBLE, histogram ARRAY<DOUBLE>"
)

FEATURES_SCHEMA = "media_id BIGINT, patch_id INT, feature ARRAY<DOUBLE>"

FRAMES_SCHEMA = "media_id BIGINT, frame_idx INT, frame_mean DOUBLE"

_MAGIC = b"FAKE"


def _keystream(seed: bytes, n: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[:n])


def encode_fake(media_id: int, kind: str, width: int, height: int, n_frames: int) -> bytes:
    k = b"I" if kind == "image" else b"V"
    header = _MAGIC + k + struct.pack(">HHH", width, height, n_frames)
    pixels = b"".join(
        _keystream(f"{media_id}:{f}".encode(), width * height) for f in range(n_frames)
    )
    return header + pixels


def _decode_fake(payload: bytes):
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg (not in this container); "
            "only the FAKE container format is decodable here"
        )
    width, height, n_frames = struct.unpack(">HHH", payload[5:11])
    frames = []
    off = 11
    for _ in range(n_frames):
        frames.append(payload[off : off + width * height])
        off += width * height
    return width, height, frames


def synthesize_media(spark: SparkSession, n: int, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table (seeded by media_id)."""
    rows = []
    for i in range(n):
        w = 16 + (i % 4) * 8
        h = 16 + (i % 3) * 8
        nf = 1 if kind == "image" else 2 + (i % 3)
        rows.append(
            (i, kind, bytearray(encode_fake(i, kind, w, h, nf)),
             {"format": "FAKE", "width": w, "height": h, "n_frames": nf})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_images(media: DataFrame) -> DataFrame:
    """Decode + global stats per item (mean pixel, 8-bin histogram)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = _decode_fake(bytes(payload))
                if not frames:
                    continue  # zero-frame payload: nothing to decode
                px = frames[0]
                hist = [0.0] * 8
                total = 0
                for b in px:
                    hist[b >> 5] += 1
                    total += b
                npix = len(px) or 1
                out.append(
                    (int(mid), w, h, len(frames), total / npix,
                     [c / npix for c in hist])
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "n_frames", "mean_pixel", "histogram"],
            )

    return media.select("media_id", "payload").mapInPandas(fn, DECODED_SCHEMA)


def extract_patch_features(media: DataFrame, patch: int = 8) -> DataFrame:
    """Patch-grid feature extraction (per-patch mean/min/max) — the
    resize/crop plumbing shape: 1 input row → many feature rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = _decode_fake(bytes(payload))
                if not frames:
                    continue  # zero-frame payload
                px = frames[0]
                pid = 0
                for py in range(0, h, patch):
                    for pxx in range(0, w, patch):
                        vals = [
                            px[y * w + x]
                            for y in range(py, min(py + patch, h))
                            for x in range(pxx, min(pxx + patch, w))
                        ]
                        out.append(
                            (int(mid), pid,
                             [sum(vals) / len(vals), float(min(vals)), float(max(vals))])
                        )
                        pid += 1
            yield pd.DataFrame(out, columns=["media_id", "patch_id", "feature"])

    return media.select("media_id", "payload").mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video-kind payloads (every Nth frame)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, frames = _decode_fake(bytes(payload))
                for idx in range(0, len(frames), every):
                    f = frames[idx]
                    out.append((int(mid), idx, sum(f) / (len(f) or 1)))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_mean"])

    return media.select("media_id", "payload").mapInPandas(fn, FRAMES_SCHEMA)


def write_fake_files(directory: str, n: int, kind: str = "image") -> list[str]:
    """Materialize n synthetic FAKE-container payloads as individual
    files (``<media_id>.fake``) — the on-disk landing layout the
    ``binaryFile`` ingestion path reads."""
    import os

    os.makedirs(directory, exist_ok=True)
    paths = []
    for i in range(n):
        w = 16 + (i % 4) * 8
        h = 16 + (i % 3) * 8
        nf = 1 if kind == "image" else 2 + (i % 3)
        p = os.path.join(directory, f"{i}.fake")
        with open(p, "wb") as fh:
            fh.write(encode_fake(i, kind, w, h, nf))
        paths.append(p)
    return paths


def read_media_dir(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a directory of media files through Spark's built-in
    ``binaryFile`` source into the engine's media schema: payload
    bytes + typed meta struct parsed from the container header
    entirely with JVM-side expressions (hex/conv on binary
    substrings — no Python in the scan path).

    Scale: binaryFile scans parallelize per file (one row per file,
    split-aware listing); meta lives in its own struct column so
    downstream filters/joins on dimensions prune the payload column
    out of the scan entirely. For payloads beyond a few hundred MB,
    flip to a path-column + ranged-read layout (the documented
    alternative in the module header).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fake")
        .load(path)
    )
    content = F.col("content")

    def u16(off: int):
        # container header ints are big-endian u16: hex() the 2-byte
        # slice and base-convert JVM-side (binary substring is 1-based)
        return F.conv(F.hex(F.substring(content, off, 2)), 16, 10).cast("int")

    kind = F.when(
        F.substring(content, 5, 1).cast("string") == "I", F.lit("image")
    ).otherwise(F.lit("video"))
    return raw.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.fake$", 1)
        .cast("bigint")
        .alias("media_id"),
        kind.alias("kind"),
        content.alias("payload"),
        F.struct(
            F.lit("FAKE").alias("format"),
            u16(6).alias("width"),
            u16(8).alias("height"),
            u16(10).alias("n_frames"),
        ).alias("meta"),
    )
