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
  container, uncompressed BMP (24-bit / 8-bit paletted), binary PNM
  (P5 pgm / P6 ppm), and PNG (8-bit non-interlaced gray / RGB /
  palette / gray+alpha / RGBA, all five row filters, inflate via
  stdlib zlib) decode with pure stdlib code — no imaging library
  needed; anything else (JPEG, 16-bit/interlaced PNG, ...) falls
  through to PIL when importable and raises NotImplementedError
  otherwise (PIL is not baked into this container). Color decodes to
  8-bit luma via integer BT.601 weights
  ((299 r + 587 g + 114 b) // 1000) so stats are bit-identical
  across hosts.

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


def _luma(r: int, g: int, b: int) -> int:
    # integer BT.601 — deterministic across hosts, no float rounding
    return (299 * r + 587 * g + 114 * b) // 1000


def encode_bmp24(width: int, height: int, rgb_rows) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (bottom-up rows, 4-byte
    row padding) — fixture twin of ``_decode_bmp``."""
    row_size = (width * 3 + 3) & ~3
    pixel_data = bytearray()
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for r, g, b in rgb_rows[y]:
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        pixel_data += row
    pixel_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pixel_off + len(pixel_data), 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return bytes(header + dib + pixel_data)


def encode_pnm(width: int, height: int, pixels, rgb: bool = False) -> bytes:
    """Binary PNM writer: P6 from (r,g,b) tuples or P5 from luma
    bytes — fixture twin of ``_decode_pnm``."""
    if rgb:
        return f"P6\n{width} {height}\n255\n".encode() + bytes(
            v for px in pixels for v in px
        )
    return f"P5\n{width} {height}\n255\n".encode() + bytes(pixels)


def _decode_bmp(payload: bytes):
    """Uncompressed BMP (BITMAPINFOHEADER, 24-bit BGR or 8-bit
    paletted) → (width, height, [luma frame]). Pure stdlib.

    Truncated payloads raise ValueError instead of silently decoding
    short frames (downstream stats divide by width*height, so a short
    raster would yield wrong values, not an error)."""
    if len(payload) < 34:
        raise ValueError(f"truncated BMP header: {len(payload)} bytes")
    pixel_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs are not supported")
    width, height = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"only uncompressed 8/24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    palette = None
    if bpp == 8:
        if len(payload) < 50:
            raise ValueError(f"truncated BMP header: {len(payload)} bytes")
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(payload):
            raise ValueError(
                f"truncated BMP palette: need {pal_off + 4 * n_colors} "
                f"bytes, have {len(payload)}"
            )
        palette = [
            _luma(payload[pal_off + 4 * i + 2], payload[pal_off + 4 * i + 1],
                  payload[pal_off + 4 * i])
            for i in range(n_colors)
        ]
    bytes_per_px = bpp // 8
    row_size = (width * bytes_per_px + 3) & ~3  # rows pad to 4 bytes
    if pixel_off + height * row_size > len(payload):
        raise ValueError(
            f"truncated BMP raster: need {pixel_off + height * row_size} "
            f"bytes, have {len(payload)}"
        )
    px = bytearray(width * height)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = payload[pixel_off + src_y * row_size :][: width * bytes_per_px]
        if bpp == 24:
            for x in range(width):
                b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                px[y * width + x] = _luma(r, g, b)
        else:
            for x in range(width):
                px[y * width + x] = palette[row[x]]
    return width, height, [bytes(px)]


def _decode_pnm(payload: bytes):
    """Binary PNM (P5 grayscale / P6 RGB, maxval ≤ 255) →
    (width, height, [luma frame]). Pure stdlib."""
    magic = payload[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:  # width, height, maxval; '#' comments legal
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    need = (1 if magic == b"P5" else 3) * width * height
    if pos + need > len(payload):
        raise ValueError(
            f"truncated {magic.decode()} raster: need {need} bytes after "
            f"header, have {len(payload) - pos}"
        )
    if magic == b"P5":
        return width, height, [payload[pos : pos + width * height]]
    raster = payload[pos : pos + 3 * width * height]
    px = bytes(
        _luma(raster[3 * i], raster[3 * i + 1], raster[3 * i + 2])
        for i in range(width * height)
    )
    return width, height, [px]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(width: int, height: int, rows, color_type: int = 0,
               palette: list[tuple[int, int, int]] | None = None,
               filter_type: int = 0) -> bytes:
    """Minimal PNG writer (8-bit, non-interlaced) — fixture twin of
    ``_decode_png``. ``rows`` is a list of per-row byte sequences in
    raw channel order; ``filter_type`` applies that PNG filter to
    every row so decoder filter paths (0=None 1=Sub 2=Up 3=Average
    4=Paeth) are individually exercisable."""
    import zlib

    ch = _PNG_CHANNELS[color_type]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = bytes(width * ch)
    for row in rows:
        row = bytes(row)
        filt = bytearray(len(row))
        for i, x in enumerate(row):
            a = row[i - ch] if i >= ch else 0  # left
            b = prev[i]  # up
            c = prev[i - ch] if i >= ch else 0  # up-left
            if filter_type == 0:
                filt[i] = x
            elif filter_type == 1:
                filt[i] = (x - a) & 0xFF
            elif filter_type == 2:
                filt[i] = (x - b) & 0xFF
            elif filter_type == 3:
                filt[i] = (x - (a + b) // 2) & 0xFF
            else:  # 4: Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[i] = (x - pred) & 0xFF
        raw += bytes((filter_type,)) + bytes(filt)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = _PNG_MAGIC + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", b"".join(bytes(p) for p in palette))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _decode_png(payload: bytes):
    """Pure-stdlib PNG decode (8-bit, non-interlaced, color types
    0/2/3/4/6; all five row filters) → (width, height, [luma frame]).
    zlib does the inflate; alpha is ignored for luma stats. 16-bit
    and interlaced PNGs fall through to the PIL gate. Truncated or
    corrupt streams raise ValueError (same contract as BMP/PNM)."""
    import zlib

    if len(payload) < 8 + 25:
        raise ValueError(f"truncated PNG: {len(payload)} bytes")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = [
                _luma(body[3 * i], body[3 * i + 1], body[3 * i + 2])
                for i in range(len(body) // 3)
            ]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG decodes dependency-free "
            f"(depth={depth}, color_type={color_type}, "
            f"interlace={interlace}); others need PIL"
        )
    if not idat:
        raise ValueError("PNG missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"PNG raster size mismatch: need {height * (1 + stride)} "
            f"bytes, inflated {len(raw)}"
        )
    px = bytearray(width * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (1 + stride)]
        row = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                b = prev[i]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG row filter {f}")
        for x in range(width):
            if color_type == 0:
                v = row[x]
            elif color_type == 2:
                v = _luma(row[3 * x], row[3 * x + 1], row[3 * x + 2])
            elif color_type == 3:
                if palette is None:
                    raise ValueError("paletted PNG missing PLTE")
                v = palette[row[x]]
            elif color_type == 4:
                v = row[2 * x]
            else:  # 6: RGBA
                v = _luma(row[4 * x], row[4 * x + 1], row[4 * x + 2])
            px[y * width + x] = v
        prev = row
    return width, height, [bytes(px)]


def _decode_pil(payload: bytes):
    """Everything else (PNG/JPEG/...) needs PIL; clean gate when the
    library is absent (it is not baked into this container)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "real media decoding of this format requires PIL/ffmpeg (not in "
            "this container); FAKE, uncompressed BMP, and binary PNM decode "
            "dependency-free"
        ) from e
    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    return img.width, img.height, [img.tobytes()]


def _decode_fake(payload: bytes):
    """Container dispatch by magic bytes → (width, height, frames of
    w·h luma bytes). FAKE/BMP/PNM are dependency-free; the rest gate
    on PIL."""
    if payload[:4] == _MAGIC:
        if len(payload) < 11:
            raise ValueError(f"truncated FAKE header: {len(payload)} bytes")
        width, height, n_frames = struct.unpack(">HHH", payload[5:11])
        if 11 + n_frames * width * height > len(payload):
            raise ValueError(
                f"truncated FAKE payload: need "
                f"{11 + n_frames * width * height} bytes, have {len(payload)}"
            )
        frames = []
        off = 11
        for _ in range(n_frames):
            frames.append(payload[off : off + width * height])
            off += width * height
        return width, height, frames
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:8] == _PNG_MAGIC:
        try:
            return _decode_png(payload)
        except NotImplementedError:
            return _decode_pil(payload)  # 16-bit / interlaced variants
    return _decode_pil(payload)


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
