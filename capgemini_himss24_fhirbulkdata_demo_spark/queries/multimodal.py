"""Multimodal binary-column queries over ``documents`` (SURVEY brief:
multimodal; the mapInPandas plumbing from ``multimodal/binary.py``
surfaced on the driver contract).

The fixtures carry no media files, so the opaque payload is the
document's own bytes (``CAST(text AS BINARY)``) — the point is the
*plumbing*: a real binary column, Arrow-batched ``mapInPandas``
feature extraction, 1→1 and 1→N output shapes, all with exact DuckDB
oracle twins (LENGTH/MD5/SUBSTRING over the same blob), so the
engine's Python-UDF surface is driver-hash-checked, not pytest-only.

Scale: mapInPandas crosses the Python boundary per Arrow batch, not
per row; payload bytes stay out of every plan that doesn't select
them (column pruning), and the patch query's output is a skinny
(id, patch_id, digest) stream — the same shape real image/audio
feature extraction produces at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

_PATCH = 64  # bytes per patch (stands in for pixel tiles)
_MAX_PATCHES = 4


@register(
    "x50_multimodal_meta",
    oracle="""
    -- documents.text is pure ASCII (asserted by the Spark side's
    -- byte-level md5 matching): STRLEN/SUBSTR over VARCHAR are exact
    -- byte equivalents, and DuckDB's SUBSTRING/MD5 don't take BLOB
    SELECT doc_id,
           STRLEN(text) AS n_bytes,
           MD5(text) AS digest,
           LOWER(HEX(SUBSTR(text, 1, 8))) AS head8_hex
    FROM documents
    ORDER BY doc_id
    """,
)
def x50_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction from an opaque binary payload via
    Arrow-batched mapInPandas (1 row → 1 row): byte length, md5
    digest, head-bytes hex. The decode stage for real formats lives in
    multimodal/binary.py behind its dependency gate; this is the
    driver-checked form of the same plumbing."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                out.append(
                    (int(did), len(b), hashlib.md5(b).hexdigest(), b[:8].hex())
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "digest", "head8_hex"]
            )

    schema = "doc_id BIGINT, n_bytes BIGINT, digest STRING, head8_hex STRING"
    return payloads.mapInPandas(fn, schema).orderBy("doc_id")


@register(
    "x51_multimodal_patches",
    oracle=f"""
    WITH patches AS (
      SELECT doc_id, CAST(g.p AS INT) AS patch_id,
             SUBSTR(text, g.p * {_PATCH} + 1, {_PATCH}) AS chunk
      FROM documents,
           (SELECT UNNEST(RANGE(0, {_MAX_PATCHES})) AS p) g
      WHERE STRLEN(text) > g.p * {_PATCH})
    SELECT doc_id, patch_id,
           STRLEN(chunk) AS patch_bytes,
           MD5(chunk) AS patch_digest
    FROM patches
    ORDER BY doc_id, patch_id
    """,
)
def x51_multimodal_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch/tile extraction shape (1 row → N rows) via mapInPandas:
    the payload splits into fixed-size byte patches (capped), each
    emitted as a skinny (doc_id, patch_id, size, digest) row — the
    resize/crop/frame-sample plumbing over a text-backed payload."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for pid in range(_MAX_PATCHES):
                    chunk = b[pid * _PATCH : (pid + 1) * _PATCH]
                    if not chunk:
                        break
                    out.append(
                        (int(did), pid, len(chunk), hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "patch_id", "patch_bytes", "patch_digest"]
            )

    schema = (
        "doc_id BIGINT, patch_id INT, patch_bytes BIGINT, patch_digest STRING"
    )
    return payloads.mapInPandas(fn, schema).orderBy("doc_id", "patch_id")
