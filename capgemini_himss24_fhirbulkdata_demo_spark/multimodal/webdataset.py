"""WebDataset-style TAR shard I/O for multimodal training corpora.

WebDataset (the de-facto loader format for large-scale multimodal
training) stores samples as consecutive members of plain tar files:
every file whose name shares a basename belongs to one sample, the
extension names the modality (``000017.jpg`` + ``000017.txt`` +
``000017.json``), and shards are just ``.tar`` files a loader streams
sequentially — no index, no random access, which is exactly what
makes the format S3/object-store friendly at 100 TB.

Spark-first design:
- **write**: `repartitionByRange(n_shards, key)` (one shuffle,
  deterministic contiguous key ranges — the same contract as
  ``dataprep.write_training_shards``) → ``sortWithinPartitions`` →
  one ``mapInPandas`` stage that serializes each partition into ONE
  in-memory tar and writes it from the worker (binary never crosses
  to the driver; the stage emits one skinny manifest row per shard).
  Tar members are written in key order with fixed metadata (mtime 0,
  uid/gid 0, mode 0o644) so shard bytes are DETERMINISTIC — equal
  inputs give byte-identical shards, which makes shard-level dedup /
  caching / diffing possible.
- **read**: ``binaryFile`` source over ``*.tar`` → ``mapInPandas``
  unpacking members with stdlib ``tarfile`` and grouping consecutive
  members by basename into one row per sample (the WebDataset
  convention: a sample's members are adjacent). Column pruning keeps
  payload bytes out of plans that only touch keys/captions.

Nothing here needs libraries beyond the stdlib: tar framing is
``tarfile`` over ``io.BytesIO`` on both sides.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# sample columns → member extensions (binary payload + utf-8 sidecars)
_PAYLOAD_EXT = "bin"


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    payload_col: str = "payload",
    text_cols: tuple[str, ...] = (),
    meta_cols: tuple[str, ...] = (),
) -> dict:
    """Export (key, payload, sidecars) rows as WebDataset tar shards.

    Per sample the shard holds ``<key>.bin`` (the binary payload),
    one ``<key>.<col>.txt`` per entry of ``text_cols``, and — when
    ``meta_cols`` is non-empty — ``<key>.json`` with those columns as
    a JSON object. Returns the manifest dict (also written to
    ``manifest.json``): shard file names, per-shard sample counts and
    key ranges, and the total.

    Scale: one range shuffle + a narrow per-partition serialize; each
    worker holds one shard in memory at a time (size a shard to the
    executor budget via ``n_shards``), and only ≤ ``n_shards`` skinny
    manifest rows ever reach the driver.
    """
    os.makedirs(path, exist_ok=True)
    cols = [key_col, payload_col, *text_cols, *meta_cols]
    # Engine-side key pre-validation (one narrow, column-pruned scan,
    # no shuffle): a bad key raised inside the write task is retried
    # (4 attempts by default) on a real cluster before failing the
    # job, and shards already written by sibling tasks are left
    # behind with no manifest.json. Failing HERE costs one cheap scan
    # of the key column and fails once, before any shard file exists.
    bad = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .filter(F.col("k").contains(".") | F.col("k").contains("/"))
        .first()
    )
    if bad is not None:
        raise ValueError(
            f"webdataset sample key {bad['k']!r} contains '.' or '/': "
            "member names are '<key>.<ext>', so such keys mis-group "
            "on read; sanitize the key column first"
        )
    sharded = (
        df.select(*cols)
        .repartitionByRange(n_shards, F.col(key_col))
        .sortWithinPartitions(key_col)
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        tar = tarfile.open(fileobj=buf, mode="w")
        n = 0
        kmin = kmax = None

        def add(name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.mode = 0o644
            tar.addfile(info, io.BytesIO(data))

        for pdf in batches:
            if not len(pdf):
                continue
            # Column-zip, not iterrows(): per-row Series construction
            # is the slowest iteration idiom pandas has, and this loop
            # runs once per sample in the shard hot path.
            keys = [str(k) for k in pdf[key_col]]
            for key in keys:
                # The reader groups members by splitting names at the
                # FIRST dot, so a '.' (or path separator) inside a key
                # would silently regroup as a different sample on
                # read-back — fail loudly at write time instead.
                if "." in key or "/" in key:
                    raise ValueError(
                        f"webdataset sample key {key!r} contains '.' or "
                        "'/': member names are '<key>.<ext>', so such "
                        "keys mis-group on read; sanitize the key "
                        "column first"
                    )
            kmin = min([kmin, *keys]) if kmin is not None else min(keys)
            kmax = max([kmax, *keys]) if kmax is not None else max(keys)
            texts = [list(pdf[c]) for c in text_cols]
            metas = [list(pdf[c]) for c in meta_cols]
            for i, (key, payload) in enumerate(zip(keys, pdf[payload_col])):
                add(f"{key}.{_PAYLOAD_EXT}", bytes(payload))
                for c, vals in zip(text_cols, texts):
                    add(f"{key}.{c}.txt", str(vals[i]).encode("utf-8"))
                if meta_cols:
                    add(
                        f"{key}.json",
                        json.dumps(
                            {c: vals[i] for c, vals in zip(meta_cols, metas)},
                            sort_keys=True,
                            default=str,
                        ).encode("utf-8"),
                    )
                n += 1
        tar.close()
        fname = f"shard-{pid:05d}.tar"
        if n:  # range partitioning can leave empty partitions
            with open(os.path.join(path, fname), "wb") as f:
                f.write(buf.getvalue())
        yield pd.DataFrame(
            [(pid, fname if n else None, n, kmin, kmax)],
            columns=["shard_id", "file", "n_samples", "key_min", "key_max"],
        )

    schema = (
        "shard_id INT, file STRING, n_samples BIGINT, "
        "key_min STRING, key_max STRING"
    )
    rows = sharded.mapInPandas(fn, schema).collect()  # ≤ n_shards rows
    shards = [
        {
            "file": r["file"],
            "n_samples": int(r["n_samples"]),
            "key_min": r["key_min"],
            "key_max": r["key_max"],
        }
        for r in sorted(rows, key=lambda r: r["shard_id"])
        if r["file"]
    ]
    manifest = {
        "format": "webdataset-tar",
        "n_shards": len(shards),
        "n_samples": sum(s["n_samples"] for s in shards),
        "text_cols": list(text_cols),
        "meta_cols": list(meta_cols),
        "shards": shards,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


_SAMPLE_SCHEMA = (
    "key STRING, payload BINARY, texts MAP<STRING,STRING>, "
    "meta STRING, shard STRING"
)

_BINARYFILE_SCHEMA = (
    "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
)


def _unpack_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage shared by the batch and streaming readers:
    (path, content) tar rows → one row per sample, grouping adjacent
    members by basename (the WebDataset convention — grouping is
    per-shard and stateless across shards, so shards parallelize
    perfectly and micro-batching cannot split a sample)."""
    for pdf in batches:
        out = []
        for shard_path, content in zip(pdf["path"], pdf["content"]):
            shard = os.path.basename(shard_path)
            tar = tarfile.open(fileobj=io.BytesIO(bytes(content)))
            cur_key = None
            cur: dict[str, bytes] = {}

            def flush():
                if cur_key is None:
                    return
                payload = cur.pop(_PAYLOAD_EXT, None)
                meta = cur.pop("json", None)
                texts = {
                    ext[: -len(".txt")]: data.decode("utf-8")
                    for ext, data in cur.items()
                    if ext.endswith(".txt")
                }
                out.append(
                    (
                        cur_key,
                        bytearray(payload) if payload is not None else None,
                        texts,
                        meta.decode("utf-8") if meta is not None else None,
                        shard,
                    )
                )

            for member in tar:
                if not member.isfile():
                    continue
                key, _, ext = member.name.partition(".")
                if key != cur_key:
                    flush()
                    cur_key, cur = key, {}
                cur[ext] = tar.extractfile(member).read()
            flush()
        yield pd.DataFrame(
            out, columns=["key", "payload", "texts", "meta", "shard"]
        )


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset tar shards back to one row per sample:
    ``(key, payload, texts map<ext,string>, meta json-string,
    shard)``.

    Scale: ``binaryFile`` gives one row per shard (a shard is sized
    to fit worker memory by construction); unpacking is a narrow
    mapInPandas — no shuffle at all. Column pruning drops payload
    bytes from everything DOWNSTREAM of the unpack when a plan never
    selects them (the unpack itself always reads the whole tar —
    that is the format's sequential-access contract, the price of
    index-free object-store streaming).
    """
    raw = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    ).select("path", "content")
    return raw.mapInPandas(_unpack_shards, _SAMPLE_SCHEMA)


def read_webdataset_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    """Streaming form of :func:`read_webdataset`: tar shards landing
    in ``path`` become micro-batches of sample rows — the continuous
    training-ingest shape (a crawler drops shards, the prep pipeline
    consumes them incrementally; pair with ``foreachBatch`` or any
    streaming sink). A shard is the atomic file-source unit, so a
    sample can never straddle micro-batches; the unpack stage is
    byte-identical to the batch reader's."""
    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(os.path.join(path, "*.tar"))
        .select("path", "content")
    )
    return raw.mapInPandas(_unpack_shards, _SAMPLE_SCHEMA)
