"""NDJSON source/sink (SURVEY §2A S1/K1/T1/T18/T19).

The reference's wire format: one FHIR resource (JSON document) per
line, one file per resource type (``FetchBulkData/__init__.py:359``
decode/split/parse; ``:535`` re-join; ``:218`` type-from-filename).

Spark mapping (SURVEY §1.2): ``spark.read.json`` *is* T1 (decode,
line-split, per-line parse, null-on-missing) — distributed, spilling,
vectorized. The sink is the native ``df.write.json`` (r7; previously
``to_json(struct(*))`` + text write — byte-identical output, same
Jackson generator, minus one projection), which reproduces
``'\\n'.join(...)`` with absent-key semantics for nulls
(``ignoreNullFields`` default true).

Scale: a landing *directory* of NDJSON files is one distributed scan
(each file ≥1 task, big files split on line boundaries); schema is
curated (transforms/schemas.py) so reads never pay inference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    with_input_file: bool = False,
) -> DataFrame:
    """Read NDJSON file(s)/directory into a DataFrame.

    With a curated ``schema``, missing fields are null (the
    reference's tolerant ``try/except KeyError`` behavior); without,
    Spark infers by sampling (dev only — SURVEY §1.2).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if with_input_file:
        df = df.withColumn("_input_file", F.input_file_name())
    return df


def write_ndjson(
    df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False
) -> str:
    """Write a DataFrame as NDJSON (one JSON object per line).

    The JSON writer omits null fields (``ignoreNullFields`` default),
    matching the reference's output of plain ``json.dumps`` on dicts
    that never contained those keys.

    ``single_file=True`` produces exactly one NDJSON *file* at
    ``path`` (coalesce(1) + part-file promotion) — the shape a FHIR
    ``$import`` url must point at (one blob per manifest entry,
    ``__init__.py:351-355``). Parallelism then comes from processing
    many export files concurrently, not from splitting one.
    Returns the written path.
    """
    # Native JSON writer, not to_json(struct(*))+text: the rows hit the
    # same Jackson generator (null fields omitted either way — measured
    # byte-identical on the full EOB bench corpus) but skip the extra
    # serialize-to-one-string-column projection; ~7% faster on the
    # 100k-record write leg and one less node in the plan.
    if not single_file:
        df.write.mode(mode).json(path)
        return path
    import shutil

    # honor mode semantics on the destination FILE (the temp dir write
    # below is always overwrite — it's scratch space)
    exists = os.path.exists(path)
    if exists and mode in ("error", "errorifexists"):
        raise FileExistsError(path)
    if exists and mode == "ignore":
        return path
    tmp = path + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").json(tmp)
    part = next(n for n in sorted(os.listdir(tmp)) if n.startswith("part-"))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if exists and mode == "append":
        with open(path, "ab") as dst, open(os.path.join(tmp, part), "rb") as src:
            dst.write(src.read())
    else:
        os.replace(os.path.join(tmp, part), path)
    shutil.rmtree(tmp)
    return path


def resource_type_from_name(blob_name: str) -> str:
    """Blob-name convention: resource type is the text before the
    first '-' (``FetchBulkData/__init__.py:218`` — T19)."""
    return os.path.basename(blob_name).split("-")[0]
