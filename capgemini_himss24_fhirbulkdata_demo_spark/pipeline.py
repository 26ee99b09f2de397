"""End-to-end bulk ETL pipeline (SURVEY §3.1, re-architected).

The reference's ``POST /himss24demo/bulkimport/latest`` flow
(``FetchBulkData/__init__.py:619-684``) as a Spark job:

1. driver-side connector: auth → $export kickoff (with the persisted
   ``_since`` cursor) → poll → land NDJSON files;
2. **per-resource-type Spark jobs**: read landed NDJSON (curated
   schema) → (source, resource) transform → write NDJSON to the
   export area. Files are independent loads (the reference loops
   sequentially, ``:644``; here each file is its own narrow job —
   SURVEY §4.3.4);
3. driver-side sink-commit: build the FHIR ``Parameters`` manifest →
   $import → poll → archive landed files → advance the cursor.

The transform stage is shuffle-free except the two broadcast joins
(RxNav enrichment map, removed-ids anti-join), so step 2 pipelines in
one stage per file regardless of file size.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

from .connectors.fhir_bulk import FhirBulkConnector, build_import_manifest
from .connectors.state import HighWaterMark
from .sources.ndjson import read_ndjson, resource_type_from_name, write_ndjson
from .transforms import get_transform
from .transforms.schemas import RESOURCE_SCHEMAS


@dataclass
class PipelineResult:
    landed: list[str] = field(default_factory=list)
    transformed: dict[str, str] = field(default_factory=dict)  # path -> out dir
    import_status_url: str | None = None
    archived: list[str] = field(default_factory=list)
    since_advanced_to: str | None = None


def transform_landed_file(
    spark: SparkSession,
    path: str,
    server_url: str,
    out_dir: str,
    rxnav: DataFrame | None = None,
) -> str:
    """Step 2 for one landed file: read → transform → write NDJSON.

    Returns the output directory. Unknown (source, resource) pairs
    pass through untouched (the reference ignores them too).

    T16 count audit (``__init__.py:532`` "{kept}/{total} will be
    loaded") rides the write as ``observe`` metrics — single pass, no
    extra jobs, unlike the reference's len() bookkeeping.
    """
    resource = resource_type_from_name(path)
    schema = RESOURCE_SCHEMAS.get(resource)
    obs_in = Observation(f"in:{os.path.basename(path)}")
    df = read_ndjson(spark, path, schema).observe(obs_in, F.count(F.lit(1)).alias("n"))
    fn = get_transform(server_url, resource)
    if fn is not None:
        df = fn(df, rxnav)
    obs_out = Observation(f"out:{os.path.basename(path)}")
    df = df.observe(obs_out, F.count(F.lit(1)).alias("n"))
    # one NDJSON FILE per export file: $import urls must point at a
    # single application/fhir+ndjson blob, not a part-file directory
    out = os.path.join(
        out_dir, os.path.splitext(os.path.basename(path))[0] + ".ndjson"
    )
    write_ndjson(df, out, single_file=True)
    logger.info(
        "%s: %s/%s resources will be loaded",
        os.path.basename(path),
        obs_out.get["n"],
        obs_in.get["n"],
    )
    return out


def run_bulk_import(
    spark: SparkSession,
    connector: FhirBulkConnector,
    server_url: str,
    group_id: str,
    token: str,
    import_server: str,
    import_token: str,
    work_dir: str,
    rxnav: DataFrame | None = None,
    state: HighWaterMark | None = None,
    client_id: str = "client",
    blob_base_url: str = "file://",
    max_parallel_files: int = 8,
) -> PipelineResult:
    """The full export → transform → import → archive flow.

    Landed files transform as CONCURRENT Spark jobs (driver-side
    thread pool — the standard multi-job submission pattern): each
    file's job is narrow and its single-blob NDJSON write is one task
    (``write_ndjson(single_file=True)``), so a sequential loop would
    execute the whole stage nearly single-threaded. The reference
    loops sequentially (``__init__.py:644``); SURVEY §4.3.4 calls for
    independent parallel loads. ``max_parallel_files`` bounds
    concurrent jobs (scheduler pressure), not correctness.
    """
    res = PipelineResult()
    since = state.get(server_url, group_id) if state else None
    # Fallback cursor only — a FHIR _since must carry a timezone
    # (YYYY-MM-DDThh:mm:ss+zz:zz); the manifest's transactionTime (the
    # server-side high-water mark) is preferred when present.
    run_started = datetime.now(timezone.utc).isoformat(timespec="seconds")

    status_url = connector.kickoff_export(server_url, group_id, token, since=since)
    manifest = json.loads(connector.poll_status(status_url, token))
    next_cursor = manifest.get("transactionTime") or run_started

    landing = os.path.join(work_dir, "landing")
    res.landed = connector.land_export(manifest, token, landing, client_id=client_id)

    out_dir = os.path.join(work_dir, "export")
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(1, max_parallel_files)) as pool:
        futures = {
            path: pool.submit(
                transform_landed_file, spark, path, server_url, out_dir, rxnav
            )
            for path in res.landed
        }
        # dict insertion order == landed order: deterministic result map
        for path, fut in futures.items():
            res.transformed[path] = fut.result()

    entries = [
        (p, f"{blob_base_url}{res.transformed[p]}") for p in res.landed
    ]
    import_body = build_import_manifest(entries)
    res.import_status_url = connector.bulk_import(import_server, import_token, import_body)
    connector.poll_status(res.import_status_url, import_token)

    res.archived = connector.archive_files(res.landed, os.path.join(work_dir, "archive"))
    if state is not None:
        state.advance(server_url, group_id, next_cursor)
        res.since_advanced_to = next_cursor
    return res


def compact_landing_dir(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Compact a small-files NDJSON landing zone, per resource type.

    Bulk exports land one file per manifest entry — at 100 TB that is
    easily 10^5 files of KB–MB size, and every downstream scan pays a
    task per file plus namenode/listing pressure. Compaction merges
    each resource type's files at the TEXT-LINE level (`spark.read.
    text` → ``coalesce`` → text sink): lines are moved byte-for-byte,
    never parsed, so no field can be pruned and no malformed line can
    be rewritten — schema-aware parsing happens downstream where
    errors are surfaced, not silently baked into the landing zone.
    ``coalesce`` is a narrow split merge (``repartition`` would
    shuffle the full payload for nothing).

    Returns {resource_type: n_output_files} (the ACTUAL written file
    count — coalesce cannot increase partition count, so one huge
    non-splittable input still yields one output file).
    """
    by_type: dict[str, list[str]] = {}
    for name in sorted(os.listdir(src_dir)):
        p = os.path.join(src_dir, name)
        if not os.path.isfile(p):
            continue
        by_type.setdefault(resource_type_from_name(name), []).append(p)
    out: dict[str, int] = {}
    for rt, files in by_type.items():
        total = sum(os.path.getsize(p) for p in files)
        n_out = max(1, -(-total // target_file_bytes))
        df = spark.read.text(files).coalesce(n_out)
        n_actual = df.rdd.getNumPartitions()
        df.write.mode("overwrite").text(os.path.join(out_dir, rt))
        out[rt] = n_actual
    return out


def restamp_seed_name(name: str, timestamp: int) -> str:
    """K5: replace every digit run in a seed blob name with a fresh
    epoch stamp (``re.sub('\\d+', ts)`` copy+delete,
    ``FetchBulkData/__init__.py:698-716``) so re-imports don't collide
    on versioned names."""
    return re.sub(r"\d+", str(timestamp), name)


def run_reset_and_seed(
    connector: FhirBulkConnector,
    import_server: str,
    import_token: str,
    seed_dir: str,
    work_dir: str,
    timestamp: int,
    blob_base_url: str = "file://",
) -> dict:
    """The reset flow (SURVEY §3.2, ``__init__.py:686-726``):
    $bulk-delete → poll → re-stamp seed files (K5) → import manifest
    → $import → poll. Returns {deleted, seeded, import_status_url}.
    """
    delete_status = connector.bulk_delete(import_server, import_token)
    connector.poll_status(delete_status, import_token)

    os.makedirs(work_dir, exist_ok=True)
    seeded: list[str] = []
    for name in sorted(os.listdir(seed_dir)):
        new_name = restamp_seed_name(name, timestamp)
        dst = os.path.join(work_dir, new_name)
        shutil.copyfile(os.path.join(seed_dir, name), dst)
        seeded.append(dst)

    entries = [(p, f"{blob_base_url}{p}") for p in seeded]
    body = build_import_manifest(entries)
    import_status = connector.bulk_import(import_server, import_token, body)
    connector.poll_status(import_status, import_token)
    return {
        "deleted": delete_status,
        "seeded": seeded,
        "import_status_url": import_status,
    }
