"""Custom Python DataSource tests: manifest-partitioned NDJSON reads,
type pruning, and composition with from_json + the transform layer."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from capgemini_himss24_fhirbulkdata_demo_spark.sources import fhir_datasource
from capgemini_himss24_fhirbulkdata_demo_spark.transforms.schemas import PATIENT_SCHEMA

PATIENTS = [
    {"resourceType": "Patient", "id": "p1", "gender": "female"},
    {"resourceType": "Patient", "id": "p2", "gender": "male"},
]
CONDITIONS = [{"resourceType": "Condition", "id": "c1", "recordedDate": "2020-01-01"}]


@pytest.fixture()
def manifest(tmp_path):
    pfile = tmp_path / "patients.ndjson"
    pfile.write_text("\n".join(json.dumps(r) for r in PATIENTS))
    cfile = tmp_path / "conditions.ndjson"
    cfile.write_text("\n".join(json.dumps(r) for r in CONDITIONS))
    m = tmp_path / "manifest.json"
    m.write_text(
        json.dumps(
            {
                "output": [
                    {"type": "Patient", "url": f"file://{pfile}"},
                    {"type": "Condition", "url": f"file://{cfile}"},
                ]
            }
        )
    )
    return str(m)


def test_manifest_read_partitions_per_entry(spark, manifest):
    fhir_datasource.register(spark)
    df = spark.read.format("fhirbulk").option("manifest", manifest).load()
    rows = df.collect()
    assert len(rows) == 3
    assert {r.resource_type for r in rows} == {"Patient", "Condition"}
    # one partition per manifest entry
    assert df.rdd.getNumPartitions() == 2
    # line numbers are per-file
    assert sorted(r.line_no for r in rows if r.resource_type == "Patient") == [0, 1]


def test_allowed_types_prunes_fetch(spark, manifest):
    fhir_datasource.register(spark)
    df = (
        spark.read.format("fhirbulk")
        .option("manifest", manifest)
        .option("allowedTypes", "Patient")
        .load()
    )
    rows = df.collect()
    assert {r.resource_type for r in rows} == {"Patient"}
    assert df.rdd.getNumPartitions() == 1  # pruned entry never became a partition


def test_compose_with_typed_projection(spark, manifest):
    """Raw-passthrough + typed lift: from_json over resource_json with
    the curated schema (SURVEY §1.2 pattern)."""
    fhir_datasource.register(spark)
    df = (
        spark.read.format("fhirbulk")
        .option("manifest", manifest)
        .option("allowedTypes", "Patient")
        .load()
        .withColumn("r", F.from_json("resource_json", PATIENT_SCHEMA))
    )
    got = {r.r.id: r.r.gender for r in df.collect()}
    assert got == {"p1": "female", "p2": "male"}


def test_missing_manifest_option_errors(spark):
    fhir_datasource.register(spark)
    with pytest.raises(Exception, match="manifest"):
        spark.read.format("fhirbulk").load().collect()


def test_fully_pruned_manifest_yields_empty(spark, manifest):
    """allowedTypes matching nothing must give an empty DataFrame, not
    a read(None) crash (PySpark substitutes [None] for empty
    partitions())."""
    fhir_datasource.register(spark)
    df = (
        spark.read.format("fhirbulk")
        .option("manifest", manifest)
        .option("allowedTypes", "Observation")
        .load()
    )
    assert df.count() == 0


def test_crlf_lines_stripped(spark, tmp_path):
    f = tmp_path / "p.ndjson"
    f.write_bytes(b'{"resourceType":"Patient","id":"a"}\r\n{"resourceType":"Patient","id":"b"}\r\n')
    m = tmp_path / "m.json"
    m.write_text(json.dumps({"output": [{"type": "Patient", "url": f"file://{f}"}]}))
    fhir_datasource.register(spark)
    rows = spark.read.format("fhirbulk").option("manifest", str(m)).load().collect()
    assert all(not r.resource_json.endswith("\r") for r in rows)
    assert sorted(json.loads(r.resource_json)["id"] for r in rows) == ["a", "b"]
