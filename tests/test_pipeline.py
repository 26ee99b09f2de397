"""End-to-end pipeline test (SURVEY §3.1): two incremental runs
through the full export → transform → import → archive flow with a
fake server; the second run carries the advanced ``_since`` cursor."""

from __future__ import annotations

import json
import os

from capgemini_himss24_fhirbulkdata_demo_spark.connectors import (
    FhirBulkConnector,
    HttpResponse,
)
from capgemini_himss24_fhirbulkdata_demo_spark.connectors.state import HighWaterMark
from capgemini_himss24_fhirbulkdata_demo_spark.pipeline import run_bulk_import
from capgemini_himss24_fhirbulkdata_demo_spark.transforms.schemas import (
    RXNAV_LOOKUP_SCHEMA,
)

PATIENTS = [
    {"resourceType": "Patient", "id": "egqBHVfQlt4Bw3XGXoxVxHg3",
     "identifier": [{"system": "old", "value": "X"}]},
    {"resourceType": "Patient", "id": "p2", "gender": "female"},
]
CONDITIONS = [
    {"resourceType": "Condition", "id": "c1",
     "code": {"coding": [{"system": "s", "code": "old"}], "text": "t"},
     "recordedDate": "1990-01-01"},
]


class FakeServer:
    def __init__(self):
        self.kickoff_urls: list[str] = []
        self.import_bodies: list[dict] = []

    def __call__(self, method, url, headers=None, data=None, params=None):
        if "$export" in url:
            self.kickoff_urls.append(url)
            return HttpResponse(202, headers={"Content-Location": "https://s/st"})
        if url == "https://s/st":
            return HttpResponse(200, content=json.dumps(
                {"output": [
                    {"type": "Patient", "url": "https://s/f/p"},
                    {"type": "Condition", "url": "https://s/f/c"},
                ]}).encode())
        if url == "https://s/f/p":
            return HttpResponse(200, content="\n".join(json.dumps(r) for r in PATIENTS).encode())
        if url == "https://s/f/c":
            return HttpResponse(200, content="\n".join(json.dumps(r) for r in CONDITIONS).encode())
        if url.endswith("/$import"):
            self.import_bodies.append(json.loads(data))
            return HttpResponse(202, headers={"Content-Location": "https://cg/st"})
        if url == "https://cg/st":
            return HttpResponse(200, content=b"{}")
        raise AssertionError(url)


def _read_out(out_path):
    """Read pipeline NDJSON output: a single file (the $import-ready
    shape) or a part-file directory."""
    if os.path.isfile(out_path):
        with open(out_path) as f:
            return [json.loads(line) for line in f if line.strip()]
    rows = []
    for name in sorted(os.listdir(out_path)):
        if name.startswith("part-"):
            with open(os.path.join(out_path, name)) as f:
                rows.extend(json.loads(line) for line in f if line.strip())
    return rows


def test_two_incremental_runs(spark, tmp_path):
    server = FakeServer()
    conn = FhirBulkConnector(transport=server, sleep=lambda s: None)
    state = HighWaterMark(str(tmp_path / "state.json"))
    rx = spark.createDataFrame([("1", "n", "r")], RXNAV_LOOKUP_SCHEMA)

    res1 = run_bulk_import(
        spark, conn, "https://fhir.epic.example", "g1", "tok",
        "https://cg", "itok", str(tmp_path / "run1"), rxnav=rx, state=state,
    )
    # first kickoff has no _since
    assert "_since" not in server.kickoff_urls[0]
    assert len(res1.landed) == 2 and len(res1.archived) == 2
    assert res1.since_advanced_to is not None

    # transforms applied per resource type
    pat_out = next(v for k, v in res1.transformed.items() if "Patient" in k)
    pats = {r["id"]: r for r in _read_out(pat_out)}
    assert pats["egqBHVfQlt4Bw3XGXoxVxHg3"]["identifier"][0]["value"] == "1S00E00AA27"
    assert pats["p2"] == PATIENTS[1]
    cond_out = next(v for k, v in res1.transformed.items() if "Condition" in k)
    conds = _read_out(cond_out)
    assert conds[0]["recordedDate"] == "2019-09-04T11:10:27.000Z"
    assert conds[0]["code"]["coding"][0]["code"] == "E11.59"

    # import manifest listed both files with types parsed from names
    types = [p["part"][0]["valueString"]
             for p in server.import_bodies[0]["parameter"] if p["name"] == "input"]
    assert sorted(types) == ["Condition", "Patient"]

    # second run: kickoff carries the persisted cursor
    run_bulk_import(
        spark, conn, "https://fhir.epic.example", "g1", "tok",
        "https://cg", "itok", str(tmp_path / "run2"), rxnav=rx, state=state,
    )
    assert f"_since={res1.since_advanced_to}" in server.kickoff_urls[1]


def test_high_water_mark_atomic(tmp_path):
    hwm = HighWaterMark(str(tmp_path / "s.json"))
    assert hwm.get("srv", "g") is None
    hwm.advance("srv", "g", "2024-01-01T00:00:00")
    hwm.advance("srv2", "g", "2024-02-02T00:00:00")
    assert hwm.get("srv", "g") == "2024-01-01T00:00:00"
    assert hwm.get("srv2", "g") == "2024-02-02T00:00:00"


def test_reset_and_seed(tmp_path):
    from capgemini_himss24_fhirbulkdata_demo_spark.pipeline import (
        restamp_seed_name,
        run_reset_and_seed,
    )

    assert restamp_seed_name("Patient-abc-1699999999.json", 42) == "Patient-abc-42.json"
    assert restamp_seed_name("Condition-7-8.json", 5) == "Condition-5-5.json"

    calls = []

    def transport(method, url, headers=None, data=None, params=None):
        calls.append((method, url))
        if "$bulk-delete" in url:
            assert params == {"_hardDelete": "True"}
            return HttpResponse(202, headers={"Content-Location": "https://cg/del"})
        if url == "https://cg/del":
            return HttpResponse(200, content=b"{}")
        if url.endswith("/$import"):
            return HttpResponse(202, headers={"Content-Location": "https://cg/imp"})
        if url == "https://cg/imp":
            return HttpResponse(200, content=b"{}")
        raise AssertionError(url)

    seed = tmp_path / "seed"
    seed.mkdir()
    (seed / "Patient-client-1000.json").write_text('{"resourceType":"Patient","id":"s1"}')
    (seed / "Condition-client-1000.json").write_text('{"resourceType":"Condition","id":"s2"}')

    conn = FhirBulkConnector(transport=transport, sleep=lambda s: None)
    out = run_reset_and_seed(
        conn, "https://cg", "tok", str(seed), str(tmp_path / "work"), timestamp=777
    )
    names = sorted(os.path.basename(p) for p in out["seeded"])
    assert names == ["Condition-client-777.json", "Patient-client-777.json"]
    assert ("DELETE", "https://cg/$bulk-delete") in calls


def test_transformed_outputs_are_single_ndjson_files(spark, tmp_path):
    """$import urls must point at one NDJSON blob each, not a Spark
    part-file directory."""
    server = FakeServer()
    conn = FhirBulkConnector(transport=server, sleep=lambda s: None)
    rx = spark.createDataFrame([("1", "n", "r")], RXNAV_LOOKUP_SCHEMA)
    res = run_bulk_import(
        spark, conn, "https://fhir.epic.example", "g1", "tok",
        "https://cg", "itok", str(tmp_path / "run"), rxnav=rx,
    )
    for out in res.transformed.values():
        assert os.path.isfile(out), out
        assert out.endswith(".ndjson")
    # the manifest's valueUris reference those single files
    uris = [p["part"][1]["valueUri"]
            for p in server.import_bodies[-1]["parameter"] if p["name"] == "input"]
    assert all(u.endswith(".ndjson") for u in uris)


def test_compact_landing_dir(spark, tmp_path):
    """Many small NDJSON export files -> compacted files per resource
    type, lines preserved BYTE-EXACTLY (fields outside any curated
    schema and even malformed lines must survive — compaction never
    parses)."""
    import json as _json

    from capgemini_himss24_fhirbulkdata_demo_spark.pipeline import compact_landing_dir

    src = tmp_path / "landing"
    src.mkdir()
    lines = []
    for i in range(6):
        recs = [
            {
                "resourceType": "Patient",
                "id": f"p{i}-{j}",
                "gender": "other",
                # field no curated schema knows about
                "address": [{"city": "Boston"}],
            }
            for j in range(3)
        ]
        txt = [_json.dumps(r) for r in recs]
        lines += txt
        (src / f"Patient-{i}.ndjson").write_text("\n".join(txt) + "\n")
    # unknown resource type and a malformed (truncated) line: both
    # must pass through unmodified
    (src / "Mystery-1.ndjson").write_text('{"resourceType": "Mystery", "x": 1\n')
    out = tmp_path / "compacted"
    result = compact_landing_dir(spark, str(src), str(out), target_file_bytes=10**9)
    assert result == {"Mystery": 1, "Patient": 1}
    files = [f for f in (out / "Patient").iterdir() if f.name.startswith("part-")]
    assert len(files) == 1
    back = sorted(r.value for r in spark.read.text(str(out / "Patient")).collect())
    assert back == sorted(lines)  # byte-exact, address field intact
    myst = [r.value for r in spark.read.text(str(out / "Mystery")).collect()]
    assert myst == ['{"resourceType": "Mystery", "x": 1']


def test_eob_bench_landing_dir_matches_single_file(tmp_path):
    """The 64-file bench landing dir carries exactly the records the
    single-file writer produces — same count, same content, contiguous
    blocks per file — so the v5 bench input change alters file layout
    only, never the measured workload."""
    import json

    from capgemini_himss24_fhirbulkdata_demo_spark.transforms.benchdata import (
        write_eob_ndjson,
        write_eob_ndjson_dir,
    )

    n = 1_000
    single = write_eob_ndjson(str(tmp_path / "one.ndjson"), n)
    land = write_eob_ndjson_dir(str(tmp_path / "landing"), n, n_files=7)
    files = sorted(
        f for f in os.listdir(land) if f.endswith(".ndjson")
    )
    assert len(files) == 7
    multi_lines = []
    for f in files:
        with open(os.path.join(land, f)) as fh:
            multi_lines.extend(fh.read().splitlines())
    single_lines = open(single).read().splitlines()
    # contiguous blocks in file order == the single-file order exactly
    assert multi_lines == single_lines
    assert len(multi_lines) == n
    # spot-check the content is real EOB JSON
    assert json.loads(multi_lines[0])["resourceType"] == "ExplanationOfBenefit"
