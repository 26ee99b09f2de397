"""Custom Python DataSource: FHIR bulk-export manifests as a table
(SURVEY §2A S1/S2 "explicit: custom DataSource V2 reader").

``spark.read.format("fhirbulk")`` over a bulk-export *manifest*: one
input partition per manifest ``output`` entry, so the reference's
sequential download loop (``FetchBulkData/__init__.py:644``) becomes
N parallel executor-side reads — the Spark-4-native answer to S1/S2.

Rows are ``(resource_type, file_url, line_no, resource_json)`` — the
raw-passthrough shape (SURVEY §1.2): downstream ``from_json`` with a
curated schema lifts the typed projection while the raw line rides
along untouched.

Options:
- ``manifest``      : path to a JSON manifest file with ``output:
                      [{type, url}]`` (the $export status body), or
- ``manifestJson``  : the manifest body inline;
- ``token``         : bearer token for http(s) urls;
- ``allowedTypes``  : comma-separated resource-type filter (partition
                      pruning — filtered types are never fetched).

``file://`` URLs read locally (tests, landed exports); ``http(s)://``
URLs fetch with ``requests`` executor-side. The reader is
driver-planned / executor-executed, so credentials travel via the
serialized options only.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


@dataclass
class _ManifestEntry(InputPartition):
    resource_type: str
    url: str


class FhirBulkReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def _manifest(self) -> dict:
        if self.options.get("manifestjson"):
            return json.loads(self.options["manifestjson"])
        path = self.options.get("manifest")
        if not path:
            raise ValueError("fhirbulk requires 'manifest' or 'manifestJson' option")
        with open(path) as f:
            return json.load(f)

    def partitions(self):
        allowed = self.options.get("allowedtypes")
        allowed_set = {t.strip() for t in allowed.split(",")} if allowed else None
        out = []
        for entry in self._manifest().get("output", []):
            if allowed_set is not None and entry["type"] not in allowed_set:
                continue  # pruned: never fetched
            out.append(_ManifestEntry(entry["type"], entry["url"]))
        return out

    def read(self, partition: _ManifestEntry):
        if partition is None:
            # PySpark substitutes [None] for an empty partitions() list;
            # an empty manifest selection is an empty result, not a crash
            return
        url = partition.url
        if url.startswith("file://"):
            with open(url[len("file://") :], "rb") as f:
                lines = f.read().decode("utf-8").splitlines()
        elif url.startswith(("http://", "https://")):
            import requests

            headers = {"Accept": "application/fhir+ndjson"}
            token = self.options.get("token")
            if token:
                headers["Authorization"] = f"Bearer {token}"
            # stream + status check: an OperationOutcome error body must
            # not be ingested as resources, a hung server must not hang
            # the task forever, and a multi-GB file must not be held
            # 3x in executor memory
            with requests.get(url, headers=headers, stream=True, timeout=300) as r:
                r.raise_for_status()
                lines = [
                    ln.decode("utf-8")
                    for ln in r.iter_lines()  # strips \n and \r\n alike
                ]
        else:
            raise ValueError(f"unsupported url scheme: {url}")
        for i, line in enumerate(lines):
            line = line.rstrip("\r")  # interior CRLF from local files
            if line.strip():
                yield (partition.resource_type, url, i, line)


class FhirBulkDataSource(DataSource):
    """Register with ``spark.dataSource.register(FhirBulkDataSource)``
    then ``spark.read.format("fhirbulk").option(...)``."""

    @classmethod
    def name(cls) -> str:
        return "fhirbulk"

    def schema(self) -> str:
        return (
            "resource_type STRING, file_url STRING, line_no INT, "
            "resource_json STRING"
        )

    def reader(self, schema: StructType) -> FhirBulkReader:
        return FhirBulkReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FhirBulkDataSource)
