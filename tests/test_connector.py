"""Offline end-to-end test of the FHIR bulk connector (SURVEY §3.1):
fake transport simulates a SMART server + bulk export + import; the
landed files then flow through the real Spark transform pipeline."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from capgemini_himss24_fhirbulkdata_demo_spark.connectors import (
    FhirBulkConnector,
    HttpResponse,
    build_import_manifest,
    build_jwt_assertion,
)
from capgemini_himss24_fhirbulkdata_demo_spark.functions.encoding import (
    b64url_decode_py,
    b64url_encode_py,
)

PATIENT = {"resourceType": "Patient", "id": "p1", "gender": "other"}


class FakeFhirServer:
    """Minimal SMART + bulk-export + import server behind a transport."""

    def __init__(self):
        self.polls = 0
        self.import_bodies = []

    def __call__(self, method, url, headers=None, data=None, params=None):
        if url.endswith("/.well-known/smart-configuration"):
            return HttpResponse(
                200, content=json.dumps({"token_endpoint": "https://idp/token"}).encode()
            )
        if url == "https://idp/token":
            assert data["grant_type"] == "client_credentials"
            assert data["client_assertion"].count(".") == 2
            return HttpResponse(
                200,
                content=json.dumps({"access_token": "tok-123", "expires_in": 3600}).encode(),
            )
        if "$export" in url:
            assert headers["Prefer"] == "respond-async"
            assert "_since=2024-01-01T00:00:00" in url
            return HttpResponse(202, headers={"Content-Location": "https://fhir/status/1"})
        if url == "https://fhir/status/1":
            self.polls += 1
            if self.polls < 3:
                return HttpResponse(202)
            manifest = {"output": [{"type": "Patient", "url": "https://fhir/file/patient1"}]}
            return HttpResponse(200, content=json.dumps(manifest).encode())
        if url == "https://fhir/file/patient1":
            assert headers["Accept"] == "application/fhir+ndjson"
            return HttpResponse(200, content=json.dumps(PATIENT).encode())
        if url.endswith("/$import"):
            self.import_bodies.append(json.loads(data))
            return HttpResponse(202, headers={"Content-Location": "https://cg/status/9"})
        if url == "https://cg/status/9":
            return HttpResponse(200, content=b"{}")
        raise AssertionError(f"unexpected request {method} {url}")


def test_full_export_import_flow(tmp_path):
    server = FakeFhirServer()
    sleeps: list[float] = []
    conn = FhirBulkConnector(transport=server, sleep=sleeps.append)

    token_url = conn.discover_token_url("https://fhir/.well-known/smart-configuration")
    assert token_url == "https://idp/token"

    jwt = build_jwt_assertion(
        "client-1", token_url, signer=lambda digest: b"sig" + digest[:4]
    )
    token, _exp = conn.get_access_token(token_url, signed_jwt=jwt)
    assert token == "tok-123"

    status_url = conn.kickoff_export(
        "https://fhir", "grp-1", token, since="2024-01-01T00:00:00"
    )
    manifest = json.loads(conn.poll_status(status_url, token))
    assert sleeps == [2, 4]  # backoff 2·n

    landing = str(tmp_path / "landing")
    paths = conn.land_export(manifest, token, landing, client_id="client-1")
    assert len(paths) == 1
    name = os.path.basename(paths[0])
    assert name.startswith("Patient-client-1-") and name.endswith(".json")
    assert json.loads(open(paths[0]).read()) == PATIENT

    body = build_import_manifest([(p, f"https://blob/{os.path.basename(p)}") for p in paths])
    assert body["parameter"][0] == {
        "name": "inputFormat",
        "valueString": "application/fhir+ndjson",
    }
    assert body["parameter"][1]["part"][0] == {"name": "type", "valueString": "Patient"}

    import_status = conn.bulk_import("https://cg", token, body)
    assert conn.poll_status(import_status, token) == b"{}"
    assert server.import_bodies[0]["resourceType"] == "Parameters"

    archived = conn.archive_files(paths, str(tmp_path / "archive"))
    assert not os.path.exists(paths[0]) and os.path.exists(archived[0])


def test_jwt_assertion_shape():
    import datetime as dt

    jwt = build_jwt_assertion(
        "cid",
        "https://idp/token",
        signer=lambda d: b"SIGNATURE",
        kid="kid-1",
        now=lambda: dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
        make_jti=lambda: "fixed-jti",
    )
    h, p, s = jwt.split(".")
    header = json.loads(b64url_decode_py(h))
    payload = json.loads(b64url_decode_py(p))
    assert header == {"alg": "RS384", "typ": "JWT", "kid": "kid-1"}
    assert payload["sub"] == payload["iss"] == "cid"
    assert payload["aud"] == "https://idp/token"
    assert payload["jti"] == "fixed-jti"
    assert payload["exp"] == 1704067500  # 2024-01-01T00:05:00Z
    assert b64url_decode_py(s) == b"SIGNATURE"


def test_b64url_roundtrip_and_sql(spark):
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.functions import b64url_sql

    data = [b"\xfb\xef\xbe", b"a", b"ab", b"abc", b"\x00\xff"]
    for d in data:
        assert b64url_decode_py(b64url_encode_py(d)) == d
    df = spark.createDataFrame([(d,) for d in data], "b: binary")
    got = [r.enc for r in df.select(b64url_sql(F.col("b")).alias("enc")).collect()]
    assert got == [b64url_encode_py(d) for d in data]


def test_poll_error_raises():
    def transport(method, url, headers=None, data=None, params=None):
        return HttpResponse(500, content=b"boom")

    conn = FhirBulkConnector(transport=transport, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="poll failed: 500"):
        conn.poll_status("https://x/status", "tok")


# ---- O10: managed-identity token provider (reference :244-251) ----


def _imds_transport(log):
    def transport(method, url, headers=None, data=None, params=None):
        log.append((method, url, dict(headers or {}), dict(params or {})))
        return HttpResponse(
            200,
            content=json.dumps(
                {"access_token": f"tok-{len(log)}", "expires_on": "4102444800"}
            ).encode(),
        )

    return transport


def test_managed_identity_imds_flow():
    import datetime as dt

    from capgemini_himss24_fhirbulkdata_demo_spark.connectors import (
        ManagedIdentityCredential,
        get_fhir_server_access_token,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.connectors.identity import (
        IMDS_ENDPOINT,
    )

    log = []
    cred = ManagedIdentityCredential(
        transport=_imds_transport(log),
        env={},
        now=lambda: dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
    )
    # reference-parity helper: scope form {server}/.default
    tok = get_fhir_server_access_token("https://fhir.example", credential=cred)
    assert tok == "tok-1"
    method, url, headers, params = log[0]
    assert (method, url) == ("GET", IMDS_ENDPOINT)
    assert headers == {"Metadata": "true"}
    # /.default scope suffix stripped to the bare resource URI
    assert params["resource"] == "https://fhir.example"
    assert params["api-version"] == "2018-02-01"
    # cached until expiry: second call makes no request
    assert cred.get_token("https://fhir.example/.default") == "tok-1"
    assert len(log) == 1


def test_managed_identity_app_service_endpoint_and_errors():
    import datetime as dt

    import pytest as _pytest

    from capgemini_himss24_fhirbulkdata_demo_spark.connectors import (
        ManagedIdentityCredential,
    )

    log = []
    cred = ManagedIdentityCredential(
        transport=_imds_transport(log),
        client_id="user-assigned-123",
        env={"IDENTITY_ENDPOINT": "http://localhost:8081/msi", "IDENTITY_HEADER": "sek"},
        now=lambda: dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
    )
    cred.get_token("https://vault.example")
    method, url, headers, params = log[0]
    assert url == "http://localhost:8081/msi"
    assert headers == {"X-IDENTITY-HEADER": "sek"}
    assert params["client_id"] == "user-assigned-123"
    assert params["api-version"] == "2019-08-01"

    def err_transport(method, url, headers=None, data=None, params=None):
        return HttpResponse(400, content=b"no identity")

    bad = ManagedIdentityCredential(transport=err_transport, env={})
    with _pytest.raises(RuntimeError, match="managed identity token request failed"):
        bad.get_token("https://fhir.example")


def test_access_token_expiry_is_timezone_aware():
    import datetime as dt

    def transport(method, url, headers=None, data=None, params=None):
        return HttpResponse(
            200, content=json.dumps({"access_token": "t", "expires_in": 3600}).encode()
        )

    conn = FhirBulkConnector(transport=transport)
    _, expires = conn.get_access_token("https://idp/token", signed_jwt="jwt")
    assert expires.tzinfo is not None
    # comparable against aware datetimes without TypeError
    assert expires > dt.datetime.now(dt.timezone.utc)


def test_poll_status_surfaces_x_progress():
    """Long export waits are observable: every X-Progress header seen
    on a 202 is handed to on_progress and kept on last_progress
    (reference surfaces the header at __init__.py:298)."""
    seen = []
    calls = {"n": 0}

    def transport(method, url, headers=None, data=None, params=None):
        calls["n"] += 1
        if calls["n"] < 3:
            return HttpResponse(
                202, headers={"X-Progress": f"{calls['n'] * 40}% complete"}
            )
        return HttpResponse(200, content=b'{"output": []}')

    c = FhirBulkConnector(transport=transport, sleep=lambda s: None)
    body = c.poll_status("https://fhir/status", "tok", on_progress=seen.append)
    assert body == b'{"output": []}'
    assert seen == ["40% complete", "80% complete"]
    assert c.last_progress == "80% complete"
