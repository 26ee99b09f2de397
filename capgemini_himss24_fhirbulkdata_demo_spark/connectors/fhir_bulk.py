"""FHIR Bulk Data connector (driver-side; SURVEY §3.1 steps 1–3 & 5).

Re-expresses the reference's orchestration (``FetchBulkData/
__init__.py``): token-URL discovery (:31-39, O7), RS384 JWT client
assertion (:63-111, O8 — signing callable injected; Key Vault / local
key both fit), token exchange (:120-173, O9), $export kickoff with
``Prefer: respond-async`` + ``_since`` cursor (:175-189,609-613,
O3/O4), exponential-backoff polling (:282-326, O5), NDJSON download
(:328-336, S1), FHIR ``Parameters`` import manifest (:205-242, T20),
$import / $bulk-delete kickoff (:253-280, K2/K3).

Everything I/O-ish is injected: ``transport(method, url, headers,
data) -> HttpResponse``, ``sleep``, ``now``, ``make_jti``. The default
transport uses ``requests`` when available.

Architectural fix vs the reference: the download loop lands files
into a directory consumed by Spark (batch or readStream) instead of
holding whole files in memory; manifest entries are processed
independently (parallel loads) instead of a sequential for-loop
(``:644``; SURVEY §4.3.4).
"""

from __future__ import annotations

import hashlib
import json
import os
import time as _time
import uuid
from calendar import timegm
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from ..functions.encoding import b64url_encode_py

JWT_BEARER = "urn:ietf:params:oauth:client-assertion-type:jwt-bearer"
NDJSON_CONTENT_TYPE = "application/fhir+ndjson"


@dataclass
class HttpResponse:
    status_code: int
    headers: dict[str, str] = field(default_factory=dict)
    content: bytes = b""

    @property
    def ok(self) -> bool:
        return 200 <= self.status_code < 300

    def json(self):
        return json.loads(self.content)


Transport = Callable[..., HttpResponse]


def _requests_transport(method: str, url: str, headers=None, data=None, params=None):
    import requests

    r = requests.request(method, url, headers=headers, data=data, params=params)
    return HttpResponse(r.status_code, dict(r.headers), r.content)


def build_jwt_assertion(
    client_id: str,
    token_url: str,
    signer: Callable[[bytes], bytes],
    kid: str = "",
    now: Callable[[], datetime] | None = None,
    make_jti: Callable[[], str] | None = None,
) -> str:
    """SMART Backend Services RS384 client assertion (O8).

    ``signer`` receives the SHA-384 digest of ``b64(header).b64(payload)``
    and returns the RS384 signature bytes — the Key Vault crypto client
    slot in the reference (``__init__.py:100``), or any local RSA key.
    """
    now = now or (lambda: datetime.now(tz=timezone.utc))
    make_jti = make_jti or (lambda: str(uuid.uuid4()))
    header = {"alg": "RS384", "typ": "JWT", "kid": kid}
    payload = {
        "sub": client_id,
        "iss": client_id,
        "aud": token_url,
        "jti": make_jti(),
        "exp": timegm((now() + timedelta(minutes=5)).utctimetuple()),
    }
    b64_h = b64url_encode_py(json.dumps(header, separators=(",", ":")).encode())
    b64_p = b64url_encode_py(json.dumps(payload, separators=(",", ":")).encode())
    signing_input = f"{b64_h}.{b64_p}".encode()
    signature = signer(hashlib.sha384(signing_input).digest())
    return f"{b64_h}.{b64_p}.{b64url_encode_py(signature)}"


def build_import_manifest(blob_entries: list[tuple[str, str]]) -> dict:
    """FHIR ``Parameters`` import body (T20, ``__init__.py:205-242``).

    ``blob_entries`` = [(blob_name, url)]; resource type = text before
    the first '-' in the blob name (``:218``).
    """
    parameter = [{"name": "inputFormat", "valueString": NDJSON_CONTENT_TYPE}]
    for blob_name, url in blob_entries:
        resource_name = os.path.basename(blob_name).split("-")[0]
        parameter.append(
            {
                "name": "input",
                "part": [
                    {"name": "type", "valueString": resource_name},
                    {"name": "url", "valueUri": url},
                ],
            }
        )
    return {"resourceType": "Parameters", "parameter": parameter}


class FhirBulkConnector:
    """End-to-end bulk $export → land → $import orchestration."""

    def __init__(
        self,
        transport: Transport | None = None,
        sleep: Callable[[float], None] = _time.sleep,
        max_poll_attempts: int = 100,
    ):
        self.transport = transport or _requests_transport
        self.sleep = sleep
        self.max_poll_attempts = max_poll_attempts

    # ---- auth (O7/O9) ----

    def discover_token_url(self, smart_config_url: str) -> str:
        r = self.transport("GET", smart_config_url)
        try:
            return r.json()["token_endpoint"]
        except Exception as e:
            raise RuntimeError("Could not find token url") from e

    def get_access_token(
        self,
        token_url: str,
        client_id: str | None = None,
        client_secret: str | None = None,
        signed_jwt: str | None = None,
        scope: str = "",
    ) -> tuple[str, datetime]:
        if signed_jwt is not None and client_secret is not None:
            raise ValueError("use either signed_jwt or client_secret, not both")
        if signed_jwt is not None:
            r = self.transport(
                "POST",
                token_url,
                data={
                    "grant_type": "client_credentials",
                    "client_assertion_type": JWT_BEARER,
                    "client_assertion": signed_jwt,
                    "scope": scope,
                },
            )
        elif client_secret is not None:
            if client_id is None:
                raise ValueError("client_secret requires client_id")
            # RFC 7617 Basic auth: STANDARD base64 with padding (the
            # reference's padding-stripped urlsafe form, __init__.py:144,
            # is rejected by compliant servers); RFC 6749 §4.4.2 further
            # requires grant_type in the body.
            import base64 as _b64

            basic = _b64.b64encode(f"{client_id}:{client_secret}".encode()).decode()
            r = self.transport(
                "POST",
                token_url,
                headers={"Authorization": f"Basic {basic}", "accept": "application/json"},
                data={"grant_type": "client_credentials"},
            )
        else:
            raise ValueError("need one of signed_jwt or client_secret")
        if not r.ok:
            raise RuntimeError(f"token exchange failed: {r.status_code}")
        body = r.json()
        # timezone-aware UTC: a naive expiry compares as TypeError
        # against the module's aware datetimes and skews by the host's
        # UTC offset
        expires = datetime.now(tz=timezone.utc) + timedelta(
            seconds=int(body["expires_in"])
        )
        return body["access_token"], expires

    # ---- export (O3/O4/O5, S1) ----

    def kickoff_export(
        self, server_url: str, group_id: str, token: str, since: str | None = None
    ) -> str:
        """GET Group/{id}/$export with respond-async; returns the
        status URL. ``since`` is the incremental high-water mark
        (``_since=YYYY-MM-DDThh:mm:ss``, O4)."""
        url = f"{server_url}/Group/{group_id}/$export"
        if since:
            url += f"?_since={since}"
        r = self.transport(
            "GET",
            url,
            headers={
                "Accept": "application/fhir+json",
                "Prefer": "respond-async",
                "Authorization": f"Bearer {token}",
            },
        )
        if not (r.ok and "Content-Location" in r.headers):
            raise RuntimeError(
                f"export kickoff failed: {r.status_code} {r.content[:200]!r}"
            )
        return r.headers["Content-Location"]

    def poll_status(
        self,
        status_url: str,
        token: str,
        on_progress: Callable[[str], None] | None = None,
    ) -> bytes:
        """Poll with linear-growth backoff (sleep 2·n, n→cap) until 200
        (reference ``:282-326``); raises on error statuses.

        Servers report export progress via the ``X-Progress`` header on
        202 responses (reference surfaces it at ``__init__.py:298``);
        each observed value is handed to ``on_progress`` and kept on
        ``self.last_progress`` so long waits are observable.
        """
        headers = {
            "Authorization": f"Bearer {token}",
            "Prefer": "respond-async",
            "Accept": "application/fhir+json",
        }
        self.last_progress: str | None = None
        for n in range(1, self.max_poll_attempts + 1):
            r = self.transport("GET", status_url, headers=headers)
            if r.status_code == 200:
                return r.content
            if r.status_code == 202:
                progress = r.headers.get("X-Progress")
                if progress is not None:
                    self.last_progress = progress
                    if on_progress is not None:
                        on_progress(progress)
                self.sleep(2 * n)
                continue
            raise RuntimeError(f"poll failed: {r.status_code} {r.content[:200]!r}")
        raise TimeoutError("polling taking too long")

    def fetch_export_file(self, data_url: str, token: str) -> bytes:
        r = self.transport(
            "GET",
            data_url,
            headers={"Authorization": f"Bearer {token}", "Accept": NDJSON_CONTENT_TYPE},
        )
        return r.content

    def _download_to(self, data_url: str, token: str, dest_path: str) -> None:
        """Chunk-stream a file to disk when running on the default
        requests transport (multi-GB export files must not buffer in
        driver memory); injected transports fall back to the in-memory
        interface (tests, small fixtures)."""
        if self.transport is not _requests_transport:
            with open(dest_path, "wb") as f:
                f.write(self.fetch_export_file(data_url, token))
            return
        import requests

        with requests.get(
            data_url,
            headers={"Authorization": f"Bearer {token}", "Accept": NDJSON_CONTENT_TYPE},
            stream=True,
        ) as r:
            r.raise_for_status()
            with open(dest_path, "wb") as f:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk)

    def land_export(
        self, manifest: dict, token: str, landing_dir: str, client_id: str = "export"
    ) -> list[str]:
        """Download every manifest output file into ``landing_dir``
        using the reference blob-name convention
        ``{Type}-{clientId}-{uuid}.json`` (``:653``); returns paths.

        Files are independent — at scale this loop parallelizes
        trivially (thread pool / one Spark task per file); kept simple
        here because the downloads are driver-side network I/O.
        """
        os.makedirs(landing_dir, exist_ok=True)
        out = []
        for entry in manifest.get("output", []):
            name = f"{entry['type']}-{client_id}-{uuid.uuid4()}.json"
            path = os.path.join(landing_dir, name)
            self._download_to(entry["url"], token, path)
            out.append(path)
        return out

    # ---- import / delete (K2/K3) ----

    def bulk_import(self, fhir_server: str, token: str, import_body: dict) -> str:
        r = self.transport(
            "POST",
            f"{fhir_server}/$import",
            headers={
                "Authorization": f"Bearer {token}",
                "Prefer": "respond-async",
                "Content-Type": "application/fhir+json",
            },
            data=json.dumps(import_body).encode(),
        )
        if not r.ok:
            raise RuntimeError(f"failed to kick off import: {r.status_code}")
        return r.headers["Content-Location"]

    def bulk_delete(self, fhir_server: str, token: str) -> str:
        r = self.transport(
            "DELETE",
            f"{fhir_server}/$bulk-delete",
            headers={
                "Authorization": f"Bearer {token}",
                "Prefer": "respond-async",
                "Content-Type": "application/fhir+json",
            },
            params={"_hardDelete": "True"},
        )
        if not r.ok:
            raise RuntimeError(f"failed to kick off delete: {r.status_code}")
        return r.headers["Content-Location"]

    # ---- archive (K4/K5) ----

    @staticmethod
    def archive_files(paths: list[str], archive_dir: str) -> list[str]:
        """Move landed files to an archive dir (blob copy+delete
        ``:338-349`` as a local FS rename)."""
        os.makedirs(archive_dir, exist_ok=True)
        out = []
        for p in paths:
            dst = os.path.join(archive_dir, os.path.basename(p))
            os.replace(p, dst)
            out.append(dst)
        return out
