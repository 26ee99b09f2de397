"""Tests for the diagnostic tools that feed scale evidence.

The scaled-fixture generator (tools/make_scaled_fixture.py) is the
substrate for SKETCH_MARGINS.md and the full-corpus differential
ladder (tools/full_differential.py); if its key-offset replication
ever broke join integrity, every conclusion drawn from those corpora
would be about a malformed corpus. These tests pin the invariants the
docstring promises, on a 2x copy of sf0.001.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

N = 2


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fixture2x"))
    import make_scaled_fixture

    make_scaled_fixture.main([out, str(N), SF_DIR, "--all-tables"])
    return out


def _counts(spark, sf_dir, table):
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet")).count()


def test_row_counts_scale_exactly(spark, scaled_dir):
    fact = (
        "lineitem orders customer part supplier events documents embeddings"
    ).split()
    for t in fact:
        assert _counts(spark, scaled_dir, t) == N * _counts(spark, SF_DIR, t), t
    for t in ("nation", "region"):
        assert _counts(spark, scaled_dir, t) == _counts(spark, SF_DIR, t), t


def _load(spark, sf_dir, table):
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


@pytest.mark.parametrize(
    "left,right,cond",
    [
        ("lineitem", "orders", "l_orderkey = o_orderkey"),
        ("lineitem", "part", "l_partkey = p_partkey"),
        ("lineitem", "supplier", "l_suppkey = s_suppkey"),
        ("orders", "customer", "o_custkey = c_custkey"),
        ("events", "customer", "user_id = c_custkey"),
        ("documents", "embeddings", "doc_id = vec_id"),
        # group-A coherence: the as-of predicate must replicate
        # per copy — a stride mismatch between event_id and
        # o_orderkey would change this count non-linearly
        (
            "events",
            "orders",
            "user_id = o_custkey AND event_id <= o_orderkey",
        ),
    ],
)
def test_join_densities_scale_exactly(spark, scaled_dir, left, right, cond):
    def pairs(sf_dir):
        _load(spark, sf_dir, left).createOrReplaceTempView("l_")
        _load(spark, sf_dir, right).createOrReplaceTempView("r_")
        return spark.sql(f"SELECT count(*) c FROM l_ JOIN r_ ON {cond}").first()["c"]

    base = pairs(SF_DIR)
    assert base > 0, f"degenerate base join {left}/{right}"
    assert pairs(scaled_dir) == N * base


def test_copies_are_key_disjoint(spark, scaled_dir):
    from pyspark.sql import functions as F

    for t, k in [
        ("documents", "doc_id"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("customer", "c_custkey"),
    ]:
        base = _load(spark, SF_DIR, t).agg(F.countDistinct(k)).first()[0]
        scaled = _load(spark, scaled_dir, t).agg(F.countDistinct(k)).first()[0]
        assert scaled == N * base, t


def test_payloads_replicate_verbatim(spark, scaled_dir):
    """Each document body appears exactly N times (the designed
    exact-duplicate stress for the dedup family)."""
    from pyspark.sql import functions as F

    docs = _load(spark, scaled_dir, "documents")
    mult = (
        docs.groupBy("text").count().select(F.collect_set("count").alias("m"))
    ).first()["m"]
    base_max = (
        _load(spark, SF_DIR, "documents").groupBy("text").count().agg(F.max("count"))
    ).first()[0]
    assert max(mult) <= N * base_max
    assert min(mult) >= N


def test_docs_override_scales_only_document_group(spark, tmp_path):
    import make_scaled_fixture

    out = str(tmp_path / "docs3x")
    make_scaled_fixture.main([out, "1", SF_DIR, "--all-tables", "--docs", "3"])
    for t in ("documents", "embeddings"):
        assert _counts(spark, out, t) == 3 * _counts(spark, SF_DIR, t), t
    for t in ("lineitem", "orders", "customer", "events"):
        assert _counts(spark, out, t) == _counts(spark, SF_DIR, t), t
    # doc/vec stride group intact under the override
    d = _load(spark, out, "documents")
    v = _load(spark, out, "embeddings")
    joined = d.join(v, d["doc_id"] == v["vec_id"]).count()
    db = _load(spark, SF_DIR, "documents")
    vb = _load(spark, SF_DIR, "embeddings")
    base = db.join(vb, db["doc_id"] == vb["vec_id"]).count()
    assert joined == 3 * base


def test_docs_without_all_tables_errors(tmp_path):
    """r9 ADVICE: --docs was silently ignored without --all-tables."""
    import make_scaled_fixture

    with pytest.raises(SystemExit):
        make_scaled_fixture.main([str(tmp_path / "x"), "2", SF_DIR, "--docs", "3"])


def test_resume_log_parsing_is_anchored(tmp_path):
    """r9 ADVICE: --resume must not green a FAIL line containing
    ': ok (' in its error text, and must carry the fixture header."""
    import full_differential

    log = tmp_path / "prior.log"
    log.write_text(
        "[differential] sf_dir=/tmp/fxA ansi=False\n"
        "[  1/3] q01_pricing_summary: ok (1.2s)\n"
        "[  2/3] q02_filter_project: FAIL (0.3s) exception: got ': ok (' in text\n"
        "[  3/3] q03_top_revenue_orders: ok (resumed from prior log)\n"
    )
    sf, log_ansi, green = full_differential.parse_resume_log(str(log))
    assert sf == "/tmp/fxA"
    assert log_ansi == "False"
    assert green == {"q01_pricing_summary", "q03_top_revenue_orders"}

    headerless = tmp_path / "old.log"
    headerless.write_text("[  1/1] q01_pricing_summary: ok (1.0s)\n")
    sf2, ansi2, green2 = full_differential.parse_resume_log(str(headerless))
    assert sf2 is None and ansi2 is None  # pre-r11: main() refuses
    assert green2 == {"q01_pricing_summary"}


def test_resume_log_parsing_captures_ansi_and_resets_on_header(tmp_path):
    """r10 ADVICE (medium): the header's ansi= flag must be captured
    so main() can refuse a cross-MODE resume (a non-ANSI log must
    never green-skip queries in an --ansi overflow-detector run), and
    a log holding two concatenated runs must resume only the LAST
    header's greens — not the union across fixtures/modes."""
    import full_differential

    log = tmp_path / "two_runs.log"
    log.write_text(
        # run 1: non-ANSI against fixture A
        "[differential] sf_dir=/tmp/fxA ansi=False\n"
        "[  1/2] q01_pricing_summary: ok (1.2s)\n"
        "[  2/2] q02_filter_project: ok (0.3s)\n"
        # run 2 (appended with >>): ANSI against fixture B
        "[differential] sf_dir=/tmp/fxB ansi=True\n"
        "[  1/2] q03_top_revenue_orders: ok (0.9s)\n"
        "[  2/2] q02_filter_project: FAIL (0.3s) boom\n"
    )
    sf, log_ansi, green = full_differential.parse_resume_log(str(log))
    assert sf == "/tmp/fxB"
    assert log_ansi == "True"
    # run 1's greens were reset at run 2's header: q01/q02 (only green
    # non-ANSI against fxA) must NOT resume-pass an ANSI run on fxB
    assert green == {"q03_top_revenue_orders"}


def test_bench_compare_point_fallback():
    """r9 verdict ask #6: the session-default streaming series gets a
    triage row even against pre-v7.1 payloads (point fallback)."""
    import bench_compare

    old = {"streaming": {"streaming_events_per_sec_default_basis": 22800}}
    band, is_point = bench_compare._band(old, "streaming_default_ev_per_sec")
    assert is_point and band == {"median": 22800, "min": 22800, "max": 22800}

    new = {
        "dispersion": {
            "streaming_default_ev_per_sec": {
                "median": 21000, "min": 19000, "max": 24000,
            }
        }
    }
    band2, is_point2 = bench_compare._band(new, "streaming_default_ev_per_sec")
    assert not is_point2 and band2["median"] == 21000
    # 21000 inside the zero-width-band? no: below 22800 -> would read
    # REGRESSION for higher-is-better against a zero-width band; the
    # printed caveat marks it as weak evidence
    assert bench_compare.verdict(band, band2, True).startswith("REGRESSION")
    assert (
        bench_compare.verdict(band, {"median": 22800, "min": 0, "max": 1}, True)
        == "noise (medians inside bands)"
    )
