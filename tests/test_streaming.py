"""Streaming tests (SURVEY §5.2.4): replay the events fixture through
a file stream; assert streaming window aggregates equal their batch
twins; watermark late-drop; stateful dedup; foreachBatch exactly-once
shape."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table
from capgemini_himss24_fhirbulkdata_demo_spark.streaming import (
    read_parquet_stream,
    run_foreach_batch_import,
    session_agg,
    streaming_dedup,
    tumbling_agg,
)

from .conftest import SF_DIR

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@pytest.fixture(scope="module")
def landed_events(spark, tmp_path_factory):
    """Land the events fixture as parquet files (the 'export dir')."""
    d = str(tmp_path_factory.mktemp("landing"))
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_to_memory(stream_df, name, checkpoint, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_equals_batch(spark, landed_events, tmp_path):
    stream = read_parquet_stream(spark, landed_events, EVENTS_SCHEMA)
    agg = tumbling_agg(stream)
    _run_to_memory(agg, "tumbling_out", str(tmp_path / "ck1"), mode="append")
    got = {
        tuple(r)
        for r in spark.table("tumbling_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect()
    }
    batch = load_table(spark, SF_DIR, "events")
    exp = {
        tuple(r)
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    }
    # availableNow + append mode emits only watermark-finalized windows;
    # every emitted window must match its batch twin exactly, and the
    # stream must have finalized all but the watermark tail.
    assert got.issubset(exp)
    assert len(got) >= len(exp) - 40  # 2h watermark tail on a 30-day stream


def test_session_stream_equals_batch(spark, landed_events, tmp_path):
    stream = read_parquet_stream(spark, landed_events, EVENTS_SCHEMA).filter(
        F.col("user_id") <= 10
    )
    agg = session_agg(stream)
    _run_to_memory(agg, "session_out", str(tmp_path / "ck2"), mode="append")
    got = {tuple(r) for r in spark.table("session_out").collect()}
    batch = load_table(spark, SF_DIR, "events").filter(F.col("user_id") <= 10)
    exp = {
        tuple(r)
        for r in batch.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
        .collect()
    }
    assert got.issubset(exp)
    assert len(got) >= len(exp) - 25


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two-run replay against one checkpoint: run 1 advances the
    watermark past the late rows; run 2 feeds only late rows → they
    are dropped (no new finalized windows from run 2's data)."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    ck = str(tmp_path / "ck")

    def land(rows, name):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    import datetime as dt

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    on_time = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=5), 1, "click", 1.0, "{}"),  # watermark -> 3h
    ]
    late = [(3, t0 + dt.timedelta(minutes=30), 1, "click", 99.0, "{}")]

    emitted: list[tuple] = []

    def run_once():
        batch_rows: list[tuple] = []

        def commit(batch_df, batch_id):
            batch_rows.extend(tuple(r) for r in batch_df.collect())

        stream = read_parquet_stream(spark, landing, EVENTS_SCHEMA)
        agg = (
            tumbling_agg(stream, window_size="1 hour", watermark="2 hours")
            .writeStream.foreachBatch(commit)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        agg.awaitTermination(120)
        return batch_rows

    land(on_time, "f1")
    first = run_once()
    assert ("2024-06-01 00:00:00", "click", 1, 1.0) in first

    land(late, "f2")
    emitted = run_once()
    # the late event's window (00:00) was already finalized in run 1 —
    # it must NOT be re-emitted or double-counted
    assert all(r[0] != "2024-06-01 00:00:00" for r in emitted)


def test_streaming_dedup(spark, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    import datetime as dt

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=10), 1, "click", 1.0, "{}"),  # dup id
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 2.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(landing, mode="append")
    stream = read_parquet_stream(spark, landing, EVENTS_SCHEMA)
    dedup = streaming_dedup(stream, ["event_id"])
    _run_to_memory(dedup, "dedup_out", str(tmp_path / "ck"))
    got = spark.table("dedup_out").select("event_id").collect()
    assert sorted(r.event_id for r in got) == [1, 2]


def test_foreach_batch_import_sink(spark, tmp_path):
    """foreachBatch commit receives (batch_df, batch_id); restart with
    the same checkpoint does not re-commit old batches."""
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    ck = str(tmp_path / "ck")
    import datetime as dt

    t0 = dt.datetime(2024, 6, 1)
    spark.createDataFrame(
        [(1, t0, 1, "click", 1.0, "{}")], EVENTS_SCHEMA
    ).coalesce(1).write.parquet(landing, mode="append")

    committed: list[tuple[int, int]] = []

    def commit(batch_df, batch_id):
        committed.append((batch_id, batch_df.count()))

    stream = read_parquet_stream(spark, landing, EVENTS_SCHEMA)
    q = run_foreach_batch_import(stream, ck, commit)
    q.awaitTermination(120)
    assert committed == [(0, 1)]

    # restart with no new data: nothing re-committed
    committed.clear()
    stream2 = read_parquet_stream(spark, landing, EVENTS_SCHEMA)
    q2 = run_foreach_batch_import(stream2, ck, commit)
    q2.awaitTermination(120)
    assert committed == []


def test_stateful_rapid_fire_flags(spark, tmp_path):
    """applyInPandasWithState: per-user lifetime sequence numbers and
    rapid-fire flags carry across micro-batches via GroupState."""
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.stateful import (
        rapid_fire_flags,
    )

    import datetime as dt

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)

    collected: list[tuple] = []

    def run_batchfile(rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        stream = read_parquet_stream(spark, landing, EVENTS_SCHEMA).select(
            "user_id", "event_id", "ts"
        )
        flags = rapid_fire_flags(stream, min_gap_s=60.0)

        def commit(batch_df, batch_id):
            collected.extend(tuple(r) for r in batch_df.collect())

        q = (
            flags.writeStream.foreachBatch(commit)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: two events 10s apart (rapid), one other user
    run_batchfile(
        [
            (1, t0, 7, "click", 1.0, "{}"),
            (2, t0 + dt.timedelta(seconds=10), 7, "click", 1.0, "{}"),
            (3, t0, 9, "view", 1.0, "{}"),
        ]
    )
    # batch 2: state must survive the restart — seq_no continues, gap
    # computed against batch 1's last event
    run_batchfile([(4, t0 + dt.timedelta(seconds=30), 7, "click", 1.0, "{}")])

    by_event = {r[1]: r for r in collected}
    assert by_event[1][2] == 1 and by_event[1][4] is False  # first: no gap
    assert by_event[2][2] == 2 and by_event[2][3] == 10.0 and by_event[2][4] is True
    assert by_event[3][2] == 1  # other user independent
    assert by_event[4][2] == 3  # lifetime count carried across batches
    assert by_event[4][3] == 20.0 and by_event[4][4] is True


def test_complete_and_update_output_modes(spark, tmp_path):
    """Streaming agg in complete mode re-emits the full result table
    each batch; update mode emits only changed keys (SURVEY §2B
    Streaming row: output modes)."""
    import datetime as dt

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    t0 = dt.datetime(2024, 6, 1)

    def land(rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def run(mode, name, ck):
        stream = read_parquet_stream(spark, landing, EVENTS_SCHEMA)
        agg = stream.groupBy("event_type").count()
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.event_type, r["count"]) for r in spark.table(name).collect()}

    land([(1, t0, 1, "click", 1.0, "{}"), (2, t0, 1, "view", 1.0, "{}")])
    got1 = run("complete", "complete_out", "ck_c")
    assert got1 == {("click", 1), ("view", 1)}

    land([(3, t0, 2, "click", 1.0, "{}")])
    got2 = run("complete", "complete_out2", "ck_c")  # resumes checkpoint
    assert got2 == {("click", 2), ("view", 1)}  # full table re-emitted

    # update mode from scratch over all files: emits current counts
    got3 = run("update", "update_out", "ck_u")
    assert ("click", 2) in got3 and ("view", 1) in got3


def test_streaming_fhir_import(spark, tmp_path):
    """Incremental FHIR import: files landing over time flow through
    the transform into single-file NDJSON blobs + idempotent commits."""
    import json as _json

    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.fhir_import import (
        start_streaming_import,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.transforms.schemas import (
        RXNAV_LOOKUP_SCHEMA,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    ck = str(tmp_path / "ck")
    rx = spark.createDataFrame([("1", "n", "r")], RXNAV_LOOKUP_SCHEMA)
    commits: list[tuple[int, list[str]]] = []

    def commit(paths, batch_id):
        commits.append((batch_id, paths))

    def run():
        q = start_streaming_import(
            spark, str(landing), "Patient", "https://fhir.epic.example",
            out_dir, ck, commit, rxnav=rx,
        )
        q.awaitTermination(120)

    (landing / "Patient-c-1.json").write_text(_json.dumps(
        {"resourceType": "Patient", "id": "egqBHVfQlt4Bw3XGXoxVxHg3",
         "identifier": [{"system": "old", "value": "X"}]}))
    run()
    assert len(commits) == 1
    path = commits[0][1][0]
    assert os.path.isfile(path) and path.endswith(".ndjson")
    rec = _json.loads(open(path).read().strip())
    assert rec["identifier"][0]["value"] == "1S00E00AA27"  # transform applied

    # second landing: new batch id, only the new file processed
    (landing / "Patient-c-2.json").write_text(
        _json.dumps({"resourceType": "Patient", "id": "p2"}))
    run()
    assert [c[0] for c in commits] == [0, 1]
    rec2 = [_json.loads(l) for l in open(commits[1][1][0]) if l.strip()]
    assert [r["id"] for r in rec2] == ["p2"]

    # replay with no new data: no re-commit
    run()
    assert len(commits) == 2


def test_interval_join_stream_equals_batch(spark, landed_events, tmp_path):
    """Watermarked stream-stream interval join == x33 batch twin on a
    replayed complete source (modulo the unfinalizable watermark
    tail, which on availableNow is empty: all state drains when both
    sources are exhausted)."""
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming import interval_join

    left = read_parquet_stream(spark, landed_events, EVENTS_SCHEMA).filter(
        F.col("event_type") == "view"
    )
    right = read_parquet_stream(spark, landed_events, EVENTS_SCHEMA).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join(left, right)
    _run_to_memory(joined, "ij_out", str(tmp_path / "ck_ij"), mode="append")
    got = {
        tuple(r)
        for r in spark.table("ij_out")
        .select("user_id", "view_id", "purchase_id", "lag_sec")
        .collect()
    }
    exp = {tuple(r) for r in QUERIES["x33_interval_join"](spark, SF_DIR).collect()}
    # stream-stream inner join emits matches as they resolve; on a
    # drained availableNow source every batch pair must have appeared
    assert got == exp
    assert len(exp) > 0


def test_stateful_funnel_firsts_across_batches(spark, tmp_path):
    """applyInPandasWithState ordered funnel (streaming form of x35):
    step k only counts events strictly after step k-1's first time,
    out-of-order steps don't count, and state carries across
    micro-batches (user 7 completes the funnel over two batches)."""
    import datetime as dt

    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.stateful import (
        funnel_firsts,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    ck = str(tmp_path / "ck")
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)

    def us(sec):
        return int((t0 + dt.timedelta(seconds=sec)).timestamp() * 1_000_000)

    collected: list[tuple] = []

    def run_batchfile(rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        stream = read_parquet_stream(spark, landing, EVENTS_SCHEMA).select(
            "user_id", "event_id", "event_type", "ts"
        )
        fun = funnel_firsts(stream)

        def commit(batch_df, batch_id):
            collected.extend(tuple(r) for r in batch_df.collect())

        q = (
            fun.writeStream.foreachBatch(commit)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 — user 7 starts the funnel; user 9's click precedes any
    # view, so it must NOT open step 2
    run_batchfile(
        [
            (1, t0, 7, "view", 1.0, "{}"),
            (2, t0 + dt.timedelta(seconds=10), 7, "click", 1.0, "{}"),
            (3, t0, 9, "click", 1.0, "{}"),
        ]
    )
    # batch 2 — user 7 completes; user 9 views then clicks, but its
    # purchase@45 precedes the click@50, so step 3 stays open
    run_batchfile(
        [
            (4, t0 + dt.timedelta(seconds=30), 7, "purchase", 1.0, "{}"),
            (5, t0 + dt.timedelta(seconds=40), 9, "view", 1.0, "{}"),
            (6, t0 + dt.timedelta(seconds=45), 9, "purchase", 1.0, "{}"),
            (7, t0 + dt.timedelta(seconds=50), 9, "click", 1.0, "{}"),
        ]
    )

    final = {}
    for row in collected:  # last update per user wins
        final[row[0]] = row
    assert final[7] == (7, 3, us(0), us(10), us(30))
    assert final[9] == (9, 2, us(40), us(50), None)
    # interim emission after batch 1: user 7 had reached step 2
    first_batch_7 = [r for r in collected if r[0] == 7][0]
    assert first_batch_7[1] == 2 and first_batch_7[4] is None


def test_transform_with_state_twin_matches_group_state(spark, tmp_path):
    """Spark-4 transformWithStateInPandas (RocksDB provider, named
    ValueState) produces exactly the applyInPandasWithState op's
    output across multi-batch replays — same state, same flags.

    Skips when protobuf is absent: the TWS state-server protocol
    imports google.protobuf in its driver worker (not baked into this
    container — the Delta/Avro gate story; runs wherever it exists).
    """
    pytest.importorskip("google.protobuf")
    import datetime as dt

    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.stateful import (
        TWS_STATE_STORE_CONF,
        rapid_fire_flags,
        rapid_fire_flags_tws,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    batches = [
        [
            (1, t0, 7, "click", 1.0, "{}"),
            (2, t0 + dt.timedelta(seconds=10), 7, "click", 1.0, "{}"),
            (3, t0, 9, "view", 1.0, "{}"),
        ],
        [
            (4, t0 + dt.timedelta(seconds=300), 7, "click", 1.0, "{}"),
            (5, t0 + dt.timedelta(seconds=301), 9, "view", 1.0, "{}"),
        ],
    ]

    def drain(op, ck, extra_conf=None):
        prev = {}
        for k, v in (extra_conf or {}).items():
            prev[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        collected: list[tuple] = []
        try:
            for i, rows in enumerate(batches):
                spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
                    "append"
                ).parquet(landing + op.__name__)
                stream = read_parquet_stream(
                    spark, landing + op.__name__, EVENTS_SCHEMA
                ).select("user_id", "event_id", "ts")

                def commit(batch_df, batch_id):
                    collected.extend(tuple(r) for r in batch_df.collect())

                q = (
                    op(stream, min_gap_s=60.0)
                    .writeStream.foreachBatch(commit)
                    .outputMode("append")
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(120)
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        return sorted(collected)

    base = drain(rapid_fire_flags, str(tmp_path / "ck_base"))
    tws = drain(
        rapid_fire_flags_tws, str(tmp_path / "ck_tws"), TWS_STATE_STORE_CONF
    )
    assert base == tws
    assert len(base) == 5
    flags = {(r[0], r[1]): r[4] for r in base}
    assert flags[(7, 2)] is True  # 10s gap < 60s
    assert flags[(7, 4)] is False  # 290s gap


def test_interval_left_join_stream_equals_batch_modulo_tail(
    spark, landed_events, tmp_path
):
    """Watermarked stream-stream LEFT OUTER interval join vs the x71
    batch twin: matched rows must agree exactly; NULL (unmatched)
    rows are emitted only when the watermark passes the view's
    interval bound, so the live result's NULL set is the batch twin's
    NULL set minus the unfinalizable tail (views younger than
    max_ts - watermark - max_lag). Asserts both directions of that
    containment, so the test fails if eviction stops emitting NULLs
    OR if rows are emitted that the batch semantics forbid."""
    import datetime as dt

    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming import interval_join

    left = read_parquet_stream(spark, landed_events, EVENTS_SCHEMA).filter(
        F.col("event_type") == "view"
    )
    right = read_parquet_stream(spark, landed_events, EVENTS_SCHEMA).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join(left, right, how="left")
    _run_to_memory(joined, "ij_left_out", str(tmp_path / "ck_ijl"), mode="append")
    got = {
        tuple(r)
        for r in spark.table("ij_left_out")
        .select("user_id", "view_id", "purchase_id")
        .collect()
    }
    batch = QUERIES["x71_interval_left_join"](spark, SF_DIR).collect()
    exp_matched = {
        (r.user_id, r.view_id, r.purchase_id) for r in batch if r.matched == 1
    }
    exp_null = {(r.user_id, r.view_id, None) for r in batch if r.matched == 0}
    got_matched = {t for t in got if t[2] is not None}
    got_null = {t for t in got if t[2] is None}
    assert got_matched == exp_matched
    assert len(exp_matched) > 0
    # the live NULL set is bounded by the batch NULL set...
    assert got_null <= exp_null
    # ...and must contain every view old enough that its state was
    # provably evicted (1 extra hour of safety margin on the bound)
    ev = load_table(spark, SF_DIR, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=4)  # watermark 2h + lag 1h + 1h margin
    views = {
        (r.user_id, r.event_id): r.ts
        for r in ev.filter(F.col("event_type") == "view").collect()
    }
    must_emit = {
        (u, v, None)
        for (u, v, ts) in ((u, v, ts) for (u, v), ts in views.items())
        if (u, v, None) in exp_null and ts < cutoff
    }
    assert must_emit <= got_null
    assert len(must_emit) > 0


def test_stream_static_enrichment_equals_batch(spark, landed_events, tmp_path):
    """Stream-static join: every micro-batch row enriched from the
    static dim exactly as the batch join would — stateless, no
    watermark, dim broadcast (the streaming form of the RxNav
    enrichment shape)."""
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming import (
        enrich_with_static,
    )

    dim = spark.createDataFrame(
        [(i, f"segment_{i % 3}") for i in range(200)], ["user_id", "segment"]
    )
    stream = read_parquet_stream(spark, landed_events, EVENTS_SCHEMA).select(
        "event_id", "user_id"
    )
    out = enrich_with_static(stream, dim, "user_id")
    _run_to_memory(out, "enrich_out", str(tmp_path / "ck_enrich"), mode="append")
    got = {tuple(r) for r in spark.table("enrich_out").collect()}
    batch = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    exp = {tuple(r) for r in batch.join(dim, "user_id", "left")
           .select("event_id", "user_id", "segment").collect()}
    # the join moves the key first in the streaming output — reorder
    assert {(e, u, s) for (u, e, s) in got} == exp
    assert len(exp) > 0


def test_streaming_hll_live_equals_batch(spark, tmp_path):
    """HLL mergeability: per-micro-batch sketch partials re-unioned
    with hll_union_agg give the SAME estimate as one whole-corpus
    sketch — register-wise max is an idempotent semilattice, so the
    result is insensitive to how the stream was micro-batched. The
    partials never cross to the driver (engine-side parquet append),
    and estimates stay within the HLL error envelope of exact."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sketches import (
        finalize_streaming_hll,
        run_streaming_hll,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sources import (
        read_parquet_stream,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "source", F.col("doc_id").cast("long").alias("doc_id")
    )
    landing = str(tmp_path / "hll_landing")
    docs.repartition(4).write.mode("overwrite").parquet(landing)

    schema = StructType(
        [StructField("source", StringType()), StructField("doc_id", LongType())]
    )
    stream = read_parquet_stream(
        spark, landing, schema, max_files_per_trigger=1
    )
    sink = str(tmp_path / "hll_partials")
    n = run_streaming_hll(
        stream, ["source"], "doc_id", str(tmp_path / "hll_ckpt"), sink
    )
    assert n >= 2, "expected multiple micro-batches"

    live = {
        r["source"]: r["approx_distinct"]
        for r in finalize_streaming_hll(spark, sink, ["source"]).collect()
    }
    batch = {
        r["source"]: r["approx_distinct"]
        for r in docs.groupBy("source")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("doc_id")).alias(
            "approx_distinct"))
        .collect()
    }
    assert live == batch  # bit-identical estimates, not merely close

    # and the estimate is inside the HLL error envelope of exact
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    for s, n_exact in exact.items():
        assert abs(live[s] - n_exact) <= max(3, 0.05 * n_exact)


def test_streaming_bloom_live_equals_batch(spark, tmp_path):
    """Bloom mergeability: the bit set unioned over micro-batches
    equals the whole-corpus filter exactly (set union is idempotent —
    micro-batching is invisible), the filter NEVER misses a member
    (no false negatives), and the driver-side probe's md5 fold
    matches the engine-side bit math bit-for-bit."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from capgemini_himss24_fhirbulkdata_demo_spark.queries.features import (
        _BLOOM_K,
        bloom_bit,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sketches import (
        StreamingBloom,
        run_streaming_bloom,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sources import (
        read_parquet_stream,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("text").alias("f"),
    )
    landing = str(tmp_path / "bloom_landing")
    docs.repartition(4).write.mode("overwrite").parquet(landing)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("f", StringType())]
    )
    stream = read_parquet_stream(
        spark, landing, schema, max_files_per_trigger=1
    )
    flt = run_streaming_bloom(stream, "f", str(tmp_path / "bloom_ckpt"))
    assert flt.n_batches >= 2, "expected multiple micro-batches"

    batch = StreamingBloom()
    batch.merge_rows(
        docs.select(
            F.explode(
                F.array(*[bloom_bit(j, F.col("f")) for j in range(_BLOOM_K)])
            ).alias("b")
        )
        .distinct()
        .collect()
    )
    assert flt.bits == batch.bits

    # no false negatives: every member fingerprint probes positive
    members = [r["f"] for r in docs.limit(40).collect()]
    assert all(flt.might_contain(f) for f in members)

    # cross-stream union: two half-filters merge to the full one
    half_a, half_b = StreamingBloom(), StreamingBloom()
    for half, pred in ((half_a, "doc_id % 2 = 0"), (half_b, "doc_id % 2 = 1")):
        half.merge_rows(
            docs.filter(pred)
            .select(
                F.explode(
                    F.array(*[bloom_bit(j, F.col("f"))
                              for j in range(_BLOOM_K)])
                ).alias("b")
            )
            .distinct()
            .collect()
        )
    half_a.merge_filter(half_b)
    assert half_a.bits == batch.bits


def test_streaming_histogram_live_equals_batch_query(spark, tmp_path):
    """Histogram mergeability: bucket counts summed over micro-batches
    equal the whole-corpus histogram exactly (linearity), and the
    driver-side quantile interpolation reproduces the x104 BATCH
    QUERY's est_value for every percentile — the streaming and batch
    forms share one estimator."""
    from pyspark.sql.types import LongType, StructField, StructType

    from capgemini_himss24_fhirbulkdata_demo_spark.queries.features import (
        _X104_QS,
        _X104_W,
        x104_histogram_quantiles,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sketches import (
        StreamingHistogram,
        run_streaming_histogram,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sources import (
        read_parquet_stream,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        F.col("n_chars").cast("long").alias("n_chars")
    )
    landing = str(tmp_path / "hist_landing")
    docs.repartition(4).write.mode("overwrite").parquet(landing)

    schema = StructType([StructField("n_chars", LongType())])
    stream = read_parquet_stream(
        spark, landing, schema, max_files_per_trigger=1
    )
    hist = run_streaming_histogram(
        stream, "n_chars", str(tmp_path / "hist_ckpt")
    )
    assert hist.n_batches >= 2, "expected multiple micro-batches"

    batch = StreamingHistogram()
    batch.merge_rows(
        docs.select((F.col("n_chars") / _X104_W).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    assert hist.buckets == batch.buckets and hist.n == batch.n

    # the streaming estimator reproduces the batch QUERY's estimates
    est = {
        r["q"]: r["est_value"]
        for r in x104_histogram_quantiles(spark, SF_DIR).collect()
    }
    for q in _X104_QS:
        assert hist.quantile(q) == est[q], (q, hist.quantile(q), est[q])

    # cross-stream union: two half-histograms merge to the full one
    half_a, half_b = StreamingHistogram(), StreamingHistogram()
    for half, pred in ((half_a, "n_chars % 2 = 0"), (half_b, "n_chars % 2 = 1")):
        half.merge_rows(
            docs.filter(pred)
            .select((F.col("n_chars") / _X104_W).cast("bigint").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
    half_a.merge_hist(half_b)
    assert half_a.buckets == batch.buckets


def test_streaming_cms_equals_batch(spark, tmp_path):
    """Mergeability is EXACT: the Count-Min sketch accumulated over
    file micro-batches equals the whole-corpus batch sketch
    counter-for-counter (linearity — splitting the stream adds zero
    error), and point estimates never underestimate true counts."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from capgemini_himss24_fhirbulkdata_demo_spark.queries.features import (
        cms_sketch,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sketches import (
        StreamingCountMin,
        run_streaming_cms,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sources import (
        read_parquet_stream,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    landing = str(tmp_path / "docs_landing")
    docs.repartition(4).write.mode("overwrite").parquet(landing)

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = read_parquet_stream(
        spark, landing, schema, max_files_per_trigger=1
    )
    sk = run_streaming_cms(stream, "text", str(tmp_path / "ckpt"))
    assert sk.n_batches >= 2, "expected multiple micro-batches"

    batch = StreamingCountMin()
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    batch.merge_rows(cms_sketch(tok).collect())
    assert sk.counters == batch.counters

    # point estimates: never under the true count
    true = {
        r["t"]: r["c"]
        for r in tok.groupBy("t").agg(F.count("*").alias("c")).limit(50).collect()
    }
    for t, c in true.items():
        assert sk.estimate(t) >= c

    # cross-stream union: two half-sketches merge to the full one
    half_a, half_b = StreamingCountMin(), StreamingCountMin()
    half_a.merge_rows(
        cms_sketch(
            docs.filter("doc_id % 2 = 0").select(
                F.explode(F.split("text", " ")).alias("t")
            )
        ).collect()
    )
    half_b.merge_rows(
        cms_sketch(
            docs.filter("doc_id % 2 = 1").select(
                F.explode(F.split("text", " ")).alias("t")
            )
        ).collect()
    )
    half_a.merge_sketch(half_b)
    assert half_a.counters == batch.counters


def test_streaming_histogram_quantile_bounds():
    """q=0 clamps to rank 1 (the minimum, percentile_cont's q=0
    semantics) instead of raising; out-of-range q raises clearly."""
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming.sketches import (
        StreamingHistogram,
    )

    h = StreamingHistogram(width=10)
    h.merge_rows([{"bucket": 2, "cnt": 3}, {"bucket": 5, "cnt": 1}])
    assert h.quantile(0) == h.quantile(1)  # both rank 1 on n=4
    assert h.quantile(100) > h.quantile(0)
    for bad in (-1, 101):
        with pytest.raises(ValueError, match="0..100"):
            h.quantile(bad)


def test_runner_sizes_state_partitions(spark, landed_events, tmp_path):
    """Engine-owned state sizing (r7 verdict #2): start_stateful_query
    pins the query's state-store partition count to state_partitions
    at first checkpoint, restores the session shuffle conf right after
    start, and produces the identical result set to a raw
    session-default drain of the same plan."""
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming import (
        start_stateful_query,
    )

    def drain(ck, **kw):
        rows = []

        def commit(batch_df, batch_id):
            rows.extend(tuple(r) for r in batch_df.collect())

        q = start_stateful_query(
            tumbling_agg(read_parquet_stream(spark, landed_events, EVENTS_SCHEMA)),
            ck,
            foreach_batch=commit,
            output_mode="update",
            **kw,
        )
        q.awaitTermination(120)
        return set(rows)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ck_sized = str(tmp_path / "ck_sized")
    got = drain(ck_sized, state_partitions=3)
    # session conf untouched for the caller (cloned into the query)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # state store pinned at exactly 3 partitions in the checkpoint
    state_dirs = sorted(
        d for d in os.listdir(os.path.join(ck_sized, "state", "0")) if d.isdigit()
    )
    assert state_dirs == ["0", "1", "2"]
    # sizing is a physical knob only: same rows as the inherit path
    exp = drain(str(tmp_path / "ck_default"), state_partitions=None)
    assert got == exp and len(got) > 0


def test_runner_restart_keeps_pinned_state_partitions(spark, tmp_path):
    """Documented runner caveat: a restart from an existing checkpoint
    keeps the ORIGINALLY pinned state partition count — a different
    state_partitions on restart must neither error nor repartition
    the state."""
    import datetime as dt

    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.streaming import (
        start_stateful_query,
    )

    landing = str(tmp_path / "landing")

    def land(rows, name):
        df = spark.createDataFrame(rows, EVENTS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(landing)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    land(
        [(1, t0, 1, "view", 1.0, None), (2, t0, 1, "click", 1.0, None)],
        "first",
    )
    ck = str(tmp_path / "ck")
    rows: list = []

    def commit(batch_df, batch_id):
        rows.extend(batch_df.collect())

    def run(state_partitions):
        q = start_stateful_query(
            tumbling_agg(
                read_parquet_stream(spark, landing, EVENTS_SCHEMA)
            ),
            ck,
            foreach_batch=commit,
            output_mode="update",
            state_partitions=state_partitions,
        )
        q.awaitTermination(120)

    run(3)
    land(
        [(3, t0 + dt.timedelta(minutes=5), 2, "view", 2.0, None)],
        "second",
    )
    run(16)  # restart asks for 16; checkpoint must keep 3
    state_dirs = sorted(
        d
        for d in os.listdir(os.path.join(ck, "state", "0"))
        if d.isdigit()
    )
    assert state_dirs == ["0", "1", "2"]
    assert len(rows) > 0  # the restarted query processed the new file
