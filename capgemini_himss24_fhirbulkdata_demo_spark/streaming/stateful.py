"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2B Streaming row: "applyInPandasWithState for custom
stateful operators").

Built-in windows/dedup cover the declared surface; this module is the
escape hatch for semantics they can't express. The shipped example —
a per-user running *visit counter with anomaly flag* (flag any event
arriving < ``min_gap_s`` after the previous one, carrying a lifetime
count across micro-batches) — needs ordered cross-batch state, which
no built-in aggregation provides.

State model: one GroupState per user holding (n_events, last_ts).
Timeout: processing-time, so idle users' state is reaped — the
state-size bound that makes this safe on an unbounded key space.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, seq_no BIGINT, "
    "gap_s DOUBLE, rapid_fire BOOLEAN"
)
STATE_SCHEMA = "n_events BIGINT, last_ts_us BIGINT"


def _flag_rapid_fire(min_gap_s: float, idle_timeout_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, last_us = state.get if state.exists else (0, None)
        out = []
        batch = pd.concat(list(pdfs))
        # null event times (NaT) carry INT64_MIN in .value — they would
        # poison last_ts_us and every subsequent gap; drop them
        batch = batch[batch["ts"].notna()].sort_values(["ts", "event_id"])
        for _, row in batch.iterrows():
            ts_us = int(row["ts"].value // 1000)  # pandas ns -> us
            n += 1
            gap = (ts_us - last_us) / 1e6 if last_us is not None else None
            out.append(
                (
                    key[0],
                    int(row["event_id"]),
                    n,
                    gap,
                    gap is not None and gap < min_gap_s,
                )
            )
            last_us = ts_us
        state.update((n, last_us))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "seq_no", "gap_s", "rapid_fire"]
        )

    return fn


def rapid_fire_flags(events, min_gap_s: float = 60.0, idle_timeout_ms: int = 0):
    """Stateful per-user sequence numbering + rapid-fire flagging.

    ``events`` is a streaming DataFrame with (user_id, event_id, ts).
    Arrow-batched per group; state is a 2-field tuple per user.

    ``idle_timeout_ms > 0`` enables processing-time state expiry for
    unbounded key spaces (the 100 TB safety bound). It costs extra
    timeout-processing micro-batches per trigger, so bounded/test
    workloads leave it off.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _flag_rapid_fire(min_gap_s, idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
