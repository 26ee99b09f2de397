"""Streaming sinks: the ``$import``-style side-effect via foreachBatch.

The reference POSTs a FHIR ``Parameters`` manifest per completed
export and polls it (``FetchBulkData/__init__.py:253-280``). The
streaming translation: every micro-batch is "an export"; foreachBatch
hands the batch DataFrame plus a monotonically-increasing batch id to
a commit callback. Exactly-once: the batch id is recorded in the
checkpoint, so a restarted query re-offers the same id and the
callback can dedupe (manifest id = batch id).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .runner import DEFAULT_STATE_PARTITIONS, start_stateful_query


def run_foreach_batch_import(
    stream_df: DataFrame,
    checkpoint_dir: str,
    commit: Callable[[DataFrame, int], None],
    trigger_available_now: bool = True,
    state_partitions: int | None = DEFAULT_STATE_PARTITIONS,
):
    """Start the stream with a foreachBatch commit callback.

    ``commit(batch_df, batch_id)`` must be idempotent on batch_id —
    that is the exactly-once contract Spark's checkpoint provides.
    Returns the StreamingQuery (caller awaits/stops).

    ``state_partitions`` sizes the query's shuffle/state partitions
    at start (engine default: see ``runner.DEFAULT_STATE_PARTITIONS``
    for the per-partition state-commit-cost rationale); ``None``
    inherits the session shuffle default.
    """
    return start_stateful_query(
        stream_df,
        checkpoint_dir,
        foreach_batch=commit,
        trigger_available_now=trigger_available_now,
        state_partitions=state_partitions,
    )
