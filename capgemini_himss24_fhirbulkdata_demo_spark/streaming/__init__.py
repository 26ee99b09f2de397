"""Structured Streaming layer (SURVEY §2B Streaming row).

The reference's incremental story is a hand-rolled micro-batch loop:
the ``_since`` cursor on kickoff (``FetchBulkData/__init__.py:609-613``)
plus sleep-based polling (``:282-326``). Here that becomes:

- a file-source ``readStream`` over an NDJSON/parquet landing
  directory (new export files appear → new micro-batch),
- event-time tumbling/sliding/session windows with watermarks,
- stateful streaming dedup (``dropDuplicates`` under watermark),
- a ``foreachBatch`` sink for the ``$import``-style side effect
  (exactly-once via the checkpointed batch id = manifest id).
"""

from .sources import read_ndjson_stream, read_parquet_stream  # noqa: F401
from .windows import (  # noqa: F401
    enrich_with_static,
    interval_join,
    session_agg,
    sliding_agg,
    streaming_dedup,
    tumbling_agg,
)
from .runner import (  # noqa: F401
    DEFAULT_STATE_PARTITIONS,
    start_stateful_query,
)
from .sinks import run_foreach_batch_import  # noqa: F401
from .sketches import StreamingCountMin, run_streaming_cms  # noqa: F401
