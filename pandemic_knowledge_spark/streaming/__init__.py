"""Structured Streaming surface (SURVEY.md §2.10, W1–W4).

The reference's streaming model is Prefect-scheduled 24h micro-batches
(/root/reference/flow/scripts/insert_owid.py:282-284) with an incremental
1-day lookback crawl (/root/reference/flow/scripts/crawl_tweets.py:60) and a
known-non-atomic delete-then-reload refresh
(/root/reference/README.md:226-227). Here each becomes the idiomatic
Structured Streaming construct: micro-batch triggers (W1), watermark +
dropDuplicates (W2 — fixing the reference's duplicate bug), an atomic
versioned-swap foreachBatch sink (W3 — fixing the non-atomic refresh), and a
corrupt-row quarantine (W4).
"""

from pandemic_knowledge_spark.streaming.sources import (
    file_stream,
    rate_events,
)
from pandemic_knowledge_spark.streaming.transforms import (
    dedup_within_watermark,
    session_window_agg,
    sliding_window_agg,
    stream_stream_interval_join,
    tumbling_window_agg,
)
from pandemic_knowledge_spark.streaming.sinks import (
    AtomicTable,
    append_parquet_sink,
    atomic_overwrite_sink,
)
from pandemic_knowledge_spark.streaming.stateful import (
    near_dup_mark_stateful,
    near_dup_verdicts,
    running_totals_stateful,
    sessionize_stateful,
)

# Percolate-at-ingest (ES percolator's alerting shape): stateless
# scan-side transform, append-mode safe on a micro-batch stream —
# defined beside its batch tier in operators.search, re-exported here
# because a streaming ingest job is where it's reached for.
from pandemic_knowledge_spark.operators.search import percolate_mark

__all__ = [
    "file_stream",
    "rate_events",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "stream_stream_interval_join",
    "AtomicTable",
    "atomic_overwrite_sink",
    "append_parquet_sink",
    "near_dup_mark_stateful",
    "near_dup_verdicts",
    "percolate_mark",
    "running_totals_stateful",
    "sessionize_stateful",
]
