"""Structured Streaming surface (beyond-reference tier).

The reference has no streaming operators (SURVEY §2-H); this tier adds
the stream shapes a large-scale ingestion pipeline needs — file-source
streams, watermarked tumbling/sliding windows, gap-based session
windows, chained multi-stateful aggregation, stream-stream interval
joins (inner and left-outer with watermark-exact emission), bounded
streaming dedup, and custom stateful aggregation via
``applyInPandasWithState``
— each runnable in ``availableNow`` batch-catchup mode so results are
deterministic and oracle-checkable against the batch engine.
"""

from orx_surgical_spark.streaming.ops import (
    chained_window_rollup,
    dedup_within_watermark,
    interval_join,
    read_events_stream,
    run_available_now,
    session_counts,
    stateful_user_totals,
    static_enriched_counts,
    typed_state_available,
    typed_state_user_stats,
    upsert_sink,
    windowed_counts,
    with_rocksdb_state_store,
)

__all__ = [
    "chained_window_rollup",
    "dedup_within_watermark",
    "interval_join",
    "read_events_stream",
    "run_available_now",
    "session_counts",
    "stateful_user_totals",
    "static_enriched_counts",
    "typed_state_available",
    "typed_state_user_stats",
    "upsert_sink",
    "windowed_counts",
    "with_rocksdb_state_store",
]
