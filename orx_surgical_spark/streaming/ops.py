"""Streaming operators over the ``events`` table.

Design notes for scale:

- File-source streams shard by file; at 100 TB the source is a
  directory tree (or Kafka) and ``maxFilesPerTrigger`` bounds per-batch
  work.  Everything downstream is standard watermark + window state in
  the state store — no driver-side accumulation.
- ``availableNow`` runs process the full backlog as a bounded stream
  and stop: the mechanism for stream/batch parity tests and for the
  catalog's oracle-checked streaming queries.
- Aggregations run in ``complete`` output mode to the memory sink in
  tests/catalog (small results); production sinks would use ``append``
  with the watermark closing windows.
"""

from __future__ import annotations

import itertools
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_SINK_IDS = itertools.count()


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet.

    ``readStream`` needs a declared schema — taken from a batch probe of
    the same path (schema-on-read, one footer).  The ``ts`` column is
    normalized to TimestampType exactly like the batch reader
    (:func:`orx_surgical_spark.sources.readers._normalize_ts` handles both
    the int64-nanos and TIMESTAMP_NTZ file encodings), so stream and
    batch plans see identical types and ``withWatermark`` (which rejects
    NTZ) always gets a TIMESTAMP.
    """
    import os

    from orx_surgical_spark.sources.readers import _normalize_ts

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        # Multi-file table (the sf1 scale tiles; any real dataset): the
        # file source streams the directory's files directly. A glob of
        # the directory NAME matches zero files — the silent-empty-
        # stream bug the r6 sf1 soak recorded as 0-row stream panels.
        target = path
    else:
        # Single-file graded layout: the file source wants a directory,
        # so stream sf_dir with a glob selecting the one file.
        reader = reader.option("pathGlobFilter", "events.parquet")
        target = sf_dir
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _normalize_ts(reader.parquet(target))


def windowed_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling (or sliding, when ``slide`` differs) window
    aggregation: events per (window, event_type) with a value sum.
    State is bounded by the watermark; late rows beyond it are dropped.
    """
    w = (
        F.window("ts", window, slide)
        if slide and slide != window
        else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes"
) -> DataFrame:
    """Gap-based session windows per user (``session_window`` — merges
    events closer than ``gap`` into one session).  Returns one row per
    (user, session) with event count and span."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user event count + value total kept in the state store (the
    engine's escape hatch for operators watermark windows can't express
    — SURVEY §2-H beyond-reference tier).
    """

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ):
        n, total = state.get() if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval condition: right
    rows within ``[left.ts, left.ts + max_gap]`` for the same key.

    Both sides carry watermarks, so the join state (buffered unmatched
    rows) is bounded: a left row can be dropped once the right watermark
    passes ``left.ts + max_gap``, and vice versa — the textbook bounded
    stream-stream join. Callers rename ts columns apart first (streaming
    joins reject ambiguous names).

    ``how='left_outer'`` emits unmatched left rows with nulls — but only
    once the watermark has passed the row's whole join window: an
    unmatched left row surfaces iff ``l_ts + max_gap <
    min(max(l_ts), max(r_ts)) - watermark_delay`` at query end, so rows
    near the stream tail stay buffered in state rather than emitting
    (verified empirically at two SFs; the catalog oracle encodes exactly
    this cutoff). That tail retention is the semantics any engine with
    watermark-bounded outer joins has — flushing them would be wrong the
    moment more data arrives.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    return l.join(
        r,
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_gap}")),
        how,
    ).drop(r[key])


def dedup_within_watermark(
    stream: DataFrame, keys: list[str], ts: str = "ts", watermark: str = "30 days"
) -> DataFrame:
    """Streaming deduplication: first row per key wins; duplicate keys
    arriving within the watermark horizon are suppressed, and key state
    older than the watermark is evicted (so the state store holds one
    entry per key per horizon, not per all time — the unbounded-state
    fix ``dropDuplicates`` alone would hit on an infinite stream)."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def upsert_sink(
    stream: DataFrame,
    path: str,
    key: str,
    order_col: str | None = None,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """``foreachBatch`` upsert sink: each micro-batch is MERGEd into the
    parquet target (batch rows win on key collision, new keys insert).

    Within a batch the latest row per key wins (``order_col`` DESC, the
    CDC compaction rule), so replaying a batch is idempotent. The
    local-parquet swap (write new version, atomic directory rename)
    stands in for what a table format does transactionally — on a real
    lake the body of ``process`` is a Delta/Iceberg ``MERGE INTO``
    inside one commit, same logical plan, and the rename disappears.
    Started with ``availableNow``; caller awaits termination.
    """
    import os
    import shutil

    from pyspark.sql import Window

    from orx_surgical_spark.operators.relational import merge_upsert

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        latest = batch
        if order_col is not None:
            w = Window.partitionBy(key).orderBy(F.desc(order_col))
            latest = (
                batch.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
        if os.path.exists(path):
            merged = merge_upsert(spark.read.parquet(path), latest, key)
        else:
            merged = latest
        staged = f"{path}__stage_{batch_id}"
        # Swap order matters: the previous version is renamed ASIDE (not
        # deleted) before the staged version takes its place, so a crash
        # at any point leaves either the old or the new complete dataset
        # on disk — never neither. A failed staged write cleans up its
        # own directory instead of leaking __stage_* dirs; replays
        # (foreachBatch redelivery) overwrite them anyway.
        old = f"{path}__old_{batch_id}"
        try:
            merged.write.mode("overwrite").parquet(staged)
        except Exception:
            shutil.rmtree(staged, ignore_errors=True)
            raise
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(staged, path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{path}__checkpoint")
        .start()
    )


def run_available_now(
    df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion over the current backlog
    (``trigger(availableNow=True)``) into a memory sink and return the
    materialized result as a batch DataFrame."""
    sink = name or f"orx_stream_sink_{next(_SINK_IDS)}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(sink)


def chained_window_rollup(
    stream: DataFrame,
    fine: str = "5 minutes",
    coarse: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Chained streaming aggregation (multiple stateful operators in one
    query, Spark 3.4+): fine-grained windowed counts re-aggregated into
    coarse windows downstream, ``window_time()`` carrying event time
    between the two stateful stages. The pre-aggregation is the point:
    the second stage's state holds one row per (fine window, key), not
    per event — the streaming analogue of partial aggregation.

    Append-mode emission: a coarse window surfaces once the watermark
    passes its end, i.e. iff ``coarse_end <= max(ts) - delay`` at query
    end (the catalog oracle encodes that cutoff; the final open windows
    stay in state, exactly as they must on an unbounded stream).
    """
    f5 = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", fine).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        f5.groupBy(F.window(F.window_time("w"), coarse).alias("h"), "event_type")
        .agg(F.sum("n").alias("n_events"))
        .select(F.col("h.start").alias("window_start"), "event_type", "n_events")
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class UserStatsProcessor(StatefulProcessor):
    """Typed-state processor behind :func:`typed_state_user_stats`.

    Module-level (not a closure) so its pure logic — the running
    (n, total) ValueState, the per-type MapState tallies, and the
    deterministic top_type tie rule (max count, then lexicographically
    smallest type) — is drivable by unit tests with fake state handles
    (``tests/test_streaming.py``): the streaming ENGINE path for this
    API needs a protobuf runtime this container lacks (permanent env
    gate, COVERAGE.md), but the processor semantics stay executable
    coverage rather than coverage on paper.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")
        self._types = handle.getMapState(
            "types", "event_type STRING", "c BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, total = (
            self._agg.get() if self._agg.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for t, c in pdf["event_type"].value_counts().items():
                prev = self._types.getValue((t,))
                self._types.updateValue(
                    (t,), ((prev[0] if prev else 0) + int(c),)
                )
        self._agg.update((n, total))
        counts = {k[0]: self._types.getValue(k)[0] for k in self._types.keys()}
        top = min(counts, key=lambda t: (-counts[t], t))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "n_types": [len(counts)],
                "top_type": [top],
            }
        )

    def close(self) -> None:
        pass


def typed_state_user_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful-processing API (the successor to
    ``applyInPandasWithState``): explicit *typed state variables* on a
    ``StatefulProcessorHandle`` instead of one opaque tuple, plus
    timers and per-state TTL (neither needed here).

    Per-user running stats kept in two typed states:

    - a ``ValueState`` (n, total) — the running count / value sum;
    - a ``MapState`` event_type -> count — per-type tallies whose key
      cardinality the state store (RocksDB — required by this API and
      set by the catalog wrapper) handles natively, no packed blobs.

    Emits ``(user_id, n_events, total_value, n_types, top_type)`` per
    key per micro-batch; after an availableNow backlog the final rows
    equal the batch aggregate (the catalog oracle). ``top_type`` has a
    deterministic tie rule: max count, then lexicographically smallest
    type.
    """
    return stream.select("user_id", "event_type", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(),
        outputStructType=(
            "user_id bigint, n_events bigint, total_value double, "
            "n_types int, top_type string"
        ),
        outputMode="Update",
        timeMode="None",
    )


def with_rocksdb_state_store(spark: SparkSession):
    """Context manager: run a streaming query under the RocksDB state
    store provider (required by ``transformWithStateInPandas``),
    restoring the previous provider after. The conf is read at query
    START, so wrapping the ``start()`` call suffices."""
    import contextlib

    key = "spark.sql.streaming.stateStore.providerClass"

    @contextlib.contextmanager
    def cm():
        prev = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return cm()


def typed_state_available() -> bool:
    """True iff this environment can run ``transformWithStateInPandas``:
    the API's dedicated state-server worker imports ``google.protobuf``
    at startup (state (de)serialization), which not every deployment
    ships. Gate callers on this instead of crashing mid-query."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def static_enriched_counts(
    stream: DataFrame,
    dim: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-STATIC join + windowed aggregation — the standard
    enrich-then-aggregate serving shape: the event stream joins a
    static dimension table (broadcast: the dim is re-resolved per
    micro-batch with NO join state and no watermark on the static
    side — only the downstream window aggregation keeps state), then
    counts per (window, market segment).

    At scale the static side is a slowly-refreshed snapshot (dims
    change by CDC, not per-event); keeping it out of the state store
    is the entire point versus a stream-stream join.
    """
    enriched = stream.withWatermark("ts", watermark).join(
        F.broadcast(dim.select("c_custkey", "c_mktsegment")),
        stream["user_id"] == F.col("c_custkey"),
    )
    return (
        enriched.groupBy(F.window("ts", window).alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("c_mktsegment").alias("segment"),
            "n",
            "sum_value",
        )
    )
