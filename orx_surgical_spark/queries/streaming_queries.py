"""Streaming catalog queries (beyond-reference tier, SURVEY §2-H).

Each runs a real Structured Streaming query over the events parquet in
``availableNow`` mode (full backlog as a bounded stream, then stop), so
the result is deterministic and — because stream semantics must equal
batch semantics on the same data — DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from orx_surgical_spark import streaming as S
from orx_surgical_spark.queries.catalog import register


@register(
    "stream_windowed_counts",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
    doc="Watermarked 5-minute tumbling-window aggregation run as a "
        "bounded stream (availableNow) — stream result must equal the "
        "batch time-bucket aggregation.",
    tags=("streaming", "window"),
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = S.read_events_stream(spark, sf_dir)
    return S.run_available_now(S.windowed_counts(stream, "5 minutes"))


@register(
    "stream_session_counts",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), g AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
    FROM o
    ), sess AS (
      SELECT user_id, sid, COUNT(*) AS n FROM g GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(MAX(n) AS BIGINT) AS max_session_events
    FROM sess GROUP BY user_id
    """,
    doc="Gap-based session windows per user (session_window, 30-minute "
        "gap) as a bounded stream, rolled up to per-user session stats; "
        "oracle is the lag/cumulative-sum sessionization — session "
        "identity must match exactly for the counts to agree. (Session "
        "boundary timestamps are excluded: streaming-mode session_window "
        "shifts them +1us vs batch, a state-store implementation detail.)",
    tags=("streaming", "session"),
)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    stream = S.read_events_stream(spark, sf_dir)
    sessions = S.session_counts(stream, "30 minutes")
    per_session = S.run_available_now(sessions)
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState): "
        "running per-user totals in the state store; after the "
        "availableNow backlog the state equals the batch aggregate.",
    tags=("streaming", "stateful"),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = S.read_events_stream(spark, sf_dir)
    return S.run_available_now(
        S.stateful_user_totals(stream), output_mode="update"
    )


@register(
    "stream_interval_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(FLOOR((EPOCH(p.ts) - EPOCH(c.ts)) / 60) AS BIGINT)
             AS gap_minutes
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    doc="Stream-stream interval join (streaming.ops.interval_join): "
        "purchases within one hour after a click by the same user, both "
        "sides watermarked so join state is bounded by the event-time "
        "horizon, run availableNow — the result must equal the batch "
        "interval join.",
    tags=("streaming", "join"),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    stream = S.read_events_stream(spark, sf_dir)
    clicks = stream.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("l_ts")
    )
    purchases = stream.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("r_ts")
    )
    joined = S.interval_join(clicks, purchases, max_gap="1 hour")
    out = joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.floor(
            (F.unix_micros("r_ts") - F.unix_micros("l_ts")) / F.lit(60_000_000)
        ).alias("gap_minutes"),
    )
    return S.run_available_now(out, output_mode="append")


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="Streaming deduplication with bounded state "
        "(dropDuplicatesWithinWatermark): first (user, type) occurrence "
        "wins, key state evicted past the watermark horizon; over the "
        "availableNow backlog with a horizon wider than the data span "
        "this equals batch DISTINCT.",
    tags=("streaming", "dedup"),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = S.read_events_stream(spark, sf_dir)
    deduped = S.dedup_within_watermark(stream, ["user_id", "event_type"])
    return S.run_available_now(
        deduped.select("user_id", "event_type"), output_mode="append"
    )


@register(
    "stream_left_outer_join",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS l_ts
      FROM events WHERE event_type = 'click'
    ), pu AS (
      SELECT user_id AS r_user, event_id AS purchase_id, ts AS r_ts
      FROM events WHERE event_type = 'purchase'
    ), wm AS (
      SELECT least((SELECT MAX(l_ts) FROM c), (SELECT MAX(r_ts) FROM pu))
               - INTERVAL 2 HOUR AS w
    ), j AS (
      SELECT cl.user_id, cl.click_id, p.purchase_id, cl.l_ts,
             CAST(FLOOR((EPOCH(p.r_ts) - EPOCH(cl.l_ts)) / 60) AS BIGINT)
               AS gap_minutes
      FROM c cl LEFT JOIN pu p ON p.r_user = cl.user_id
        AND p.r_ts >= cl.l_ts AND p.r_ts <= cl.l_ts + INTERVAL 1 HOUR
    )
    SELECT user_id, click_id, purchase_id, gap_minutes
    FROM j, wm
    WHERE purchase_id IS NOT NULL OR l_ts + INTERVAL 1 HOUR < wm.w
    """,
    doc="Stream-stream LEFT OUTER interval join "
        "(streaming.ops.interval_join how='left_outer'): clicks with "
        "their within-the-hour purchase, or nulls once the watermark "
        "passes the click's whole join window. The oracle replicates "
        "the watermark-eviction cutoff exactly — an unmatched click "
        "emits iff l_ts + 1h < min(max click ts, max purchase ts) - 2h "
        "(the final global watermark) — so the driver hash-checks the "
        "outer-emission semantics, including the deliberately-buffered "
        "stream tail, not just the inner matches.",
    tags=("streaming", "outer-join"),
)
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    stream = S.read_events_stream(spark, sf_dir)
    clicks = stream.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("l_ts")
    )
    purchases = stream.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("r_ts"),
    )
    joined = S.interval_join(
        clicks, purchases, max_gap="1 hour", how="left_outer"
    )
    out = joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.floor(
            (F.unix_micros("r_ts") - F.unix_micros("l_ts")) / F.lit(60_000_000)
        ).alias("gap_minutes"),
    )
    return S.run_available_now(out, output_mode="append")


@register(
    "stream_chained_agg",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events
    FROM hourly
    WHERE h + INTERVAL 1 HOUR <= (SELECT MAX(ts) - INTERVAL 10 MINUTE
                                  FROM events)
    """,
    doc="Chained streaming aggregation "
        "(streaming.ops.chained_window_rollup): 5-minute windowed "
        "counts re-aggregated into hourly rollups — two stateful "
        "operators in one query (Spark 3.4+), window_time() carrying "
        "event time between them, the second stage's state keyed per "
        "fine window not per event. The oracle replays the append-mode "
        "watermark cutoff (hour_end <= max(ts) - 10min), so the "
        "emission semantics incl. the still-open tail windows are "
        "hash-checked.",
    tags=("streaming", "chained-agg"),
)
def stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    stream = S.read_events_stream(spark, sf_dir)
    rolled = S.chained_window_rollup(stream)
    out = S.run_available_now(rolled, output_mode="append")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
    )


@register(
    "stream_static_enrich",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '5 minutes', e.ts) AS TIMESTAMP)
             AS window_start,
           c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(e.value), 4) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY window_start, segment
    """,
    doc="Stream-static enrichment (streaming.ops.static_enriched_"
        "counts): the event stream broadcast-joins the STATIC customer "
        "dimension (no join state — only the window aggregation is "
        "stateful), then 5-minute tumbling counts per market segment; "
        "availableNow result must equal the batch join + time-bucket "
        "aggregation.",
    tags=("streaming", "join", "static"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.sources import load_table

    stream = S.read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer")
    return S.run_available_now(S.static_enriched_counts(stream, dim))
