"""Temporal-join catalog queries (beyond-reference tier): as-of join
and banded range join over the events table — both oracle-checked
(DuckDB has a native ASOF JOIN; the range predicate is plain SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators.temporal import asof_join, range_join_pairs
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table


@register(
    "asof_purchase_prior_click",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      -- one row per (user, ts): dedup makes the as-of match unambiguous
      SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, ROUND(c.click_value, 2) AS asof_click_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="AS-OF JOIN: each purchase gets the same user's latest prior "
        "click value. Implemented as tagged-union + one window pass "
        "(single shuffle on the key, no join operator) — the scalable "
        "as-of shape; oracle is DuckDB's native ASOF JOIN.",
    tags=("temporal", "asof"),
)
def asof_purchase_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_value"],
    )
    return out.select(
        "event_id", F.round("asof_click_value", 2).alias("asof_click_value")
    )


@register(
    "range_join_close_events",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, floor(epoch(ts)) AS s FROM events
    )
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           CAST(ABS(a.s - b.s) AS BIGINT) AS gap_seconds
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND ABS(a.s - b.s) <= 300
    """,
    doc="Banded range self-join: same-user event pairs within 5 minutes. "
        "Time is bucketed by the gap width and each row probes its own + "
        "next bucket via an equi-join, so the join never sees the cross "
        "product (the theta-join a naive range join would be).",
    tags=("temporal", "range"),
)
def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return range_join_pairs(
        ev, key="user_id", ts="ts", id_col="event_id", max_gap_seconds=300
    )


@register(
    "cogroup_asof_merge",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, ROUND(c.click_value, 2) AS asof_click_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="The SAME as-of semantics as asof_purchase_prior_click, executed "
        "through the cogrouped-pandas escape hatch: "
        "df.groupBy(key).cogroup(other.groupBy(key)).applyInPandas with "
        "pandas.merge_asof per user — the API tier for per-group logic "
        "built-in expressions can't express (and the proof the Arrow "
        "path reproduces the JVM result bit-for-bit, since both share "
        "one DuckDB ASOF oracle). Each side shuffles once on the key; "
        "groups stream through Arrow batches, never the driver.",
    tags=("temporal", "asof", "cogroup"),
)
def cogroup_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # The right ts is renamed apart: both sides deriving "ts" from the
    # same scan confuses cogroup's column resolution (the shared
    # attribute is pruned from the right frame), and pandas merge_asof
    # wants distinct names anyway.
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select("user_id", F.col("ts").alias("click_ts"), "click_value")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # A side with no rows for this key arrives as a 0-column frame.
        if left.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "asof_click_value": pd.Series(dtype="float64")}
            )
        left = left.sort_values("ts")
        if right.empty:
            out = left[["event_id"]].copy()
            out["asof_click_value"] = float("nan")
            return out
        right = right.sort_values("click_ts")
        merged = pd.merge_asof(
            left,
            right[["click_ts", "click_value"]],
            left_on="ts",
            right_on="click_ts",
            direction="backward",
        )
        return merged[["event_id", "click_value"]].rename(
            columns={"click_value": "asof_click_value"}
        )

    out = (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(merge, "event_id bigint, asof_click_value double")
    )
    return out.select(
        "event_id", F.round("asof_click_value", 2).alias("asof_click_value")
    )


@register(
    "grouped_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT user_id, MEDIAN(value) AS med FROM events GROUP BY user_id
    ), dev AS (
      SELECT e.user_id, e.value, ABS(e.value - m.med) AS d, m.med
      FROM events e JOIN med m ON m.user_id = e.user_id
    ), mad AS (
      SELECT user_id, MEDIAN(d) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(ANY_VALUE(d.med), 6) AS med,
           ROUND(ANY_VALUE(a.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.d > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad a ON a.user_id = d.user_id
    GROUP BY d.user_id
    """,
    doc="Grouped-map applyInPandas (the plain grouped pandas tier, "
        "complementing the stateful and cogrouped variants): per-user "
        "robust outlier stats — median, MAD, and the count of events "
        "beyond 3 MADs — computed with NumPy per group. Median/MAD need "
        "the group's full value set (not mergeable sketches), which is "
        "exactly when the Arrow grouped-map escape hatch earns its "
        "shuffle; each group streams through one Arrow batch.",
    tags=("pandas", "outliers"),
)
def grouped_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        med = float(np.median(v))
        d = np.abs(v - med)
        mad = float(np.median(d))
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(v)],
                "med": [round(med, 6)],
                "mad": [round(mad, 6)],
                "n_outliers": [int((d > 3 * mad).sum())],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        stats,
        "user_id bigint, n_events bigint, med double, mad double, n_outliers bigint",
    )


@register(
    "user_active_intervals",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 300000 AS e
      FROM events
    ), m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pme
      FROM iv
    ), g AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS grp
      FROM m
    ), per AS (
      SELECT user_id, grp, MIN(s) AS ps, MAX(e) AS pe
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_periods,
           CAST(SUM(pe - ps) AS BIGINT) AS active_ms
    FROM per GROUP BY user_id
    """,
    doc="Interval-union active-time accounting: each event opens a "
        "5-minute activity interval; merge_intervals unions the "
        "overlaps per user into maximal disjoint periods, then one "
        "aggregate reports period count and total covered "
        "milliseconds. The extent-based complement of gap "
        "sessionization (sessionize_events counts 30-min inter-event "
        "gaps; this measures actual covered time, the uptime/"
        "coverage-gap primitive). One shuffle: both windows and the "
        "closing aggregate share the user_id partitioning.",
    tags=("temporal", "intervals"),
)
def user_active_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.temporal import merge_intervals

    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    iv = ev.select(
        "user_id", ms.alias("s"), (ms + F.lit(300000)).alias("e")
    )
    periods = merge_intervals(iv, "user_id", "s", "e")
    return periods.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.sum(F.col("period_end") - F.col("period_start")).alias(
            "active_ms"
        ),
    )
