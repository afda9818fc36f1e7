"""Time-series and attribution analytics: linear gap interpolation,
last-touch attribution, and ordered multi-step funnels. The shapes
behind metric dashboards and marketing/behavior analytics, each one
window pass or min-chain aggregate — no self-join explosions — and
each DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table


@register(
    "interpolate_daily_value",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS lo,
             CAST(MAX(CAST(ts AS DATE)) AS DATE) AS hi
      FROM events
    ), spine AS (
      SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ), types AS (SELECT DISTINCT event_type FROM events),
    daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type, AVG(value) AS v
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT s.d, ty.event_type, da.v,
             CAST(DATEDIFF('day', DATE '1970-01-01', s.d) AS BIGINT) AS ed
      FROM spine s CROSS JOIN types ty
      LEFT JOIN daily da ON da.d = s.d AND da.event_type = ty.event_type
    ), filled AS (
      SELECT d, event_type, v, ed,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN ed END IGNORE NULLS)
               OVER wp AS prev_ed,
             LAST_VALUE(v IGNORE NULLS) OVER wp AS prev_v,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN ed END IGNORE NULLS)
               OVER wn AS next_ed,
             FIRST_VALUE(v IGNORE NULLS) OVER wn AS next_v
      FROM grid
      WINDOW wp AS (PARTITION BY event_type ORDER BY ed
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY ed
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS d, event_type,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v) * (ed - prev_ed)
                        / (next_ed - prev_ed)
             ELSE COALESCE(prev_v, next_v)
           END, 6) AS v_interp,
           CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS was_missing
    FROM filled
    """,
    doc="Linear interpolation of missing days in a per-type daily mean "
        "series: date-spine gap fill, then one forward window (last "
        "observed value/day) + one backward window (next observed) per "
        "type, and the linear blend as a projection. Two window passes "
        "over the spine — never a per-gap self-join; edges extend the "
        "nearest observation. The spine is days x types (tiny at any "
        "fact scale); the only fact-table shuffle is the daily "
        "aggregate.",
    tags=("timeseries", "interpolation"),
)
def interpolate_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "event_type", "value"
    )
    bounds = ev.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    types = ev.select("event_type").distinct()
    daily = ev.groupBy("d", "event_type").agg(F.avg("value").alias("v"))
    grid = (
        spine.crossJoin(types)
        .join(daily, ["d", "event_type"], "left")
        .withColumn("ed", F.datediff("d", F.lit("1970-01-01")).cast("bigint"))
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("ed")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("ed")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_ed = F.when(F.col("v").isNotNull(), F.col("ed"))
    filled = grid.select(
        "d",
        "event_type",
        "v",
        "ed",
        F.last(obs_ed, ignorenulls=True).over(wp).alias("prev_ed"),
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.first(obs_ed, ignorenulls=True).over(wn).alias("next_ed"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("ed") - F.col("prev_ed"))
            / (F.col("next_ed") - F.col("prev_ed")),
        )
        .otherwise(F.coalesce("prev_v", "next_v"))
    )
    return filled.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "event_type",
        F.round(interp, 6).alias("v_interp"),
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("bigint").alias(
            "was_missing"
        ),
    )


@register(
    "last_touch_attribution",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ), attributed AS (
      SELECT p.event_id, t.event_type AS touch_type
      FROM purchases p
      LEFT JOIN LATERAL (
        SELECT e.event_type
        FROM events e
        WHERE e.user_id = p.user_id
          AND e.event_type <> 'purchase'
          AND e.ts < p.ts
          AND e.ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY e.ts DESC, e.event_id DESC
        LIMIT 1
      ) t ON TRUE
    )
    SELECT COALESCE(touch_type, 'none') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM attributed GROUP BY 1
    """,
    doc="Last-touch attribution: each purchase credited to the most "
        "recent non-purchase event by the same user within the prior "
        "hour. Implemented as a tagged union + one window (the as-of "
        "join shape, operators/temporal.py): purchases and touches "
        "interleave in one per-user ts sort, each purchase reads the "
        "running last touch — one shuffle, no lateral re-scan per "
        "purchase (the oracle's LATERAL is the semantic spec, not the "
        "distributed plan).",
    tags=("timeseries", "attribution"),
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", None)
        .otherwise(F.col("event_type"))
        .alias("touch_type"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_struct = F.when(
        F.col("touch_type").isNotNull(),
        F.struct("ts", "event_id", "touch_type"),
    )
    attributed = (
        tagged.withColumn("last_touch", F.last(touch_struct, ignorenulls=True).over(w))
        .where(F.col("is_purchase"))
        .select(
            "event_id",
            F.when(
                F.col("last_touch").isNotNull()
                & (
                    F.col("last_touch.ts")
                    >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
                ),
                F.col("last_touch.touch_type"),
            )
            .otherwise(F.lit("none"))
            .alias("touch_type"),
        )
    )
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )


@register(
    "ordered_funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT v.user_id, MIN(e.ts) AS t
          FROM v JOIN events e
            ON e.user_id = v.user_id AND e.event_type = 'click' AND e.ts > v.t
          GROUP BY v.user_id),
    p AS (SELECT c.user_id, MIN(e.ts) AS t
          FROM c JOIN events e
            ON e.user_id = c.user_id AND e.event_type = 'purchase'
           AND e.ts > c.t
          GROUP BY c.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
    """,
    doc="Ordered three-step funnel (view -> click -> purchase, strictly "
        "increasing timestamps): each stage is first-view, then "
        "first-click-after-view, then first-purchase-after-that-click — "
        "min-chain aggregates, all keyed on user_id so the three "
        "shuffles share one partitioning (vs the sequence-pattern "
        "self-join that explodes on active users).",
    tags=("timeseries", "funnel"),
)
def ordered_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str) -> DataFrame:
        return (
            prev.join(ev, "user_id")
            .where((F.col("event_type") == etype) & (F.col("ts") > F.col("t")))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t2"))
            .select("user_id", F.col("t2").alias("t"))
        )

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    c = first_after(v, "click")
    p = first_after(c, "purchase")
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )
