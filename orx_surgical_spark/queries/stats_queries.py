"""Statistics / compaction utility queries: mode, ordered string
aggregation, CDC latest-row compaction, per-group z-score
normalization, and histogram binning. Small, everyday shapes a
warehouse user expects an engine to have — each a single-pass
aggregate or one window, each DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table


@register(
    "mode_priority_by_status",
    oracle="""
    SELECT o_orderstatus,
           MIN(o_orderpriority) FILTER (WHERE r = 1) AS mode_priority,
           CAST(MAX(n) AS BIGINT) AS mode_count
    FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             RANK() OVER (PARTITION BY o_orderstatus
                          ORDER BY COUNT(*) DESC, o_orderpriority) AS r
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) GROUP BY o_orderstatus
    """,
    doc="Per-group mode (most frequent order priority per status) via "
        "count + rank — the tie rule (smallest value wins) is explicit, "
        "unlike bare mode() whose tie choice is engine-defined. Two "
        "hash aggregates on nested keys; the window runs on the tiny "
        "(status, priority) aggregate, never the fact table.",
    tags=("stats", "mode"),
)
def mode_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    ranked = counts.withColumn("r", F.rank().over(w))
    return ranked.groupBy("o_orderstatus").agg(
        F.min(F.when(F.col("r") == 1, F.col("o_orderpriority"))).alias(
            "mode_priority"
        ),
        F.max("n").alias("mode_count"),
    )


@register(
    "nations_per_region_agg",
    oracle="""
    SELECT r.r_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Ordered string aggregation (LISTAGG): comma-joined nation names "
        "per region. Spark expresses the deterministic ordering as "
        "array_sort(collect_list) + array_join — collect_list alone is "
        "partition-order-dependent, the classic distributed-listagg "
        "trap.",
    tags=("stats", "string-agg"),
)
def nations_per_region_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, ROUND(value, 4) AS value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="CDC log compaction: the latest row per key (row_number over ts "
        "DESC, event_id tiebreak) — the upsert-materialization pattern "
        "every change-capture pipeline runs. One shuffle on the key; "
        "Spark plans the rn=1 filter as WindowGroupLimit, keeping only "
        "each partition's current winner instead of sorting whole "
        "partitions.",
    tags=("window", "cdc"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 4).alias("value"))
    )


@register(
    "zscore_order_value",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / STDDEV_SAMP(o_totalprice) OVER w, 6) AS price_z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus)
    """,
    doc="Per-group z-score normalization (feature-engineering "
        "primitive): each order's price standardized against its status "
        "group's mean/stddev via an unframed window — one shuffle, no "
        "self-join back, both moments computed in the same Window "
        "operator pass.",
    tags=("stats", "normalize"),
)
def zscore_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus")
    z = (F.col("o_totalprice") - F.avg("o_totalprice").over(w)) / F.stddev_samp(
        "o_totalprice"
    ).over(w)
    return orders.select(
        "o_orderkey", "o_orderstatus", F.round(z, 6).alias("price_z")
    )


@register(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, bucket
    """,
    doc="Fixed-width histogram binning (floor arithmetic, width 25) of "
        "event values per type — the distribution-profiling primitive "
        "behind G11-style EDA reports, one map-side bucket expression + "
        "one hash aggregate; no per-bucket scans, no driver binning.",
    tags=("stats", "histogram"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / 25.0).cast("bigint").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "dq_orders_report",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS o_orderkey_null_violations,
           CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
             AS o_orderkey_dup_violations,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                           OR o_orderstatus IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS o_orderstatus_outside_set_violations,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS o_totalprice_out_of_range_violations,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
             AS o_custkey_orphans_violations
    FROM orders
    """,
    doc="Declarative data-quality gate (functions/quality.py, "
        "'Deequ-lite'): not-null, uniqueness, value-set, range, and "
        "referential-integrity rules over orders compiled into ONE "
        "aggregate pass plus one broadcast anti-join for the foreign "
        "key — a constant number of scans however many rules run, the "
        "property that lets a 100 TB pipeline run its checks every "
        "load.",
    tags=("quality", "constraints"),
)
def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.functions import quality as Q

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return Q.check_constraints(
        orders,
        Q.not_null("o_orderkey"),
        Q.unique("o_orderkey"),
        Q.in_set("o_orderstatus", ["O", "F", "P"]),
        Q.in_range("o_totalprice", lo=0.0),
        Q.foreign_key("o_custkey", customer, "c_custkey"),
    )
