"""Relational catalog queries (SURVEY §2 A/B/C/D/E5/G) over the
driver's TPC-H-ish tables.

Each query composes the engine's operator library
(:mod:`orx_surgical_spark.operators.relational`,
:mod:`orx_surgical_spark.functions.metrics`) and declares a DuckDB
oracle. Aliases and rounding match on both sides (catalog contract —
see :mod:`orx_surgical_spark.queries.catalog`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orx_surgical_spark.functions import metrics
from orx_surgical_spark.operators import relational as R
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table


# ---------------------------------------------------------------------------
# Flagship: pricing summary (scan -> filter -> hash aggregate; TPC-H Q1
# shape). Covers A1 scan+projection, B5 range predicate, D1-style aggs.
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                           AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                           AS avg_price,
           ROUND(AVG(l_discount), 6)                                AS avg_disc,
           CAST(COUNT(*) AS BIGINT)                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship pricing summary: filter -> groupBy -> 8 aggregates "
        "(one scan, map-side partial aggregation; whole-stage codegen).",
    bench=True,
    tags=("A1", "B5", "D1"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B2/B3/B12: null-on-error cast + regex extract + null drop.
# ---------------------------------------------------------------------------

@register(
    "cast_null_drop",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k_num,
             TRY_CAST(event_type AS BIGINT)                  AS bad_cast
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)       AS n,
           CAST(SUM(k_num) AS BIGINT)     AS sum_k,
           CAST(COUNT(bad_cast) AS BIGINT) AS n_numeric_type
    FROM e
    WHERE k_num IS NOT NULL
    GROUP BY event_type
    """,
    doc="Cast-with-null-on-error (pd.to_numeric errors='coerce' parity, "
        "SURVEY B2) + regex extract (B12) + na.drop (B3).",
    tags=("B2", "B3", "B12"),
)
def cast_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("k_num", F.regexp_extract("props", "[0-9]+", 0).cast("bigint"))
    # Invalid cast -> null (engine runs non-ANSI; reference cms_preprocess.py:72)
    ev = ev.withColumn("bad_cast", F.col("event_type").cast("bigint"))
    ev = R.drop_null(ev, ["k_num"])
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k_num").alias("sum_k"),
        F.count("bad_cast").alias("n_numeric_type"),
    )


# ---------------------------------------------------------------------------
# B4/B8/B16 + C1: date derives over a fact-dim join.
# ---------------------------------------------------------------------------

@register(
    "date_derive",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           ROUND(AVG(date_diff('day', o_orderdate, l_shipdate) / 365.0), 6)
               AS avg_ship_lag_years,
           ROUND(AVG(dayofyear(l_shipdate)), 6) AS avg_ship_doy,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_year
    """,
    doc="Year extract (B4), date-diff age in 365-day years (B8), "
        "day-of-year (B16) over an inner fact join (C1).",
    tags=("B4", "B8", "B16", "C1"),
)
def date_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
    return (
        R.with_year(joined, "o_orderdate", "o_year")
        .groupBy("o_year")
        .agg(
            F.round(F.avg(R.age_years("l_shipdate", "o_orderdate")), 6).alias(
                "avg_ship_lag_years"
            ),
            F.round(F.avg(F.dayofyear("l_shipdate")), 6).alias("avg_ship_doy"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# B5/B6/B7: range + equality + negated conjunction of IN-lists.
# ---------------------------------------------------------------------------

@register(
    "filter_in_range",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(year(o_orderdate) AS INTEGER) AS o_year
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1996 AND 2000
      AND o_orderstatus = 'F'
      AND NOT (year(o_orderdate) IN (1996, 1997)
               AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
    """,
    doc="Range predicate (B5), equality (B6), negated conjunction of "
        "IN-lists — the reference's surgery-exclusion shape (B7, "
        "cms_preprocess.py:89).",
    tags=("B5", "B6", "B7"),
)
def filter_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = R.with_year(load_table(spark, sf_dir, "orders"), "o_orderdate", "o_year")
    out = R.filter_year_range(orders, "o_year", 1996, 2000)
    out = out.filter(F.col("o_orderstatus") == "F")
    out = R.exclude_early_events(
        out, "o_year", [1996, 1997], "o_orderpriority", ["1-URGENT", "2-HIGH"]
    )
    return out.select("o_orderkey", "o_custkey", "o_totalprice", "o_year")


# ---------------------------------------------------------------------------
# B10-B13: string cleanup pipeline.
# ---------------------------------------------------------------------------

@register(
    "string_clean",
    oracle="""
    WITH p AS (
      SELECT trim(split_part(regexp_replace('''' || p_name || '''', '^''|''$', '', 'g'), '.', 1))
                 AS clean_name,
             CAST(split_part(p_brand, '#', 2) AS INTEGER) AS brand_num,
             CASE WHEN regexp_matches(p_type, '^\\s*$') THEN 'None' ELSE p_type END
                 AS type_or_sentinel
      FROM part
    )
    SELECT clean_name, type_or_sentinel,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(brand_num) AS INTEGER) AS max_brand_num
    FROM p
    GROUP BY clean_name, type_or_sentinel
    """,
    doc="ICD-9-style code cleanup: strip-quote + truncate-at-dot (B10), "
        "rename (B11), blank->sentinel (B12), trim (B13) — reference "
        "cms_preprocess.py:118-130.",
    tags=("B10", "B11", "B12", "B13"),
)
def string_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    quoted = F.concat(F.lit("'"), F.col("p_name"), F.lit("'"))
    part = part.select(
        R.clean_code(quoted).alias("clean_name"),
        F.substring_index("p_brand", "#", -1).cast("int").alias("brand_num"),
        R.blank_to_sentinel("p_type").alias("type_or_sentinel"),
    )
    return part.groupBy("clean_name", "type_or_sentinel").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("brand_num").alias("max_brand_num"),
    )


# ---------------------------------------------------------------------------
# C1: broadcast dim-fact join.
# ---------------------------------------------------------------------------

@register(
    "join_customer_orders",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT)       AS n_orders,
           ROUND(SUM(o_totalprice), 2)    AS revenue,
           ROUND(AVG(o_totalprice), 6)    AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Inner equi-join fact x broadcast dim (C1; reference merge(ben, ip) "
        "cms_preprocess.py:69), then hash aggregate.",
    bench=True,
    tags=("C1", "D1"),
)
def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = R.dim_fact_join(
        orders, customer, on=orders.o_custkey == customer.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# C2: chained 3-way join.
# ---------------------------------------------------------------------------

@register(
    "join_3way_region",
    oracle="""
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT)    AS n_customers,
           ROUND(AVG(c_acctbal), 6)    AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="3-way chained inner join (C2; reference's dead-code "
        "ben-pde-ip chain, modelling CNN.ipynb cell 3).",
    tags=("C2",),
)
def join_3way_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
    )


# ---------------------------------------------------------------------------
# C3/B14: lookup join with default for misses.
# ---------------------------------------------------------------------------

@register(
    "lookup_join_default",
    oracle="""
    WITH mapping AS (
      SELECT p_partkey, p_size FROM part WHERE p_size >= 25
    )
    SELECT COALESCE(p_size, 0) AS mapped_size,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem LEFT JOIN mapping ON l_partkey = p_partkey
    GROUP BY mapped_size
    """,
    doc="Dict-probe-with-default as broadcast left join + coalesce "
        "(C3/B14; reference d.get(x, 0), cms_preprocess.py:192,195).",
    tags=("C3", "B14"),
)
def lookup_join_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    mapping = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    out = R.lookup_join_default(
        li, mapping, key="l_partkey", map_key="p_partkey", map_value="p_size",
        out="mapped_size", default=0,
    )
    return out.groupBy("mapped_size").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# D2 + C4: full-period-coverage group filter via left-semi join.
# ---------------------------------------------------------------------------

@register(
    "semi_join_full_years",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_custkey IN (
      SELECT o_custkey FROM orders
      WHERE year(o_orderdate) BETWEEN 1996 AND 1998
      GROUP BY o_custkey
      HAVING COUNT(DISTINCT year(o_orderdate)) = 3
    )
    GROUP BY o_orderstatus
    """,
    doc="Full-enrollment filter: keys with rows in EVERY period of the "
        "window, applied as a left-semi join (D2+C4; reference "
        "set(x) >= {2008..2010}, cms_preprocess.py:92-93).",
    bench=True,
    tags=("D2", "C4"),
)
def semi_join_full_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = R.with_year(load_table(spark, sf_dir, "orders"), "o_orderdate", "o_year")
    kept = R.full_enrollment_filter(orders, "o_custkey", "o_year", [1996, 1997, 1998])
    return kept.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# D1: group-by MAX over many columns.
# ---------------------------------------------------------------------------

@register(
    "group_max_wide",
    oracle="""
    SELECT l_orderkey,
           MAX(l_quantity)      AS l_quantity,
           MAX(l_extendedprice) AS l_extendedprice,
           MAX(l_discount)      AS l_discount
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="Group-by MAX over several columns (D1; reference patient-year "
        "occurrence collapse, cms_preprocess.py:286).",
    tags=("D1",),
)
def group_max_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return R.group_max(
        li, ["l_orderkey"], ["l_quantity", "l_extendedprice", "l_discount"]
    )


# ---------------------------------------------------------------------------
# D3: distinct values.
# ---------------------------------------------------------------------------

@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    doc="Distinct vocabulary scan (D3; reference df['CCS'].unique(), "
        "cms_preprocess.py:159,167).",
    tags=("D3",),
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.distinct_values(load_table(spark, sf_dir, "customer"), "c_mktsegment")


# ---------------------------------------------------------------------------
# E5: sort + limit (top-k) with deterministic tiebreak.
# ---------------------------------------------------------------------------

@register(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Sort+limit rebalance shape (E5; reference sort_values().iloc[:n], "
        "cms_preprocess.py:313-314). Runs as TakeOrderedAndProject: "
        "per-partition top-k, k-row merge — no full sort at scale.",
    tags=("E5",),
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return R.top_k(
        orders, "o_totalprice", 100, ascending=False, tiebreak=["o_orderkey"]
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# ---------------------------------------------------------------------------
# B15: binary label derivation + per-class aggregates.
# ---------------------------------------------------------------------------

@register(
    "label_binarize",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
               AS label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY label
    """,
    doc="Binary label from code membership (B15; reference DRG in "
        "{469,470}, cms_preprocess.py:202).",
    tags=("B15",),
)
def label_binarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    label = R.derive_binary_label("o_orderpriority", ["1-URGENT", "2-HIGH"])
    return orders.select(label, "o_totalprice").groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# E3 analog: pivot by year.
# ---------------------------------------------------------------------------

_PIVOT_YEARS = list(range(1995, 2002))


@register(
    "pivot_by_year",
    oracle="""
    SELECT c_mktsegment,
    """
    + ",\n".join(
        f"       ROUND(SUM(CASE WHEN year(o_orderdate) = {y} THEN o_totalprice END), 2) AS y{y}"
        for y in _PIVOT_YEARS
    )
    + """
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Explicit pivot on year — the well-defined replacement for the "
        "reference's positional group-of-3 flatten (E3, "
        "cms_preprocess.py:267-297; SURVEY §7 hard part 1).",
    tags=("E3", "D1"),
)
def pivot_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = R.dim_fact_join(orders, customer, on=orders.o_custkey == customer.c_custkey)
    pivoted = (
        R.with_year(joined, "o_orderdate", "o_year")
        .groupBy("c_mktsegment")
        .pivot("o_year", _PIVOT_YEARS)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    renames = [F.col("c_mktsegment")] + [
        F.col(str(y)).alias(f"y{y}") for y in _PIVOT_YEARS
    ]
    return pivoted.select(*renames)


# ---------------------------------------------------------------------------
# E1 analog: multi-hot occurrence flags per key.
# ---------------------------------------------------------------------------

_PRIORITIES = [
    ("has_urgent", "1-URGENT"),
    ("has_high", "2-HIGH"),
    ("has_medium", "3-MEDIUM"),
    ("has_notspec", "4-NOT SPECIFIED"),
    ("has_low", "5-LOW"),
]


@register(
    "occurrence_flags",
    oracle="""
    SELECT o_custkey,
    """
    + ",\n".join(
        f"       CAST(MAX(CASE WHEN o_orderpriority = '{v}' THEN 1 ELSE 0 END) AS INTEGER) AS {n}"
        for n, v in _PRIORITIES
    )
    + """
    FROM orders
    GROUP BY o_custkey
    """,
    doc="Multi-hot occurrence vector as named columns (E1 parity shape; "
        "reference binarize_categorical_columns, cms_preprocess.py:209-236).",
    tags=("E1", "D1"),
)
def occurrence_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [
        F.max(F.when(F.col("o_orderpriority") == v, 1).otherwise(0)).alias(n)
        for n, v in _PRIORITIES
    ]
    return orders.groupBy("o_custkey").agg(*aggs)


# ---------------------------------------------------------------------------
# G1: threshold sweep; G2/G3: binarize + confusion matrix.
# ---------------------------------------------------------------------------

@register(
    "threshold_sweep",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
             value / 500.0 AS score
      FROM events
    ), th AS (
      SELECT i * (1.0 / 20) AS threshold FROM range(20) t(i)
    ), agg AS (
      SELECT threshold,
             CAST(SUM(CASE WHEN label = 1 AND score > threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN label = 0 AND score > threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN label = 1 AND score <= threshold THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN label = 0 AND score <= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored CROSS JOIN th
      GROUP BY threshold
    )
    SELECT ROUND(threshold, 6) AS threshold, tp, fp, fn, tn,
           ROUND(CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END, 6) AS precision,
           ROUND(CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END, 6) AS recall,
           ROUND(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                      ELSE 2 * tp / (2 * tp + fp + fn) END, 6) AS f1
    FROM agg
    """,
    doc="Threshold sweep as one conditional-aggregation pass (G1; "
        "reference arange(0,1,0.01) + f1_score loop, cnn_model.ipynb "
        "cell 4). Thresholds broadcast; scored side never shuffles.",
    bench=True,
    tags=("G1",),
)
def threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        (F.col("value") / 500.0).alias("score"),
    )
    return metrics.threshold_sweep(scored, "score", "label", n_thresholds=20)


@register(
    "confusion_matrix",
    oracle="""
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
           CASE WHEN value / 500.0 > 0.3 THEN 1 ELSE 0 END AS prediction,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY label, prediction
    """,
    doc="Binarize-at-threshold (G2) + confusion matrix as grouped count "
        "(G3; reference confusion_matrix(y, preds)).",
    tags=("G2", "G3"),
)
def confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        metrics.binarize(F.col("value") / 500.0, 0.3).alias("prediction"),
    )
    return metrics.confusion_matrix(scored, "label", "prediction")


# ---------------------------------------------------------------------------
# Window: top-k per group (beyond-reference OLAP staple).
# ---------------------------------------------------------------------------

@register(
    "window_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    doc="Top-3 orders per customer via row_number window — one shuffle "
        "on the group key (beyond-reference OLAP tier).",
    tags=("window",),
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return R.top_k_per_group(
        orders, ["o_custkey"], "o_totalprice", 3, tiebreak=["o_orderkey"]
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


# ---------------------------------------------------------------------------
# Sessionization: gap-based sessions via lag window (beyond-reference).
# ---------------------------------------------------------------------------

@register(
    "sessionize_events",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ms FROM events
    ), flagged AS (
      SELECT user_id,
             CASE WHEN LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
                    OR ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
    doc="Gap-based sessionization (30 min) via lag window + cumulative "
        "flag — batch analog of the streaming session_window operator.",
    bench=True,
    tags=("window", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ms)
    lag_ms = F.lag(ms).over(w)
    flagged = ev.select(
        "user_id",
        F.when(lag_ms.isNull() | ((ms - lag_ms) > 1800000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# G6: ROC curve points from the distributed sweep.
# ---------------------------------------------------------------------------

@register(
    "roc_points",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
             value / 500.0 AS score
      FROM events
    ), th AS (
      SELECT i * (1.0 / 20) AS threshold FROM range(20) t(i)
    ), agg AS (
      SELECT threshold,
             CAST(SUM(CASE WHEN label = 1 AND score > threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN label = 0 AND score > threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN label = 1 AND score <= threshold THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN label = 0 AND score <= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored CROSS JOIN th
      GROUP BY threshold
    )
    SELECT ROUND(threshold, 6) AS threshold,
           ROUND(CASE WHEN fp + tn = 0 THEN 0.0 ELSE fp / (fp + tn) END, 6) AS fpr,
           ROUND(CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END, 6) AS tpr
    FROM agg
    """,
    doc="ROC curve points via the threshold-sweep aggregation (G6; "
        "reference roc_curve + trapezoid auc).",
    tags=("G4", "G6"),
)
def roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        (F.col("value") / 500.0).alias("score"),
    )
    return metrics.roc_points(scored, "score", "label", n_thresholds=20)


# ---------------------------------------------------------------------------
# G5: PR curve points from the same distributed sweep.
# ---------------------------------------------------------------------------

@register(
    "pr_points",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
             value / 500.0 AS score
      FROM events
    ), th AS (
      SELECT i * (1.0 / 20) AS threshold FROM range(20) t(i)
    ), agg AS (
      SELECT threshold,
             SUM(CASE WHEN label = 1 AND score > threshold THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN label = 0 AND score > threshold THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN label = 1 AND score <= threshold THEN 1 ELSE 0 END) AS fn
      FROM scored CROSS JOIN th
      GROUP BY threshold
    )
    SELECT ROUND(threshold, 6) AS threshold,
           ROUND(CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END, 6) AS recall,
           ROUND(CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END, 6) AS precision
    FROM agg
    """,
    doc="PR curve points via the threshold-sweep aggregation (G5; "
        "reference precision_recall_curve + np.interp(0.9, ...) — the "
        "interpolation runs driver-side over this tiny result, "
        "functions.metrics.precision_at_recall).",
    tags=("G5",),
)
def pr_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        (F.col("value") / 500.0).alias("score"),
    )
    return metrics.pr_points(scored, "score", "label", n_thresholds=20)


# ---------------------------------------------------------------------------
# G11: per-column profile report (the dataprep EDA analogue).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@register(
    "profile_summary",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT({c}) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           ROUND(AVG({c}), 6) AS mean,
           ROUND(STDDEV_SAMP({c}), 6) AS stddev,
           MIN({c}) AS min_val,
           MAX({c}) AS max_val,
           ROUND(QUANTILE_CONT({c}, 0.5), 6) AS median
    FROM lineitem"""
        for c in _PROFILE_COLS
    ),
    doc="Per-column profile: count / nulls / mean / stddev / min / max / "
        "exact interpolated median (G11; reference dataprep create_report, "
        "dataprep_report.py:16-27).",
    tags=("G11",),
)
def profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Single aggregate pass for all columns (r5; the previous
    # union-of-per-column-aggs scanned lineitem once PER column), then
    # stack the one wide row to tall. Output identical to the oracle's
    # UNION ALL form.
    stats = ("n", "n_null", "mean", "stddev", "min_val", "max_val", "median")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).cast("double").alias(f"n__{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("double").alias(f"n_null__{c}"),
            F.round(F.avg(c), 6).alias(f"mean__{c}"),
            F.round(F.stddev_samp(c), 6).alias(f"stddev__{c}"),
            F.min(c).alias(f"min_val__{c}"),
            F.max(c).alias(f"max_val__{c}"),
            F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias(f"median__{c}"),
        ]
    stack = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{s}__{c}`" for s in stats)
        )
        for c in _PROFILE_COLS
    )
    tall = li.agg(*aggs).selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) "
        f"AS (column_name, {', '.join(stats)})"
    )
    return tall.select(
        "column_name",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        "mean", "stddev", "min_val", "max_val", "median",
    )


@register(
    "profile_correlations",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           ROUND(CORR({a}, {b}), 6) AS pearson_r
    FROM lineitem"""
        for i, a in enumerate(_PROFILE_COLS)
        for b in _PROFILE_COLS[i + 1:]
    ),
    doc="G11 bivariate profile section: pairwise Pearson correlation "
        "over the profiled numeric columns (reference dataprep "
        "create_report's bivariate plots, dataprep_report.py:27) — all "
        "pairs in ONE aggregate pass (corr is map-side combinable), "
        "stacked to a tall (col_a, col_b, pearson_r) frame.",
    tags=("G11", "bivariate"),
)
def profile_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.functions.profile import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return correlation_matrix(li, _PROFILE_COLS)


# ---------------------------------------------------------------------------
# OLAP breadth the engine exposes beyond the reference: rollup subtotals,
# running windows, lag deltas, sketch aggregates (SURVEY §2-D note).
# ---------------------------------------------------------------------------

@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals via ROLLUP (flag -> flag+status -> grand "
        "total) — one pass, Spark expands grouping sets map-side.",
    tags=("D1", "rollup"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(revenue), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "running_order_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING
           ), 2) AS running_total
    FROM orders
    """,
    doc="Per-customer running revenue: cumulative window sum with a "
        "deterministic (date, key) frame order; one shuffle on the "
        "partition key.",
    tags=("window",),
)
def running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "order_gap_days",
    oracle="""
    WITH g AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             LAG(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_date
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', prev_date, o_orderdate) AS BIGINT) AS gap_days
    FROM g WHERE prev_date IS NOT NULL
    """,
    doc="Days since the customer's previous order (lag window + "
        "datediff) — the reorder-interval building block.",
    tags=("window", "B8"),
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return (
        o.select(
            "o_custkey", "o_orderkey",
            F.datediff("o_orderdate", prev).cast("bigint").alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )


@register(
    "sketch_aggregates",
    oracle=None,  # HLL/KLL sketches are engine-specific -> rows-only;
    # tests/test_sketches.py bounds their error against exact values
    doc="Sketch aggregates per event_type: approx_count_distinct (HLL) "
        "and percentile_approx — the sublinear-memory path for "
        "count-distinct/quantiles at 100 TB (exact variants shuffle "
        "every distinct value).",
    tags=("sketch", "D3"),
)
def sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.round(F.percentile_approx("value", 0.5), 2).alias("approx_median"),
        F.round(F.percentile_approx("value", 0.99), 2).alias("approx_p99"),
    )


@register(
    "hll_shard_union",
    oracle=None,  # sketch binaries are engine-internal -> covered by the
    # hll_union_bands gate (exact shard counts + error-band booleans)
    doc="Mergeable-sketch shard pattern (Apache DataSketches HLL via "
        "hll_sketch_agg): build one user_id sketch per (event_type, "
        "day) shard, then hll_union_agg the BINARIES to per-type "
        "estimates — re-aggregation without rescanning the fact table, "
        "the way 100 TB cardinality rollups are actually maintained "
        "(approx_count_distinct cannot merge across a saved boundary; "
        "sketch columns can be persisted per-partition and unioned "
        "later at any grouping).",
    tags=("sketch", "D3"),
)
def hll_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    shards = ev.groupBy(
        "event_type", F.to_date("ts").alias("__shard")
    ).agg(F.hll_sketch_agg("user_id").alias("__sk"))
    return shards.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("merged_users"),
    )


@register(
    "dedup_apply",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
    FROM documents
    GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    """,
    doc="Apply-side of exact dedup: the surviving representative ids "
        "(min id per content hash) via aggregate + semi join — the "
        "dedup ladder's output table.",
    tags=("dedup",),
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.dedup import drop_exact_dups

    docs = load_table(spark, sf_dir, "documents")
    return drop_exact_dups(docs).select("doc_id")


# ---------------------------------------------------------------------------
# TPC-H classics adapted to the synthetic schema: multi-join + agg + top-k
# (Q3 shape) and a 6-way snowflake join (Q5 shape) — join-ordering and
# broadcast-selection showcases.
# ---------------------------------------------------------------------------

@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join, anti-correlated date filters, "
        "grouped revenue, top-10 by revenue (TakeOrderedAndProject; "
        "deterministic tiebreak keys).",
    tags=("C1", "C2", "E5"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    joined = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate") < cutoff),
              cust["c_custkey"] == orders["o_custkey"])
        .join(li.filter(F.col("l_shipdate") > cutoff),
              F.col("o_orderkey") == li["l_orderkey"])
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way snowflake join (fact + 5 dims, including "
        "the supplier-nation == customer-nation local-supplier "
        "condition) with region pruning — Catalyst broadcast-selects the "
        "dim chain; only the fact side shuffles for the aggregate.",
    tags=("C1", "C2", "D1"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n)
         for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    joined = (
        t["customer"]
        .join(t["orders"], t["customer"]["c_custkey"] == t["orders"]["o_custkey"])
        .join(t["lineitem"], F.col("o_orderkey") == t["lineitem"]["l_orderkey"])
        .join(
            t["supplier"],
            (F.col("l_suppkey") == t["supplier"]["s_suppkey"])
            & (t["supplier"]["s_nationkey"] == t["customer"]["c_nationkey"]),
        )
        .join(t["nation"], F.col("c_nationkey") == t["nation"]["n_nationkey"])
        .join(t["region"], F.col("n_regionkey") == t["region"]["r_regionkey"])
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("n_name").agg(
        F.round(F.sum(revenue), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Semi-structured + reshape breadth: JSON property extraction and
# wide->long unpivot (melt).
# ---------------------------------------------------------------------------

@register(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM (
      SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    """,
    doc="Semi-structured column handling: parse the JSON props string "
        "with a declared schema (from_json) and aggregate the extracted "
        "field — schema-on-read for event payloads.",
    tags=("B2", "json"),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k bigint").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing,
           'OBJECT<k: BIGINT>' AS value_schema
    FROM (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             json_extract(props, '$.nope') AS missing
      FROM events
    )
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT tier of semi-structured handling: parse_json "
        "into a VARIANT column (binary-encoded, no up-front schema), "
        "typed path extraction with variant_get, null-safe "
        "try_variant_get on a missing path, and schema_of_variant "
        "inference merged per event type via schema_of_variant_agg "
        "(surfaces per-row shape drift, unlike a lexicographic max "
        "over schema strings). The inferred-schema column is a real "
        "check: the oracle pins the literal "
        "'OBJECT<k: BIGINT>' Spark must infer from the data, and the "
        "extraction aggregates must match DuckDB's JSON path reads. "
        "Complements json_props_stats (from_json with a declared "
        "schema): VARIANT is the schema-on-read path when payload "
        "shapes drift.",
    tags=("B2", "json", "variant"),
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    parsed = v.select(
        "event_type",
        "v",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(v, '$.nope', 'string')").alias("missing"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing"),
        # schema_of_variant_agg merges the per-row schemas (ADVICE r5:
        # a lexicographic MAX over schema strings would silently hide
        # per-row shape drift; the merged schema surfaces it, and the
        # oracle pins the merged literal).
        F.expr("schema_of_variant_agg(v)").alias("value_schema"),
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           ROUND(l_quantity, 6) AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', ROUND(l_extendedprice, 6) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', ROUND(l_discount, 6) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', ROUND(l_tax, 6) FROM lineitem
    """,
    doc="Wide->long unpivot (melt) of lineitem's four measures — the "
        "inverse of pivot; map-side only, no shuffle (reference's wide "
        "code columns -> long form is the same reshape, SURVEY §2-C3).",
    tags=("reshape", "C3"),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    renamed = li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    out = renamed.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "price", "discount", "tax"],
        "measure",
        "value",
    )
    return out.withColumn("value", F.round("value", 6))


@register(
    "skew_key_report",
    oracle="""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), tot AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows
      FROM counts
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(cnt AS BIGINT) AS cnt,
           ROUND(cnt / (t.n_rows * 1.0), 6) AS share,
           ROUND(cnt / (t.n_rows * 1.0 / t.n_keys), 4) AS skew_ratio,
           CAST(CEIL(cnt / 2048.0) AS INT) AS n_salts
    FROM counts, tot t
    ORDER BY cnt DESC, user_id
    LIMIT 10
    """,
    doc="Join-key skew profiler (the pre-flight check for salting a "
        "100 TB join): top-10 hottest events.user_id keys with exact "
        "count, row share, skew ratio vs the per-key mean, and the "
        "salt fan-out bounding each bucket at 2048 rows (power of two "
        "=> the ceil has no float-boundary ambiguity). One map-side "
        "count aggregate, lazily checkpointed for its two consumers; "
        "top-k via TakeOrderedAndProject.",
    tags=("skew", "profiling", "D5"),
)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return R.skew_key_report(ev, "user_id", top_k=10, target_rows_per_task=2048)


@register(
    "salted_join_segments",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
    doc="Skew-safe salted equi-join, oracle-proved semantics-preserving: "
        "the fact side is salted into 8 random buckets and the dim side "
        "replicated across them (operators/relational.py:salted_join), "
        "yet the aggregate equals the PLAIN join the oracle runs — the "
        "salt is join-internal and cannot change results, which is the "
        "whole point of the technique. Values sum as exact integer "
        "cents so the hash is immune to float summation order.",
    tags=("skew", "join", "C1"),
)
def salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("bigint").alias("__cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = R.salted_join(ev, cust, on="user_id", n_salts=8)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("__cents") / F.lit(100.0), 2).alias("total_value"),
        )
        .orderBy("segment")
    )
