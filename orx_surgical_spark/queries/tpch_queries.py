"""TPC-H-shaped OLAP queries over the driver's synthetic tables.

Q1/Q3/Q5 shapes live in :mod:`relational_queries` (pricing_summary,
shipping_priority, local_supplier_volume); this module adds the Q4 /
Q6 / Q12 / Q14 / Q18 / Q19 / Q22 shapes plus (r6) the
partsupp-dependent Q2 / Q9 / Q11 / Q16 / Q20 over a deterministic
derived partsupp, all adapted to the synthetic schema (no
commitdate/receiptdate/shipmode/phone columns — the predicates are
re-based on the columns that exist, the plan shapes are the canonical
ones).
Each documents the physical plan Catalyst should pick; value-identical
DuckDB oracles gate the results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table


@register(
    "q4_late_shipment_orders",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: order-priority checking via EXISTS — a LEFT "
        "SEMI join of orders against lineitems shipped >90 days after "
        "the order date, then a tiny aggregate. The semi join "
        "short-circuits per order (no duplicate expansion, no distinct "
        "needed) and shuffles on the join key only once.",
    tags=("tpch", "semi-join"),
)
def q4_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: forecasting-revenue-change — a pure "
        "scan-filter-aggregate with zero joins and zero shuffles beyond "
        "the final single-row combine. All four predicates push into "
        "the parquet scan (shipdate range prunes row groups via "
        "min/max stats); the ideal plan is one WholeStageCodegen span.",
    tags=("tpch", "scan-agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape: shipping-mode/priority matrix — fact-fact "
        "equi-join with conditional-sum pivots. The shipdate filter "
        "pushes below the join (Catalyst filter pushdown), and both "
        "conditional counts ride one hash aggregate; no separate "
        "per-class scans.",
    tags=("tpch", "conditional-agg"),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q14_promo_revenue_pct",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1996-07-01'
    """,
    doc="TPC-H Q14 shape: promotion-effect ratio — fact joined to the "
        "part dimension (broadcast: part is small), two conditional "
        "sums folded into one aggregate, ratio in the final projection. "
        "The fact side never shuffles; the only exchange is the "
        "single-row combine.",
    tags=("tpch", "broadcast-join"),
)
def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 200
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(b.sum_qty, 2) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape: large-volume customers — aggregate-then-join: "
        "the HAVING aggregate reduces lineitem to the few qualifying "
        "order keys BEFORE joining orders and customer, so the "
        "expensive join inputs are pre-shrunk (aggregate pushdown by "
        "construction). The shrunken key set broadcasts under AQE.",
    tags=("tpch", "having"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .where(F.col("sum_qty_raw") > 200)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty_raw", 2).alias("sum_qty"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: discounted revenue under a disjunction of "
        "brand/size/quantity conjunctions. The OR references both join "
        "sides, so it cannot be a plain pushed filter — but Catalyst's "
        "PushExtraPredicateThroughJoin derives the part-only OR "
        "((brand=12 AND size 1-15) OR ...) onto the broadcast part scan "
        "and the quantity-only OR onto the lineitem scan, shrinking "
        "both inputs before the join evaluates the full predicate. "
        "At 100 TB that derived lineitem filter (quantity <= 30) is "
        "the difference between scanning everything and row-group "
        "pruning most of the fact table.",
    tags=("tpch", "disjunctive-pushdown"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    branch = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return joined.where(
        branch("Brand#12", 1, 15, 1, 11)
        | branch("Brand#23", 10, 30, 10, 20)
        | branch("Brand#3", 20, 50, 20, 30)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate < DATE '1996-01-01'
      )
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape (global sales opportunity): customers with "
        "above-average account balance and no orders in the first year, "
        "counted per nation. Three classic pieces in one plan: a scalar "
        "subquery (1-row average, broadcast to every partition as a "
        "literal — zero shuffle), a LEFT ANTI join against the "
        "date-filtered orders (NOT EXISTS; the filter shrinks the build "
        "side before the join), and a small hash aggregate. The anti "
        "join shuffles only the pre-filtered keys; customer never "
        "shuffles twice.",
    tags=("tpch", "anti-join", "scalar-subquery"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    early = orders.where(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = customer.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(early, rich["c_custkey"] == early["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    doc="TPC-H Q15 shape (top supplier): revenue-per-supplier aggregate "
        "for one quarter, then keep the row(s) equal to the global max "
        "— tie-preserving, unlike ORDER BY .. LIMIT 1. The quarter "
        "filter pushes into the scan; the per-supplier aggregate is "
        "small (|suppliers| rows), so the scalar MAX over it and the "
        "supplier-name join are both broadcast-sized. The only "
        "fact-table shuffle is the one groupBy(l_suppkey).",
    tags=("tpch", "scalar-subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        # Round INSIDE the aggregate: the plan evaluates `rev` twice (the
        # scalar-max side and the join side), and float sum order differs
        # between evaluations — equality on raw doubles would
        # nondeterministically drop the max row. Rounded to 2 decimals,
        # both evaluations agree (catalog-wide double convention).
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(max_rev))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), rev["l_suppkey"] == supplier["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — a LEFT "
        "OUTER join with the filter INSIDE the join condition (pushing "
        "it to a WHERE would silently turn the join inner and drop "
        "zero-order customers), then two cascaded aggregates; the "
        "second groups a |customers|-row input down to a handful of "
        "distribution rows. Priority filter stands in for the spec's "
        "comment filter (no o_comment in the synthetic schema).",
    tags=("tpch", "outer-join"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (orders["o_custkey"] == cust["c_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy(cust["c_custkey"])
        .agg(F.count(orders["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.lim
    """,
    doc="TPC-H Q17 shape: small-quantity-order revenue. The spec's "
        "correlated scalar subquery (per-part average quantity) is "
        "decorrelated into one pre-aggregate joined back on the part "
        "key — the per-part avg table is |parts|-sized and both joins "
        "key on l_partkey, so the fact table shuffles once and the "
        "plan never evaluates a subquery per row.",
    tags=("tpch", "decorrelation"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("lim")
    )
    brand = part.where(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.join(F.broadcast(brand), li["l_partkey"] == brand["p_partkey"])
        .join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < F.col("lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
           -- per-term DECIMAL sum: order-independent exact arithmetic,
           -- rounded half-up while still decimal (both engines agree),
           -- only then widened to double for a uniform output type
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
    GROUP BY ns.n_name, nc.n_name, EXTRACT(YEAR FROM l.l_shipdate)
    """,
    doc="TPC-H Q7 shape: cross-nation shipping volume by year. The "
        "fact table joins orders on the order key (one co-keyed "
        "shuffle pair); customer/supplier/nation sides are all "
        "broadcast dims, and the nation-pair inequality filters after "
        "the dim joins — the canonical star-join-with-two-role-dims "
        "plan (nation joined twice under different roles).",
    tags=("tpch", "star-join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .where(F.col("s_nkey") != F.col("c_nkey"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,4)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q8_national_market_share",
    oracle="""
    WITH vol AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1997-01-01'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                          ELSE 0 END) / SUM(volume), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — the 8-table join "
        "(lineitem at the center; part/orders/customer/nation/region/"
        "supplier/nation dims) with a conditional-share aggregate per "
        "year. The seven true dimension sides are broadcast (all far "
        "below the 10 MB threshold), so the fact table is never "
        "shuffled until the tiny per-year aggregate; the two nation "
        "copies are separate broadcast builds, not a self-join "
        "shuffle. The filtered two-year orders slice also broadcasts "
        "at the tested SFs via Catalyst's size estimate, but is NOT "
        "forced: above the threshold it correctly degrades to a "
        "shuffle join (the right call at 100 TB, where the slice is "
        "itself huge) — the plan test pins the sf0.001 shape only.",
    tags=("tpch", "multi-join"),
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    supplier = load_table(spark, sf_dir, "supplier")
    cust_nation = nation.alias("cn")
    supp_nation = nation.alias("sn")
    vol = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(cust_nation),
            customer["c_nationkey"] == F.col("cn.n_nationkey"),
        )
        .join(F.broadcast(region), F.col("cn.n_regionkey") == region["r_regionkey"])
        .join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(
            F.broadcast(supp_nation),
            supplier["s_nationkey"] == F.col("sn.n_nationkey"),
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
                .otherwise(0.0)
            )
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q10_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           -- 4dp, not the canonical 2: money products carry <= 4
           -- decimal digits, so 4dp rounding sits ON grid points and
           -- cannot tie; at 2dp an exact .xx5 sum rounds differently
           -- under BigDecimal HALF_UP vs double rounding (hit at
           -- sf0.01, customer 249)
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item reporting — top-20 customers by "
        "lost revenue (returnflag = 'R') in one quarter. The quarter "
        "filter pushes into the orders scan and the returnflag filter "
        "into the lineitem scan BEFORE the join; customer and nation "
        "broadcast; the final top-k is TakeOrderedAndProject (never a "
        "global sort), with c_custkey as the deterministic tiebreak.",
    tags=("tpch", "topk"),
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM late l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape: suppliers who kept orders waiting — the "
        "hardest canonical shape: a semi join (some OTHER supplier "
        "contributed to the order) stacked with an anti join (but no "
        "OTHER supplier was late) over the late-lines set, counted per "
        "supplier. Lateness is re-based on shipdate vs orderdate + 60 "
        "days (the synthetic schema has no commit/receipt dates) and "
        "the canonical single-nation filter is dropped (100 suppliers "
        "total); the plan shape — two hash shuffles on l_orderkey for "
        "semi+anti, broadcast supplier dim, TakeOrderedAndProject — is "
        "the canonical one.",
    tags=("tpch", "semi-anti"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        late.join(
            l2,
            (late["l_orderkey"] == l2["o2"]) & (late["l_suppkey"] != l2["s2"]),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3["o3"]) & (F.col("l_suppkey") != l3["s3"]),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(supplier), F.col("l_suppkey") == supplier["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q2/Q9/Q11/Q16/Q20: the partsupp-dependent shapes (r6).
#
# The synthetic schema ships no partsupp table, but lineitem carries the
# (l_partkey, l_suppkey) relationship instances, so partsupp is DERIVED
# deterministically: the distinct observed pairs, plus availqty/
# supplycost from the first 16 bits of an md5 over the key pair — the
# same engine-independent arithmetic as encoders.hash_fraction, so the
# DuckDB oracle rebuilds the identical table from the same parquet. At
# scale this derivation is one distinct-aggregate over the fact table
# (shuffle on the pair key), done once and reused per query plan.
# ---------------------------------------------------------------------------

# DuckDB side of the 16-bit md5 prefix (hex-nibble arithmetic; same
# idiom as encoder_queries._H16).
_PS_HEX = "strpos('0123456789abcdef', substr(h, {i}, 1)) - 1"
_PS_H16 = " + ".join(f"({_PS_HEX.format(i=i + 1)}) * {16 ** (3 - i)}" for i in range(4))

_PARTSUPP_CTE = f"""
    WITH ps_h AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             md5(CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR)) AS h
      FROM lineitem
    ), partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST(({_PS_H16}) % 9999 + 1 AS INTEGER) AS ps_availqty,
             ROUND(CAST(({_PS_H16}) % 100000 AS DOUBLE) / 100.0 + 1.0, 2)
               AS ps_supplycost
      FROM ps_h
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp derivation (see module comment): distinct observed
    (part, supplier) pairs + md5-deterministic availqty/supplycost."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    h16 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-",
                    F.col("ps_partkey").cast("string"),
                    F.col("ps_suppkey").cast("string"),
                ).cast("binary")
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (h16 % 9999 + 1).cast("int").alias("ps_availqty"),
        F.round((h16 % 100000).cast("double") / 100.0 + 1.0, 2).alias(
            "ps_supplycost"
        ),
    )



@register(
    "q2_min_cost_supplier",
    oracle=_PARTSUPP_CTE + """
    , eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), cand AS (
      SELECT p.p_partkey, eu.s_name, eu.s_acctbal, eu.n_name,
             ps.ps_supplycost
      FROM partsupp ps
      JOIN part p ON ps.ps_partkey = p.p_partkey
      JOIN eu ON ps.ps_suppkey = eu.s_suppkey
      WHERE p.p_type = 'LARGE'
    ), mn AS (
      SELECT p_partkey, MIN(ps_supplycost) AS min_cost
      FROM cand GROUP BY p_partkey
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey,
           ROUND(c.ps_supplycost, 2) AS ps_supplycost
    FROM cand c JOIN mn ON c.p_partkey = mn.p_partkey
                       AND c.ps_supplycost = mn.min_cost
    ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
    LIMIT 20
    """,
    doc="TPC-H Q2 shape: cheapest EUROPE supplier per LARGE part — the "
        "correlated MIN subquery decorrelated into a per-part min "
        "aggregate joined back to the candidates (ties kept, per spec). "
        "supplier/nation/region/part are all broadcast dims; partsupp "
        "(the derived distinct over lineitem) shuffles once on the "
        "pair key; TakeOrderedAndProject caps the output at 20. "
        "Adaptation: no p_mfgr/s_address columns in the synthetic "
        "schema, so the projection carries the columns that exist.",
    tags=("tpch", "partsupp", "correlated-min"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "LARGE")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"])
        .join(F.broadcast(eu), ps["ps_suppkey"] == eu["s_suppkey"])
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "ps_supplycost")
    )
    mn = (
        cand.groupBy("p_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .withColumnRenamed("p_partkey", "mn_partkey")  # self-lineage join:
        # cand and mn share column ids, so rename the aggregate's key
    )
    return (
        cand.join(
            mn,
            (cand["p_partkey"] == mn["mn_partkey"])
            & (cand["ps_supplycost"] == mn["min_cost"]),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.round("ps_supplycost", 2).alias("ps_supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


@register(
    "q9_product_type_profit",
    oracle=_PARTSUPP_CTE + """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           -- exact decimal arithmetic on both sides: a double SUM's
           -- last bits can land either side of the half-cent boundary
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                          - CAST(ps.ps_supplycost AS DECIMAL(18,2))
                            * CAST(l.l_quantity AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN partsupp ps ON l.l_partkey = ps.ps_partkey
                    AND l.l_suppkey = ps.ps_suppkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: product-type profit — revenue minus supply "
        "cost per (supplier nation, order year) over parts whose name "
        "matches. part/supplier/nation broadcast; the partsupp "
        "derivation and orders co-shuffle with lineitem on their join "
        "keys; the LIKE filter prunes parts before the fact join.",
    tags=("tpch", "partsupp", "multi-join"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(
            ps,
            (li["l_partkey"] == ps["ps_partkey"])
            & (li["l_suppkey"] == ps["ps_suppkey"]),
        )
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                - F.col("ps_supplycost").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(18,2)")
            ).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("profit"))
    )


@register(
    "q11_important_stock",
    oracle=_PARTSUPP_CTE + """
    , asia AS (
      SELECT s.s_suppkey
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    ), v AS (
      SELECT ps.ps_partkey,
             SUM(ps.ps_supplycost * ps.ps_availqty) AS value
      FROM partsupp ps JOIN asia a ON ps.ps_suppkey = a.s_suppkey
      GROUP BY ps.ps_partkey
    )
    SELECT ps_partkey, ROUND(value, 2) AS stock_value
    FROM v
    WHERE value > (SELECT SUM(value) * 0.001 FROM v)
    """,
    doc="TPC-H Q11 shape: important stock — per-part inventory value "
        "for one region's suppliers, kept only above a fraction "
        "(0.001, scaled so every graded SF keeps rows) of the "
        "GLOBAL total (scalar subquery over the same aggregate). The "
        "per-part aggregate computes once and is self-joined against "
        "its own tiny global sum (a broadcast of one row), not "
        "recomputed.",
    tags=("tpch", "partsupp", "scalar-subquery"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select("s_suppkey")
    )
    v = (
        ps.join(F.broadcast(asia), ps["ps_suppkey"] == asia["s_suppkey"])
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"))
    )
    total = v.agg((F.sum("value") * 0.001).alias("cutoff"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("value") > F.col("cutoff"))
        .select("ps_partkey", F.round("value", 2).alias("stock_value"))
    )


@register(
    "q16_parts_supplier_counts",
    oracle=_PARTSUPP_CTE + """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%0'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: supplier counts per (brand, type, size) with "
        "a NOT IN supplier blacklist — a broadcast LEFT ANTI join (the "
        "blacklist is tiny), a broadcast part-dim join with pushed "
        "brand/type/size filters, then count-distinct per group. "
        "Adaptation: no comment column, so the 'complaints' blacklist "
        "is the deterministic s_name LIKE '%0' stand-in.",
    tags=("tpch", "partsupp", "anti-join"),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_name").like("%0")
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps["ps_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_availability",
    oracle=_PARTSUPP_CTE + """
    , bolt_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
    ), shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) = 1996
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_name
    FROM partsupp ps
    JOIN bolt_parts b ON ps.ps_partkey = b.p_partkey
    JOIN shipped sh ON ps.ps_partkey = sh.l_partkey
                   AND ps.ps_suppkey = sh.l_suppkey
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    WHERE ps.ps_availqty > 0.5 * sh.qty
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: suppliers with excess availability — availqty "
        "above half of the 1996 shipped quantity of that (part, "
        "supplier), restricted to parts matching a name pattern. The "
        "correlated quantity subquery decorrelates into one grouped "
        "aggregate over the filtered fact slice, equi-joined on the "
        "pair key; part filter and supplier dim broadcast.",
    tags=("tpch", "partsupp", "decorrelated"),
)
def q20_excess_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier")
    shipped = (
        li.where(F.year("l_shipdate") == 1996)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    return (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"])
        .join(
            shipped,
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .join(F.broadcast(sup), ps["ps_suppkey"] == sup["s_suppkey"])
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )
