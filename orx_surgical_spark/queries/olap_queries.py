"""OLAP / lakehouse breadth queries: anti-join, CUBE, set operations,
date-spine gap fill, exact quantiles, corr/covar, MERGE upsert, and
connected-components dedup clustering.

These extend the beyond-reference tier (COVERAGE.md) with the shapes a
large-scale training-data pipeline leans on daily. Every query keeps
the catalog contract: identical aliases and rounding on the Spark and
DuckDB sides (:mod:`orx_surgical_spark.queries.catalog`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators import relational as R
from orx_surgical_spark.operators.graph import connected_components, pagerank
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table


@register(
    "anti_join_no_orders",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS sum_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND EXTRACT(year FROM o.o_orderdate) = 1995)
    GROUP BY c_mktsegment
    """,
    doc="LEFT ANTI join (NOT EXISTS): customers with no 1995 order "
        "(every customer in the synthetic data has SOME order, so the "
        "year filter keeps the result non-trivial), summarized per "
        "market segment. The filtered order-key side reduces to a "
        "distinct-key build that Catalyst broadcasts — the customer scan "
        "is never shuffled.",
    tags=("C", "anti-join"),
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    never = R.anti_join(
        customer,
        orders.where(F.year("o_orderdate") == 1995).select(
            F.col("o_custkey").alias("c_custkey")
        ),
        "c_custkey",
    )
    return never.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


@register(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority) with grouping_id disambiguating "
        "subtotal levels — Spark expands the cube map-side into one hash "
        "aggregate (single shuffle), not 4 separate scans.",
    tags=("D", "cube"),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")


@register(
    "set_ops_buyer_years",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1995),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE EXTRACT(year FROM o_orderdate) = 1996)
    SELECT 'both' AS cohort, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    UNION ALL
    SELECT 'only_1995', o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    UNION ALL
    SELECT 'only_1996', o_custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
    """,
    doc="Set operations (INTERSECT / EXCEPT) partitioning 1995 vs 1996 "
        "buyers into retained / churned / new cohorts. Spark plans both "
        "ops as aggregates + joins on the same key, so AQE reuses the "
        "exchange across the three branches.",
    tags=("D", "set-ops"),
)
def set_ops_buyer_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return (
            orders.where(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = buyers(1995), buyers(1996)
    tag = lambda df, t: df.select(F.lit(t).alias("cohort"), "o_custkey")  # noqa: E731
    return (
        tag(y95.intersect(y96), "both")
        .unionByName(tag(y95.subtract(y96), "only_1995"))
        .unionByName(tag(y96.subtract(y95), "only_1996"))
    )


@register(
    "date_spine_fill",
    oracle="""
    WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
                    FROM events),
         spine AS (SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                                      CAST(hi AS TIMESTAMP),
                                                      INTERVAL 1 DAY)) AS DATE) AS d
                   FROM bounds),
         types AS (SELECT DISTINCT event_type FROM events),
         daily AS (SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS n
                   FROM events GROUP BY 1, 2)
    SELECT STRFTIME(s.d, '%Y-%m-%d') AS d, ty.event_type,
           CAST(COALESCE(da.n, 0) AS BIGINT) AS n
    FROM spine s
    CROSS JOIN types ty
    LEFT JOIN daily da ON da.d = s.d AND da.event_type = ty.event_type
    """,
    doc="Gap-filled daily counts: a date spine built with "
        "sequence()/explode (no driver-side loop) cross-joined with the "
        "type dimension, left-joined to observed counts, zeros filled. "
        "The spine is tiny (days x types) so both joins broadcast; the "
        "only shuffle is the daily aggregate.",
    tags=("D", "timeseries"),
)
def date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "event_type"
    )
    bounds = ev.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy("d", "event_type").agg(F.count(F.lit(1)).alias("n_obs"))
    return (
        spine.crossJoin(types)
        .join(daily, ["d", "event_type"], "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "event_type",
            F.coalesce("n_obs", F.lit(0)).alias("n"),
        )
    )


@register(
    "quantiles_by_segment",
    oracle="""
    SELECT c_mktsegment,
           ROUND(QUANTILE_CONT(c_acctbal, 0.25), 6) AS p25,
           ROUND(QUANTILE_CONT(c_acctbal, 0.50), 6) AS p50,
           ROUND(QUANTILE_CONT(c_acctbal, 0.75), 6) AS p75
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="EXACT linear-interpolation quantiles (percentile()) per group — "
        "the exact counterpart of the sketch tier's percentile_approx; "
        "exact needs the per-group value sets, approx streams a mergeable "
        "sketch and is the 100 TB path (sketch_aggregates).",
    tags=("D", "quantiles"),
)
def quantiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(c_acctbal, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.75)"), 6).alias("p75"),
    )


@register(
    "corr_covar_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS std_qty,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Bivariate statistics per group: Pearson correlation, sample "
        "covariance, stddevs — single-pass mergeable moment aggregates "
        "(one shuffle, map-side partials), the building block for "
        "feature-correlation screens over training tables.",
    tags=("D", "stats"),
)
def corr_covar_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH source AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N',
             o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    merged AS (
      SELECT * FROM orders t
      WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT * FROM source
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
             AS sum_floor_price
    FROM merged
    GROUP BY o_orderstatus
    """,
    doc="MERGE / SCD-1 upsert as a DataFrame composition "
        "(operators.relational.merge_upsert): source rows win on key "
        "collision, new keys insert, untouched target rows survive — the "
        "plan Delta/Iceberg run inside a transactional commit. The "
        "deterministic source (10%% updates with a +1000 price bump, 1%% "
        "inserts) is derived from the same snapshot so DuckDB can replay "
        "it; an exact integer aggregate fingerprints the merged table.",
    tags=("C", "merge"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # The +1000.0 bump and the FLOOR fingerprint keep every per-row value
    # bit-identical across engines (IEEE add, no decimal rounding) and the
    # aggregate an exact integer sum — order-independent by construction.
    updates = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    inserts = orders.where(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    source = updates.unionByName(inserts)
    merged = R.merge_upsert(orders, source, "o_orderkey")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor("o_totalprice").cast("bigint")).alias("sum_floor_price"),
    )


@register(
    "doc_lang_components",
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b
      FROM documents d1
      JOIN documents d2 ON d2.doc_id = d1.doc_id + 1 AND d2.lang = d1.lang
    ),
    sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
    cc(node, label) AS (
      SELECT a AS node, a AS label FROM sym
      UNION
      SELECT s.b AS node, c.label
      FROM cc c JOIN sym s ON s.a = c.node
      WHERE c.label < s.b
    ),
    resolved AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
    labeled AS (
      SELECT d.doc_id, COALESCE(r.component, d.doc_id) AS component
      FROM documents d LEFT JOIN resolved r ON r.node = d.doc_id
    )
    SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM labeled GROUP BY component
    """,
    doc="Connected-components dedup clustering "
        "(operators.graph.connected_components): pairs -> transitive "
        "clusters via min-label propagation + pointer jumping, O(log d) "
        "rounds. Edge fixture: consecutive doc_ids sharing a lang (runs "
        "-> chain components, the propagation worst case). Oracle is a "
        "DuckDB recursive CTE; singletons keep their own id.",
    tags=("graph", "dedup"),
)
def doc_lang_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("prev_id"),
        F.col("doc_id").alias("dst"),
        F.col("lang").alias("lang2"),
    )
    edges = docs.join(
        nxt,
        (docs["doc_id"] == nxt["prev_id"]) & (docs["lang"] == nxt["lang2"]),
    ).select(F.col("doc_id").alias("src"), "dst")
    # consecutive-id same-lang join: distinct pairs with src < dst
    comp = connected_components(edges, edges_distinct=True)
    labeled = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
    )
    return labeled.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))


def _pagerank_oracle_sql(n_iter: int = 10) -> str:
    """DuckDB oracle for :func:`doc_graph_pagerank`: the 10 power steps
    unrolled as chained CTEs (DuckDB's recursive CTEs allow only one
    reference to the recursive table, but each PageRank step needs the
    previous ranks twice — contribution join + dangling-mass scalar).
    Each step CTE is ``AS MATERIALIZED``: DuckDB otherwise inlines CTEs,
    and the double self-reference would expand the chain 2^10-fold.

    Float parity: every literal is CAST to DOUBLE (DuckDB parses ``0.85``
    as DECIMAL, whose exact arithmetic would diverge from IEEE doubles
    and change the result *schema*), and the expression tree mirrors the
    Spark operator's association order. Residual cross-engine error is
    summation order (~1e-16 absolute), eight orders below the 1e-8
    rounding grain of the final ROUND(rank, 8).
    """
    step = """
    r{k} AS MATERIALIZED (
      SELECT f.node, f.out_deg,
             ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
              + (CAST(0.85 AS DOUBLE)
                 * (SELECT COALESCE(SUM(p.rank), CAST(0 AS DOUBLE))
                    FROM r{prev} p WHERE p.out_deg IS NULL))
                / (SELECT n FROM nn))
             + CAST(0.85 AS DOUBLE) * COALESCE(c.contrib, CAST(0 AS DOUBLE))
               AS rank
      FROM flagged f
      LEFT JOIN (
        SELECT e.dst AS node, SUM(p.rank / p.out_deg) AS contrib
        FROM dedges e JOIN r{prev} p
          ON p.node = e.src AND p.out_deg IS NOT NULL
        GROUP BY e.dst
      ) c ON c.node = f.node
    )"""
    steps = ",".join(step.format(k=k, prev=k - 1) for k in range(1, n_iter + 1))
    return f"""
    WITH edges AS (
      SELECT d1.doc_id AS src, d2.doc_id AS dst
      FROM documents d1
      JOIN documents d2 ON d2.doc_id = d1.doc_id + 1 AND d2.lang = d1.lang
    ),
    dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
    nodes AS (SELECT src AS node FROM dedges UNION SELECT dst FROM dedges),
    deg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_deg
      FROM dedges GROUP BY src
    ),
    flagged AS MATERIALIZED (
      SELECT n.node, d.out_deg FROM nodes n LEFT JOIN deg d USING (node)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM flagged),
    r0 AS MATERIALIZED (
      SELECT node, out_deg, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
      FROM flagged
    ),{steps}
    SELECT CAST(node AS BIGINT) AS node, ROUND(rank, 8) AS rank
    FROM r{n_iter}
    ORDER BY ROUND(rank, 8) DESC, node
    LIMIT 20
    """


@register(
    "doc_graph_pagerank",
    oracle=_pagerank_oracle_sql(),
    doc="PageRank (operators.graph.pagerank, 10 power iterations, "
        "d=0.85) over the directed doc-succession graph (doc_id -> next "
        "doc_id sharing a lang). Top 20 nodes by rank; ranks rounded and "
        "tie-broken on node id so the row set is deterministic. The "
        "per-iteration plan is one key-reused join + one hash aggregate "
        "(see operator docstring for the 100 TB shape); correctness is "
        "pinned both by the NumPy power-iteration cross-check in "
        "tests/test_graph.py and, since r5, by a DuckDB oracle with the "
        "10 power steps unrolled as chained CTEs.",
    tags=("graph", "pagerank"),
)
def doc_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("prev_id"),
        F.col("doc_id").alias("dst"),
        F.col("lang").alias("lang2"),
    )
    edges = docs.join(
        nxt,
        (docs["doc_id"] == nxt["prev_id"]) & (docs["lang"] == nxt["lang2"]),
    ).select(F.col("doc_id").alias("src"), "dst")
    ranks = pagerank(edges, n_iter=10)
    return (
        ranks.select("node", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
    )


@register(
    "full_outer_daily_recon",
    oracle="""
    WITH od AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), sd AS (
      SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ship_lines
      FROM lineitem GROUP BY 1
    )
    SELECT STRFTIME(COALESCE(od.d, sd.d), '%Y-%m-%d') AS d,
           CAST(COALESCE(od.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(sd.n_ship_lines, 0) AS BIGINT) AS n_ship_lines,
           CASE WHEN od.d IS NULL THEN 'ship_only'
                WHEN sd.d IS NULL THEN 'order_only'
                ELSE 'both' END AS presence
    FROM od FULL OUTER JOIN sd ON sd.d = od.d
    """,
    doc="FULL OUTER join reconciliation: daily order counts vs daily "
        "shipment-line counts, keeping unmatched days from either side "
        "with a presence tag — the audit/backfill-detection shape. Both "
        "inputs are pre-aggregated to day grain BEFORE the join, so the "
        "outer join runs on two tiny day tables, not the facts; the "
        "plan is two hash aggregates + one merge of day keys.",
    tags=("C", "outer-join"),
)
def full_outer_daily_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    sd = li.groupBy(F.to_date("l_shipdate").alias("sd_d")).agg(
        F.count(F.lit(1)).alias("n_ship_lines")
    )
    joined = od.join(sd, od["d"] == sd["sd_d"], "full_outer")
    return joined.select(
        F.date_format(F.coalesce("d", "sd_d"), "yyyy-MM-dd").alias("d"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("n_ship_lines", F.lit(0)).cast("bigint").alias("n_ship_lines"),
        F.when(F.col("d").isNull(), "ship_only")
        .when(F.col("sd_d").isNull(), "order_only")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "scd2_customer_history",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_acctbal AS balance,
             DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
      FROM customer
    ), upd AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS balance
      FROM customer WHERE c_custkey % 7 <> 0
      UNION ALL
      -- +100000000 clears real custkeys at any SF (max = 150000*SF;
      -- +1e6 collided from SF~7, breaking the one-row-per-key precondition)
      SELECT c_custkey + 100000000, 0.0 FROM customer WHERE c_custkey % 50 = 0
    ), j AS (
      SELECT h.c_custkey AS hk, h.balance AS hb, h.valid_from, h.valid_to,
             u.c_custkey AS uk, u.balance AS ub
      FROM hist h FULL OUTER JOIN upd u ON h.c_custkey = u.c_custkey
    ), f AS (
      SELECT *,
             (hk IS NOT NULL AND uk IS NOT NULL AND hb IS DISTINCT FROM ub)
               AS chg
      FROM j
    )
    SELECT hk AS c_custkey, hb AS balance,
           CAST(valid_from AS VARCHAR) AS valid_from,
           coalesce(CAST(CASE WHEN chg THEN DATE '2021-06-15'
                              ELSE valid_to END AS VARCHAR),
                    '9999-12-31') AS valid_to
    FROM f WHERE hk IS NOT NULL
    UNION ALL
    SELECT uk, ub, '2021-06-15', '9999-12-31'
    FROM f WHERE chg OR (hk IS NULL AND uk IS NOT NULL)
    """,
    doc="SCD-2 MERGE (operators.relational.scd2_upsert): apply an "
        "update snapshot to a validity-interval history table — "
        "changed keys close their open row and version, identical "
        "updates are no-ops (no spurious versions), absent keys pass "
        "through, new keys open. Closed history never joins (pure "
        "pass-through — at lake scale closed rows dominate and are "
        "file-reuse). Deterministic updates derived from the same "
        "snapshot (+100.0 balance bump for custkey%3=0, keys%7=0 "
        "absent, 2%% brand-new keys) so DuckDB replays the merge "
        "row-for-row; raw IEEE doubles, no rounding anywhere. The "
        "catalog projection serializes validity dates as ISO strings "
        "with the classic 9999-12-31 open-row sentinel (nullable DATE "
        "round-trips engine-dependently through pandas; the operator "
        "itself keeps NULL-means-open semantics).",
    tags=("C", "merge", "scd2"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    hist = cust.select(
        "c_custkey",
        F.col("c_acctbal").alias("balance"),
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = (
        cust.where(k % 7 != 0)
        .select(
            "c_custkey",
            F.when(k % 3 == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("balance"),
        )
        .unionByName(
            cust.where(k % 50 == 0).select(
                (k + 100000000).alias("c_custkey"),
                F.lit(0.0).alias("balance"),
            )
        )
    )
    out = R.scd2_upsert(hist, upd, "c_custkey", ["balance"], "2021-06-15")
    return out.select(
        "c_custkey",
        "balance",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.coalesce(F.col("valid_to").cast("string"), F.lit("9999-12-31"))
        .alias("valid_to"),
    )


@register(
    "doc_lang_triangles",
    oracle="""
    WITH e AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b
      FROM documents d1
      JOIN documents d2
        ON (d2.doc_id = d1.doc_id + 1 OR d2.doc_id = d1.doc_id + 2)
       AND d2.lang = d1.lang
    ), deg AS (
      SELECT n, COUNT(*) AS deg
      FROM (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
      GROUP BY n
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM e e1
      JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT SUM(deg * (deg - 1) // 2) FROM deg) AS BIGINT)
             AS n_wedges,
           ROUND(3.0 * (SELECT t FROM tri)
                 / (SELECT SUM(deg * (deg - 1) // 2) FROM deg), 6)
             AS global_clustering
    """,
    doc="Triangle census (degree-oriented node-iterator) of the "
        "deterministic lang-affinity graph: consecutive and skip-one "
        "doc_ids sharing a lang, so same-lang runs form stacked "
        "triangles. Reports nodes/edges/triangles/wedges and the "
        "global clustering coefficient 3T/wedges — the density "
        "diagnostic that tells a dedup pipeline whether components are "
        "clique-ish duplicate groups or chains that transitive closure "
        "would over-merge. The orientation (deg, id) bounds wedge "
        "fan-out at the hub, so the self-join survives skewed graphs; "
        "the oracle counts the same triangles orientation-free.",
    tags=("graph", "triangles"),
)
def doc_lang_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.graph import triangle_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    right = docs.select(
        F.col("doc_id").alias("dst"), F.col("lang").alias("lang2")
    )
    edges = docs.join(
        right,
        (
            (right["dst"] == docs["doc_id"] + 1)
            | (right["dst"] == docs["doc_id"] + 2)
        )
        & (docs["lang"] == right["lang2"]),
    ).select(F.col("doc_id").alias("src"), "dst")
    return triangle_stats(edges)


_KCORE_EDGES_CTE = """
      SELECT a, b FROM (
        SELECT d1.doc_id AS a, d2.doc_id AS b
        FROM documents d1
        JOIN documents d2
          ON (d2.doc_id = d1.doc_id + 1 OR d2.doc_id = d1.doc_id + 2)
         AND d2.lang = d1.lang
        UNION
        SELECT d2.doc_id, d1.doc_id
        FROM documents d1
        JOIN documents d2
          ON (d2.doc_id = d1.doc_id + 1 OR d2.doc_id = d1.doc_id + 2)
         AND d2.lang = d1.lang
      )
"""


def _kcore_oracle() -> str:
    from orx_surgical_spark.operators.graph import kcore_oracle_sql

    return kcore_oracle_sql(_KCORE_EDGES_CTE, k=2, rounds=4)


@register(
    "doc_graph_kcore",
    oracle=_kcore_oracle(),
    doc="Bounded-round 2-core peel of the lang-affinity doc graph "
        "(same deterministic edge set as doc_lang_triangles): drop "
        "degree-<2 nodes, recompute on the induced subgraph, 4 rounds, "
        "plus a converged flag proving one more round would remove "
        "nothing. The density screen between component (too loose) and "
        "clique (too strict): 2-core members are cycle-corroborated "
        "dedup candidates, chains peel away. The generated oracle "
        "unrolls every peel round (kcore_oracle_sql), so the hash "
        "covers the whole iteration. Per round: one map-side-combined "
        "degree aggregate + two LeftSemi joins against a shrinking "
        "node list — no windows, no global structure; cascades on this "
        "graph cannot cross lang-run boundaries, so 4 rounds converge "
        "at any scale factor.",
    tags=("graph", "kcore"),
)
def doc_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.graph import kcore

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    right = docs.select(
        F.col("doc_id").alias("dst"), F.col("lang").alias("lang2")
    )
    edges = docs.join(
        right,
        (
            (right["dst"] == docs["doc_id"] + 1)
            | (right["dst"] == docs["doc_id"] + 2)
        )
        & (docs["lang"] == right["lang2"]),
    ).select(F.col("doc_id").alias("src"), "dst")
    return kcore(edges, k=2, rounds=4)


def _bfs_oracle() -> str:
    from orx_surgical_spark.operators.graph import bfs_oracle_sql

    seeds = "SELECT MIN(doc_id) AS node FROM documents GROUP BY lang"
    return bfs_oracle_sql(_KCORE_EDGES_CTE, seeds, rounds=4)


@register(
    "doc_graph_bfs_layers",
    oracle=_bfs_oracle(),
    doc="Bounded-round BFS hop distances over the lang-affinity doc "
        "graph, seeded at each language's first document: the radius "
        "diagnostic completing the graph tier (components say WHICH "
        "cluster, k-core how DENSE, BFS how FAR duplication spreads "
        "from a seed before the graph dies out). Per round: one "
        "frontier-sized edge join + LeftAnti against visited + a "
        "distinct — never visited-set-sized work; the "
        "frontier_exhausted flag proves the layers are the complete "
        "reachable set, not a budget truncation. Generated unrolled "
        "oracle (bfs_oracle_sql) replays every expansion.",
    tags=("graph", "bfs"),
)
def doc_graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.graph import bfs_layers

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    right = docs.select(
        F.col("doc_id").alias("dst"), F.col("lang").alias("lang2")
    )
    edges = docs.join(
        right,
        (
            (right["dst"] == docs["doc_id"] + 1)
            | (right["dst"] == docs["doc_id"] + 2)
        )
        & (docs["lang"] == right["lang2"]),
    ).select(F.col("doc_id").alias("src"), "dst")
    seeds = docs.groupBy("lang").agg(F.min("doc_id").alias("node"))
    return bfs_layers(edges, seeds.select("node"), rounds=4)
