"""Windowed / ranking / text-statistics analytics queries.

Second OLAP-breadth batch: ranking windows (dense_rank / percent_rank /
ntile), range-frame rolling aggregates, hopping (sliding) time windows,
conversion funnels, TF-IDF term weighting, array higher-order-function
statistics, and edit-distance fuzzy matching. Every query keeps the
catalog contract (identical aliases + rounding on the Spark and DuckDB
sides, deterministic tie-breaks under any LIMIT/rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orx_surgical_spark.operators import text as T
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


@register(
    "rank_ntile_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
           ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
           CAST(NTILE(4) OVER w AS BIGINT) AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Ranking-window family over one partition spec: dense_rank, "
        "percent_rank, ntile(4) of customers by balance within segment. "
        "One shuffle on the partition key serves all three functions "
        "(single Window physical operator); c_custkey tie-break makes "
        "ntile deterministic across engines.",
    tags=("window", "rank"),
)
def rank_ntile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
    )


@register(
    "rolling_90d_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(DATEDIFF('day', DATE '1970-01-01', o_orderdate)
                           AS BIGINT)
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 2) AS spend_90d
    FROM orders
    """,
    doc="RANGE-frame rolling aggregate: per customer, total spend over "
        "the trailing 90 days (inclusive) of each order. The frame is a "
        "true value-range on epoch-day (not N rows), so same-day orders "
        "all see the full window. One shuffle on o_custkey + sort; at "
        "100 TB the partition key spreads customers evenly and the frame "
        "scan is linear per partition. Same-day ties share a RANGE frame "
        "sum, so the output is order-insensitive.",
    tags=("window", "range-frame"),
)
def rolling_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    epoch_day = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_day)
        .rangeBetween(-90, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
    )


@register(
    "sliding_window_events",
    oracle="""
    WITH starts AS (
      SELECT event_type,
             (CAST(FLOOR(EPOCH(ts) / 1800) AS BIGINT) - k.k) * 1800 AS win_start
      FROM events
      CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
    )
    SELECT win_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM starts
    GROUP BY win_start, event_type
    """,
    doc="Hopping (sliding) time window: 1-hour windows every 30 minutes, "
        "event counts per (window, type). Each event expands to exactly "
        "size/slide = 2 windows map-side, then one hash aggregate — the "
        "batch analog of Structured Streaming's window(slideDuration) "
        "and the same plan shape at any scale. Window start is reported "
        "as epoch seconds (bigint) to stay timezone-proof across "
        "engines.",
    tags=("window", "timeseries"),
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp("w.start").alias("win_start"),
            "event_type",
            "n",
        )
    )


@register(
    "funnel_signup_purchase",
    oracle="""
    WITH first_signup AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase AS (
      SELECT s.user_id, MIN(e.ts) AS purchase_ts
      FROM first_signup s
      JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND e.ts > s.signup_ts
      GROUP BY s.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users,
           CAST(COUNT(p.purchase_ts) AS BIGINT) AS n_converted,
           ROUND(AVG((EPOCH(p.purchase_ts) - EPOCH(s.signup_ts)) / 3600.0), 4)
             AS avg_hours_to_convert
    FROM first_signup s LEFT JOIN first_purchase p ON p.user_id = s.user_id
    """,
    doc="Two-step conversion funnel: users whose first purchase follows "
        "their first signup, with mean hours-to-convert. Both steps are "
        "hash aggregates keyed on user_id, so the three shuffles share "
        "one partitioning and AQE reuses the exchange; no window sort is "
        "needed because only the per-user MIN matters.",
    tags=("funnel", "timeseries"),
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchase = (
        signup.join(ev, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") > F.col("signup_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    joined = signup.join(purchase, "user_id", "left")
    hours = (
        F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")
    ) / F.lit(3600.0 * 1_000_000)
    return joined.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("purchase_ts").alias("n_converted"),
        F.round(F.avg(hours), 4).alias("avg_hours_to_convert"),
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term <> '' GROUP BY doc_id, term
    ), stats AS (
      SELECT term,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term, df, total_tf,
           ROUND(LN(n.n_docs * 1.0 / df), 6) AS idf,
           ROUND(total_tf * LN(n.n_docs * 1.0 / df), 4) AS total_tfidf
    FROM stats, n
    ORDER BY total_tf DESC, term
    LIMIT 25
    """,
    doc="TF-IDF term weighting over the corpus: per-term document "
        "frequency and total term frequency (exact integer aggregates), "
        "idf = ln(N/df), reported for the top-25 terms by total_tf. The "
        "LIMIT key is (total_tf DESC, term) — pure integers + unique "
        "term — so the row set is deterministic; doubles are only "
        "payload. Two hash aggregates, both partial-aggregated map-side; "
        "N is a scalar broadcast.",
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    return (
        stats.select(
            "term",
            "df",
            "total_tf",
            F.round(idf, 6).alias("idf"),
            F.round(F.col("total_tf") * idf, 4).alias("total_tfidf"),
        )
        .orderBy(F.desc("total_tf"), F.asc("term"))
        .limit(25)
    )


#: Fixed retrieval query for the BM25 ranker — terms from the synthetic
#: corpus vocabulary, shared verbatim by the Spark plan and the oracle.
_BM25_TERMS = ("spark", "merge", "window")


@register(
    "bm25_topk_docs",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
      FROM documents
    ), corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM base
    ), tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base)
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, dl, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               LN(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / c.avgdl))
               * 1000000.0) AS BIGINT) AS micros
      FROM tf JOIN dfreq d USING (term), corpus c
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS INT) AS n_terms,
           ROUND(SUM(micros) / 1000000.0, 6) AS bm25
    FROM scored
    GROUP BY doc_id
    ORDER BY SUM(micros) DESC, doc_id
    LIMIT 15
    """,
    doc="BM25 ranked retrieval (Lucene idf form) for a fixed bag of "
        "query terms: tokenize once, filter the explode to the query "
        "terms BEFORE the tf shuffle, broadcast the |terms|-row df "
        "table back, TakeOrderedAndProject top-15. Per-(doc,term) "
        "scores are rounded to integer micro-points before the per-doc "
        "sum, so the ranking key is exact integer math — immune to "
        "float summation order in either engine.",
    tags=("text", "bm25", "retrieval"),
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return T.bm25_topk(docs, _BM25_TERMS, k1=1.2, b=0.75, k=15)


@register(
    "array_hof_embedding_stats",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
             AS avg_l2_norm,
           ROUND(AVG(len(list_filter(embedding, x -> x > 0))), 6)
             AS avg_n_positive,
           ROUND(AVG(list_max(list_transform(embedding,
                 x -> ABS(CAST(x AS DOUBLE))))), 6) AS avg_abs_max
    FROM embeddings
    GROUP BY label
    """,
    doc="Array higher-order functions as first-class operators: per-label "
        "mean L2 norm, positive-component count, and abs-max over the "
        "embedding column — aggregate/filter/transform lambdas evaluated "
        "JVM-side per row (no UDF, no explode), then one hash aggregate. "
        "Elements are cast to double before summing so both engines "
        "accumulate in double precision in list order.",
    tags=("array", "hof"),
)
def array_hof_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    n_pos = F.size(F.filter("embedding", lambda x: x > 0))
    abs_max = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(F.sqrt(sq_sum)), 6).alias("avg_l2_norm"),
        F.round(F.avg(n_pos), 6).alias("avg_n_positive"),
        F.round(F.avg(abs_max), 6).alias("avg_abs_max"),
    )


@register(
    "fuzzy_type_pairs",
    oracle="""
    WITH ty AS (SELECT DISTINCT p_type FROM part)
    SELECT a.p_type AS type_a, b.p_type AS type_b,
           CAST(levenshtein(a.p_type, b.p_type) AS BIGINT) AS edit_dist
    FROM ty a JOIN ty b ON a.p_type < b.p_type
    WHERE levenshtein(a.p_type, b.p_type) <= 6
    """,
    doc="Edit-distance fuzzy matching: pairs of distinct part types "
        "within Levenshtein distance 6. The distinct-value dimension is "
        "tiny (~150 values) so the self-join broadcasts and the O(d^2) "
        "comparison runs on a dimension, never the fact table — the "
        "schema-reconciliation / label-canonicalization primitive. At "
        "larger dictionary sizes, block on length bands first (|len(a) - "
        "len(b)| <= max_dist prunes pairs cheaply).",
    tags=("text", "fuzzy"),
)
def fuzzy_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ty = load_table(spark, sf_dir, "part").select("p_type").distinct()
    a = ty.select(F.col("p_type").alias("type_a"))
    b = ty.select(F.col("p_type").alias("type_b"))
    dist = F.levenshtein("type_a", "type_b")
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .where(dist <= 6)
        .select("type_a", "type_b", dist.cast("bigint").alias("edit_dist"))
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus))
    """,
    doc="Explicit GROUPING SETS (not cube/rollup): revenue by flag, by "
        "status, and by both, disambiguated by grouping_id. Spark "
        "expands the sets map-side into one Expand + single hash "
        "aggregate — one shuffle for all three groupings, vs three "
        "separate scans in a naive UNION ALL plan.",
    tags=("D", "grouping-sets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "revenue")
    )
