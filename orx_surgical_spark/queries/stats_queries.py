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


# -- Engine-exact sketch queries (cms / kmv) --------------------------------
# DuckDB-side helpers: first n hex digits of an md5 column as a BIGINT
# (the oracle half of the md5 hash family shared with
# operators/sketches.py; same idiom as encoder_queries._H16).
_HEXDIG = "(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


def _hex_int(h: str, n: int) -> str:
    return " + ".join(
        f"CAST({_HEXDIG.format(h=h, i=i + 1)} AS BIGINT) * {16 ** (n - 1 - i)}"
        for i in range(n)
    )


_CMS_ORACLE = f"""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events
    ), cells AS (
      SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT CAST(s.j AS INT) AS j,
               CAST(({_hex_int('h', 4)}) % 64 AS INT) AS bucket
        FROM (
          SELECT k, t.j AS j,
                 md5('cms' || CAST(t.j AS VARCHAR) || ':' || k) AS h
          FROM ev, range(0, 4) t(j)
        ) s
      ) q
      GROUP BY j, bucket
    ), probes AS (
      SELECT user_id FROM events GROUP BY user_id ORDER BY user_id LIMIT 10
    ), pe AS (
      SELECT user_id, CAST(j AS INT) AS j,
             CAST(({_hex_int('h', 4)}) % 64 AS INT) AS bucket
      FROM (
        SELECT p.user_id, t.j,
               md5('cms' || CAST(t.j AS VARCHAR) || ':'
                   || CAST(p.user_id AS VARCHAR)) AS h
        FROM probes p, range(0, 4) t(j)
      )
    ), est AS (
      SELECT pe.user_id,
             CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS e
      FROM pe LEFT JOIN cells c ON c.j = pe.j AND c.bucket = pe.bucket
      GROUP BY pe.user_id
    ), exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ex
      FROM events GROUP BY user_id
    )
    SELECT p.user_id,
           x.ex AS exact_cnt,
           e.e AS cms_est,
           e.e AS merged_est,
           e.e >= x.ex AS over_ok,
           TRUE AS merge_ok
    FROM probes p
    JOIN est e ON e.user_id = p.user_id
    JOIN exact x ON x.user_id = p.user_id
"""


@register(
    "cms_user_event_counts",
    oracle=_CMS_ORACLE,
    doc="Count-min sketch (depth 4 x width 64, md5 hash family) of "
        "per-user event frequencies, probed at the 10 smallest user "
        "ids: exact count vs sketch estimate vs shard-merged estimate. "
        "Engine-exact — the sketch is a pure function of the key "
        "multiset, so unlike the HLL band gate this is full value-hash "
        "material. over_ok pins the one-sided error guarantee "
        "(est >= exact, always); merge_ok pins mergeability: four "
        "event-id-sharded sketches cell-summed must equal the direct "
        "build (the oracle derives merged_est from the direct cells — "
        "a Spark-side merge bug flips the boolean and breaks the "
        "hash). Build shuffles at most depth*width rows per task "
        "(map-side combine); estimation broadcasts the 256-cell grid.",
    tags=("sketch", "cms"),
)
def cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    probes = ev.select("user_id").distinct().orderBy("user_id").limit(10)
    direct = SK.cms_build(ev, "user_id", depth=4, width=64)
    shard = (
        F.conv(
            F.substring(
                F.md5(F.col("event_id").cast("string").cast("binary")), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % 4
    ).alias("__shard")
    sharded = SK.cms_build(
        ev.select("user_id", shard), "user_id", depth=4, width=64,
        shard_col="__shard",
    )
    merged = SK.cms_merge(sharded)
    est = SK.cms_estimate(direct, probes, "user_id", depth=4, width=64,
                          est_col="cms_est")
    mest = SK.cms_estimate(merged, probes, "user_id", depth=4, width=64,
                           est_col="merged_est")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        probes.join(exact, "user_id")
        .join(est, "user_id")
        .join(mest, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            "merged_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("over_ok"),
            (F.col("cms_est") == F.col("merged_est")).alias("merge_ok"),
        )
    )


_KMV_EST_LIT = 15 * (16**12)  # (k-1) * hash space, exact integer

_KMV_ORACLE = f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), h AS (
      SELECT event_type, user_id,
             md5(CAST(user_id AS VARCHAR)) AS h
      FROM du
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY h, user_id) AS rn
      FROM h
    ), bk AS (
      SELECT * FROM r WHERE rn <= 16
    ), per AS (
      SELECT event_type, COUNT(*) AS n, MAX(h) AS hk,
             STRING_AGG(CASE WHEN rn <= 8
                             THEN CAST(user_id AS VARCHAR) END,
                        ',' ORDER BY rn) AS sample_csv
      FROM bk GROUP BY event_type
    ), exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ex
      FROM events GROUP BY event_type
    ), typed AS (
      SELECT p.event_type, x.ex AS exact_distinct,
             CASE WHEN p.n < 16 THEN CAST(p.n AS DOUBLE)
                  ELSE ROUND({_KMV_EST_LIT} / ({_hex_int('hk', 12)}), 4)
             END AS kmv_est,
             p.sample_csv
      FROM per p JOIN exact x ON x.event_type = p.event_type
    ), gpool AS (
      SELECT DISTINCT user_id, h FROM bk
    ), gr AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY h, user_id) AS rn FROM gpool
    ), gk AS (
      SELECT * FROM gr WHERE rn <= 16
    ), gagg AS (
      SELECT COUNT(*) AS n, MAX(h) AS hk,
             STRING_AGG(CASE WHEN rn <= 8
                             THEN CAST(user_id AS VARCHAR) END,
                        ',' ORDER BY rn) AS sample_csv
      FROM gk
    ), gexact AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ex FROM events
    )
    SELECT * FROM typed
    UNION ALL
    SELECT '_ALL_' AS event_type, g2.ex AS exact_distinct,
           CASE WHEN g.n < 16 THEN CAST(g.n AS DOUBLE)
                ELSE ROUND({_KMV_EST_LIT} / ({_hex_int('hk', 12)}), 4)
           END AS kmv_est,
           g.sample_csv
    FROM gagg g, gexact g2
"""


@register(
    "kmv_distinct_users",
    oracle=_KMV_ORACLE,
    doc="KMV bottom-k sketch (k=16, md5 order) per event type: distinct-"
        "user estimate, exact distinct for comparison, and the first 8 "
        "sketch members as a deterministic uniform sample of the "
        "distinct-user SET. The _ALL_ row is built ONLY from the five "
        "per-type sketches (bottom-k of the union of bottom-ks) — the "
        "mergeable-summaries property, value-hash-pinned because the "
        "oracle computes the same global sketch from scratch. Exact "
        "when a group holds < k keys; otherwise (k-1)*2^48/h48(kth), "
        "every step integer-exact or shared-IEEE. Scale shape: one "
        "distinct shuffle, then rank<=k planned as WindowGroupLimit "
        "(map-side top-k per group); the global row touches only "
        "5*k sketch rows via TakeOrderedAndProject, never the data.",
    tags=("sketch", "kmv"),
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    k = 16
    bk = SK.kmv_bottomk(ev, "event_type", "user_id", k=k)
    est = SK.kmv_estimate(bk, k=k)

    def sample_csv_agg():
        ordered = F.array_sort(F.collect_list(F.struct("rn", "key")))
        first8 = F.slice(ordered, 1, 8)
        return F.array_join(
            F.transform(first8, lambda s: s["key"].cast("string")), ","
        ).alias("sample_csv")

    samples = bk.groupBy("grp").agg(sample_csv_agg())
    exact = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    typed = (
        exact.join(est, "grp")
        .join(samples, "grp")
        .select(
            F.col("grp").alias("event_type"),
            "exact_distinct",
            "kmv_est",
            "sample_csv",
        )
    )
    # Global row from the per-type sketches ONLY (mergeability): the
    # pool is <= n_groups * k rows, so the top-k is
    # TakeOrderedAndProject over sketch output, never a global window
    # over data.
    pool = bk.select("key", "h").distinct()
    g16 = pool.orderBy("h", "key").limit(k)
    gagg = g16.agg(
        F.count(F.lit(1)).alias("n_in_sketch"),
        F.max("h").alias("hk"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(F.collect_list(F.struct("h", "key"))), 1, 8
                ),
                lambda s: s["key"].cast("string"),
            ),
            ",",
        ).alias("sample_csv"),
    )
    h48 = F.conv(F.substring("hk", 1, 12), 16, 10).cast("bigint")
    g_est = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
    ).otherwise(F.round(F.lit(15 * SK.KMV_HASH_SPACE) / h48, 4))
    g_exact = ev.agg(F.count_distinct("user_id").alias("exact_distinct"))
    grow = gagg.crossJoin(g_exact).select(
        F.lit("_ALL_").alias("event_type"),
        "exact_distinct",
        g_est.alias("kmv_est"),
        "sample_csv",
    )
    return typed.unionAll(grow)


def _bloom_word_case(prefix: str = "") -> str:
    return (
        "CASE word "
        + " ".join(f"WHEN {i} THEN {prefix}w{i}" for i in range(8))
        + " END"
    )


_BLOOM_ORACLE = f"""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ), bits AS (
      SELECT CAST(pos // 32 AS INT) AS word, pos % 32 AS bit
      FROM (
        SELECT ({_hex_int('h', 4)}) % 256 AS pos
        FROM (
          SELECT md5('bf' || CAST(t.j AS VARCHAR) || ':' || k) AS h
          FROM ev, range(0, 3) t(j)
        )
      )
    ), sk AS (
      SELECT {', '.join(
        f"BIT_OR(CASE WHEN word = {i} THEN CAST(POW(2, bit) AS BIGINT) "
        f"ELSE 0 END) AS w{i}" for i in range(8)
      )}
      FROM bits
    ), probes AS (
      SELECT CAST(user_id AS VARCHAR) AS probe_key
      FROM (SELECT user_id FROM events GROUP BY user_id
            ORDER BY user_id LIMIT 10)
      UNION ALL
      SELECT 'absent:' || CAST(t.i AS VARCHAR) FROM range(0, 5) t(i)
    ), pbits AS (
      SELECT probe_key, CAST(pos // 32 AS INT) AS word, pos % 32 AS bit
      FROM (
        SELECT probe_key, ({_hex_int('h', 4)}) % 256 AS pos
        FROM (
          SELECT probe_key,
                 md5('bf' || CAST(t.j AS VARCHAR) || ':' || probe_key) AS h
          FROM probes, range(0, 3) t(j)
        )
      )
    ), hits AS (
      SELECT probe_key,
             BOOL_AND((({_bloom_word_case()}) &
                       CAST(POW(2, bit) AS BIGINT)) != 0) AS bloom_hit
      FROM pbits CROSS JOIN sk
      GROUP BY probe_key
    ), present AS (
      SELECT DISTINCT k AS probe_key FROM ev
    )
    SELECT h.probe_key,
           p.probe_key IS NOT NULL AS present_expected,
           h.bloom_hit,
           (h.bloom_hit OR p.probe_key IS NULL) AS no_false_negative_ok,
           TRUE AS merge_ok
    FROM hits h LEFT JOIN present p ON p.probe_key = h.probe_key
"""


@register(
    "bloom_membership_users",
    oracle=_BLOOM_ORACLE,
    doc="Mergeable Bloom filter (256 bits / 3 md5 hashes) of the event "
        "user-id set, probed with 10 known keys and 5 absent keys: "
        "membership verdicts plus two pinned guarantees — "
        "no_false_negative_ok (every inserted key's bits are set, a "
        "theorem) and merge_ok (four event-id-sharded filters OR-merged "
        "must equal the direct build word-for-word; the oracle derives "
        "merged from the direct words, so a Spark merge bug flips the "
        "boolean and breaks the hash). Completes the engine-exact "
        "sketch family: distinct (KMV), frequency (CMS), membership "
        "(Bloom). Build is ONE conditional-bit_or aggregate emitting a "
        "single row per task map-side; the finished 8-word row is "
        "broadcast for probing.",
    tags=("sketch", "bloom"),
)
def bloom_membership_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    direct = SK.bloom_build(ev, "user_id")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.col("event_id").cast("string").cast("binary")), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % 4
    ).alias("__shard")
    merged = SK.bloom_merge(
        SK.bloom_build(ev.select("user_id", shard), "user_id",
                       shard_col="__shard")
    )
    # merge_ok: one boolean scalar — all 8 words agree.
    eq = None
    md = merged.select(*[F.col(f"w{i}").alias(f"m{i}") for i in range(8)])
    cmp_df = direct.crossJoin(F.broadcast(md))
    for i in range(8):
        term = F.col(f"w{i}") == F.col(f"m{i}")
        eq = term if eq is None else (eq & term)
    merge_flag = cmp_df.select(eq.alias("merge_ok"))

    known = (
        ev.select("user_id").distinct().orderBy("user_id").limit(10)
        .select(F.col("user_id").cast("string").alias("probe_key"))
    )
    absent = spark.range(5).select(
        F.concat(F.lit("absent:"), F.col("id").cast("string")).alias(
            "probe_key"
        )
    )
    probes = known.unionAll(absent)
    hits = SK.bloom_probe(direct, probes, "probe_key")
    present = ev.select(
        F.col("user_id").cast("string").alias("probe_key")
    ).distinct().withColumn("__present", F.lit(True))
    return (
        hits.join(present, "probe_key", "left")
        .crossJoin(F.broadcast(merge_flag))
        .select(
            "probe_key",
            F.coalesce(F.col("__present"), F.lit(False)).alias(
                "present_expected"
            ),
            "bloom_hit",
            (F.col("bloom_hit") | ~F.coalesce(F.col("__present"),
                                              F.lit(False))).alias(
                "no_false_negative_ok"
            ),
            "merge_ok",
        )
    )
