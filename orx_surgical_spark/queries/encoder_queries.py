"""Encoder catalog queries (SURVEY §2-E) over the driver's synthetic
tables.

The MHE index construction and the hash/stratified splits are
engine-independent arithmetic (md5 + row_number), so they are
DuckDB-oracle-checked; only the ``SparseVector``-producing tiers (MLlib
types) fall back to rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators import encoders as E
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table

# First 16 bits of an md5 hex digest as an integer (DuckDB side of
# encoders.hash_fraction).
_HEX = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"
_H16 = " + ".join(f"({_HEX.format(h='h', i=i + 1)}) * {16 ** (3 - i)}" for i in range(4))


@register(
    "mhe_sparse_indices",
    oracle="""
    WITH vocab AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS INTEGER) AS cat_idx
      FROM (SELECT DISTINCT event_type FROM events)
    ), n AS (
      SELECT COUNT(*) AS n_cats FROM vocab
    )
    SELECT DISTINCT e.user_id,
           CAST((dayofyear(e.ts) - 1) * n.n_cats + v.cat_idx AS INTEGER) AS mhe_idx
    FROM events e
    JOIN vocab v USING (event_type)
    CROSS JOIN n
    """,
    doc="E4 multi-hot day-of-year encoding as exploded sparse indices: "
        "flat index (dayofyear-1)*|vocab| + category_index per "
        "(user, active cell) — the reference's (366, 516) scatter "
        "(cms_preprocess.py:329-336) with the tensor never dense.",
    bench=True,
    tags=("E4", "E1"),
)
def mhe_sparse_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    idx_df, _ = E.mhe_sparse_indices(ev, ["user_id"], "ts", "event_type")
    return idx_df


@register(
    "hash_split_summary",
    oracle=f"""
    WITH h AS (
      SELECT o_totalprice, md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders
    ), s AS (
      SELECT o_totalprice,
             CASE WHEN ({_H16}) / 65536.0 < 0.8 THEN 'train' ELSE 'test' END AS split
      FROM h
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 6) AS avg_totalprice
    FROM s GROUP BY split
    """,
    doc="E7 deterministic hash split: md5-bucket of the row key -> "
        "train/test, pure projection (no shuffle, no seed state) — the "
        "100 TB split idiom, engine-independently reproducible.",
    tags=("E7",),
)
def hash_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    split = E.hash_split(orders, "o_orderkey", {"train": 0.8, "test": 0.2})
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_totalprice"),
    )


@register(
    "stratified_split_exact",
    oracle="""
    WITH l AS (
      SELECT event_id, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ), r AS (
      SELECT label, value,
             ROW_NUMBER() OVER (
               PARTITION BY label
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY label) AS n
      FROM l
    )
    SELECT label,
           CASE WHEN rn <= CEIL(n * 0.8) THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM r GROUP BY label, split
    """,
    doc="E7 exact-proportion stratified split: per-label row_number over "
        "a deterministic md5 ordering, first ceil(0.8*n) rows = train "
        "(reference train_test_split(stratify=y), cms_preprocess.py:364).",
    tags=("E7", "D2"),
)
def stratified_split_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_id", "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    split = E.stratified_split_exact(labeled, "label", "event_id", 0.8)
    return split.groupBy("label", "split").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@register(
    "mhe_vectors",
    oracle="""
    WITH vocab AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS INTEGER) AS cat_idx
      FROM (SELECT DISTINCT event_type FROM events)
    ), n AS (
      SELECT COUNT(*) AS n_cats FROM vocab
    ), cells AS (
      SELECT DISTINCT e.user_id,
             CAST((dayofyear(e.ts) - 1) * n.n_cats + v.cat_idx AS INTEGER)
               AS mhe_idx
      FROM events e
      JOIN vocab v USING (event_type)
      CROSS JOIN n
    )
    SELECT user_id,
           CAST(COUNT(*) AS INTEGER) AS n_active,
           STRING_AGG(CAST(mhe_idx AS VARCHAR), ',' ORDER BY mhe_idx) AS idx_csv
    FROM cells GROUP BY user_id
    """,
    doc="E4 model-ready tier: one SparseVector(366*|vocab|) per user "
        "packed by an Arrow-batched pandas UDF from the sparse index "
        "set. The driver-checked surface decodes the vector back to its "
        "active-index list JVM-side (vector_to_array + higher-order "
        "filter) and canonicalizes it to a comma-joined string, so the "
        "oracle pins the exact vector content — indices, order, count — "
        "not just row shape (r5; previously rows-only).",
    tags=("E4",),
)
def mhe_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vecs = E.mhe_sparse_vectors(ev, ["user_id"], "ts", "event_type")
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array("features")
    idxs = F.filter(
        F.transform(arr, lambda x, i: F.when(x != 0, i)),
        lambda v: v.isNotNull(),
    )
    return vecs.select(
        "user_id",
        F.size(idxs).alias("n_active"),
        F.array_join(F.transform(idxs, lambda i: i.cast("string")), ",").alias(
            "idx_csv"
        ),
    )


@register(
    "seeded_sample_split",
    oracle=None,  # Spark-seeded Bernoulli sampling -> rows-only check
    doc="E7 seeded stratified split (sampleBy + left-anti complement), "
        "reference random_state=42 parity tier; returns per-(label, "
        "split) counts.",
    tags=("E7",),
)
def seeded_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.select(
        "event_id", "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    train, test = E.stratified_sample_split(labeled, "label", "event_id", 0.8, seed=42)
    t = train.groupBy("label").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "split", F.lit("train")
    )
    s = test.groupBy("label").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "split", F.lit("test")
    )
    return t.unionByName(s)


@register(
    "occurrence_vectors_cv",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ), dt AS (
      SELECT DISTINCT doc_id, token FROM toks
    ), v AS (
      SELECT CAST(COUNT(DISTINCT token) AS INTEGER) AS vocab_size FROM dt
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_active,
           (SELECT vocab_size FROM v) AS vocab_size,
           STRING_AGG(token, ',' ORDER BY token) AS token_csv
    FROM dt GROUP BY doc_id
    """,
    doc="E1 sparse tier: CountVectorizer(binary=True) multi-hot "
        "occurrence vectors over document tokens (replaces the "
        "reference's O(n*|vocab|) np.isin loop, cms_preprocess.py:232). "
        "CountVectorizer orders its vocabulary by frequency (untestable "
        "across engines), so the driver-checked surface maps each "
        "vector's active indices back to their *tokens* via a broadcast "
        "join with the fitted vocabulary and canonicalizes the sorted "
        "token set to a comma-joined string — vocabulary-order-free, so "
        "a DuckDB oracle can pin the exact per-doc vector content (r5; "
        "previously rows-only).",
    tags=("E1", "D3"),
)
def occurrence_vectors_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("codes")
    )
    # Cap far above any realistic doc-token vocabulary so membership is
    # deterministic (the truncated top-N tie-break would not be).
    model, out = E.binary_occurrence_vectors(toks, "codes", vocab_size=1 << 18)
    from pyspark.ml.functions import vector_to_array

    vocab_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            list(enumerate(model.vocabulary)), "idx INT, token STRING"
        )
    )
    arr = vector_to_array("features")
    idxs = F.filter(
        F.transform(arr, lambda x, i: F.when(x != 0, i)),
        lambda v: v.isNotNull(),
    )
    active = out.select(
        "doc_id", F.explode(idxs).alias("idx")
    ).join(vocab_df, "idx")
    return active.groupBy("doc_id").agg(
        F.size(F.collect_set("token")).alias("n_active"),
        F.lit(len(model.vocabulary)).alias("vocab_size"),
        F.array_join(F.sort_array(F.collect_set("token")), ",").alias("token_csv"),
    )


@register(
    "source_mixture_sample",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_docs,
             (SELECT MIN(n_docs) FROM c) / CAST(n_docs AS DOUBLE) AS w
      FROM c
    ), s AS (
      SELECT d.source, COUNT(*) AS k
      FROM (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents) d
      JOIN w USING (source)
      WHERE (({_H16}) / 65536.0) < w.w
      GROUP BY d.source
    )
    SELECT w.source, w.n_docs, ROUND(w.w, 6) AS weight,
           CAST(COALESCE(s.k, 0) AS BIGINT) AS n_sampled
    FROM w LEFT JOIN s USING (source)
    """,
    doc="Deterministic source-mixture rebalance: every source "
        "downsampled to the smallest via the seedless md5 fraction — "
        "the data-mixing step of a pretraining pipeline; scan + "
        "broadcast weight table + filter, no fact-side shuffle.",
    tags=("encoder", "sampling"),
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sampled, weights = E.mixture_sample(docs, "source", "doc_id")
    per_src = sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    return weights.join(per_src, "source", "left").select(
        "source",
        F.col("__n").alias("n_docs"),
        F.round("__w", 6).alias("weight"),
        F.coalesce("n_sampled", F.lit(0)).cast("bigint").alias("n_sampled"),
    )
