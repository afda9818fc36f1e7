"""Similarity search over embedding columns (beyond-reference tier).

Two paths:

- **Brute-force cosine top-k** — exact baseline: broadcast the query
  set, compute cosine via JVM-side ``zip_with``/``aggregate`` (no
  Python), window top-k per query. Correct at any corpus size when the
  query set is small (the corpus side streams; only a k-row-per-query
  result shuffles).
- **LSH-bucketed ANN** — MLlib ``BucketedRandomProjectionLSH`` over
  L2-normalized vectors (Euclidean distance on unit vectors is a
  monotone transform of cosine: d^2 = 2 - 2*cos). The 100 TB path:
  candidate generation touches only matching hash buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, fully JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` is broadcast (it must be the small side); the corpus is
    scanned once — no corpus self-shuffle. Output: (query_id,
    neighbor_id, sim, rn), sim rounded to 6 dp, ties broken by
    neighbor id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def knn_label_vote(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification of each query vector (ties by
    smaller label). Output: (query_id, pred_label, votes)."""
    topk = cosine_topk(corpus, queries, k, id_col, vec_col)
    labeled = topk.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nlabel")
        ),
        on="neighbor_id",
    )
    votes = labeled.groupBy("query_id", "nlabel").agg(
        F.count(F.lit(1)).alias("votes")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nlabel").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("nlabel").alias("pred_label"), "votes")
    )


def ann_lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bucket_length: float = 0.5, num_hash_tables: int = 4,
) -> DataFrame:
    """Approximate top-k neighbors via BucketedRandomProjectionLSH over
    L2-normalized vectors (unit-sphere Euclidean == monotone cosine).

    Rows-only checkable (MLlib's random projections are seeded
    JVM-internal). Output: (query_id, neighbor_id, dist, rn).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(out_id),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("__raw"),
        )
        return Normalizer(inputCol="__raw", outputCol="features", p=2.0).transform(
            v
        ).drop("__raw")

    c = prep(corpus, "neighbor_id")
    q = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=42,
    )
    model = lsh.fit(c)
    # Distance threshold 2.0 covers the whole unit sphere; LSH pruning
    # still restricts comparisons to matching buckets.
    pairs = model.approxSimilarityJoin(q, c, 2.0, distCol="dist")
    scored = pairs.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.neighbor_id").alias("neighbor_id"),
        F.round("dist", 6).alias("dist"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
