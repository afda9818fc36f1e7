"""Similarity-search catalog queries (beyond-reference tier) over the
``embeddings`` table (``vec_id, embedding: array<float>, label``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators import similarity as S
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table

_TOPK_CTE = """
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings
    ), s AS (
      SELECT query_id, neighbor_id,
             ROUND(list_cosine_similarity(qv, cv), 6) AS sim
      FROM q CROSS JOIN c
      WHERE neighbor_id != query_id
    ), r AS (
      SELECT query_id, neighbor_id, sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id
             ) AS INTEGER) AS rn
      FROM s
    )
"""


@register(
    "cosine_topk",
    oracle=_TOPK_CTE + """
    SELECT query_id, neighbor_id, sim, rn FROM r WHERE rn <= 5
    """,
    doc="Exact brute-force cosine top-5 neighbors for 10 query vectors: "
        "broadcast queries, one corpus scan, JVM-side zip_with dot "
        "product, window top-k. The exact ANN baseline.",
    bench=True,
    tags=("similarity",),
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.cosine_topk(emb, queries, k=5)


@register(
    "knn_label_vote",
    oracle=_TOPK_CTE + """
    , labeled AS (
      SELECT r.query_id, e.label AS nlabel
      FROM r JOIN embeddings e ON r.neighbor_id = e.vec_id
      WHERE r.rn <= 5
    ), votes AS (
      SELECT query_id, nlabel, CAST(COUNT(*) AS BIGINT) AS votes
      FROM labeled GROUP BY query_id, nlabel
    ), best AS (
      SELECT query_id, nlabel, votes,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY votes DESC, nlabel
             ) AS rn
      FROM votes
    )
    SELECT query_id, nlabel AS pred_label, votes FROM best WHERE rn = 1
    """,
    doc="k-NN majority-vote classification over the cosine top-5 "
        "(embedding-similarity labeling for data curation).",
    tags=("similarity", "knn"),
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.knn_label_vote(emb, queries, k=5)


@register(
    "ann_lsh_topk",
    oracle=None,  # MLlib random projections are JVM-seeded -> rows-only
    doc="Approximate top-k neighbors via BucketedRandomProjectionLSH on "
        "L2-normalized vectors — the bucketed candidate-generation path "
        "for corpus-x-corpus similarity at 100 TB (rows-only check).",
    tags=("similarity", "ann", "mllib"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ann_lsh_topk(emb, queries, k=5)
