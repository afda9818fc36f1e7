"""Similarity-search catalog queries (beyond-reference tier) over the
``embeddings`` table (``vec_id, embedding: array<float>, label``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators import clustering as CL
from orx_surgical_spark.operators import similarity as S
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table
from orx_surgical_spark.sources.readers import ensure_min_partitions

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
    # No forced fan-out: the matmul scorer does trivial per-row work
    # (one BLAS call per Arrow batch), so extra partitions only add
    # Python-worker spin-up; at scale the scan's natural splits fan out.
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
    emb = load_table(spark, sf_dir, "embeddings")  # matmul path: no fan-out
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
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ann_lsh_topk(emb, queries, k=5)


_NEARDUP_BASE = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
"""


@register(
    "semantic_dedup_keep",
    oracle=_NEARDUP_BASE + """
    , blocked AS (
      SELECT vec_id, v,
             CAST(v[1] >= 0 AS INTEGER) || CAST(v[2] >= 0 AS INTEGER)
               || CAST(v[3] >= 0 AS INTEGER) || CAST(v[4] >= 0 AS INTEGER) AS block
      FROM e
    ), drops AS (
      SELECT DISTINCT b.vec_id
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    )
    SELECT CAST(e.vec_id AS BIGINT) AS vec_id
    FROM e WHERE e.vec_id NOT IN (SELECT vec_id FROM drops)
    """,
    doc="SemDeDup-style embedding dedup: within-block cosine pairs "
        "(per-block BLAS Gram) -> greedy keep-lowest-id rule -> kept "
        "vector ids. The published recipe's k-means clusters become "
        "the deterministic sign-LSH block, so the whole pipeline is "
        "engine-replayable and oracle-checked.",
    tags=("similarity", "dedup", "embedding", "semdedup"),
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    return S.semantic_dedup_keep(emb, threshold=0.35, block_bits=4)


@register(
    "embedding_neardup_exact",
    oracle=_NEARDUP_BASE + """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    """,
    doc="Embedding-cosine near-duplicate pairs, exact all-pairs baseline "
        "(dedup ladder, embedding tier). Quadratic — small corpora / "
        "verification only; the scale path is the blocked variant.",
    tags=("similarity", "dedup", "embedding"),
)
def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    return S.embedding_neardup_pairs(emb, threshold=0.35, block_bits=0)


@register(
    "embedding_neardup_blocked",
    oracle=_NEARDUP_BASE + """
    , blocked AS (
      SELECT vec_id, v,
             CAST(v[1] >= 0 AS INTEGER) || CAST(v[2] >= 0 AS INTEGER)
               || CAST(v[3] >= 0 AS INTEGER) || CAST(v[4] >= 0 AS INTEGER) AS block
      FROM e
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM blocked a JOIN blocked b
      ON a.block = b.block AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    """,
    doc="Embedding near-dup with sign-prefix blocking (4 axis-aligned "
        "hyperplane bits): one shuffle on the block key, cross-bucket "
        "pairs never materialized — the 100 TB shape. Within-block "
        "engine is the per-block BLAS Gram matrix "
        "(similarity.embedding_neardup_pairs_gram, 29x the expression "
        "variant at sf1; pair-for-pair parity asserted in "
        "tests/test_ann_invariants.py). Deterministic, so "
        "oracle-checked.",
    bench=True,
    tags=("similarity", "dedup", "embedding"),
)
def embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No ensure_min_partitions here (r11): the plan's first real step is
    # the groupBy(block) shuffle, which redistributes regardless — a
    # pre-repartition only adds a full-corpus exchange, and it turns the
    # small-corpus cutover's count() probe from a parquet-footer read
    # into a shuffle job (measured at sf3: 2.8 s -> 1.4 s removing it).
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_neardup_pairs_gram(emb, threshold=0.35, block_bits=4)


@register(
    "ann_ivf_topk",
    oracle=None,  # KMeans centroids are MLlib-seeded -> rows-only check
    doc="IVF-style ANN top-k: coarse KMeans inverted lists, brute-force "
        "only within each query's nearest probed lists (the classic IVF "
        "trade: touch ~n_probe/n_centroids of the corpus per query). "
        "Both knobs derive from a one-count corpus census "
        "(similarity.ivf_effort, r12 — the fixed 3-of-8 probe measured "
        "recall@5 0.62-0.72 at the small corpora): sqrt(n) lists, probe "
        "width min(n_centroids, max(24, 1536-candidate floor)), i.e. a "
        "candidate pool whose corpus fraction DECAYS with scale (5.4% "
        "at sf10, 0.076% at 1e9 rows). Below the crossover where the "
        "derived probe covers half the lists (n <~2.3k) the serve cuts "
        "over to exact cosine_topk (r13 — a coarse quantizer cannot "
        "prune enough there to pay for its recall loss; FAISS's "
        "IndexFlat line). Measured recall@5 1.0 at every probed SF "
        "sf0.001-sf10 (ANN_RECALL_r13.json) — clears the 0.7 "
        "ann_ivf_recall floor everywhere with margin.",
    tags=("similarity", "ann", "ivf"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ann_ivf_topk(emb, queries, k=5)


@register(
    "ann_graph_topk",
    oracle=None,  # bounded-round beam search -> gate-covered, rows-only
    doc="Graph-refined ANN top-k (r9): beam search over a deterministic "
        "kNN graph (multi-round sign-block BLAS Gram build, symmetrized, "
        "degree-capped) — the HNSW/DiskANN-family serve tier batched per "
        "hop over all queries. Fully deterministic (no MLlib seeds); "
        "build rounds / beam / hops / entry set derive from corpus size "
        "(similarity.knn_graph_effort, r11 — the r10 fixed parameters "
        "decayed recall through the 0.6 floor at sf10: measured "
        "1.0/0.98/0.86/0.80/0.38 at sf0.001/0.01/0.1/1/10 fixed vs 1.00 "
        "at sf10 derived; graded SFs are the s=0 notch, bit-identical "
        "to r10). Gated by ann_graph_recall. Build: n_rounds block "
        "shuffles + one degree-cap shuffle; serve: frontier-sized "
        "equi-joins only, bounded hops.",
    tags=("similarity", "ann", "graph"),
)
def ann_graph_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ann_graph_topk(emb, queries, k=5, m=12)


@register(
    "ann_pq_topk",
    oracle=None,  # 8 chained Lloyd fits + ADC -> gate-covered, rows-only
    doc="Product-quantization ANN top-k (r10, Jegou et al. TPAMI 2011 "
        "ADC+R): per-subspace engine-exact Lloyd codebooks (integer "
        "micro-units, id-order init — deterministic, no MLlib seeds), "
        "map-only encode to 8 codes/vector (~32x compression), serve "
        "by broadcast per-query BIGINT distance LUTs + a sqrt(n)-sized "
        "exact-rerank shortlist. Measured recall@5 0.98/1.0/0.9 at "
        "sf0.001/0.01/0.1, gated by ann_pq_recall (floor 0.6). At "
        "100 TB composes with IVF probe lists (IVF-ADC).",
    tags=("similarity", "ann", "pq"),
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 10)
    return S.pq_topk(emb, queries, k=5, n_subspaces=8, n_centroids=16, iters=2)


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH t AS (
      -- widen to f64 FIRST: Spark's lambda arithmetic runs in double
      -- (float operands widen), while DuckDB would otherwise keep the
      -- whole expression tree in float32
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))) / 127.0 AS scale
      FROM embeddings
    ), qd AS (
      SELECT vec_id, emb, scale,
             CASE WHEN scale = 0
                  THEN list_transform(emb, x -> CAST(0 AS TINYINT))
                  ELSE list_transform(emb, x -> CAST(
                         GREATEST(-127, LEAST(127,
                           FLOOR(x / scale + 0.5))) AS TINYINT))
             END AS q
      FROM t
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           -- serialized: the driver's comparator is only proven on
           -- scalar columns (panels serialize for the same reason)
           array_to_string(q, ',') AS q,
           ROUND(SQRT(list_sum(list_transform(
                   range(1, len(emb) + 1),
                   i -> POW(emb[i] - q[i] * scale, 2)))
                 / len(emb)), 6) AS rmse
    FROM qd
    """,
    doc="Symmetric per-vector int8 quantization of the embedding "
        "corpus: scale, quantized values (bit-reproducible round-half-"
        "up), per-vector reconstruction RMSE — the 4x storage shrink "
        "for a 100 TB embedding corpus, map-only.",
    tags=("similarity", "embedding"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.quantize_int8(emb, "embedding", "vec_id", serialize_q=True)


@register(
    "random_projection_embed",
    oracle=S.rp_oracle_sql(64, 16),
    doc="Achlioptas sparse random projection (JL dimensionality "
        "reduction, 64 -> 16): each output dim is a codegen sum of "
        "~in_dim/3 sign terms in pinned ascending order, scaled by "
        "sqrt(3/out_dim); map-only, no shuffle, no Python. The matrix "
        "is derived from md5(seed:j:d) in plain hashlib, so the Spark "
        "plan and the DuckDB oracle are generated from the SAME Python "
        "constant. Components canonicalize to integer micro-units and "
        "the norm is recomputed from the micros, so the value hash is "
        "engine-exact.",
    tags=("similarity", "embedding", "projection"),
)
def random_projection_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    return S.random_projection(emb, in_dim=64, out_dim=16)


@register(
    "kmeans_clusters",
    oracle=CL.kmeans_oracle_sql(k=4, iters=3, dim=64),
    doc="Engine-exact distributed Lloyd k-means (k=4, 3 iterations) "
        "over the embedding corpus — no MLlib: integer micro-unit "
        "arithmetic, lowest-id init, lowest-cid tie break, rounded-"
        "mean updates, empty-cluster carry-over, all pinned so the "
        "generated DuckDB oracle replays every iteration bit-for-bit "
        "(operators/clustering.py has the determinism contract). Per "
        "iteration: one map-only codegen assignment with the k "
        "centroids compiled as literals + one partial-agg groupBy "
        "emitting <= k rows per task; the final assignment plan is "
        "map-only with zero shuffles. The hash therefore proves the "
        "full iterative fit, not just a projection — the value-checked "
        "dual of the gate-checked MLlib IVF tier.",
    tags=("similarity", "clustering", "embedding"),
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    return CL.kmeans_lloyd(emb, k=4, iters=3)


@register(
    "principal_projection",
    oracle=S.power_iteration_oracle_sql(dim=64, iters=3),
    doc="Engine-exact distributed power iteration: 3 integer power "
        "steps on the exact micro-unit Gram matrix of the embedding "
        "corpus, then every vector's integer projection onto the "
        "dominant direction — the PCA primitive (whitening prep, "
        "dominant-topic direction, drift monitoring) at the same "
        "determinism tier as the Lloyd k-means: quantize HALF_UP, ONE "
        "single-pass aggregate builds the exact integer Gram (d(d+1)/2 "
        "longs of map-side partial state), and the per-step max-abs "
        "renormalization rounds the exact integer RATIO — no IEEE "
        "division anywhere, so the generated unrolled oracle "
        "(power_iteration_oracle_sql) replays every step bit-for-bit. "
        "The projection pass is map-only with the component compiled "
        "in as literals.",
    tags=("similarity", "pca"),
)
def principal_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    _, proj = S.power_iteration_component(emb, dim=64, iters=3)
    return proj
