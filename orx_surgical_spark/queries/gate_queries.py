"""Deterministic quality-gate wrappers for the seeded/sketched queries.

The five ``panel_ann`` members (ANN top-k, MLlib MinHash pairs, seeded
Bernoulli split, HLL/KLL sketches) produce outputs that depend on
JVM-internal seeds or sketch internals, so no SQL oracle can replay
their raw rows. But their *quality* is deterministic: recall against
the exact-cosine ground truth, pair recall against the deterministic
banded-LSH pipeline, split fractions against their sampling bands,
sketch values against exact aggregates. Each wrapper here re-runs the
raw seeded query inside the graded path, measures it against its
deterministic ground truth (also computed in-plan — no collects), and
emits only deterministic columns: exact counts any SQL engine can
recompute plus pass/fail booleans the DuckDB oracle expects to be
uniformly true.

So where the r5 driver could only count panel_ann's rows, the r6 panel
hash now breaks on ANY quality regression — recall below floor, split
fraction out of band, sketch outside its error band (VERDICT r5 "Next
round" item 4).

Floors/bands are calibrated against measured values at both graded SFs
(r6 probe; margins noted per wrapper) and double-pinned by
``tests/test_ann_invariants.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.queries.catalog import REGISTRY, register
from orx_surgical_spark.sources import load_table

#: measured recall with the r12 input-derived effort (ivf_effort:
#: sqrt(n) lists, probe width min(n_centroids, 24)):
#: 1.0/1.0/0.94/1.0/1.0/1.0 at sf0.001-sf10 — worst probed scale 0.94
#: clears the floor by 0.24. A fully broken probe path degenerates to
#: ~scan fraction (<=0.53 at sf0.1 and decaying with scale).
_IVF_FLOOR = 0.7
#: measured 0.92 / 0.98 — floor well above a broken-bucketing ~0.
_LSH_FLOOR = 0.8
#: measured 1.0 / 0.98 at the graded SFs (0.86 / 0.80 at the sf0.1 /
#: sf1 soak scales, where the gate also runs) — floor clears the worst
#: probed scale with margin while staying far above a broken-graph ~0.
_GRAPH_FLOOR = 0.6
#: measured 0.98 / 1.0 at the graded SFs, 0.9 at sf0.1, with the
#: sqrt(n)-derived rerank shortlist; a broken shortlist/LUT collapses
#: to ~k/n. Same floor discipline as the graph tier.
_PQ_FLOOR = 0.6
#: measured 1.0 at both SFs against the banded-LSH verified pairs.
_MINHASH_FLOOR = 0.9
_JACCARD_THRESHOLD = 0.7
#: 0.8 target fraction; worst measured 0.856 (n=202 at sf0.001, ~2
#: sigma of Bernoulli noise) — band is ±3.5 sigma at the smallest
#: graded stratum, far from the 0.5/1.0 failure modes.
_FRAC_LO, _FRAC_HI = 0.70, 0.90
#: HLL rsd defaults to 0.05; worst measured 0.007.
_USERS_REL_ERR = 0.15


def _ann_recall_fn(raw_name: str, method: str, floor: float):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        exact = REGISTRY["cosine_topk"].fn(spark, sf_dir).select(
            "query_id", "neighbor_id"
        )
        approx = REGISTRY[raw_name].fn(spark, sf_dir).select(
            "query_id", "neighbor_id", F.lit(1).alias("hit")
        )
        per_q = (
            exact.join(approx, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.avg(F.coalesce(F.col("hit"), F.lit(0))).alias("recall"))
        )
        return per_q.agg(
            F.avg("recall").alias("r"), F.count(F.lit(1)).alias("nq")
        ).select(
            F.lit(method).alias("method"),
            F.lit(5).alias("k"),
            F.col("nq").cast("bigint").alias("n_queries"),
            F.lit(floor).alias("recall_floor"),
            (F.coalesce(F.col("r"), F.lit(0.0)) >= floor).alias("meets_floor"),
        )

    return fn


_ANN_ORACLE = """
    SELECT '{method}' AS method, 5 AS k,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           {floor} AS recall_floor, TRUE AS meets_floor
    FROM embeddings WHERE vec_id < 10
"""


def _minhash_pair_recall_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = (
        REGISTRY["lsh_verified_pairs"].fn(spark, sf_dir)
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .select("id_a", "id_b")
    )
    found = REGISTRY["mllib_minhash_pairs"].fn(spark, sf_dir).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.lit(1).alias("hit"),
    ).distinct()
    return (
        truth.join(found, ["id_a", "id_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.avg(F.coalesce(F.col("hit"), F.lit(0))).alias("recall"),
        )
        .select(
            F.col("n_true_pairs").cast("bigint"),
            F.lit(_JACCARD_THRESHOLD).alias("jaccard_threshold"),
            F.lit(_MINHASH_FLOOR).alias("recall_floor"),
            # no true pairs at this SF -> vacuously true
            (F.coalesce(F.col("recall"), F.lit(1.0)) >= _MINHASH_FLOOR).alias(
                "meets_floor"
            ),
        )
    )


@register(
    "sample_split_bands",
    oracle=f"""
    SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           {_FRAC_LO} AS frac_lo, {_FRAC_HI} AS frac_hi,
           TRUE AS train_frac_in_band
    FROM events GROUP BY 1
    """,
    doc="Quality gate over seeded_sample_split (E7 sampleBy tier): "
        "per-label totals are deterministic; the seeded train fraction "
        "must sit inside the +-3.5-sigma sampling band around 0.8.",
    tags=("E7", "gate"),
)
def sample_split_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = REGISTRY["seeded_sample_split"].fn(spark, sf_dir)
    agg = raw.groupBy("label").agg(
        F.sum("n").alias("n_total"),
        F.sum(F.when(F.col("split") == "train", F.col("n")).otherwise(0)).alias(
            "n_train"
        ),
    )
    frac = F.col("n_train") / F.col("n_total")
    return agg.select(
        F.col("label").cast("int"),
        F.col("n_total").cast("bigint"),
        F.lit(_FRAC_LO).alias("frac_lo"),
        F.lit(_FRAC_HI).alias("frac_hi"),
        ((frac >= _FRAC_LO) & (frac <= _FRAC_HI)).alias("train_frac_in_band"),
    )


@register(
    "sketch_error_bands",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_err_ok,
           TRUE AS median_in_rank_band,
           TRUE AS p99_in_rank_band
    FROM events GROUP BY event_type
    """,
    doc="Quality gate over sketch_aggregates: HLL distinct within 15% "
        "relative error of the exact count (rsd default 5%, worst "
        "measured 0.7%); approx quantiles inside exact rank bands "
        "(median within [p40, p60] values, p99 within [p95, max]) — "
        "the guarantee approx sketches actually make is rank error, so "
        "the band is rank-based, not value-based.",
    tags=("sketch", "gate"),
)
def sketch_error_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = REGISTRY["sketch_aggregates"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("percentile(value, array(0.40, 0.60, 0.95))").alias("p"),
        F.max("value").alias("v_max"),
    )
    j = sk.join(exact, "event_type")
    users_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
    ) <= _USERS_REL_ERR
    med_ok = (F.col("approx_median") >= F.col("p")[0]) & (
        F.col("approx_median") <= F.col("p")[1]
    )
    p99_ok = (F.col("approx_p99") >= F.col("p")[2]) & (
        F.col("approx_p99") <= F.col("v_max")
    )
    return j.select(
        "event_type",
        F.col("exact_users").cast("bigint"),
        users_ok.alias("users_err_ok"),
        med_ok.alias("median_in_rank_band"),
        p99_ok.alias("p99_in_rank_band"),
    )


@register(
    "hll_union_bands",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_shards,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_err_ok
    FROM events GROUP BY event_type
    """,
    doc="Quality gate over hll_shard_union: the per-type shard count "
        "must EXACTLY match the oracle's distinct-day count (the merge "
        "saw every shard), and the merged HLL estimate must sit within "
        "15% relative error of the exact distinct-user count "
        "(DataSketches lgConfigK=12 => ~1.6% rse; worst measured well "
        "under the band).",
    tags=("sketch", "gate"),
)
def hll_union_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = REGISTRY["hll_shard_union"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    j = sk.join(exact, "event_type")
    ok = (
        F.abs(F.col("merged_users") - F.col("exact_users"))
        / F.col("exact_users")
    ) <= _USERS_REL_ERR
    return j.select(
        "event_type",
        F.col("n_shards").cast("bigint"),
        F.col("exact_users").cast("bigint"),
        ok.alias("merged_err_ok"),
    )


def _register_gates() -> None:
    for name, raw, method, floor in (
        ("ann_ivf_recall", "ann_ivf_topk", "ivf_kmeans", _IVF_FLOOR),
        ("ann_lsh_recall", "ann_lsh_topk", "rp_lsh", _LSH_FLOOR),
        ("ann_graph_recall", "ann_graph_topk", "knn_graph_beam", _GRAPH_FLOOR),
        ("ann_pq_recall", "ann_pq_topk", "pq_adc_rerank", _PQ_FLOOR),
    ):
        register(
            name,
            oracle=_ANN_ORACLE.format(method=method, floor=floor),
            doc=(
                f"Quality gate over {raw}: mean recall@5 against the exact "
                "cosine_topk ground truth (computed in-plan, equi-joins "
                f"only) must clear the {floor} floor; n_queries and the "
                "floor are the deterministic columns, the boolean is the "
                "gate."
            ),
            tags=("similarity", "ann", "gate"),
        )(_ann_recall_fn(raw, method, floor))

    # The minhash gate's oracle embeds the deterministic banded-LSH
    # pipeline's own oracle as its ground truth (registered by
    # dedup_queries, imported before this module — order matters).
    truth_oracle = REGISTRY["lsh_verified_pairs"].oracle
    assert truth_oracle
    register(
        "minhash_pair_recall",
        oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
           {_JACCARD_THRESHOLD} AS jaccard_threshold,
           {_MINHASH_FLOOR} AS recall_floor,
           TRUE AS meets_floor
    FROM (
    {truth_oracle}
    ) __truth WHERE jaccard >= {_JACCARD_THRESHOLD}
    """,
        doc=(
            "Quality gate over mllib_minhash_pairs: recall of the seeded "
            "MLlib MinHashLSH pair set against the deterministic "
            "banded-LSH verified pairs at jaccard >= "
            f"{_JACCARD_THRESHOLD} (measured 1.0 at both graded SFs; "
            f"floor {_MINHASH_FLOOR})."
        ),
        tags=("dedup", "minhash", "gate"),
    )(_minhash_pair_recall_fn)


_register_gates()


@register(
    "heavy_hitters_mg",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), ex AS (
      SELECT term, COUNT(*) AS exact_cnt FROM tok
      WHERE term <> '' GROUP BY term
    )
    SELECT term, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           TRUE AS no_overcount, TRUE AS underest_within_slack
    FROM ex ORDER BY exact_cnt DESC, term LIMIT 10
    """,
    doc="Quality gate over the mergeable Misra-Gries heavy-hitters "
        "sketch (operators/sketches.py): for the top-10 exact corpus "
        "tokens, the summed counter never exceeds the exact count and "
        "undershoots it by at most the summed per-partition eviction "
        "slack — the MG guarantee, which holds for ANY partitioning, "
        "so the booleans are deterministic even though the sketch "
        "contents are not. k=8 counters against a ~35-term vocabulary "
        "forces real evictions (slack > 0) at every SF.",
    tags=("sketch", "gate"),
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    from orx_surgical_spark.operators import sketches as SK
    from orx_surgical_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("term")).where(
        F.col("term") != ""
    )
    # Referenced twice (slack total + per-key estimates): checkpoint
    # the <= (k+1)*n_partitions summary rows, not the token stream.
    sk = SK.mg_heavy_hitters(toks, "term", k=8).localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY
    )
    total_slack = sk.agg(F.sum("slack")).first()[0]
    ests = (
        sk.where(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("est").alias("est"))
    )
    # The gate needs ground truth; production consumers use the sketch
    # alone. Exact top-10 is the deterministic row-set selector.
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("term")).limit(10)
    return (
        top.join(F.broadcast(ests), "term", "left")
        .na.fill({"est": 0})
        .select(
            "term",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            (F.col("est") <= F.col("exact_cnt")).alias("no_overcount"),
            (
                (F.col("exact_cnt") - F.col("est"))
                <= F.lit(int(total_slack))
            ).alias("underest_within_slack"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
    )
