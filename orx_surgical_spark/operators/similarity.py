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

    ``queries`` must be the small side (collected + shipped to every
    corpus partition — same bound as a broadcast); the corpus is
    scanned once, no corpus self-shuffle. Each Arrow batch is scored
    with ONE BLAS matmul (``C_norm @ Q_norm.T``) and reduced to a
    per-batch partial top-k, so only ``batches x |Q| x k`` candidate
    rows reach the global top-k window. The matmul replaces an
    interpreted ``zip_with``/``aggregate`` HOF per pair — Catalyst does
    not codegen lambda HOFs, which made the dot product the whole
    query's cost at bench scale (~150x off a native engine).

    ``id_col`` must be integral. Output: (query_id, neighbor_id, sim,
    rn), sim rounded half-away to 6 dp *before* top-k selection so tie
    handling matches the rounded values the caller compares, ties
    broken by neighbor id.

    Per-invocation floor (r11, VERDICT r10 stretch probe): every call
    re-collects the query vectors (one bounded job, filter pushed to
    the scan) and re-broadcasts the matrix before the scoring job —
    TWO Spark jobs plus a Python-worker spin-up per run by design,
    since memoizing either would let a bench lap reuse state the
    driver's first call must pay for. Against an embedded engine's
    sub-ms dispatch that two-job floor dominates the sub-second
    absolute wall at every probed SF; there is no per-run re-planning
    of the corpus side beyond it.
    """
    import numpy as np

    qrows = (
        queries.select(
            F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")
        ).collect()
    )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = corpus.sparkSession.sparkContext.broadcast((qids, qmat))

    def score(batches):
        import numpy as np
        import pandas as pd

        qids_, qmat_ = bq.value
        nq = len(qids_)
        for pdf in batches:
            if pdf.empty:
                continue
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cmat = np.stack(pdf["__cv"].to_numpy()).astype(np.float64, copy=False)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ qmat_.T  # (batch, nq)
            # SQL ROUND semantics (half away from zero), applied BEFORE
            # selection so boundary ties resolve on the emitted values.
            sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            sims[nids[:, None] == qids_[None, :]] = -np.inf  # self-match
            take = min(k, len(nids))
            out_q, out_n, out_s = [], [], []
            for j in range(nq):
                order = np.lexsort((nids, -sims[:, j]))[:take]
                keep = order[np.isfinite(sims[order, j])]
                out_q.append(np.full(len(keep), qids_[j], dtype=np.int64))
                out_n.append(nids[keep])
                out_s.append(sims[keep, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "sim": np.concatenate(out_s),
                }
            )

    scored = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).mapInPandas(score, "query_id long, neighbor_id long, sim double")
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


def embedding_neardup_pairs(
    corpus: DataFrame, threshold: float = 0.35,
    id_col: str = "vec_id", vec_col: str = "embedding",
    block_bits: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >=
    threshold) — the embedding tier of the dedup ladder.

    ``block_bits = 0`` is the exact all-pairs baseline (corpus joined
    to itself — quadratic, small-corpus only).  ``block_bits = b > 0``
    buckets vectors by the sign pattern of their first ``b`` dimensions
    (deterministic axis-aligned random-hyperplane LSH) and compares
    within buckets only: the join is on the block key, so at 100 TB it
    shuffles each side once and never materializes cross-bucket pairs.
    Sign blocking is the documented approximation: a near-dup pair is
    found iff no blocked dimension straddles zero between the two
    vectors (high-probability for true near-dups, whose dims agree).

    Sizing ``block_bits``: within-block comparison is quadratic in
    block size (~n^2 / 2^b total pair work), so the bit count must
    GROW with the corpus — pick ``b ~ log2(n / target_block)`` for a
    target in-block size (e.g. b=24 puts a 10^9-vector corpus at
    ~60-row blocks). The catalog query pins b=4 because the oracle
    replays the same 4-bit blocking in SQL at the graded SFs; the r6
    sf1 soak (10x vectors, fixed b) measured the expected ~100x pair
    work — the knob, not the shape, is what scales.
    """
    def prep(side: str) -> DataFrame:
        # Precompute the scalar norm once per row, so the per-pair work
        # is one dot product + a divide — not dot + two 64-element norms.
        d = corpus.select(
            F.col(id_col).alias(f"id_{side}"),
            F.col(vec_col).cast("array<double>").alias(f"__v_{side}"),
        ).withColumn(f"__n_{side}", l2_norm(F.col(f"__v_{side}")))
        if block_bits > 0:
            key = F.concat(
                *[
                    (F.element_at(f"__v_{side}", i + 1) >= 0).cast("int").cast("string")
                    for i in range(block_bits)
                ]
            )
            d = d.withColumn("__block", key)
        return d

    a, b = prep("a"), prep("b")
    lt = F.col("id_a") < F.col("id_b")
    if block_bits > 0:
        joined = a.join(b, on=(a["__block"] == b["__block"]) & lt)
    else:
        joined = a.crossJoin(b).filter(lt)
    return (
        joined.select(
            "id_a", "id_b",
            F.round(
                dot(F.col("__v_a"), F.col("__v_b"))
                / (F.col("__n_a") * F.col("__n_b")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_neardup_pairs_gram(
    corpus: DataFrame, threshold: float = 0.35,
    id_col: str = "vec_id", vec_col: str = "embedding",
    block_bits: int = 4, max_block: int = 1024,
    small_cutover: bool = True, cutover_rows: int | None = None,
) -> DataFrame:
    """Blocked embedding near-dup with a per-block BLAS Gram matrix —
    the vectorized verify stage for :func:`embedding_neardup_pairs`.

    Same sign-pattern blocking and identical pair semantics (id_a <
    id_b, cosine >= threshold, cos_sim rounded to 6 dp; asserted
    pair-for-par against the expression variant in
    ``tests/test_ann_invariants.py``), different within-block engine:
    the expression variant compares pairs via Catalyst higher-order
    functions — ~2*d interpreted lambda calls PER PAIR, which at sf1
    (20k vectors, b=4 → ~12M pairs) is the one genuinely
    compute-bound gap in the bench. Here each group becomes ONE
    ``applyInPandas`` task: rows → a (n, d) float matrix, the
    normalized Gram ``X̂ X̂ᵀ`` in one BLAS call, and only the
    entries above threshold come back — the per-pair cost drops from
    interpreted lambdas to a fused dgemm, and nothing but surviving
    pairs crosses Arrow.

    Per-task memory is BOUNDED regardless of block skew: a sign block
    larger than ``max_block`` rows is split into ``nc = ceil(n /
    max_block)`` deterministic sub-chunks (``xxhash64(id) % nc``) and
    its pair work tiles over the ``nc*(nc+1)/2`` chunk pairs — each
    row is shuffled to exactly ``nc`` (block, ci<=cj) groups, diagonal
    groups compute their upper triangle, off-diagonal groups the cross
    Gram, so every within-block pair lands in EXACTLY one task and no
    task ever holds more than ``2*max_block`` rows (a <=max_block²
    Gram tile, ~8 MB at the 1024 default). This is what makes the
    operator survive the boilerplate/replica corpora where sign
    patterns collapse: at sf3 the tiled embeddings put ~30k rows in
    one block — a ~7 GB Gram in a single Python worker before
    chunking (measured: 10.2 s best with 59% run spread), small
    stable tiles after. Tile width is a measured knob (same-session
    best-of-6 at sf3): 4096 was 2-3x worse than 2048; 2048 measured
    best 3.20 s / med-vs-best spread 9%; **1024 measured best 2.44 s
    / spread 4%** (r13) — finer tiles both balance 32 workers against
    straggler waves (the bench quiet gate kept flagging this query's
    20-40% run wobble at every SF) and keep each task's fresh numpy
    allocation inside the page-fault-cheap range.
    Blocks under ``max_block`` take the nc=1 fast path: one group per
    block, zero replication — the sf0.01 plan is unchanged.

    ``cutover_rows`` (default ``2*max_block``) decouples the
    small-corpus cutover from the tile width: a whole corpus of up to
    2048 rows (the graded sf0.1 size) still plans the single-exchange
    direct path — a worst-case single task there holds exactly the
    ``2*max_block`` rows the tiled bound already allows.

    Scale shape: one shuffle on (block, chunk-pair); replication of a
    skewed block grows only with sqrt of its pair count (nc per row).
    Measured at sf1 (20k vectors, b=4, 149k pairs): 21.8 s → 0.75 s
    warm vs the expression variant."""
    key = F.concat(
        *[
            (F.element_at(vec_col, i + 1) >= 0).cast("int").cast("string")
            for i in range(block_bits)
        ]
    )
    blocked = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        key.alias("__block"),
    )
    # Small-corpus cutover (r11, VERDICT r10 item 6): when the WHOLE
    # corpus holds at most ``max_block`` rows, every sign block is
    # provably <= max_block — the census aggregate + broadcast join +
    # explode below would add a second corpus scan and an extra Spark
    # job only to conclude nc=1 everywhere. Skip straight to the
    # single-shuffle groupBy(block) plan instead (constant chunk
    # coordinates keep the Gram kernel's diagonal path and schema
    # identical). The probe is one ``count()`` — an empty-ReadSchema
    # parquet-footer scan when ``corpus`` is table-backed; callers
    # composing heavy upstream transforms can pass
    # ``small_cutover=False`` to stay fully lazy. Measured: recovers
    # the r10 sf0.1 regression (0.41 -> 0.64 s tiled) without touching
    # the sf3+ tiled win — sf0.1's 2000 vectors sit under the 2048
    # default, sf1's 20k go through the census path unchanged.
    if cutover_rows is None:
        cutover_rows = 2 * max_block
    if small_cutover and corpus.count() <= cutover_rows:
        tiled = blocked.select(
            "id",
            "v",
            "__block",
            F.lit(0).alias("__c"),
            F.lit(0).alias("__ci"),
            F.lit(0).alias("__cj"),
        )
        return _neardup_gram_apply(tiled, threshold)
    # Per-block chunk counts: one tiny aggregate (<= 2^block_bits rows,
    # map-side partial combine) broadcast-joined back in — the same
    # lazy census pattern as build_knn_graph. Staying IN-PLAN (r11,
    # advisor r10 medium) fixes two defects of the r10 driver-side
    # collect: the builder no longer triggers a full scan at call time,
    # and a block value absent from the census can't silently NULL out
    # `nc` and drop its rows via explode(sequence(0, NULL-1)) — the
    # left join + coalesce routes any unseen block to the nc=1 path.
    sizes = blocked.groupBy("__block").agg(F.count(F.lit(1)).alias("__n"))
    nc = F.coalesce(
        F.ceil(F.col("__n") / F.lit(max_block)).cast("int"), F.lit(1)
    )
    chunk = F.pmod(F.xxhash64("id"), nc).cast("int")
    tiled = (
        blocked.join(F.broadcast(sizes), "__block", "left")
        .withColumn("__c", chunk)
        .withColumn(
            "__o",
            F.explode(F.sequence(F.lit(0), nc - 1)),
        )
        .select(
            "id",
            "v",
            "__block",
            "__c",
            F.least("__c", "__o").alias("__ci"),
            F.greatest("__c", "__o").alias("__cj"),
        )
    )
    return _neardup_gram_apply(tiled, threshold)


def _neardup_gram_apply(tiled: DataFrame, threshold: float) -> DataFrame:
    """Shared Arrow Gram kernel over (block, ci<=cj) tile groups —
    both the census-tiled plan and the small-corpus direct plan of
    :func:`embedding_neardup_pairs_gram` end here; the input contract
    is columns ``id, v, __block, __c, __ci, __cj`` with every
    within-block pair landing in exactly one (ci, cj) group."""
    import numpy as np
    import pyarrow as pa

    def _pairs(ia, jb, cs) -> "pa.Table":
        lo, hi = np.minimum(ia, jb), np.maximum(ia, jb)
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "cos_sim": pa.array(cs, pa.float64()),
            }
        )

    # Arrow-native kernel (applyInArrow, not applyInPandas): the
    # embedding column arrives as one contiguous list<double> buffer,
    # so the (n, d) matrix is a single reshape — no per-row Python
    # object materialization. The pandas path built every row as a
    # boxed list (np.stack over an object column): ~3x the per-task
    # allocation volume, and the dominant source of the 20-40% run-
    # to-run jitter the bench's quiet gate kept tripping on at sf3.
    def gram(tbl: "pa.Table") -> "pa.Table":
        ci = tbl.column("__ci")[0].as_py()
        cj = tbl.column("__cj")[0].as_py()
        ids = tbl.column("id").to_numpy()
        flat = (
            tbl.column("v").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
        )
        n = len(ids)
        x = flat.reshape(n, flat.size // n)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        xh = x / norms[:, None]
        if ci == cj:
            g = np.round(xh @ xh.T, 6)
            # strict upper triangle: id_a < id_b regardless of
            # within-block row order, every unordered pair once
            keep = g >= threshold
            keep[np.tril_indices(n)] = False
            ii, jj = np.nonzero(keep)
            return _pairs(ids[ii], ids[jj], g[ii, jj])
        c = tbl.column("__c").to_numpy()
        a = c == ci
        b = c == cj
        if not a.any() or not b.any():
            return _pairs(
                np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64),
            )
        g = np.round(xh[a] @ xh[b].T, 6)
        # filter BEFORE materializing index arrays: only surviving
        # entries pay the int64 index cost, not the whole tile
        ii, jj = np.nonzero(g >= threshold)
        return _pairs(ids[a][ii], ids[b][jj], g[ii, jj])

    return tiled.groupBy("__block", "__ci", "__cj").applyInArrow(
        gram, "id_a long, id_b long, cos_sim double"
    )


def semantic_dedup_keep(
    corpus: DataFrame, threshold: float = 0.35,
    id_col: str = "vec_id", vec_col: str = "embedding",
    block_bits: int = 4,
) -> DataFrame:
    """SemDeDup-style embedding-level dedup: keep one representative
    per near-duplicate relation.

    Composition of the blocked near-dup tier: compute within-block
    cosine pairs (:func:`embedding_neardup_pairs_gram` — per-block BLAS
    Gram), then DROP every vector that has a lower-id near-dup
    (``id_b`` endpoints) — the same greedy first-occurrence keep rule
    the paragraph dedup uses, so the rule is engine-replayable in SQL
    (DuckDB oracle replays blocking + pairs + NOT IN).  The published
    SemDeDup recipe clusters with k-means then prunes within clusters;
    here the cluster structure is the deterministic sign-LSH block —
    same shape (bounded within-group quadratic work, one shuffle on
    the group key), no iterative fit in the query path.

    Returns the kept ``(vec_id)`` rows.  Scale: pair work is bounded by
    ``block_bits`` exactly as in the near-dup operator; the drop set is
    tiny (near-dups only) and the final anti-join broadcasts it.
    """
    pairs = embedding_neardup_pairs_gram(
        corpus, threshold, id_col, vec_col, block_bits
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(F.broadcast(drops), id_col, "left_anti").select(
        F.col(id_col).cast("long").alias(id_col)
    )


def ivf_effort(n: int | float) -> dict:
    """Input-derived IVF build/serve effort (VERDICT r11 item 5: the
    fixed ``n_centroids=8 / n_probe=3`` measured recall@5 0.54-0.60 at
    the SMALL corpora — 3-of-8 coarse lists cover 37.5% of a corpus
    whose cluster structure is too weak to concentrate the true
    neighbors — while sitting at 1.0 from sf1 up).

    Same precedent as :func:`knn_graph_effort` and ``pq_topk``'s
    sqrt(n) rerank shortlist: derive both knobs from the corpus size,

        n_centroids = clamp(round(sqrt(n)), 1, min(n, 65536))  (FAISS rule)
        n_probe     = min(n_centroids,
                          max(24, ceil(1536 * n_centroids / n)))

    The ``24`` term is the scale rule (probe fraction 24/sqrt(n) decays
    as the corpus grows: 17% at 20k, 5.4% at 200k, 0.076% at 1e9). The
    ``1536``-candidate floor (r13, VERDICT r12 item 8) fixes the one
    sub-1.0 point in the r12 trend: at n=2k (nlist=45) the fixed 24-cap
    scanned only ~1080 candidates of a corpus whose cluster structure
    is too weak to concentrate neighbors — recall@5 0.94, while
    n_probe=32 (≥1440 candidates) measures 1.0. Guaranteeing
    n_probe * n/n_centroids >= 1536 raises the probe width exactly in
    the small-n crossover zone (full scan below n~1536; n_probe 35 at
    n=2k) and is inert from n=20k up (ceil(1536*141/20000)=11 < 24), so
    the r12 sweep's 1.0 rows at 20k/60k/200k remain the measured truth.
    The floor is a vanishing corpus fraction at scale (1536/n).

    n_centroids never exceeds the corpus size (ADVICE r12: the old
    floor of 4 asked KMeans for more clusters than points on a <4-row
    corpus), with a hard floor of 1.
    """
    import math

    n_int = max(int(n), 1)
    nlist = max(1, min(int(round(math.sqrt(float(n_int)))), n_int, 65536))
    n_probe = min(nlist, max(24, math.ceil(1536 * nlist / n_int)))
    return {"n_centroids": nlist, "n_probe": n_probe}


def build_ivf_index(
    corpus: DataFrame, n_centroids: int | None = 8, id_col: str = "vec_id",
    vec_col: str = "embedding", seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: coarse KMeans centroids + the corpus
    partitioned into inverted lists (one ``centroid_id`` per vector).

    This is the EXPENSIVE half of IVF search (a KMeans fit over the
    corpus + one map-side assignment pass), split out so it can run
    once and be persisted (:func:`save_ivf_index`) while serving runs
    only the cheap probe (:func:`search_ivf_index`) — the vector-
    database build/serve split. Returns ``(centroids, lists)``:
    ``centroids`` is a tiny (n_centroids x dim) broadcastable table,
    ``lists`` carries (neighbor_id, __cv, centroid_id).

    ``n_centroids=None`` derives the list count from a one-aggregate
    corpus census via :func:`ivf_effort` (sqrt(n), the FAISS rule) —
    the r12 default for the catalog path.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_centroids is None:
        n_centroids = ivf_effort(corpus.count())["n_centroids"]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn("features", array_to_vector("__cv"))
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features",
                predictionCol="centroid_id")
    model = km.fit(c)
    lists = model.transform(c).select("neighbor_id", "__cv", "centroid_id")
    centroids = c.sparkSession.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "centroid_id int, __ctr array<double>",
    )
    return centroids, lists


def save_ivf_index(centroids: DataFrame, lists: DataFrame, path: str) -> None:
    """Persist an IVF index as two parquet tables. The inverted lists
    are written partitioned by ``centroid_id``, so a loaded search's
    probe join can partition-prune straight to the probed lists."""
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    lists.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/lists"
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Load a persisted IVF index (see :func:`save_ivf_index`)."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/lists"),
    )


def search_ivf_index(
    centroids: DataFrame, lists: DataFrame, queries: DataFrame, k: int = 5,
    n_probe: int | None = 2, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Serve-side IVF probe against a (built or loaded) index: each
    query scores the broadcast centroid table, keeps its ``n_probe``
    nearest lists, and brute-forces only those — ``n_probe /
    n_centroids`` of the corpus per query, with the top-k window the
    only shuffle. ``n_probe=None`` derives the probe width from the
    index itself (centroid count + list rows) via :func:`ivf_effort`'s
    rule — min(n_centroids, max(24, ceil(1536*n_centroids/n))) — so a
    loaded index serves with the same candidate floor as a fresh
    build. Output: (query_id, neighbor_id, sim, rn)."""
    import math

    from pyspark.sql import Window

    if n_probe is None:
        nlist = centroids.count()
        n = max(lists.count(), 1)
        n_probe = min(nlist, max(24, math.ceil(1536 * nlist / n)))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "__qv", "centroid_id",
        cosine(F.col("__qv"), F.col("__ctr")).alias("__csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__csim").desc(), F.col("centroid_id")
    )
    probes = qc.withColumn("__pr", F.row_number().over(wq)).filter(
        F.col("__pr") <= n_probe
    ).select("query_id", "__qv", "centroid_id")

    cands = probes.join(lists, on="centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def ann_ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    n_centroids: int | None = None, n_probe: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN in one shot: :func:`build_ivf_index` +
    :func:`search_ivf_index` (see those for the scale shapes and the
    persistable build/serve split). Centroids are MLlib-seeded, so the
    catalog checks this through deterministic recall gates.

    ``n_centroids`` / ``n_probe`` default to None — derived from ONE
    corpus census via :func:`ivf_effort` (sqrt(n) lists, probe width
    min(n_centroids, max(24, 1536-candidate floor))); pass explicit
    values to pin them.

    Below the IVF crossover the derived effort is cut over to an exact
    serve (r13, VERDICT r12 item 8): when the derived probe covers at
    least half the lists (``2*n_probe >= n_centroids``, i.e. n <~2.3k
    under the effort rule — at n=2k the 1536-candidate floor already
    scans 78% of the corpus), a coarse quantizer cannot prune enough to
    pay for its own recall loss (the r12/r13 trends measured 0.94/0.96
    at exactly that point, every other SF 1.0), so the corpus is served
    by :func:`cosine_topk` directly — recall 1.0 by construction, no
    KMeans fit, same output contract. FAISS draws the same line
    (IndexFlat below ~10k vectors). The cutover fraction vanishes at
    scale and never fires when both knobs are pinned explicitly.
    Output: (query_id, neighbor_id, sim, rn).
    """
    derived = n_centroids is None or n_probe is None
    if derived:
        eff = ivf_effort(corpus.count())
        n_centroids = eff["n_centroids"] if n_centroids is None else n_centroids
        n_probe = eff["n_probe"] if n_probe is None else n_probe
    n_probe = min(n_probe, n_centroids)
    if derived and 2 * n_probe >= n_centroids:
        return cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    centroids, lists = build_ivf_index(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
        seed=seed,
    )
    return search_ivf_index(
        centroids, lists, queries, k=k, n_probe=n_probe, id_col=id_col,
        vec_col=vec_col,
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


def quantize_int8(df, vec_col: str = "embedding", id_col: str = "vec_id",
                  serialize_q: bool = False):
    """Per-vector symmetric int8 quantization of a float embedding
    column: ``scale = max|x| / 127``, ``q_i = floor(x_i/scale + 0.5)``
    clamped to [-127, 127] — the storage layout that shrinks a 100 TB
    float32 embedding corpus 4x (and its ANN working set with it),
    dequantizing as ``x̂ = q * scale``.

    Round-half-up is spelled out as ``floor(x + 0.5)`` instead of an
    engine ``round()`` so every engine agrees on ties; all arithmetic
    is exact float32→float64 widening followed by identical f64 ops,
    so quantized values are bit-reproducible across engines.  Map-only
    (no shuffle): returns ``(id, scale, q array<tinyint>, rmse)`` where
    rmse is the per-vector reconstruction error.  ``serialize_q=True``
    renders q as a comma-joined string (scalar-only output for
    cross-engine value hashing).
    """
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(scale == 0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127), F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)))
            ).cast("tinyint"),
        )
    )
    out = df.select(F.col(id_col), v.alias("__v"), scale.alias("__scale"), q.alias("q"))
    mse = (
        F.aggregate(
            F.zip_with(
                F.col("__v"), F.col("q"),
                lambda x, qq: F.pow(x - qq * F.col("__scale"), F.lit(2.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size("__v")
    )
    q_out = (
        F.array_join(F.col("q").cast("array<string>"), ",").alias("q")
        if serialize_q
        else F.col("q")
    )
    return out.select(
        id_col,
        F.round("__scale", 6).alias("scale"),
        q_out,
        F.round(F.sqrt(mse), 6).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# Sparse random projection (Achlioptas / Johnson-Lindenstrauss)
# ---------------------------------------------------------------------------

#: Seed string for the shared projection matrix — versioned so a future
#: matrix change is an explicit new operator, not silent drift.
RP_SEED = "orx-rp-v1"


def rp_matrix(in_dim: int, out_dim: int, seed: str = RP_SEED) -> list[list[int]]:
    """Deterministic Achlioptas sparse sign matrix: entry (j, d) is
    +1 w.p. 1/6, -1 w.p. 1/6, 0 w.p. 2/3, drawn from the first byte of
    ``md5(seed:j:d)`` — plain hashlib, no RNG state, so the Spark plan
    and the DuckDB oracle are generated from the *same* Python constant
    and cannot disagree. The matrix is a model parameter: at 64x16 it
    is ~1 KB of literals folded into the plan (the broadcast degenerate
    case), never a table."""
    import hashlib

    m = []
    for j in range(in_dim):
        row = []
        for d in range(out_dim):
            b = hashlib.md5(f"{seed}:{j}:{d}".encode()).digest()[0] % 6
            row.append(1 if b == 0 else (-1 if b == 1 else 0))
        m.append(row)
    return m


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = RP_SEED,
) -> DataFrame:
    """Project ``vec_col`` (array<float>, ``in_dim`` wide) to
    ``out_dim`` dimensions with the Achlioptas sparse sign matrix —
    the JL-lemma dimensionality reduction that makes downstream ANN /
    clustering cheaper at 100 TB. Map-only: each output dimension is a
    codegen sum of the ~in_dim/3 nonzero +/-1 terms (ascending input
    index, so float addition order is pinned), scaled by
    ``sqrt(3/out_dim)``; no shuffle, no UDF, no Python on the data
    path.

    Output is canonicalized engine-independently: each component is
    rounded to integer MICRO-units (``round(x * 1e6) -> bigint``) and
    the row carries the comma-joined micro CSV plus the projected L2
    norm recomputed FROM the integer micros — integer formatting and
    integer-sourced math are identical across engines, sidestepping
    double->varchar formatting divergence entirely.
    """
    import math

    m = rp_matrix(in_dim, out_dim, seed)
    scale = math.sqrt(3.0 / out_dim)
    micros = []
    for d in range(out_dim):
        s = F.lit(0.0)
        for j in range(in_dim):
            if m[j][d] == 1:
                s = s + F.element_at(vec_col, j + 1).cast("double")
            elif m[j][d] == -1:
                s = s - F.element_at(vec_col, j + 1).cast("double")
        micros.append(
            F.round(F.lit(scale) * s * F.lit(1e6)).cast("bigint").alias(f"m{d}")
        )
    proj = df.select(id_col, *micros)
    sq_sum = None
    for d in range(out_dim):
        t = F.col(f"m{d}") * F.col(f"m{d}")
        sq_sum = t if sq_sum is None else sq_sum + t
    return proj.select(
        id_col,
        F.concat_ws(
            ",", *[F.col(f"m{d}").cast("string") for d in range(out_dim)]
        ).alias("proj_micros_csv"),
        F.round(F.sqrt(sq_sum.cast("double")) / F.lit(1e6), 6).alias(
            "proj_norm"
        ),
    )


def rp_oracle_sql(in_dim: int, out_dim: int = 16, seed: str = RP_SEED) -> str:
    """DuckDB replay of :func:`random_projection`, generated from the
    same matrix constant with the same term order and literals."""
    import math

    m = rp_matrix(in_dim, out_dim, seed)
    scale = math.sqrt(3.0 / out_dim)
    cols = []
    for d in range(out_dim):
        terms = "0.0"
        for j in range(in_dim):
            if m[j][d] == 1:
                terms += f" + CAST(embedding[{j + 1}] AS DOUBLE)"
            elif m[j][d] == -1:
                terms += f" - CAST(embedding[{j + 1}] AS DOUBLE)"
        cols.append(
            f"CAST(ROUND({scale!r} * ({terms}) * 1000000.0) AS BIGINT) AS m{d}"
        )
    micro_cols = ",\n             ".join(cols)
    csv = " || ',' || ".join(f"CAST(m{d} AS VARCHAR)" for d in range(out_dim))
    sq = " + ".join(f"m{d} * m{d}" for d in range(out_dim))
    return f"""
    WITH proj AS (
      SELECT vec_id,
             {micro_cols}
      FROM embeddings
    )
    SELECT vec_id,
           {csv} AS proj_micros_csv,
           ROUND(SQRT(CAST({sq} AS DOUBLE)) / 1000000.0, 6) AS proj_norm
    FROM proj
    """


# ---------------------------------------------------------------------------
# Engine-exact distributed power iteration (dominant Gram direction).
# ---------------------------------------------------------------------------

PI_MICRO = 1000

# Micro-unit ladder: candidate quantization units, largest (most
# precise) first. The unit must satisfy the end-to-end int64 bound of
# the whole iteration (see pi_micro_for), so it SHRINKS as the corpus
# grows — precision is traded for overflow headroom automatically
# instead of via the manual rescale the r8 docstring demanded.
_PI_MICRO_LADDER = (1000, 100, 10, 1)

# Safe ceiling for every intermediate: comfortably under 2^63-1, and a
# round literal both engines compare against identically.
_PI_INT64_SAFE = 9.0e18


def _pi_micro_safe(micro: int, n: float, max_abs: float, dim: int) -> bool:
    """True iff quantization unit ``micro`` keeps every intermediate of
    the iteration inside int64 for an ``n``-row, ``dim``-dim corpus
    with per-coordinate magnitude <= ``max_abs``.

    Worst-case chain: |x_m| <= micro*max_abs + 0.5 (HALF_UP), Gram
    |S_ij| <= n*|x_m|^2, step |w_i| <= dim*|S|*micro, and the rounding
    numerator 2*|w|*micro + m <= |w|*(2*micro+1). The factor-4 slack
    absorbs the +0.5 quantization term (as (max_abs + 1/micro)^2) and
    the +1. EVALUATION ORDER MATTERS: this double-precision expression
    is replayed literally inside the generated SQL oracle, so both
    sides fold the same literals in the same left-associative order
    with plain * (never pow(), whose libm rounding is build-dependent)
    — the comparison can never disagree across engines.
    """
    slack = max_abs + 1.0 / micro
    return (4 * dim) * n * float(micro) ** 4 * (slack * slack) <= _PI_INT64_SAFE


def pi_micro_for(n: int | float, max_abs: float, dim: int) -> int:
    """Largest ladder unit whose whole-iteration worst case fits int64.

    Raises if even micro=1 cannot (n*max_abs^2 ~ 3.5e16 — past any
    realistic corpus; at that point the Gram itself needs > int64).
    """
    for micro in _PI_MICRO_LADDER:
        if _pi_micro_safe(micro, float(n), float(max_abs), dim):
            return micro
    raise ValueError(
        f"power iteration: corpus too large for int64 Gram even at "
        f"micro=1 (n={n}, max_abs={max_abs}, dim={dim})"
    )


def _pi_round_ratio(num: int, den: int) -> int:
    """Half-away-from-zero rounding of the EXACT integer ratio
    ``num/den`` (den > 0) — pure integer arithmetic, so the Spark
    driver loop and the SQL oracle agree bit-for-bit with no IEEE
    division anywhere in the iteration."""
    q = (2 * abs(num) + den) // (2 * den)
    return q if num >= 0 else -q


def power_iteration_component(
    df,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
    n_override: int | None = None,
    max_abs_override: float | None = None,
):
    """Dominant direction of the corpus Gram matrix by ``iters`` power
    steps — the engine-exact PCA primitive (whitening prep, dominant-
    topic direction, embedding drift monitoring), built the same way
    as :mod:`~orx_surgical_spark.operators.clustering`'s Lloyd fit:
    integer micro-unit arithmetic with pinned determinism rules so a
    generated SQL oracle replays the whole computation.

    Returns ``(component, projections)``: the final integer component
    vector (max-abs normalized to PI_MICRO) and a map-only DataFrame
    of per-vector integer projections onto it.

    Determinism contract (both engines): quantize to
    ``round(x * micro)`` micro ints (HALF_UP); ONE distributed pass
    builds the exact integer Gram ``S = sum over rows of x x^T``
    (upper triangle as d(d+1)/2 sum expressions — past the
    whole-stage-codegen field limit, so Spark falls back to the
    row-based aggregate, but it is still one scan with map-side
    partial state and a one-off expression-compile cost; mirrored
    driver-side — O(d^2) state, same bounded-collect precedent as the
    Lloyd centroid table); each power step is exact integer
    ``w = S v`` followed by max-abs renormalization via
    :func:`_pi_round_ratio` — the rounding is computed on the exact
    rational, never on a float quotient, so there is NO IEEE step the
    two engines could disagree on.

    Magnitude bound (r9, VERDICT r8 item 3): the quantization unit is
    DERIVED, not fixed — one cheap pre-pass computes ``(count,
    max_abs)`` and :func:`pi_micro_for` picks the largest ladder unit
    whose whole-iteration worst case (quantize -> Gram -> d steps ->
    rational renorm numerator) fits int64. The generated SQL oracle
    replays the identical ladder from the identical pre-pass, so both
    engines always agree on the chosen unit. ``n_override`` /
    ``max_abs_override`` let tests (and the oracle generator) pin a
    simulated corpus magnitude — e.g. prove the 1e10-row unit choice
    end-to-end on a small table.

    Scale shape: the Gram pass is one single-pass aggregate
    (map-side partials of d(d+1)/2 longs per task); iterations are
    driver-side O(d^2) integer math; the projection is one map-only
    pass with the component compiled in as literals.
    """
    import operator as op
    from functools import reduce

    arr = F.col(vec_col).cast("array<double>")
    if n_override is not None and max_abs_override is not None:
        n_rows, max_abs = n_override, max_abs_override
    else:
        stat = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.array_max(F.transform(arr, F.abs))).alias("mx"),
        ).first()
        n_rows = int(stat["n"] or 0)
        max_abs = float(stat["mx"] or 0.0)
    micro = pi_micro_for(n_rows, max_abs, dim)

    xm = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(
            arr,
            lambda x: F.round(x * F.lit(float(micro))).cast("bigint"),
        ).alias("xm"),
    ).localCheckpoint(eager=False)

    aggs = [
        F.sum(
            F.element_at("xm", i + 1) * F.element_at("xm", j + 1)
        ).alias(f"s_{i}_{j}")
        for i in range(dim)
        for j in range(i, dim)
    ]
    row = xm.agg(*aggs).first()
    S = [[0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            v = int(row[f"s_{i}_{j}"] or 0)
            S[i][j] = v
            S[j][i] = v

    v = [micro] * dim
    for _ in range(iters):
        w = [sum(S[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            raise ValueError(
                "power_iteration_component: zero Gram matrix (empty or "
                "all-zero corpus)"
            )
        v = [_pi_round_ratio(w[i] * micro, m) for i in range(dim)]

    terms = [
        F.element_at("xm", i + 1) * F.lit(int(v[i])) for i in range(dim)
    ]
    proj = xm.select(
        "vec_id", reduce(op.add, terms).cast("bigint").alias("proj_micro")
    )
    return v, proj


def power_iteration_oracle_sql(
    dim: int = 64,
    iters: int = 3,
    table: str = "embeddings",
    n_override: int | None = None,
    max_abs_override: float | None = None,
) -> str:
    """Generated DuckDB oracle replaying
    :func:`power_iteration_component` end-to-end: the (count, max_abs)
    pre-pass and micro-unit ladder (same double-precision bound
    expression, same left-associative literal folding — see
    :func:`_pi_micro_safe`), quantization, the exact integer Gram
    (self-join in long format), every power step with the SAME integer
    rational rounding, and the final projections. Overrides pin a
    simulated corpus magnitude exactly like the Spark side's."""
    if n_override is not None and max_abs_override is not None:
        stats = (
            f"SELECT CAST({n_override} AS DOUBLE) AS n, "
            f"CAST({max_abs_override!r} AS DOUBLE) AS mx"
        )
    else:
        stats = (
            f"SELECT CAST(COUNT(*) AS DOUBLE) AS n,\n"
            f"             COALESCE(MAX(list_max(list_transform("
            f"CAST(embedding AS DOUBLE[]), x -> ABS(x)))), 0.0) AS mx\n"
            f"      FROM {table}"
        )
    rungs = " ".join(
        f"WHEN {4 * dim} * n * {float(u) ** 4!r} * "
        f"((mx + {1.0 / u!r}) * (mx + {1.0 / u!r})) "
        f"<= {_PI_INT64_SAFE!r} THEN CAST({u} AS BIGINT)"
        for u in _PI_MICRO_LADDER
    )
    parts = [f"""
    WITH stats AS (
      {stats}
    ), mu AS (
      SELECT CASE {rungs} ELSE CAST(
        error('pi_micro oracle: no ladder rung fits int64') AS BIGINT
      ) END AS u FROM stats
    ), xml AS (
      SELECT vec_id, t.i AS i,
             CAST(ROUND(CAST(embedding AS DOUBLE[])[t.i] * mu.u)
                  AS BIGINT) AS x
      FROM {table}, mu, range(1, {dim + 1}) t(i)
    ), s AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS v
      FROM xml a JOIN xml b USING (vec_id)
      GROUP BY a.i, b.i
    ), v0 AS (
      SELECT t.i AS i, CAST(mu.u AS BIGINT) AS v
      FROM range(1, {dim + 1}) t(i), mu
    )"""]
    for t in range(1, iters + 1):
        prev = f"v{t - 1}"
        parts.append(f"""
    , w{t} AS (
      SELECT s.i AS i, CAST(SUM(s.v * p.v) AS BIGINT) AS w
      FROM s JOIN {prev} p ON p.i = s.j
      GROUP BY s.i
    ), m{t} AS (
      SELECT MAX(ABS(w)) AS m FROM w{t}
    ), v{t} AS (
      SELECT i,
             CAST(CASE WHEN w >= 0
                  THEN (2 * ABS(w) * mu.u + m) // (2 * m)
                  ELSE -((2 * ABS(w) * mu.u + m) // (2 * m))
                  END AS BIGINT) AS v
      FROM w{t}, m{t}, mu
    )""")
    parts.append(f"""
    SELECT x.vec_id, CAST(SUM(x.x * f.v) AS BIGINT) AS proj_micro
    FROM xml x JOIN v{iters} f ON f.i = x.i
    GROUP BY x.vec_id
    """)
    return "".join(parts)


# ---------------------------------------------------------------------------
# Graph-refined ANN: kNN-graph build + beam-search serve (r9).
# ---------------------------------------------------------------------------


def knn_graph_effort(
    n: int | float, block_bits: int = 4, max_block: int = 4096, dim: int = 64
) -> dict:
    """Input-derived build/serve effort for the kNN-graph ANN tier
    (VERDICT r10 item 2: fixed parameters decayed recall 1.0 → 0.98 →
    0.86 → 0.80 → <0.6 across sf0.001→sf10 — once the corpus outgrows
    the ``2^block_bits * max_block`` blocking capacity, each sign block
    splits into ever more hash sub-buckets and in-block recall
    collapses; the docstring predicted the mechanism, the sf10 soak
    measured it).

    Same precedent as ``pi_micro_for`` and ``pq_topk``'s sqrt(n)
    rerank: derive the effort from the input, one *notch* per doubling
    past capacity —

        s = ceil(log2(n / (2^block_bits * max_block)))   (min 0)

    and scale every axis that restores recall in the notch: TWO extra
    sign-blocking rounds per notch (different dims per round re-link
    what a sub-bucket split isolated — the dominant recall lever by
    measurement), wider serve beam, one extra hop per two notches, and
    exponentially more entry points. At every SF where the r10 fixed
    parameters held (n <= capacity 65,536: all graded SFs, sf1, sf3),
    s = 0 reproduces them EXACTLY; at sf10 (n = 200,000, s = 2) the
    sweep measured recall@5 0.38 under the fixed build and, derived:
    0.76 with rounds 4 / 0.86 with 5 / **1.00 with rounds 6** (beam 64,
    hops 5, entry_bits 6 throughout, build wall 89 → 151 s of the
    1147 s sf10 panel) — rounds = 2 + 2s buys the full-recall point
    for ~40% more build.

    ``n_rounds`` is capped at ``dim // block_bits`` — each round blocks
    on a disjoint dim slice, so a 64-dim corpus supports at most 16
    distinct rounds.
    """
    import math

    cap = (2 ** block_bits) * max_block
    s = max(0, math.ceil(math.log2(max(float(n), 1.0) / cap))) if n else 0
    return {
        "n_rounds": min(2 + 2 * s, max(1, dim // block_bits)),
        "beam": 32 + 16 * s,
        "hops": 4 + (s + 1) // 2,
        "entry_bits": min(4 + s, 10),
    }


def build_knn_graph(
    corpus: DataFrame,
    m: int = 8,
    block_bits: int = 4,
    n_rounds: int | None = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block: int = 4096,
) -> DataFrame:
    """Approximate kNN graph over the corpus — the build phase of the
    graph-refined ANN serve tier (the HNSW/DiskANN family's navigable
    neighborhood graph, built the Spark way: blocked batch Gram instead
    of incremental insertion).

    Per round r, vectors are blocked by the sign pattern of dims
    ``[r*block_bits, (r+1)*block_bits)`` — deterministic, seedless, and
    DIFFERENT per round, so the union of rounds cross-links regions a
    single blocking would isolate (the multi-probe trick that keeps the
    graph navigable across block boundaries). Within each block, one
    BLAS Gram (same applyInPandas shape as
    :func:`embedding_neardup_pairs_gram`) emits each row's top-``m``
    in-block neighbors. Edges are then symmetrized (an edge found from
    either endpoint serves both) and each node's adjacency is capped at
    ``2*m`` by (sim DESC, dst ASC) so the serve-time fan-out is bounded.

    Scale shape: ``n_rounds`` shuffles on the block keys + one shuffle
    for the per-src degree cap; per-block memory is the n_block x d
    matrix + its Gram. ``block_bits`` bounds the block COUNT, not block
    size, so a skewed corpus (e.g. all-nonnegative ReLU/TF-IDF
    embeddings) can collapse into one giant block: any sign block
    larger than ``max_block`` rows is therefore secondarily split into
    ``ceil(count / max_block)`` deterministic ``xxhash64(id)`` buckets
    before the Gram, capping per-task memory at
    ``max_block^2 + max_block*d`` floats regardless of skew (the split
    costs some in-block recall; the per-round re-blocking plus edge
    symmetrization re-links across sub-buckets). The size census is a
    tiny count-per-block aggregate broadcast back — no extra wide
    shuffle. No all-pairs anywhere. Output: (src, dst, sim) with sim
    rounded half-away to 6 dp.
    """
    import numpy as np
    import pandas as pd

    if max_block < 2:
        raise ValueError("build_knn_graph: max_block must be >= 2")
    if n_rounds is None:
        n, dim = _corpus_stats(corpus, vec_col)
        n_rounds = knn_graph_effort(n, block_bits, max_block, dim)["n_rounds"]
    if m < 1 or n_rounds < 1:
        raise ValueError("build_knn_graph: m and n_rounds must be >= 1")

    def topm(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(dtype=np.int64)
        x = np.stack(pdf["v"].to_numpy())
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        g = (x / norms[:, None]) @ (x / norms[:, None]).T
        g = np.sign(g) * np.floor(np.abs(g) * 1e6 + 0.5) / 1e6  # SQL ROUND
        np.fill_diagonal(g, -np.inf)
        take = min(m, len(ids) - 1)
        if take <= 0:
            return pd.DataFrame({"src": [], "dst": [], "sim": []}).astype(
                {"src": np.int64, "dst": np.int64, "sim": np.float64}
            )
        out_s, out_d, out_v = [], [], []
        for i in range(len(ids)):
            order = np.lexsort((ids, -g[i]))[:take]
            keep = order[np.isfinite(g[i, order])]
            out_s.append(np.full(len(keep), ids[i], dtype=np.int64))
            out_d.append(ids[keep])
            out_v.append(g[i, keep])
        return pd.DataFrame(
            {
                "src": np.concatenate(out_s),
                "dst": np.concatenate(out_d),
                "sim": np.concatenate(out_v),
            }
        )

    parts = []
    for r in range(n_rounds):
        key = F.concat(
            *[
                (F.element_at(vec_col, r * block_bits + i + 1) >= 0)
                .cast("int")
                .cast("string")
                for i in range(block_bits)
            ]
        )
        blocked = corpus.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            key.alias("__block"),
        )
        # Skew guard: split any block over max_block rows into
        # deterministic hash sub-buckets. The census aggregate emits at
        # most 2^block_bits rows and broadcasts back, so the only wide
        # exchange stays the applyInPandas groupBy itself.
        sizes = blocked.groupBy("__block").agg(F.count(F.lit(1)).alias("__cnt"))
        salted = (
            blocked.join(F.broadcast(sizes), "__block")
            .withColumn(
                "__nsub",
                F.ceil(F.col("__cnt") / F.lit(max_block)).cast("long"),
            )
            .withColumn(
                "__block",
                F.concat_ws(
                    "#",
                    F.col("__block"),
                    F.pmod(F.xxhash64("id"), F.col("__nsub")).cast("string"),
                ),
            )
            .select("id", "v", "__block")
        )
        parts.append(
            salted.groupBy("__block").applyInPandas(
                topm, "src long, dst long, sim double"
            )
        )
    from functools import reduce

    edges = reduce(DataFrame.unionByName, parts)
    sym = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
        )
    )
    dedup = sym.groupBy("src", "dst").agg(F.max("sim").alias("sim"))
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("dst").asc())
    return (
        dedup.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 2 * m)
        .drop("__rn")
    )


def _corpus_stats(corpus: DataFrame, vec_col: str) -> tuple[int, int]:
    """(row count, vector dim) in one tiny aggregate — the bounded
    pre-pass that feeds :func:`knn_graph_effort` (index builds are
    explicitly materialized, so an eager census is the contract here,
    exactly like the IVF trainer's centroid fit)."""
    row = corpus.agg(
        F.count(F.lit(1)).alias("n"), F.min(F.size(vec_col)).alias("d")
    ).first()
    return int(row["n"] or 0), int(row["d"] or 64)


def entry_points(
    corpus: DataFrame,
    block_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic, spatially-spread beam-search entry set: the
    minimum id of every round-0 sign block (<= 2^block_bits nodes, one
    per occupied orthant slice — the seedless stand-in for HNSW's top
    layer)."""
    key = F.concat(
        *[
            (F.element_at(vec_col, i + 1) >= 0).cast("int").cast("string")
            for i in range(block_bits)
        ]
    )
    return (
        corpus.select(F.col(id_col).cast("long").alias("node"), key.alias("__b"))
        .groupBy("__b")
        .agg(F.min("node").alias("node"))
        .select("node")
    )


def search_knn_graph(
    graph: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    beam: int = 16,
    hops: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    entries: DataFrame | None = None,
) -> DataFrame:
    """Beam search over the kNN graph — the serve phase: greedy
    best-first expansion batched over ALL queries at once, which is the
    only way the sequential hop loop of HNSW-style search makes sense
    on Spark (per-query sequentiality becomes per-hop set algebra).

    Each hop: the frontier (the not-yet-expanded members of every
    query's current beam) equi-joins the adjacency list, unseen
    candidates equi-join the corpus for their vectors, ONE Arrow pass
    scores them against the broadcast query matrix, and a per-query
    window keeps the top-``beam``. Joins are frontier-sized
    (<= n_queries * beam * degree rows), never corpus-sized; the
    corpus-side lookup is an equi-join on the vector id, which prunes
    and co-locates like any big-table point-join family at 100 TB.
    Bounded rounds (``hops``), like the BFS/k-core operators.

    Output matches the other ANN serves: (query_id, neighbor_id, sim,
    rn <= k), sim rounded half-away to 6 dp, ties by neighbor id;
    self-matches excluded from the final ranking. Fully deterministic
    (no RNG, no MLlib seeds), so the recall gate's floor is stable.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    qrows = queries.select(
        F.col(id_col).cast("long"), F.col(vec_col).cast("array<double>")
    ).collect()
    if not qrows:
        raise ValueError("search_knn_graph: empty query set")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0.0] = 1.0
    qmat = qmat / qnorm
    bq = spark.sparkContext.broadcast(
        {int(q): qmat[i] for i, q in enumerate(qids)}
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            qv = np.stack([bq.value[int(q)] for q in pdf["query_id"]])
            cv = np.stack(pdf["__cv"].to_numpy()).astype(np.float64, copy=False)
            nrm = np.linalg.norm(cv, axis=1)
            nrm[nrm == 0.0] = 1.0
            sims = np.einsum("ij,ij->i", qv, cv / nrm[:, None])
            sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "node": pdf["node"].to_numpy(dtype=np.int64),
                    "sim": sims,
                }
            )

    vecs = corpus.select(
        F.col(id_col).cast("long").alias("node"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    )
    qid_df = spark.createDataFrame(
        [(q,) for q in sorted(set(int(q) for q in qids))], "query_id long"
    )
    if entries is None:
        entries = entry_points(corpus, id_col=id_col, vec_col=vec_col)
    seed = F.broadcast(qid_df).crossJoin(F.broadcast(entries)).select(
        "query_id", "node"
    )

    def score_nodes(cand: DataFrame) -> DataFrame:
        return cand.join(vecs, "node").mapInPandas(
            score, "query_id long, node long, sim double"
        )

    from pyspark.sql import Window

    w_beam = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("node").asc()
    )
    top = score_nodes(seed).localCheckpoint(eager=False)
    visited = seed.localCheckpoint(eager=False)
    frontier = top.select("query_id", "node")
    for _ in range(hops):
        neigh = (
            frontier.join(graph, frontier["node"] == graph["src"])
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
        )
        fresh = neigh.join(visited, ["query_id", "node"], "left_anti")
        scored = score_nodes(fresh).localCheckpoint(eager=False)
        visited = visited.unionByName(
            fresh.select("query_id", "node")
        ).localCheckpoint(eager=False)
        merged = top.unionByName(scored)
        top = (
            merged.withColumn("__rn", F.row_number().over(w_beam))
            .filter(F.col("__rn") <= beam)
            .drop("__rn")
            .localCheckpoint(eager=False)
        )
        # expand only newly-scored nodes that made the beam
        frontier = scored.join(
            top.select("query_id", "node"), ["query_id", "node"], "left_semi"
        ).select("query_id", "node")

    w_k = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        top.filter(F.col("node") != F.col("query_id"))
        .select("query_id", F.col("node").alias("neighbor_id"), "sim")
        .withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= k)
    )


def ann_graph_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    beam: int | None = None,
    hops: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build + serve in one call (the registry-facing convenience; a
    production deployment persists the graph once — it is a plain
    (src, dst, sim) DataFrame, parquet-writable like the IVF lists —
    and serves many query batches against it).

    ``beam``/``hops`` default to the corpus-size-derived effort ladder
    (:func:`knn_graph_effort`), as do the build rounds and the entry
    set width — pass explicit values only to pin a configuration."""
    n, dim = _corpus_stats(corpus, vec_col)
    eff = knn_graph_effort(n, dim=dim)
    graph = build_knn_graph(
        corpus, m=m, n_rounds=eff["n_rounds"], id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=False)
    entries = entry_points(
        corpus, block_bits=min(eff["entry_bits"], dim), id_col=id_col,
        vec_col=vec_col,
    )
    return search_knn_graph(
        graph, corpus, queries, k=k,
        beam=eff["beam"] if beam is None else beam,
        hops=eff["hops"] if hops is None else hops,
        id_col=id_col, vec_col=vec_col, entries=entries,
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: per-subspace Lloyd codebooks +
# asymmetric-distance (ADC) serve (r10).
# ---------------------------------------------------------------------------


def _unit_vec(vec_col: str) -> Column:
    """L2-normalize an array<double> column (zero vectors stay zero).
    On unit vectors squared L2 is a monotone transform of cosine
    (d^2 = 2 - 2*cos), so PQ's L2-trained codebooks rank like the
    exact cosine ground truth."""
    v = F.col(vec_col).cast("array<double>")
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)


def pq_train_codebooks(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    driver_cutover_rows: int = 200_000,
) -> list[list[list[int]]]:
    """Train PQ codebooks: Lloyd k-means per subspace of the
    L2-normalized vectors, with the clustering module's determinism
    rules (integer micro-units, k-smallest-ids init, lowest-code
    tie-break, rounded-mean update, empty-cluster carry-over). Fully
    deterministic: no MLlib seeds anywhere, so two runs produce the
    same codebooks.

    All ``n_subspaces`` fits run FUSED: per Lloyd iteration, ONE pass
    computes every subspace's assignment (the argmin expressions
    compile in as literals) and ONE global aggregate — keyless, so it
    is pure map-side partials emitting a single
    ``n_subspaces * n_centroids * (sub + 1)``-field row — yields every
    (subspace, cluster) sum/count at once. Total: ``iters + 2`` jobs
    instead of the ~``n_subspaces * (iters + 2)`` a per-subspace loop
    costs (42 s -> ~8 s at sf0.1 for 8 subspaces), and driver state
    stays O(n_subspaces * n_centroids * dim) integers.

    Returns ``codebooks[m][j]`` = centroid ``j`` of subspace ``m`` as
    micro-unit ints. At 100 TB the fit side is a bounded sample (the
    ``models.fit_sample`` pattern — PQ codebooks, like any quantizer,
    are estimated, not aggregated), while ENCODE and SERVE below
    stream the full corpus map-only.

    r14 driver cutover (same precedent as clustering.lloyd_centroids):
    at or below ``driver_cutover_rows`` the fused iteration runs on the
    driver in numpy int64 — the distributed fit's per-iteration cost at
    small n is Catalyst compiling the n_subspaces x n_centroids x
    (sub+1) aggregate tree (~1150 expressions at the 8x16 default;
    measured 37 s for 500 vectors, ~7 s/job of pure planning+codegen),
    not the data. Identical arithmetic (exact int distances, argmin =
    lowest code on ties, the same ``half_up`` update, emptied clusters
    carry over), pinned by a loop ≡ cutover test. Pass 0 to force the
    distributed fit.
    """
    import math
    import operator as _op
    from functools import reduce as _reduce

    from orx_surgical_spark.operators.clustering import MICRO

    first = corpus.select(F.col(vec_col)).first()
    if first is None:
        raise ValueError("pq_train_codebooks: empty corpus")
    dim = len(first[0])
    if dim % n_subspaces != 0:
        raise ValueError(
            f"pq_train_codebooks: dim {dim} not divisible by "
            f"n_subspaces {n_subspaces}"
        )
    sub = dim // n_subspaces
    xm_df = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(
            _unit_vec(vec_col),
            lambda x: F.round(x * F.lit(float(MICRO))).cast("bigint"),
        ).alias("xm"),
    ).localCheckpoint(eager=False)
    if (
        0 < driver_cutover_rows
        and xm_df.limit(driver_cutover_rows + 1).count() <= driver_cutover_rows
    ):
        import numpy as np

        rows = xm_df.collect()
        if len(rows) < n_centroids:
            raise ValueError(
                f"pq_train_codebooks: need at least n_centroids="
                f"{n_centroids} vectors, got {len(rows)}"
            )
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        X = np.array([r["xm"] for r in rows], dtype=np.int64)

        def hup(x: float) -> int:
            return (
                int(math.floor(x + 0.5))
                if x >= 0
                else -int(math.floor(-x + 0.5))
            )

        order = np.argsort(ids, kind="stable")[:n_centroids]
        out = []
        for m in range(n_subspaces):
            Xm = X[:, m * sub:(m + 1) * sub]
            C = Xm[order].copy()
            for _ in range(iters):
                d = Xm[:, None, :] - C[None, :, :]
                np.square(d, out=d)
                assign = d.sum(axis=2).argmin(axis=1)  # ties -> lowest code
                counts = np.bincount(assign, minlength=n_centroids)
                sums = np.zeros((n_centroids, sub), dtype=np.int64)
                np.add.at(sums, assign, Xm)
                for j in range(n_centroids):
                    if counts[j]:  # emptied cluster keeps its centroid
                        C[j] = [
                            hup(float(s) / float(counts[j])) for s in sums[j]
                        ]
            out.append([[int(v) for v in c] for c in C])
        return out
    init_rows = xm_df.orderBy("vec_id").limit(n_centroids).collect()
    if len(init_rows) < n_centroids:
        raise ValueError(
            f"pq_train_codebooks: need at least n_centroids="
            f"{n_centroids} vectors, got {len(init_rows)}"
        )
    codebooks = [
        [
            [int(v) for v in r["xm"][m * sub : (m + 1) * sub]]
            for r in init_rows
        ]
        for m in range(n_subspaces)
    ]

    def cid_expr(m: int) -> Column:
        cands = []
        for j, c in enumerate(codebooks[m]):
            terms = []
            for i in range(sub):
                d = F.element_at("xm", m * sub + i + 1) - F.lit(int(c[i]))
                terms.append(d * d)
            cands.append(
                F.struct(
                    _reduce(_op.add, terms).alias("d"), F.lit(j).alias("j")
                )
            )
        return F.array_min(F.array(*cands))["j"]

    def half_up(x: float) -> int:
        # Spark F.round HALF_UP on doubles (the clustering module's
        # update rule): round half away from zero.
        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    for _ in range(iters):
        assigned = xm_df.select(
            "xm", *[cid_expr(m).alias(f"c{m}") for m in range(n_subspaces)]
        )
        aggs = []
        for m in range(n_subspaces):
            for j in range(n_centroids):
                hit = F.col(f"c{m}") == j
                aggs.append(
                    F.sum(F.when(hit, 1).otherwise(0)).alias(f"n_{m}_{j}")
                )
                for i in range(sub):
                    aggs.append(
                        F.sum(
                            F.when(hit, F.element_at("xm", m * sub + i + 1))
                        ).alias(f"s_{m}_{j}_{i}")
                    )
        row = assigned.agg(*aggs).first()
        for m in range(n_subspaces):
            for j in range(n_centroids):
                cnt = row[f"n_{m}_{j}"]
                if cnt:  # emptied cluster keeps its previous centroid
                    codebooks[m][j] = [
                        half_up(row[f"s_{m}_{j}_{i}"] / cnt)
                        for i in range(sub)
                    ]
    return codebooks


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``n_subspaces`` one-byte-ish codes — the
    nearest codebook centroid per subspace (exact BIGINT squared
    distance on micro-units, ties to the lowest code, mirroring the
    Lloyd assignment rule). Map-only: the codebooks compile in as
    literals (constants, no join), so encoding is one codegen pass —
    the 100 TB shape, and the codes table is what a production
    deployment persists (``n_subspaces`` ints per vector, a ~32x
    compression of a 64-dim float64 embedding).
    """
    import operator as _op
    from functools import reduce as _reduce

    from orx_surgical_spark.operators.clustering import MICRO

    n_subspaces = len(codebooks)
    sub = len(codebooks[0][0])
    xm = F.transform(
        _unit_vec(vec_col), lambda x: F.round(x * F.lit(float(MICRO))).cast("bigint")
    )
    enc = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"), xm.alias("xm")
    )

    def code_expr(m: int) -> Column:
        cands = []
        for j, c in enumerate(codebooks[m]):
            terms = []
            for i in range(sub):
                d = F.element_at("xm", m * sub + i + 1) - F.lit(int(c[i]))
                terms.append(d * d)
            cands.append(
                F.struct(
                    _reduce(_op.add, terms).alias("d"), F.lit(j).alias("j")
                )
            )
        return F.array_min(F.array(*cands))["j"].cast("int")

    return enc.select(
        "vec_id",
        F.array(*[code_expr(m) for m in range(n_subspaces)]).alias("codes"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    iters: int = 2,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN serve via asymmetric distance computation with exact
    re-ranking (ADC+R — Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011, §V): the query stays
    UNquantized (micro-int precision); per query a ``n_subspaces x
    n_centroids`` lookup table of exact BIGINT squared subdistances is
    computed driver-side from the literal codebooks, and every corpus
    vector's approximate distance is just ``n_subspaces`` table
    lookups on its codes — integer adds, no floats, whole-stage
    codegen. The ADC pass keeps a per-query shortlist of ``rerank``
    candidates; only those (``n_queries * rerank`` rows, never the
    corpus) fetch their full vectors by equi-join and re-rank by EXACT
    integer squared L2 — the step that recovers the recall the 32-bit
    codes alone cannot hold on high-intrinsic-dimension corpora.
    ``rerank=None`` derives the shortlist from the corpus size
    (``max(64, 8*ceil(sqrt(n)))`` — the same input-derived-parameter
    rule as ``pi_micro_for``/shuffle width): a fixed shortlist dilutes
    recall as the corpus grows; sqrt growth keeps the rerank join
    asymptotically free while recall stays flat across the probed SFs.

    Scale shape: train on a bounded sample, encode map-only, serve =
    codes table x broadcast LUT rows (bounded by the query count, the
    same BroadcastNestedLoopJoin-with-O(1)-side pattern as
    ``ann_ivf_topk``'s centroid probe) + one per-query shortlist
    window + a shortlist-sized rerank join. At 100 TB the serve
    composes with the IVF tier (IVF-ADC): probe lists prune the
    corpus, PQ codes replace the full vectors inside each list.
    Deterministic end to end — no seeds.

    Output: (query_id, neighbor_id, dist_micro_sq, rn <= k); ties
    broken by neighbor id; self-matches excluded.
    """
    import operator as _op
    from functools import reduce as _reduce

    from pyspark.sql import Window

    from orx_surgical_spark.operators.clustering import MICRO

    spark = corpus.sparkSession
    codebooks = pq_train_codebooks(
        corpus, n_subspaces, n_centroids, iters, id_col, vec_col
    )
    sub = len(codebooks[0][0])
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    if rerank is None:
        import math

        n = corpus.count()
        rerank = max(64, 8 * math.isqrt(max(n - 1, 0)) + 8)

    qrows = (
        queries.select(
            F.col(id_col).cast("long"),
            F.transform(
                _unit_vec(vec_col),
                lambda x: F.round(x * F.lit(float(MICRO))).cast("bigint"),
            ),
        )
        .collect()
    )
    if not qrows:
        raise ValueError("pq_topk: empty query set")
    luts = []
    seen = set()
    for qid, qxm in sorted((int(r[0]), list(r[1])) for r in qrows):
        if qid in seen:
            continue
        seen.add(qid)
        lut = [
            [
                sum(
                    (int(qxm[m * sub + i]) - int(c[i])) ** 2
                    for i in range(sub)
                )
                for c in codebooks[m]
            ]
            for m in range(n_subspaces)
        ]
        luts.append((qid, lut))
    lut_df = spark.createDataFrame(
        luts, "query_id long, lut array<array<bigint>>"
    )
    dist = _reduce(
        _op.add,
        [
            F.element_at(
                F.element_at("lut", m + 1), F.element_at("codes", m + 1) + 1
            )
            for m in range(n_subspaces)
        ],
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro_sq").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        codes.crossJoin(F.broadcast(lut_df))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dist.alias("adc_micro_sq"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__rn", F.row_number().over(w_adc))
        .filter(F.col("__rn") <= max(rerank, k))
        .drop("__rn")
    )
    # Exact re-rank: only the shortlist fetches full vectors. qxm rows
    # are one micro-int vector per query — broadcast by construction.
    qxm_df = spark.createDataFrame(
        [
            (qid, [int(v) for v in qxm])
            for qid, qxm in sorted(
                {int(r[0]): list(r[1]) for r in qrows}.items()
            )
        ],
        "query_id long, qxm array<bigint>",
    )
    cxm = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.transform(
            _unit_vec(vec_col),
            lambda x: F.round(x * F.lit(float(MICRO))).cast("bigint"),
        ).alias("cxm"),
    )
    exact_d = F.aggregate(
        F.zip_with("qxm", "cxm", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro_sq").asc(), F.col("neighbor_id").asc()
    )
    return (
        shortlist.join(cxm, "neighbor_id")
        .join(F.broadcast(qxm_df), "query_id")
        .select("query_id", "neighbor_id", exact_d.alias("dist_micro_sq"))
        .withColumn("rn", F.row_number().over(w_k))
        .filter(F.col("rn") <= k)
    )
