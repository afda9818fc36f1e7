"""Unit tests for the engine-exact Lloyd k-means
(`operators/clustering.py`): semantics the oracle-parity hash can't
localize — separation recovery, the nearest-centroid invariant, and
construction determinism."""

from __future__ import annotations

import numpy as np

from orx_surgical_spark.operators.clustering import (
    MICRO,
    kmeans_lloyd,
    lloyd_centroids,
)


def _blob_df(spark, centers, n_per, spread, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in centers:
        for _ in range(n_per):
            v = (np.array(c) + rng.normal(0, spread, len(c))).astype(
                "float32"
            )
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_separated_blobs(spark):
    """Two blobs 10 sigma apart: Lloyd with k=2 must put each blob in
    one cluster (whatever the cluster ids end up being)."""
    df = _blob_df(spark, [(0.0, 0.0, 0.0), (5.0, 5.0, 5.0)], 25, 0.5)
    got = {
        r.vec_id: r.cluster_id
        for r in kmeans_lloyd(df, k=2, iters=3).collect()
    }
    first = {got[i] for i in range(25)}
    second = {got[i] for i in range(25, 50)}
    assert len(first) == 1 and len(second) == 1 and first != second


def test_kmeans_assignment_is_nearest_final_centroid(spark, sf_dir):
    """Every vector's (cluster_id, dist) must equal the numpy argmin
    over the operator's own final centroids on the quantized ints —
    exact int64 arithmetic, lowest-cid tie rule."""
    from orx_surgical_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    xm, centroids = lloyd_centroids(emb, k=4, iters=3)
    pts = {r.vec_id: np.array(r.xm, dtype=np.int64) for r in xm.collect()}
    cm = np.array(centroids, dtype=np.int64)
    got = kmeans_lloyd(emb, k=4, iters=3).collect()
    assert len(got) == len(pts)
    for r in got:
        d = ((pts[r.vec_id][None, :] - cm) ** 2).sum(axis=1)
        assert r.cluster_id == int(np.argmin(d))  # argmin = lowest-id tie
        assert r.dist_micro_sq == int(d[r.cluster_id])


def test_kmeans_quantization_matches_round_half_away(spark):
    """The micro quantization is ROUND-half-away-from-zero on the
    float64-widened value — pinned because the oracle replays it."""
    df = spark.createDataFrame(
        [(0, [0.0000005, -0.0000005, 0.25])],
        "vec_id long, embedding array<float>",
    )
    xm, _ = lloyd_centroids(df, k=1, iters=0)
    v = xm.collect()[0].xm
    # float32(5e-7) widens to ~5.0000...e-7 ulps off exact .5; assert
    # only sign symmetry + the exact representable case.
    assert v[0] == -v[1]
    assert v[2] == round(float(np.float32(0.25)) * MICRO)


def test_kmeans_deterministic_across_invocations(spark, sf_dir):
    from orx_surgical_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, kmeans_lloyd(emb, k=4, iters=2).collect()))
    b = sorted(map(tuple, kmeans_lloyd(emb, k=4, iters=2).collect()))
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k=3 over 2 distinct points: one centroid never wins a point
    after the first update and must carry over unchanged (COALESCE
    branch) instead of crashing or going null."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [9.0, 9.0])],
        "vec_id long, embedding array<float>",
    )
    rows = kmeans_lloyd(df, k=3, iters=3).collect()
    assert len(rows) == 3
    assert all(r.dist_micro_sq == 0 for r in rows)


def test_kmeans_final_plan_is_map_only(spark, sf_dir):
    """The returned plan must contain no Exchange and no Join — the
    iterations happen at construction; serving the assignment is one
    codegen pass over the checkpointed quantized corpus."""
    from orx_surgical_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        kmeans_lloyd(emb, k=4, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_kmeans_rejects_fewer_vectors_than_k(spark):
    """n < k violates the smallest-k-ids init rule — must raise a
    clear ValueError, not IndexError in the carry-over step."""
    import pytest

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="at least k=4"):
        kmeans_lloyd(df, k=4, iters=1)


def test_kmeans_rejects_empty_corpus(spark):
    import pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        kmeans_lloyd(empty, k=2, iters=1)
