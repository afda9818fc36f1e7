"""Unit tests for operators.graph: connected_components (chains — the
propagation worst case, stars, multi-component graphs, direction /
self-loop / duplicate-edge insensitivity) and pagerank (NumPy
power-iteration cross-check, dangling-node mass conservation)."""

import numpy as np
import pytest

from orx_surgical_spark.operators.graph import connected_components, pagerank


def _cc(spark, pairs, **kw):
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    rows = connected_components(edges, **kw).collect()
    got = {r["node"]: r["component"] for r in rows}
    # Path parity (r13): unless the caller pinned a path, assert the
    # driver union-find cutover (default at these sizes) and the
    # distributed loop agree row-for-row on every graph under test —
    # the cutover must be invisible to consumers and oracles.
    if "driver_cutover_edges" not in kw:
        loop_rows = connected_components(
            edges, driver_cutover_edges=0, **kw
        ).collect()
        assert {r["node"]: r["component"] for r in loop_rows} == got
    return got


def test_chain_collapses_to_min(spark):
    # 0-1-2-...-9: worst case for plain propagation; pointer jumping
    # must still converge well inside max_iter.
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_star(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13)]
    got = _cc(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_direction_selfloop_duplicates_ignored(spark):
    pairs = [(5, 4), (4, 5), (4, 4), (4, 3), (3, 4)]
    got = _cc(spark, pairs)
    assert got == {3: 3, 4: 3, 5: 3}


def test_isolated_nodes_absent(spark):
    got = _cc(spark, [(7, 8)])
    assert set(got) == {7, 8}


def test_chain_converges_with_tight_iteration_budget(spark):
    # log2(diameter 15) ~ 4 rounds of min+jump; 8 is generous, while a
    # plain-propagation implementation would need 15.
    got = _cc(spark, [(i, i + 1) for i in range(15)], max_iter=8)
    assert got == {i: 0 for i in range(16)}


def _np_pagerank(pairs, damping=0.85, n_iter=10):
    nodes = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in set(pairs):
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, d in set(pairs):
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (3, 1)],                       # cycle: uniform ranks
        [(1, 2), (1, 3), (1, 4), (2, 1)],               # hub with backlink
        [(1, 2), (2, 3)],                               # chain with dangling sink
        [(1, 3), (2, 3), (3, 4), (5, 3), (4, 5), (1, 2)],
    ],
)
def test_pagerank_matches_numpy_power_iteration(spark, pairs):
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=10).collect()}
    want = _np_pagerank(pairs, n_iter=10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # Probability mass is conserved (dangling redistribution included).
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_triangle_stats_known_graphs(spark):
    """K4 has 4 triangles / 12 wedges (clustering 1.0); adding a
    pendant vertex adds 3 wedges at the K4-side endpoint and no
    triangle. Duplicate/reversed input edges must not double-count."""
    from orx_surgical_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + k4 + [(3, 9)]
    df = spark.createDataFrame(noisy, ["src", "dst"])
    row = triangle_stats(df).collect()[0]
    assert row.n_nodes == 5
    assert row.n_edges == 7
    assert row.n_triangles == 4
    # K4 wedges: 4 * C(3,2) = 12; vertex 3 now has degree 4 -> C(4,2)=6
    # (+3), vertex 9 degree 1 -> 0. Total 15.
    assert row.n_wedges == 15
    assert row.global_clustering == round(12 / 15, 6)


def test_triangle_stats_star_has_none(spark):
    """A star (max-skew hub) has wedges but zero triangles — the
    degree orientation keeps the hub as wedge tip, never fan-out."""
    from orx_surgical_spark.operators.graph import triangle_stats

    star = [(0, i) for i in range(1, 9)]
    row = triangle_stats(spark.createDataFrame(star, ["src", "dst"])).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 28  # C(8,2)
    assert row.global_clustering == 0.0


def test_triangle_stats_empty_edges(spark):
    """Empty edge set: SUM(deg*(deg-1)/2) is NULL — the summary must
    coalesce to an all-zero row, not raise."""
    from orx_surgical_spark.operators.graph import triangle_stats

    empty = spark.createDataFrame([], "src long, dst long")
    row = triangle_stats(empty).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (
        0, 0, 0, 0,
    )
    assert row.global_clustering == 0.0


def test_triangle_rounding_matches_half_away(spark):
    """The clustering coefficient is rounded IN-PLAN with F.round
    (HALF_UP) so it matches the DuckDB oracle's ROUND; a graph whose
    ratio lands exactly on a 5 at the 7th decimal would expose Python
    round()'s half-to-even. 3*4/15 = 0.8 is exact here; the invariant
    under test is that the value comes back as the plan's rounded
    double, bit-equal to round-half-away."""
    from decimal import ROUND_HALF_UP, Decimal

    from orx_surgical_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    row = triangle_stats(
        spark.createDataFrame(k4, ["src", "dst"])
    ).collect()[0]
    expect = float(
        Decimal(3.0 * row.n_triangles / row.n_wedges).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    assert row.global_clustering == expect


def _kcore_df(spark, pairs, **kw):
    from orx_surgical_spark.operators.graph import kcore

    edges = spark.createDataFrame(pairs, ["src", "dst"])
    return kcore(edges, **kw).collect()


def test_kcore_peels_chain_keeps_triangle(spark):
    """Triangle + pendant chain: the 2-core is exactly the triangle
    (degree 2 inside), the chain peels end-in; converged."""
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    rows = _kcore_df(spark, pairs, k=2, rounds=4)
    assert {r.node for r in rows} == {0, 1, 2}
    assert all(r.core_deg == 2 and r.converged for r in rows)


def test_kcore_run_of_two_dissolves(spark):
    """A single edge has no 2-core; output is empty (not an error)."""
    assert _kcore_df(spark, [(7, 8)], k=2, rounds=2) == []


def test_kcore_converged_flag_false_on_tight_budget(spark):
    """A path of 8 nodes peels one node per end per round under k=2 —
    with rounds=1 the remainder still has degree-1 ends, so the flag
    must report non-convergence instead of claiming a 2-core."""
    path = [(i, i + 1) for i in range(7)]
    rows = _kcore_df(spark, path, k=2, rounds=1)
    assert rows and not any(r.converged for r in rows)
    # and with enough rounds the whole path dissolves, converged
    assert _kcore_df(spark, path, k=2, rounds=4) == []


def test_kcore_3core_of_k4_plus_tail(spark):
    """K4 survives a 3-core; the tail and its attachment cascade off."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    rows = _kcore_df(spark, k4 + [(3, 9), (9, 10)], k=3, rounds=3)
    assert {r.node for r in rows} == {0, 1, 2, 3}
    assert all(r.core_deg == 3 and r.converged for r in rows)


def _bfs(spark, pairs, seed_ids, **kw):
    from orx_surgical_spark.operators.graph import bfs_layers

    edges = spark.createDataFrame(pairs, ["src", "dst"])
    seeds = spark.createDataFrame([(s,) for s in seed_ids], ["node"])
    return bfs_layers(edges, seeds, **kw).collect()


def test_bfs_chain_distances_exact(spark):
    """Chain 0-1-2-3-4-5 seeded at 0: dist must equal hop index, and
    with rounds >= 5 the frontier is exhausted."""
    rows = _bfs(spark, [(i, i + 1) for i in range(5)], [0], rounds=6)
    assert {r.node: r.dist for r in rows} == {i: i for i in range(6)}
    assert all(r.frontier_exhausted for r in rows)


def test_bfs_budget_truncation_flagged(spark):
    """Same chain with rounds=2: only 3 layers reached and the flag
    must report the truncation."""
    rows = _bfs(spark, [(i, i + 1) for i in range(5)], [0], rounds=2)
    assert {r.node: r.dist for r in rows} == {0: 0, 1: 1, 2: 2}
    assert not any(r.frontier_exhausted for r in rows)


def test_bfs_multi_seed_min_distance(spark):
    """Two seeds at both chain ends: distances are min-over-seeds, and
    an unreachable side component never appears."""
    pairs = [(i, i + 1) for i in range(4)] + [(10, 11)]
    rows = _bfs(spark, pairs, [0, 4], rounds=4)
    got = {r.node: r.dist for r in rows}
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}
    assert all(r.frontier_exhausted for r in rows)


def test_bfs_exact_fixpoint_budget_probes_exhaustion(spark):
    """Budget landing exactly on the last layer: the probe round must
    still report exhaustion (no off-by-one truncation flag)."""
    rows = _bfs(spark, [(0, 1), (1, 2)], [0], rounds=2)
    assert {r.node: r.dist for r in rows} == {0: 0, 1: 1, 2: 2}
    assert all(r.frontier_exhausted for r in rows)


def _walk_executed_plan(node, depth=0, out=None):
    """Flatten an executed SparkPlan tree (AQE stages included) via py4j."""
    if out is None:
        out = []
    name = node.nodeName()
    out.append((name, node))
    ch = node.children()
    for i in range(ch.size()):
        _walk_executed_plan(ch.apply(i), depth + 1, out)
    if "AdaptiveSparkPlan" in name:
        _walk_executed_plan(node.executedPlan(), depth + 1, out)
    elif "QueryStage" in name:
        _walk_executed_plan(node.plan(), depth + 1, out)
    return out


def test_label_broadcast_bytes_per_row(spark):
    """Evidence datum for graph._BROADCAST_BYTES_PER_LABEL_ROW (VERDICT
    r13 item 8): at the sf10 census scale (~485k label rows) the built
    BroadcastExchange's dataSize metric must stay within the 64 B/row
    budget the threshold-derived hint bound assumes. Measured r14:
    20,657,216 bytes for 485,000 rows = 42.6 B/row serialized."""
    from pyspark.sql import functions as F

    n = 485_000
    labels = spark.range(0, n).select(
        F.col("id").alias("node"), F.col("id").alias("component")
    )
    corpus = spark.range(0, 2 * n).select(F.col("id").alias("doc_id"))
    j = corpus.join(F.broadcast(labels), corpus["doc_id"] == labels["node"], "left")
    qe = j._jdf.queryExecution()
    qe.toRdd().count()  # execute THIS QueryExecution so metrics populate
    sizes = []
    for name, node in _walk_executed_plan(qe.executedPlan()):
        if "BroadcastExchange" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "dataSize":
                    sizes.append(int(kv._2().value()))
    assert sizes, "no BroadcastExchange found in the executed plan"
    bytes_per_row = max(sizes) / n
    assert bytes_per_row <= 64, (
        f"label broadcast measured {bytes_per_row:.1f} B/row; "
        "_BROADCAST_BYTES_PER_LABEL_ROW's budget is stale"
    )


def test_label_broadcast_bound_derives_from_threshold(spark):
    """The CC result hint must honor the session's broadcast threshold
    (ADVICE r13): bound rows = threshold / 64, zero when broadcast is
    disabled."""
    from orx_surgical_spark.operators.graph import _broadcast_label_rows_bound

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        assert _broadcast_label_rows_bound(spark) == (64 << 20) // 64
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
        assert _broadcast_label_rows_bound(spark) == (10 << 20) // 64
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _broadcast_label_rows_bound(spark) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
