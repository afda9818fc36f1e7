"""Distributed connected components over an edge DataFrame.

Near-duplicate *clustering* is the missing last step of every dedup
pipeline in this engine: LSH / minhash / embedding blocking emit
verified candidate PAIRS (:mod:`orx_surgical_spark.operators.dedup`,
:mod:`~orx_surgical_spark.operators.similarity`), but "keep one doc per
duplicate cluster" needs the transitive closure of those pairs — a
connected-components problem on a graph whose edge list is itself a
DataFrame.

Algorithm: min-label propagation fused with pointer jumping (path
halving). Each round does

1. ``label(v) <- min(label(v), min over neighbours u of label(u))``
   — one shuffle on the edge's src key + one hash aggregate on dst;
2. ``label(v) <- label(label(v))`` — one self-join of the (small)
   label table, which halves pointer chains.

Step 2 turns the O(diameter) worst case of plain propagation (long
chains) into O(log diameter) rounds, the same convergence class as the
large-star/small-star algorithm of Kiveris et al. (MapReduce CC), while
staying three DataFrame ops per round. Every round ends in an eager
``localCheckpoint`` — iterative lineage otherwise grows the Catalyst
plan exponentially and re-executes prior rounds. On a real cluster with
a fault-tolerance requirement, swap ``localCheckpoint`` for
``checkpoint`` against a durable dir; semantics are identical.

Scale notes: the label table is one row per *node that appears in an
edge* — for near-dup clustering that is only the duplicated minority of
the corpus, typically orders of magnitude smaller than the corpus
itself. Both per-round shuffles key on node id; skew only arises if one
node participates in a huge fraction of edges, which LSH band-capping
upstream (dedup.py) already bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    edges_distinct: bool = False,
    driver_cutover_edges: int = 100_000,
    broadcast_labels_max_nodes: int = 4_000_000,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum
    node id in the node's connected component.

    ``edges`` is an undirected edge list (direction ignored, self-loops
    dropped). Nodes with no edges don't appear; callers wanting
    singleton components left-join the full node set and coalesce to
    the node's own id.

    ``edges_distinct=True`` declares the input has no duplicate
    (src, dst) pairs and no pair present in both orientations — true of
    every in-repo caller (verified near-dup pairs and consecutive-id
    edges both guarantee ``src < dst`` distinct) — which drops the
    defensive pre-distinct. Duplicate edges never change the answer
    (min-label over more rows), only the per-round join fan-out, so the
    flag is purely the cost knob: one full exchange+HashAggregate over
    the edge set removed from the eager prefix (r12; the bench showed
    ~90% of corpus_curation_summary's wall inside this function's eager
    checkpoints, whose first job executes the whole upstream LSH+verify
    pipeline).

    ``driver_cutover_edges``: symmetrized edge sets at or below twice
    this bound are solved on the driver by union-find instead of the
    distributed loop (see the inline comment); pass 0 to force the
    loop. Both paths produce identical (node, min-id component) rows.

    ``broadcast_labels_max_nodes``: when the node census (one count of
    the already-materialized label checkpoint) is at or below this
    bound, the RETURNED frame carries an explicit broadcast hint: the
    loop's result is a checkpoint that plans as ``Scan ExistingRDD``
    with UNKNOWN stats, so without the hint every consumer keep-join
    sort-merges the full corpus against a label table Catalyst cannot
    see is small — the same unknown-stats pathology
    ``_driver_union_find`` fixed for the cutover path's consumers
    (r13 §8). Strategy-only (a hint never changes rows); above the
    bound consumers keep the sort-merge shape, which is then correct.

    The knob is a hard CEILING, not the bound itself (ADVICE r13: a
    fixed 4M-row hint bypassed ``autoBroadcastJoinThreshold`` entirely,
    and a 4M-row built hash relation is ~100-200 MB per executor, not
    the docstring's optimistic "tens of MB"). The effective bound is
    ``min(ceiling, session autoBroadcastJoinThreshold /
    _BROADCAST_BYTES_PER_LABEL_ROW)`` — i.e. the hint only re-applies
    the decision the session's own threshold implies for a relation
    whose size Catalyst cannot estimate (a checkpoint). With the
    repo session's 64 MB threshold that is ~1M nodes; on a vanilla
    10 MB session ~160k. Pass 0 to disable. Broadcasting the label
    tables INSIDE the loop was measured and rejected (r13): per-round
    broadcasts of a changing table churn driver/executor memory faster
    than the context cleaner reclaims them — isolated sf3 best-of-5
    went from a stable 6.9 s median (sort-merge rounds) to 14 s with
    2-4x run variance.
    """
    # Materialize the edge list BEFORE the two-orientation union: a
    # DataFrame is a plan, and both union branches embed it, so an
    # unmaterialized upstream (the curation pipeline's whole LSH +
    # verify stage; doc_lang_components' self-join) would execute TWICE
    # inside the sym checkpoint job (measured r13: CC-phase wall at sf3
    # dropped from ~22 s inside the pipeline to ~7 s on pre-materialized
    # edges — the difference was a second full verify pass). Lineage is
    # cut a second time by the sym checkpoint right after; this one
    # exists only to dedupe the upstream execution, at the price of one
    # pass over the (small) edge list.
    edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    ).localCheckpoint(eager=True)
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not edges_distinct:
        sym = sym.distinct()
    sym = sym.localCheckpoint(eager=True)

    # Small-graph cutover (r13; same precedent as similarity.py's
    # small-corpus Gram cutover): the iterative loop's per-round cost is
    # ~6 exchanges + a job-scheduling floor, which DOMINATES when the
    # duplicate graph is small — at sf0.1 the curation pipeline's CC
    # phase spent ~1.2 s of pure scheduling on 512 edges (2 rounds).
    # Below the bound, solve on the driver with union-find (micro-
    # seconds for 100k edges, ~3 MB of longs) and hand the result back
    # as a LocalRelation the downstream keep-join can broadcast. The
    # census is one tiny count job over the ALREADY-materialized
    # checkpoint, negligible next to even a single loop round. The
    # distributed loop stays the at-scale path: a real 10-100 TB corpus
    # at a 30-50% dup factor has O(n_docs) verified edges, far past the
    # bound (tests pin loop ≡ cutover on the same graphs).
    if sym.count() <= 2 * driver_cutover_edges:  # sym holds both orientations
        return _driver_union_find(sym)

    # Eager on purpose: every round references the label table TWICE
    # (the neighbour-min join and the fold join), so an unmaterialized
    # label plan is re-executed per reference. A lazy init (and,
    # worse, batching two propagate+jump steps into one checkpoint to
    # halve job-scheduling floors) was tried in r12 and REVERTED: a
    # DataFrame is a plan, not a result, so each un-checkpointed step
    # is EMBEDDED 2-3x in the plan that consumes it (neighbour-min
    # join, fold join, and the pointer-jump self-join) — the batched
    # round re-executes step A's three exchanges up to three times,
    # trading one scheduling floor for up to 2x the exchange work.
    # Measured in-lap at sf1 it was a wash (14.9 s batched vs the
    # box-speed-adjusted r11 12.3 s single-step on the curation
    # pipeline); the single-step form is the shape with one
    # materialization per step and no duplicated subplans.
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # Node census over the materialized checkpoint (one cheap job):
    # decides whether the RETURNED frame is small enough to hint for
    # the consumers' keep-joins (see the docstring; in-loop broadcasts
    # were measured and rejected). The effective bound derives from the
    # session's own broadcast threshold so the hint never forces a
    # build the session's config would refuse on a known-size relation.
    broadcast_small = broadcast_labels_max_nodes > 0 and labels.count() <= min(
        broadcast_labels_max_nodes,
        _broadcast_label_rows_bound(edges.sparkSession),
    )

    from pyspark.sql import Observation

    for _ in range(max_iter):
        # (1) min label over neighbours, folded into own label; the old
        # label rides along so convergence is decided by an observed
        # metric on the checkpoint job instead of a second join+count
        # job per round.
        neigh_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(sym["b"].alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        # stepped is referenced twice below (jump probe + the parent
        # lookup). A DataFrame is a plan, not a result: without its own
        # checkpoint the neigh_min subtree — the round's only pass over
        # the edge set — is EMBEDDED twice in the jump plan and executed
        # twice (measured r13: the round plan carries 10 Exchanges and
        # ZERO ReusedExchange with AQE off; Spark does not reuse the
        # duplicated exchange here). One extra small-table
        # materialization per round buys back a full edge-set pass.
        stepped = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.col("label").alias("old"),
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # (2) pointer jump: label <- label(label). Halves chains.
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        obs = Observation()
        jumped = (
            stepped.join(parent, stepped["label"] == parent["p_node"], "left")
            .select(
                "node", F.coalesce("p_label", "label").alias("label"), "old"
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum((F.col("label") != F.col("old")).cast("long")),
                    F.lit(0),
                ).alias("changed"),
            )
        )
        labels = jumped.select("node", "label").localCheckpoint(eager=True)
        # The eager checkpoint already materialized the plan, so the
        # metric is available without launching any further job.
        if obs.get["changed"] == 0:
            break

    out = labels.select("node", F.col("label").alias("component"))
    # Same consumer-side rationale as _driver_union_find's hint: the
    # result is a checkpoint (unknown stats) that every caller joins
    # against the full corpus — broadcast it when the census says it is
    # small, keep sort-merge when it is not.
    return F.broadcast(out) if broadcast_small else out


#: Built-hash-relation bytes per (node, label) long pair — UnsafeRow +
#: LongHashedRelation map overhead dominates the 16 B payload. The
#: measured datum (tests/test_graph.py::test_label_broadcast_bytes_per_row,
#: BroadcastExchange dataSize at the sf10 census scale of 485k rows)
#: is 42.6 B/row serialized (20.66 MB total); 64 keeps a ~1.5x margin
#: for the in-memory hash map on top of the serialized form.
_BROADCAST_BYTES_PER_LABEL_ROW = 64


def _broadcast_label_rows_bound(spark) -> int:
    """Max label rows the session's ``autoBroadcastJoinThreshold``
    implies for a (node, label) relation (ADVICE r13: derive the hint
    bound from the threshold instead of a fixed row count)."""
    from orx_surgical_spark.operators.dedup import _broadcast_threshold_bytes

    thr = _broadcast_threshold_bytes(spark)
    if thr <= 0:  # broadcast disabled in this session
        return 0
    return thr // _BROADCAST_BYTES_PER_LABEL_ROW


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Exact CC of a small symmetrized edge set on the driver.

    Classic union-find with path halving; labels are then canonicalized
    to the minimum node id per component, so the result is identical to
    the distributed loop's (min-label) output row-for-row — the
    deterministic contract the DuckDB recursive-CTE oracles replay.
    Returns ``(node, component)`` typed like the edge endpoints, with
    an explicit broadcast hint: a Python-created local DataFrame plans
    as ``Scan ExistingRDD`` with UNKNOWN stats (not a LocalRelation),
    so without the hint every consumer keep-join sort-merges it —
    measured at sf0.1 that re-added two Exchanges + two Sorts to
    corpus_curation_summary's final join for a ≤200k-row build side
    that is a few MB of longs. The hint is strategy-only (never
    changes rows) and the cutover bound keeps it far under the
    broadcast cap."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            parent[root] = parent[parent[root]]  # path halving
            root = parent[root]
        return root

    for row in sym.collect():
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    roots = {n: find(n) for n in parent}
    for n, r in roots.items():
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    from pyspark.sql import types as T

    a_type = sym.schema[0].dataType
    schema = T.StructType(
        [T.StructField("node", a_type), T.StructField("component", a_type)]
    )
    return F.broadcast(
        sym.sparkSession.createDataFrame(
            [(n, comp_min[r]) for n, r in roots.items()], schema
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge DataFrame; returns
    ``(node, rank)`` with ranks summing to 1 (within float error).

    Each iteration is the standard power step

        rank(v) <- (1-d)/N + d * (sum over in-neighbours u of
                   rank(u)/out_deg(u)  +  dangling_mass / N)

    as two DataFrame ops: one equi-join of the rank table with the edge
    list on the source key, one hash aggregate on the destination key.
    Dangling nodes (no out-edges) spread their mass uniformly; their
    aggregate rank is collected as an *observed metric* on the previous
    round's checkpoint job (the dangling node set is fixed, so round 0
    needs only the dangling-node count under the uniform init) — no
    per-round scalar job at all. ``out_deg`` rides along in the rank
    table, so the per-round plan is exactly one join + one aggregate.
    The edge list re-partitions once on ``src`` up front so every
    iteration's join reuses that partitioning; per-round
    ``localCheckpoint`` truncates the growing iterative lineage (swap
    for ``checkpoint`` on a durable dir when running on a cluster).

    Scale: state per round is one (node, rank) row per node — O(V) —
    and one shuffle keyed on node id; edge skew (celebrity nodes) only
    affects the aggregate side, which partial-aggregates map-side.
    """
    e = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .distinct()
        .repartition("e_src")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .union(e.select("e_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    n_total = nodes.count()
    out_deg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("out_deg"))
    # out_deg travels with the rank table (null = dangling): the
    # per-round plan needs no rank⋈out_deg join and the dangling mass
    # is observable on the same pass that materializes the new ranks.
    flagged = (
        nodes.join(out_deg, nodes["node"] == out_deg["e_src"], "left")
        .select("node", "out_deg")
        .localCheckpoint(eager=True)
    )
    n_dangling = flagged.where(F.col("out_deg").isNull()).count()
    ranks = flagged.withColumn("rank", F.lit(1.0 / n_total))
    dangling = n_dangling / n_total  # uniform init ⇒ exact, no job

    for _ in range(n_iter):
        contrib = (
            e.join(ranks.where(F.col("out_deg").isNotNull()),
                   e["e_src"] == F.col("node"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("c"))
        )
        base = (1.0 - damping) / n_total + damping * dangling / n_total
        obs = Observation()
        ranks = (
            flagged.join(contrib, "node", "left")
            .select(
                "node",
                "out_deg",
                (F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(
                        F.when(F.col("out_deg").isNull(), F.col("rank"))
                        .otherwise(F.lit(0.0))
                    ),
                    F.lit(0.0),
                ).alias("dangling_mass"),
            )
            .localCheckpoint(eager=True)
        )
        dangling = obs.get["dangling_mass"]
    return ranks.select("node", "rank")


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle census of an undirected graph: one row with
    ``n_nodes, n_edges, n_triangles, n_wedges, global_clustering``
    (= 3T / wedges) — the cluster-density diagnostic for a near-dup
    graph (high clustering => LSH components are genuine clique-ish
    duplicate groups; low => chains of borderline pairs that a
    transitive closure would over-merge).

    Algorithm: degree-oriented node-iterator. Edges are canonicalized
    and deduplicated, then ORIENTED from the (degree, id)-smaller
    endpoint to the larger — every wedge is generated at its
    lowest-degree vertex, which bounds per-vertex wedge fan-out by
    O(sqrt(|E|)) even on skewed graphs (the hub never fans out; it is
    always the wedge tip). One self-join builds oriented wedges, one
    semi-ish join closes them against the oriented edge set; wedge
    totals come from the exact degree table. All shuffles key on
    vertex ids; no global sort, no cartesian.
    """
    # This operator runs THREE actions (triangle count, edge count, the
    # degree aggregate) and its intermediates are each referenced 2-3x
    # across/within them. Un-materialized, the canonicalize+distinct
    # pipeline would re-run once per reference (r13, same measured
    # mechanism as the CC loop): e feeds deg twice + the orientation
    # join + the edge count; deg feeds both orientation sides + the
    # wedge total; o feeds both wedge sides + the closing semi-join.
    # Three eager checkpoints (O(E), O(V), O(E)) make every downstream
    # reference a block read.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # Orientation rank: lexicographic (deg, id). Carried as columns so
    # comparisons stay in codegen.
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("deg").alias("db")), "b")
    )
    lower_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_is_a, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    # Wedges at u: out-neighbour pairs (v, w) ordered by (deg, id);
    # close each against the oriented edge v->w.
    w1 = o.select(F.col("u"), F.col("v"), F.col("dv"))
    w2 = o.select(
        F.col("u"), F.col("v").alias("w"), F.col("dv").alias("dw")
    )
    wedges = w1.join(w2, "u").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closed = wedges.join(
        o.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"],
        "leftsemi",
    )
    n_tri = closed.count()
    n_edges = e.count()
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    ).first()
    spark = edges.sparkSession
    # Empty edge set: SUM() is NULL — coalesce both counters to 0 so the
    # summary row is well-typed instead of raising on int(None).
    n_nodes = int(stats.n_nodes) if stats.n_nodes is not None else 0
    n_wedges = int(stats.n_wedges) if stats.n_wedges is not None else 0
    base = spark.createDataFrame(
        [(n_nodes, int(n_edges), int(n_tri), n_wedges)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint, n_wedges bigint",
    )
    # Round in-plan with F.round (HALF_UP, away from zero) so the value
    # matches the DuckDB oracle's ROUND exactly — Python round() is
    # half-to-even and can disagree at the 6th decimal.
    return base.select(
        "*",
        F.when(
            F.col("n_wedges") > 0,
            F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("global_clustering"),
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-round k-core peel of an undirected graph: drop nodes of
    degree < ``k``, recompute degrees on the induced subgraph, repeat
    ``rounds`` times. Returns one row per surviving node:
    ``[node, core_deg, converged]`` where ``core_deg`` is the node's
    degree inside the final subgraph and ``converged`` is true iff one
    MORE round would remove nothing (i.e. the result IS the exact
    k-core, not just a bounded-round approximation — the flag makes
    the bounded semantics honest at any scale instead of silently
    wrong past the round budget).

    Why k-core next to connected components / triangles: a dedup
    cluster that survives the 2-core is cycle-redundant (every member
    is corroborated by >= 2 independent near-dup edges), while
    tree-like chains — the shape transitive closure over-merges — peel
    away entirely. The density screen between "component" (too loose)
    and "clique" (too strict).

    Scale shape per round: one degree aggregate (map-side combined) +
    two LeftSemi joins against a node list that only ever SHRINKS —
    no global structure, no windows. The edge set is localCheckpointed
    each round so T rounds stay T plans, not one 2^T-deep lineage
    (same precedent as :func:`connected_components`). Convergence for
    locality-bounded graphs (e.g. the lang-affinity doc graph, where
    cascades cannot cross run boundaries) is 2-3 rounds regardless of
    corpus size; the flag reports if a pathological graph needs more.
    """
    # Materialize before the two-orientation union (same defect and fix
    # as connected_components, r13): both union branches embed the edge
    # input, so a plan-valued ``edges`` would execute twice inside the
    # checkpoint job.
    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    ).localCheckpoint(eager=True)
    sym = base.union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = sym.distinct().localCheckpoint(eager=True)

    def degrees(ed: DataFrame) -> DataFrame:
        return ed.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )

    for _ in range(rounds):
        # survivors is referenced by BOTH semi-joins below; without its
        # own materialization the degree aggregate — the round's only
        # pass over the edge set — runs twice per round (r13, same
        # measured mechanism as the CC loop's stepped table).
        survivors = (
            degrees(e)
            .where(F.col("deg") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
        e = (
            e.join(
                survivors.select(F.col("node").alias("a")), "a", "leftsemi"
            )
            .join(
                survivors.select(F.col("node").alias("b")), "b", "leftsemi"
            )
            .localCheckpoint(eager=True)
        )
    final = degrees(e)
    # One probe round: converged iff no final node is under-degree.
    n_under = final.where(F.col("deg") < k).count()
    return final.select(
        "node",
        F.col("deg").alias("core_deg"),
        F.lit(n_under == 0).alias("converged"),
    )


def kcore_oracle_sql(edges_cte: str, k: int = 2, rounds: int = 4) -> str:
    """Generate the DuckDB oracle that replays :func:`kcore` with every
    peel round unrolled as a CTE pair (same generated-oracle pattern
    as ``clustering.kmeans_oracle_sql``) — so the hash check proves
    the whole iterative peel plus the convergence probe, not just the
    final projection. ``edges_cte`` must select a SYMMETRIC distinct
    edge set as columns ``(a, b)``."""
    parts = [f"WITH e0 AS ({edges_cte})"]
    for t in range(1, rounds + 1):
        prev = f"e{t - 1}"
        parts.append(f"""
    , v{t} AS (
      SELECT a AS n FROM {prev} GROUP BY a HAVING COUNT(*) >= {k}
    ), e{t} AS (
      SELECT e.a, e.b FROM {prev} e
      JOIN v{t} x ON x.n = e.a
      JOIN v{t} y ON y.n = e.b
    )""")
    parts.append(f"""
    , final AS (
      SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
      FROM e{rounds} GROUP BY a
    ), under AS (
      SELECT COUNT(*) AS u FROM final WHERE core_deg < {k}
    )
    SELECT node, core_deg, (SELECT u FROM under) = 0 AS converged
    FROM final
    """)
    return "".join(parts)


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-round breadth-first distances from a seed set over an
    undirected graph: one row per node reached within ``rounds`` hops,
    ``[node, dist, frontier_exhausted]`` — ``dist`` the exact hop
    distance (0 for seeds) and ``frontier_exhausted`` true iff the
    last expansion added no new node, i.e. the reported layers are the
    COMPLETE reachable set, not a round-budget truncation (the same
    honest-bounded-semantics contract as :func:`kcore`).

    The missing radius diagnostic next to the rest of the graph tier:
    connected components say WHICH cluster a doc joins, k-core how
    dense it is, BFS layers how FAR the contamination/duplication
    spreads from a seed (e.g. how many hops from a known-bad document
    before the near-dup graph dies out).

    Scale shape per round: one equi-join of the CURRENT FRONTIER (not
    the visited set) against the edge list + one LeftAnti against
    visited + a min-dist distinct — frontier-sized work. The edge set
    and per-round state are localCheckpointed so T rounds stay T
    plans.
    """
    # Materialize before the two-orientation union (same defect and fix
    # as connected_components, r13): a plan-valued ``edges`` would
    # otherwise execute twice inside the checkpoint job.
    base = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    ).localCheckpoint(eager=True)
    sym = base.union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = sym.distinct().localCheckpoint(eager=True)

    visited = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    exhausted = False
    for t in range(1, rounds + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "leftanti")
            .select("node", F.lit(t).alias("dist"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            exhausted = True
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    if not exhausted:
        # Probe round: did the budget land exactly on the fixpoint?
        probe = (
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "leftanti")
        )
        exhausted = probe.isEmpty()
    return visited.select(
        "node", "dist", F.lit(exhausted).alias("frontier_exhausted")
    )


def bfs_oracle_sql(
    edges_cte: str, seeds_cte: str, rounds: int = 4
) -> str:
    """Generated DuckDB oracle replaying :func:`bfs_layers` with each
    expansion unrolled as a CTE (the kcore_oracle_sql pattern).
    ``edges_cte`` selects a symmetric distinct ``(a, b)`` edge set;
    ``seeds_cte`` selects distinct seed ``node`` values."""
    parts = [
        f"WITH e AS ({edges_cte}), v0 AS ("
        f"SELECT node, 0 AS dist FROM ({seeds_cte}))"
    ]
    for t in range(1, rounds + 1):
        prev = f"v{t - 1}"
        frontier = f"SELECT node FROM {prev} WHERE dist = {t - 1}"
        parts.append(f"""
    , v{t} AS (
      SELECT node, dist FROM {prev}
      UNION ALL
      SELECT n.node, {t} AS dist FROM (
        SELECT DISTINCT e.b AS node
        FROM ({frontier}) f JOIN e ON e.a = f.node
      ) n
      WHERE n.node NOT IN (SELECT node FROM {prev})
    )""")
    parts.append(f"""
    , probe AS (
      SELECT COUNT(*) AS n FROM (
        SELECT DISTINCT e.b AS node
        FROM (SELECT node FROM v{rounds} WHERE dist = {rounds}) f
        JOIN e ON e.a = f.node
      ) x
      WHERE x.node NOT IN (SELECT node FROM v{rounds})
    )
    SELECT node, CAST(dist AS INT) AS dist,
           (SELECT n FROM probe) = 0 AS frontier_exhausted
    FROM v{rounds}
    """)
    return "".join(parts)
