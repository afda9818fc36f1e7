"""Stage-level plan evidence for the r13 curation-pipeline changes.

FRAGILITY NOTE (ADVICE r13): the before/after replay below detects the
loop's shape by string-matching ``inspect.getsource`` of
``connected_components`` (splitting on ``"sym ="`` and the
``"# (2) pointer jump"`` comment). It was written against the r13
shas (``8959601`` before, ``20fc8f6`` after); if the loop body is
reworded the replay silently dumps the wrong shape — treat this as a
one-round evidence script and re-pin the markers before reusing it.

The committed ``plans/r13/corpus_curation_summary_*.txt`` files show
only the query's FINAL plan (keep-join + aggregate): the LSH, verify
and CC stages execute at build time behind eager localCheckpoints, so
their plans never appear in the tail. This script dumps the internal
stage plans the round's claims are about:

- ``curation_verify_stage``  — the jaccard_verify output plan (shingle
  table referenced twice: before = two embedded semi-join+shingle
  subtrees, after = two scans of one checkpoint + broadcast hint);
- ``cc_sym_union``           — the subtree the sym checkpoint executes
  (before = upstream verify pipeline EMBEDDED TWICE by the
  two-orientation union, after = two scans of the edges checkpoint);
- ``cc_round_jump``          — one propagate+jump round's plan on a
  synthetic checkpointed graph (before = the neigh_min subtree
  embedded twice with zero ReusedExchange, after = jump over the
  round's own stepped checkpoint).

Run once per code state with the matching PYTHONPATH::

    PYTHONPATH=<worktree-at-before-sha> python scripts/dump_curation_stage_plans.py \
        --out plans/r13 --tag before --sf-dir .scale/sf3
    PYTHONPATH=<repo> python scripts/dump_curation_stage_plans.py \
        --out plans/r13 --tag after --sf-dir .scale/sf3
"""

from __future__ import annotations

import argparse
import os


def _fmt(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default="/root/repo/.scale/sf3")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from orx_surgical_spark.operators import dedup as D
    from orx_surgical_spark.operators.text import tokens
    from orx_surgical_spark.session import get_spark, shuffle_partitions_for_bytes
    from orx_surgical_spark.sources.readers import ensure_min_partitions, load_table

    sf_dir = args.sf_dir
    input_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(sf_dir)
        for f in files
        if f.endswith(".parquet")
    )
    spark = get_spark(
        app_name="stage-plans",
        shuffle_partitions=shuffle_partitions_for_bytes(input_bytes),
    )
    if input_bytes < (1 << 30):
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    os.makedirs(args.out, exist_ok=True)

    def dump(name: str, text: str) -> None:
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path}")

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    eligible = docs.where(F.size(tokens("text")) >= 10)

    # 1. verify stage (lazy — plan visible without execution)
    verified = (
        D.jaccard_verify(D.lsh_candidate_pairs(eligible), eligible)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    dump("curation_verify_stage_sf3", _fmt(spark, verified))

    # 2. what the CC sym checkpoint executes: the two-orientation union
    #    over the edge input exactly as connected_components builds it.
    edges = verified.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    e = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).where(
        F.col("a") != F.col("b")
    )
    # Replay the sym construction exactly as the running code state
    # builds it (detected from the loop's own source, so the same
    # script dumps faithful before/after shapes from either tree).
    import inspect

    from orx_surgical_spark.operators.graph import connected_components

    loop_src = inspect.getsource(connected_components)
    if "edges = edges.select" in loop_src and ".localCheckpoint" in loop_src.split(
        "sym ="
    )[0]:
        e = e.localCheckpoint(eager=True)
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    dump("cc_sym_union_sf3", _fmt(spark, sym))

    # 3. one loop round on a synthetic checkpointed graph (shape-only:
    #    chain graph, 5k nodes), replaying the loop body source.
    rng = spark.range(0, 100000).select(
        (F.col("id") % 5000).alias("a"), ((F.col("id") + 7) % 5000).alias("b")
    )
    s = rng.localCheckpoint(eager=True)
    labels = (
        s.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    neigh_min = (
        s.join(labels, s["a"] == labels["node"])
        .groupBy(s["b"].alias("node"))
        .agg(F.min("label").alias("nmin"))
    )
    stepped = labels.join(neigh_min, "node", "left").select(
        "node",
        F.col("label").alias("old"),
        F.least("label", F.coalesce("nmin", "label")).alias("label"),
    )
    if ".localCheckpoint(eager=True)" in loop_src.split("stepped = (")[-1].split(
        "# (2) pointer jump"
    )[0]:
        stepped = stepped.localCheckpoint(eager=True)
    parent = stepped.select(
        F.col("node").alias("p_node"), F.col("label").alias("p_label")
    )
    jumped = stepped.join(parent, stepped["label"] == parent["p_node"], "left").select(
        "node", F.coalesce("p_label", "label").alias("label"), "old"
    )
    dump("cc_round_jump", _fmt(spark, jumped))


if __name__ == "__main__":
    main()
