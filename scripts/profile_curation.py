"""Phase-level profile of corpus_curation_summary (guide §1.1-1.2).

Times cumulative pipeline prefixes against the noop sink so each
phase's share is (prefix_k - prefix_{k-1}):

  P1  eligibility filter + LSH candidate pairs
  P2  + exact-Jaccard verify (>= 0.5)
  P3  + connected components
  P4  full query (keep-join + per-lang aggregate)

Each prefix is rebuilt fresh per run (same rationale as bench.py's
per-run fn(): lazy localCheckpoints must not carry results across
runs). Usage::

    SPARK_GRAFT_SF_DIR=/root/repo/.scale/sf3 python scripts/profile_curation.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from orx_surgical_spark.operators import dedup as D
    from orx_surgical_spark.operators.graph import connected_components
    from orx_surgical_spark.operators.text import tokens
    from orx_surgical_spark.queries.catalog import REGISTRY
    from orx_surgical_spark.session import get_spark, shuffle_partitions_for_bytes
    from orx_surgical_spark.sources.readers import ensure_min_partitions, load_table

    input_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(sf_dir)
        for f in files
        if f.endswith(".parquet")
    )
    spark = get_spark(
        app_name="profile-curation",
        shuffle_partitions=shuffle_partitions_for_bytes(input_bytes),
    )
    if input_bytes < (1 << 30):
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    def eligible():
        docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
        return docs.where(F.size(tokens("text")) >= 10)

    def p1():
        return D.lsh_candidate_pairs(eligible())

    def p2():
        return (
            D.jaccard_verify(p1(), eligible())
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b")
        )

    def p3():
        return connected_components(
            p2().select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            edges_distinct=True,
        )

    def p4():
        return REGISTRY["corpus_curation_summary"].fn(spark, sf_dir)

    phases = {"p1_lsh_cands": p1, "p2_verify": p2, "p3_cc": p3, "p4_full": p4}

    # cardinalities once (untimed; also warms caches)
    cards = {
        "n_eligible": eligible().count(),
        "n_cands": p1().count(),
        "n_verified": p2().count(),
    }
    print(f"# cards: {cards}", file=sys.stderr)

    best: dict[str, float] = {}
    all_t: dict[str, list[float]] = {k: [] for k in phases}
    for _ in range(n_runs):
        for name, build in phases.items():
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            all_t[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name, ts in all_t.items():
        best[name] = round(min(ts), 3)
    deltas = {
        "lsh_cands": best["p1_lsh_cands"],
        "verify": round(best["p2_verify"] - best["p1_lsh_cands"], 3),
        "cc": round(best["p3_cc"] - best["p2_verify"], 3),
        "kept_agg": round(best["p4_full"] - best["p3_cc"], 3),
    }
    out = {
        "sf_dir": sf_dir,
        "n_runs": n_runs,
        "cards": cards,
        "best_prefix_s": best,
        "phase_delta_s": deltas,
        "all_times": {k: [round(t, 3) for t in v] for k, v in all_t.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
