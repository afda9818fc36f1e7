"""Isolated CC micro-bench: time connected_components on a pre-
materialized verified-edge parquet (so the LSH/verify upstream is out
of the timed region). Usage::

    PYTHONPATH=<repo> python scripts/cc_ab.py <edges.parquet> [n_runs] [bcast_max_nodes]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    edges_path = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    bcast = int(sys.argv[3]) if len(sys.argv) > 3 else None

    import inspect

    from orx_surgical_spark.operators.graph import connected_components
    from orx_surgical_spark.session import get_spark

    spark = get_spark(app_name="cc-ab", shuffle_partitions=52)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    kw = {}
    sig = inspect.signature(connected_components)
    if bcast is not None and "broadcast_labels_max_nodes" in sig.parameters:
        kw["broadcast_labels_max_nodes"] = bcast

    edges = spark.read.parquet(edges_path)
    n_edges = edges.count()

    # warmup
    connected_components(edges, edges_distinct=True, **kw).write.format(
        "noop"
    ).mode("overwrite").save()

    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        comp = connected_components(edges, edges_distinct=True, **kw)
        comp.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "edges": n_edges,
                "kw": {k: v for k, v in kw.items()},
                "best": min(times),
                "median": sorted(times)[len(times) // 2],
                "times": times,
            }
        )
    )


if __name__ == "__main__":
    main()
