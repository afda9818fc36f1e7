"""Bench harness: run the headline catalog queries end-to-end and print
ONE JSON line with per-query wall-clock seconds.

Usage: ``python bench.py`` — reads ``SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and ``SPARK_GRAFT_CPUS`` (default all cores).
Each query is forced through a full materialization via the noop sink
(no driver collect — measures the distributed plan, not pandas
conversion).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from orx_surgical_spark.queries.catalog import REGISTRY
    from orx_surgical_spark.session import get_spark, shuffle_partitions_for_bytes

    # Shuffle width follows input volume (see shuffle_partitions_for_bytes):
    # constant-width shuffles either drown small inputs in task overhead
    # or starve big ones.
    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    ) if os.path.isdir(sf_dir) else 0
    spark = get_spark(
        app_name="orx-surgical-bench",
        shuffle_partitions=shuffle_partitions_for_bytes(input_bytes),
    )
    # AQE follows data volume too: its per-stage re-optimization costs
    # driver round trips that dominate sub-second queries, while static
    # planning already picks broadcast joins here (input sizes are known
    # at plan time and far below the broadcast threshold). Above ~1 GB,
    # runtime re-planning (skew splits, dynamic broadcast, coalescing)
    # pays for itself — measured ~15% of bench wall at sf0.1.
    if input_bytes < (1 << 30):
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    bench_queries = {n: q for n, q in sorted(REGISTRY.items()) if q.bench}

    # Untimed warmup at the smallest SF: compiles the same whole-stage
    # codegen classes (the codegen cache keys on generated source, which
    # is data-independent), so the timed loop measures steady-state
    # throughput instead of first-run JIT/codegen (~2-3 s per query).
    warmup_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warmup_dir):
        for name, q in bench_queries.items():
            try:
                q.fn(spark, warmup_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    # Best-of-N per query (N = SPARK_GRAFT_BENCH_RUNS, default 5): the
    # repeat runs reuse compiled codegen and warmed file/footer caches,
    # so min-of-runs reports steady-state throughput with less scheduler
    # noise. 5 runs (up from 3 in r4) makes the median-based spread
    # meaningful: with co-located load stalling ~1 run in 6 (measured
    # r5), 3 runs left the median itself contaminated too often.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    # One untimed run per query at the TARGET scale first: the sf0.001
    # warmup above compiles codegen, but scale-dependent state (parquet
    # footer/page cache, broadcast builds, shuffle file buffers) only
    # warms at the measured size — without this, run 1 is structurally
    # 2-4x the steady state and the spread number reads as machine
    # noise when it isn't.
    for name, q in bench_queries.items():
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"# target warmup {name} failed: {exc}", file=sys.stderr)

    # Timed runs are interleaved round-robin (q1 q2 ... qn, q1 q2 ...):
    # a transient background-load spike then degrades at most one run
    # of each query instead of all N runs of whichever query it
    # coincides with — min-of-N stays meaningful on a shared machine.
    # Each timed run is error-isolated: one broken query records as
    # "failed" in the JSON instead of killing the whole artifact (r3
    # lesson — a single AnalysisException zeroed out the round's bench).
    all_times: dict[str, list[float]] = {n: [] for n in bench_queries}
    failures: dict[str, str] = {}
    t_all = time.perf_counter()
    for _ in range(max(runs, 1)):
        for name, q in bench_queries.items():
            if name in failures:
                continue
            t0 = time.perf_counter()
            try:
                df = q.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:
                failures[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"# FAILED {name}: {failures[name]}", file=sys.stderr)
                continue
            all_times[name].append(time.perf_counter() - t0)

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    worst: dict[str, float] = {}
    for name, times in all_times.items():
        # A query that succeeded on an early run but failed later must
        # not look healthy to a consumer reading `queries` alone:
        # `failed` takes precedence, so drop its partial timings.
        if not times or name in failures:
            continue
        best = min(times)
        timings[name] = round(best, 3)
        # Run-to-run spread: (median-min)/min — steady-state
        # repeatability of the plan. The r4 investigation showed the
        # max-based spread was dominated by single multi-second stalls
        # from co-located machine load (arbitrary queries, 300-870%,
        # JVM GC measured at <100 ms, not positional): one contaminated
        # run out of N says nothing about the plan, so the headline
        # spread is outlier-robust and the worst run is reported
        # separately in worst_run_pct rather than silently dropped.
        med = sorted(times)[len(times) // 2]
        spreads[name] = round((med - best) / best, 3) if best > 0 else 0.0
        worst[name] = round((max(times) - best) / best, 3) if best > 0 else 0.0
        print(
            f"# {name}: {timings[name]:.3f}s (spread {spreads[name]:.1%}, "
            f"worst {worst[name]:.1%})",
            file=sys.stderr,
        )
    total = round(sum(timings.values()), 3)
    print(
        f"# wall including repeats: {time.perf_counter() - t_all:.3f}s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": max(runs, 1),
                "run_spread_pct": {n: round(s * 100, 1) for n, s in spreads.items()},
                "max_spread_pct": round(max(spreads.values()) * 100, 1)
                if spreads
                else 0.0,
                "worst_run_pct": {n: round(w * 100, 1) for n, w in worst.items()},
                "loadavg_1m": round(os.getloadavg()[0], 2),
                "failed": failures,
            }
        )
    )


if __name__ == "__main__":
    main()
