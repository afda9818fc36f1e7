"""Sketch aggregates: bound approx_count_distinct / percentile_approx
error against exact values (engine-specific, so no SQL oracle)."""

from pyspark.sql import functions as F

from orx_surgical_spark.sources import load_table


def test_hll_within_five_percent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: (r["approx"], r["exact"])
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    for et, (approx, exact) in got.items():
        assert abs(approx - exact) <= max(0.05 * exact, 2), et


def test_percentile_approx_brackets_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.percentile_approx("value", 0.5).alias("approx"),
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).collect()[0]
    spread = row["hi"] - row["lo"]
    assert abs(row["approx"] - row["exact"]) <= 0.05 * spread


def test_mg_heavy_hitters_guarantee_skewed_multipartition(spark):
    """MG theorem on a skewed stream split over 4 partitions: never
    overcounts, undercount bounded by summed slack, every key whose
    count exceeds the slack survives the evictions, and each partition
    emits at most k counter rows + 1 slack row."""
    from orx_surgical_spark.operators.sketches import mg_heavy_hitters

    # Zipf-ish: key_i appears 1000 // (i + 1) times, 40 distinct keys.
    rows = [(f"k{i:02d}",) for i in range(40) for _ in range(1000 // (i + 1))]
    df = spark.createDataFrame(rows, ["key"]).repartition(4)
    k = 8
    out = mg_heavy_hitters(df, "key", k=k).collect()

    # partition emission bound: total rows <= (k + 1) * n_partitions
    assert len(out) <= (k + 1) * 4

    slack = sum(r.slack for r in out)
    est = {}
    for r in out:
        if r.key is not None:
            est[r.key] = est.get(r.key, 0) + r.est
    exact = {
        r.key: r.cnt
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert slack > 0  # 40 keys vs k=8 forces evictions
    for key, cnt in exact.items():
        e = est.get(key, 0)
        assert e <= cnt, (key, e, cnt)
        assert cnt - e <= slack, (key, e, cnt, slack)
        if cnt > slack:  # provable-presence corollary
            assert key in est, (key, cnt, slack)


def test_mg_exact_when_vocab_fits(spark):
    """With distinct keys <= k there are no evictions: slack 0 and the
    sketch IS the exact count — the degenerate case callers rely on
    when profiling a low-cardinality key."""
    from orx_surgical_spark.operators.sketches import mg_heavy_hitters

    rows = [(f"k{i}",) for i in range(5) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, ["key"]).repartition(3)
    out = mg_heavy_hitters(df, "key", k=8).collect()
    assert sum(r.slack for r in out) == 0
    est = {}
    for r in out:
        if r.key is not None:
            est[r.key] = est.get(r.key, 0) + r.est
    assert est == {f"k{i}": i + 1 for i in range(5)}
