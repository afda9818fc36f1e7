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


def test_cms_overestimates_and_merge_equals_direct(spark):
    """CMS invariants on a skewed stream: (1) every estimate >= exact
    count (one-sided error, a theorem, not a tolerance); (2) building
    per-shard sketches and cell-summing them equals the direct build
    cell-for-cell (mergeable-summaries contract), for an arbitrary
    4-way shard assignment."""
    from pyspark.sql import functions as F

    from orx_surgical_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rows = [(f"k{i:02d}",) for i in range(50) for _ in range(500 // (i + 1))]
    df = spark.createDataFrame(rows, ["key"]).repartition(4)
    depth, width = 4, 32  # narrow grid => real collisions

    direct = cms_build(df, "key", depth=depth, width=width)
    sharded = cms_build(
        df.withColumn("s", F.crc32(F.col("key")) % 4),
        "key", depth=depth, width=width, shard_col="s",
    )
    merged = cms_merge(sharded)
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )

    probes = df.select("key").distinct()
    est = {
        r.key: r.est
        for r in cms_estimate(direct, probes, "key",
                              depth=depth, width=width).collect()
    }
    exact = {
        r.key: r.cnt
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for key in exact:
        assert est[key] >= exact[key], (key, est[key], exact[key])


def test_cms_unseen_key_estimates_from_collisions_only(spark):
    """A key never inserted gets est = min over its 4 cells — with a
    sparse stream and wide grid that minimum is 0."""
    from orx_surgical_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([(f"x{i}",) for i in range(5)], ["key"])
    sk = cms_build(df, "key", depth=4, width=256)
    probes = spark.createDataFrame([("never-seen",)], ["key"])
    [row] = cms_estimate(sk, probes, "key", depth=4, width=256).collect()
    assert row.est == 0


def test_kmv_merge_property_and_exact_small_groups(spark):
    """bottom-k(union) == bottom-k(union of per-group bottom-ks) — the
    merge theorem on real data; and a group with < k distinct keys
    reads out its EXACT cardinality."""
    from pyspark.sql import functions as F

    from orx_surgical_spark.operators.sketches import (
        kmv_bottomk,
        kmv_estimate,
    )

    rows = [(f"g{i % 3}", i % 40) for i in range(600)] + [("tiny", 999)]
    df = spark.createDataFrame(rows, ["grp", "key"])
    k = 16
    bk = kmv_bottomk(df, "grp", "key", k=k)

    # merge theorem: global bottom-k from sketches == from raw keys
    from_sketch = (
        bk.select("key", "h").distinct().orderBy("h", "key").limit(k)
    )
    from_raw = (
        df.select("key").distinct()
        .withColumn("h", F.md5(F.col("key").cast("string").cast("binary")))
        .orderBy("h", "key").limit(k)
    )
    assert sorted(map(tuple, from_sketch.collect())) == sorted(
        map(tuple, from_raw.collect())
    )

    est = {r.grp: r.kmv_est for r in kmv_estimate(bk, k=k).collect()}
    assert est["tiny"] == 1.0  # < k distinct => exact
    # 40 distinct per g-group; estimator should land in a sane band
    for g in ("g0", "g1", "g2"):
        assert 10 <= est[g] <= 160, (g, est[g])


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted key must probe true (theorem); OR-merged shard
    filters must equal the direct build word-for-word; an absent-key
    false-positive stays possible but bounded (256 bits / 50 keys /
    3 hashes => fp ~ 4% — assert the 15 absent probes aren't ALL
    positive, which would indicate a saturated or buggy filter)."""
    from pyspark.sql import functions as F

    from orx_surgical_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    df = spark.createDataFrame(
        [(f"key{i}",) for i in range(50)], ["k"]
    ).repartition(4)
    direct = bloom_build(df, "k")
    merged = bloom_merge(
        bloom_build(
            df.withColumn("s", F.crc32(F.col("k")) % 4), "k", shard_col="s"
        )
    )
    assert direct.collect() == merged.collect()

    known = df.select(F.col("k").alias("probe"))
    absent = spark.createDataFrame(
        [(f"nope{i}",) for i in range(15)], ["probe"]
    )
    hits = {
        r.probe: r.bloom_hit
        for r in bloom_probe(
            direct, known.unionAll(absent), "probe"
        ).collect()
    }
    assert all(hits[f"key{i}"] for i in range(50))  # no false negatives
    fps = sum(hits[f"nope{i}"] for i in range(15))
    assert fps < 15  # not saturated


def test_bloom_empty_filter_rejects_everything(spark):
    from orx_surgical_spark.operators.sketches import bloom_build, bloom_probe

    empty = spark.createDataFrame([], "k string")
    sk = bloom_build(empty, "k")
    probes = spark.createDataFrame([("x",), ("y",)], ["probe"])
    got = bloom_probe(sk, probes, "probe").collect()
    assert got and all(r.bloom_hit is False for r in got)
