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
