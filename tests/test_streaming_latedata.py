"""Watermark semantics under real multi-batch streaming (append mode).

Spark's guarantee is asymmetric: data within the watermark delay is
always aggregated; data later than the watermark is dropped once the
window's state has been evicted (it may still merge if it arrives while
the state is live).  Three files + maxFilesPerTrigger=1 create three
micro-batches: window closes, state evicts, then a too-late row arrives
and must NOT resurrect the window."""

import time

import pandas as pd
from pyspark.sql import functions as F


def test_late_row_after_eviction_is_dropped(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    ts = pd.Timestamp

    # Batch 0: three rows in window 10:00-10:05; one row at 11:00 pushes
    # max event time so the post-batch watermark becomes 10:50.
    pd.DataFrame(
        {
            "ts": [ts("2024-01-01 10:00:30"), ts("2024-01-01 10:01:00"),
                   ts("2024-01-01 10:04:00"), ts("2024-01-01 11:00:00")],
            "v": [1.0, 1.0, 1.0, 1.0],
        }
    ).to_parquet(str(src / "a.parquet"), index=False)
    time.sleep(1.1)
    # Batch 1 (runs with watermark 10:50): on-time row; at batch end the
    # 10:00 window (end 10:05 < 10:50) is emitted and its state evicted.
    pd.DataFrame(
        {"ts": [ts("2024-01-01 11:02:00")], "v": [1.0]}
    ).to_parquet(str(src / "b.parquet"), index=False)
    time.sleep(1.1)
    # Batch 2: a row 48 min behind the watermark for the evicted window —
    # the guaranteed-drop path.
    pd.DataFrame(
        {"ts": [ts("2024-01-01 10:02:00")], "v": [100.0]}
    ).to_parquet(str(src / "c.parquet"), index=False)

    schema = spark.read.parquet(str(src / "a.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .select(F.col("w.start").alias("ws"), "n", "sv")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("late_sink").collect()
    rows = {}
    for r in out:
        rows.setdefault(str(r["ws"]), []).append(r)

    # Exactly one emission of the 10:00 window, with batch-0 rows only —
    # the post-eviction late row (v=100) neither merged nor re-emitted.
    w1 = rows["2024-01-01 10:00:00"]
    assert len(w1) == 1
    assert w1[0]["n"] == 3 and w1[0]["sv"] == 3.0
    # Windows not yet past the final watermark stay unemitted in append.
    assert "2024-01-01 11:00:00" not in rows
