"""Stream/batch equivalence for the streaming tier — availableNow runs
must produce exactly the batch semantics on the same data (the
catalog's DuckDB oracles cover tumbling/session/stateful; here the
sliding-window variant and source plumbing)."""

from pyspark.sql import functions as F

from orx_surgical_spark import streaming as S
from orx_surgical_spark.sources import load_table


def test_sliding_window_stream_equals_batch(spark, sf_dir):
    stream = S.read_events_stream(spark, sf_dir)
    streamed = S.run_available_now(
        S.windowed_counts(stream, "10 minutes", slide="5 minutes")
    )

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_source_schema_matches_batch(spark, sf_dir):
    stream = S.read_events_stream(spark, sf_dir)
    batch = load_table(spark, sf_dir, "events")
    assert dict(stream.dtypes) == dict(batch.dtypes)
    assert stream.isStreaming
