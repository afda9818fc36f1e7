"""IO sinks/sources (SURVEY §2-A3/A4): parquet checkpoint round-trip
with partition pruning, and model persistence."""

from pyspark.sql import functions as F

from orx_surgical_spark import models as M
from orx_surgical_spark.plans import plan_str
from orx_surgical_spark.sources import load_table
from orx_surgical_spark.sources.readers import (
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
    write_parquet,
)


def test_parquet_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_ckpt")
    write_parquet(orders, path)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)
    assert back.exceptAll(orders).count() == 0


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """A3 at scale: partitionBy + a partition-key filter must prune at
    the file index, not scan-and-filter."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    write_parquet(orders, path, partition_by=["o_year"])
    back = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = plan_str(back)
    # Partition filters appear separately from data filters in the scan.
    assert "PartitionFilters" in plan and "o_year" in plan.split("PartitionFilters")[1].split("\n")[0]
    expected = orders.filter(F.col("o_year") == 1995).count()
    assert back.count() == expected


def test_jsonl_roundtrip_with_declared_schema(spark, sf_dir, tmp_path):
    """JSONL sink/source: declared-schema read returns the identical
    relation (modulo JSON's null-vs-missing, absent in this data)."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, schema=docs.schema)
    assert dict(back.dtypes) == dict(docs.dtypes)
    assert back.exceptAll(docs).count() == 0
    assert docs.exceptAll(back).count() == 0


def test_orc_roundtrip_and_predicate_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/source round-trips exactly and pushes filters into the
    vectorized scan like parquet does."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0
    filtered = back.filter(F.col("o_orderkey") == 42).select("o_orderkey")
    plan = plan_str(filtered)
    assert "PushedFilters" in plan and "o_orderkey" in plan.split("PushedFilters")[1].split("]")[0]


def test_model_save_load_same_predictions(spark, sf_dir, tmp_path):
    """A4: fitted models persist and reload bit-identically
    (reference model.save('models/cnn_10000b.h5') / load_model)."""
    from pyspark.ml.regression import LinearRegressionModel

    ev = load_table(spark, sf_dir, "events")
    feat = M.with_event_features(ev).cache()
    model = M.lasso_regression(feat)
    path = str(tmp_path / "lasso_model")
    model.write().overwrite().save(path)
    loaded = LinearRegressionModel.load(path)
    a = model.transform(feat).select("event_id", "prediction")
    b = loaded.transform(feat).select("event_id", "prediction")
    assert a.exceptAll(b).count() == 0


def test_custom_python_datasource_partitioned_deterministic(spark):
    """Spark 4 Python Data Source API: the orx_media synthetic source
    declares one InputPartition per shard (parallel like file splits),
    rows are md5-deterministic (stable under retries), and reads are
    repeatable."""
    from orx_surgical_spark.sources.synthetic import (
        MEDIA_SOURCE_SCHEMA,
        register_media_source,
    )

    register_media_source(spark)
    df = (
        spark.read.format("orx_media")
        .option("shards", 3)
        .option("rowspershard", 20)
        .load()
    )
    assert df.schema == MEDIA_SOURCE_SCHEMA
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 60
    assert {r["media_id"] for r in rows} == set(range(60))
    by_id = {r["media_id"]: r for r in rows}
    assert all(len(r["payload"]) == r["width"] * r["height"] for r in rows)
    # Re-read is bit-identical (determinism contract).
    again = {r["media_id"]: r for r in spark.read.format("orx_media")
             .option("shards", 3).option("rowspershard", 20).load().collect()}
    assert all(by_id[i]["payload"] == again[i]["payload"] for i in by_id)


def test_events_ts_dtype_pinned(spark, sf_dir):
    """Pin events.ts to TimestampType regardless of the parquet file
    encoding (int64-nanos under nanosAsLong, or timestamp[us] read as
    TIMESTAMP_NTZ).  The r3 testdata regeneration flipped the encoding
    and silently broke every unix_millis/withWatermark consumer — this
    pin makes the next flip a loud local failure."""
    from orx_surgical_spark.sources.readers import load_table

    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_normalize_ts_handles_ntz_and_bigint(spark):
    """_normalize_ts converts both known encodings; instants match what
    DuckDB reads from the same values (epoch micros preserved exactly)."""
    from pyspark.sql import functions as F

    from orx_surgical_spark.sources.readers import _normalize_ts

    micros = [0, 1_700_000_000_123_456, 1_700_000_000_123_457]
    ntz = spark.createDataFrame([(m,) for m in micros], "us bigint").select(
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts")
    )
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    fixed = _normalize_ts(ntz)
    assert dict(fixed.dtypes)["ts"] == "timestamp"
    got = [r["us"] for r in fixed.select(F.unix_micros("ts").alias("us")).collect()]
    assert sorted(got) == micros

    nanos = spark.createDataFrame(
        [(m * 1000 + 999,) for m in micros], "ts bigint"
    )
    fixed2 = _normalize_ts(nanos)
    assert dict(fixed2.dtypes)["ts"] == "timestamp"
    got2 = [r["us"] for r in fixed2.select(F.unix_micros("ts").alias("us")).collect()]
    # nanos -> micros truncates (div 1000), matching DuckDB.
    assert sorted(got2) == micros
