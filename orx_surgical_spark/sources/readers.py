"""Sources and sinks (SURVEY §2-A).

The reference's IO surface is ``pd.read_csv(usecols=...)`` projection
scans (A1, ``cms_preprocess.py:26-51``), a vestigial parquet scan (A2,
``dataprep_report.py:18``), and ``np.save``/``np.load`` tensor
checkpoints (A3, ``modelling CNN.ipynb`` cells 5-8). Here:

- CSV scans declare an explicit schema (no inference) and project via
  ``select`` — Catalyst pushes the projection into the scan.
- Parquet is the checkpoint format (replaces ``np.save``): columnar,
  compressed, self-describing, splittable — the 100 TB-scale answer to
  the reference's bool-cast npy caches.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from orx_surgical_spark.schemas import TPCH_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (SURVEY §2-A2). Pushdown/pruning handled by Catalyst."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    columns: Sequence[str] | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan with declared schema + column projection (SURVEY §2-A1).

    Mirrors ``pd.read_csv(path, usecols=cols)`` (reference
    ``cms_preprocess.py:45-49``) but with an explicit schema; the
    ``select`` is pruned into the scan by Catalyst.
    """
    df = spark.read.schema(schema).option("header", str(header).lower()).csv(path)
    if columns is not None:
        df = df.select(*columns)
    return df


#: path -> parquet schema, inferred once per process (r13). Without a
#: declared schema every ``spark.read.parquet`` call launches a
#: 1-task schema-inference JOB re-reading the footers — measured
#: ~60-90 ms per table per call, i.e. 2 of join_customer_orders' 6
#: bench jobs were footer re-reads. This is catalog metadata, not
#: result state (same legitimacy line as inference.py's _UDF_CACHE):
#: any production table carries its schema in a catalog and pays
#: inference at most once; the synthetic tables are immutable per
#: path. At 100 TB the same memo replaces a footer-sampling pass over
#: thousands of files with one lookup.
_SCHEMA_CACHE: dict[str, T.StructType] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated synthetic table (TESTDATA.md).

    ``events.ts`` has shipped in two encodings across data regenerations:
    TIMESTAMP(NANOS) (read as int64 nanos under
    ``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]``
    (read as TIMESTAMP_NTZ when ``inferTimestampNTZ`` is on).  Both are
    normalized to session-TZ TimestampType here so every downstream
    operator (``unix_millis``, ``withWatermark``, window functions) sees
    one type regardless of the file encoding.

    The parquet schema is inferred once per path and declared on every
    subsequent scan (see ``_SCHEMA_CACHE``) — the schema is a property
    of the immutable file, so the memo can never change a result, only
    drop the per-call footer-inference job.
    """
    path = f"{sf_dir}/{name}.parquet"
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[path] = schema
    df = spark.read.schema(schema).parquet(path)
    return _normalize_ts(df) if name == "events" else df


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to TimestampType (LTZ).

    - ``bigint``: int64 epoch-nanos (legacy ``nanosAsLong`` read).  Integer
      division (`div`), NOT `/` + floor: `/` promotes to double, and int64
      epoch-nanos exceed the 53-bit double mantissa, so the floor lands
      1µs off on a measurable fraction of rows.
    - ``timestamp_ntz``: parquet ``timestamp[us]`` without timezone.  With
      the UTC session TZ the cast is instant-identical to DuckDB's read
      of the same file; NTZ would otherwise reject ``unix_millis`` /
      ``withWatermark`` (they require TIMESTAMP).
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Sequence[str] | None = None
) -> dict[str, DataFrame]:
    """Load several synthetic tables at once; default = all of them."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TPCH_TABLES)}


#: (input files, default parallelism) -> scan partition count. Probing
#: a FRESH DataFrame's width via ``df.rdd.getNumPartitions()`` runs a
#: full physical-planning pass on the driver (~45 ms/call measured at
#: sf0.1); the width is a pure function of the scan's file set and the
#: session's split confs, so it is memoized the same way as
#: ``_SCHEMA_CACHE`` — metadata, never result state. The key assumes
#: the input is a scan or narrow transforms over one (every in-repo
#: call site: load_table / attach_fake_media outputs, which preserve
#: scan partitioning); a post-shuffle plan would not be width-stable
#: per file set, and such inputs bypass the cache via the empty-
#: ``inputFiles`` branch or simply must not be passed here.
_SCAN_PARTS_CACHE: dict[tuple, int] = {}


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition up to ``n`` partitions if the scan produced fewer.

    Small local parquet files arrive as 1-2 splits, serializing CPU-heavy
    per-row work (hashing, shingling). At real scale the scan has
    thousands of splits and this is a no-op — the guard keeps the extra
    shuffle out of the 100 TB path.
    """
    target = n or df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        key = (tuple(sorted(files)), target)
        parts = _SCAN_PARTS_CACHE.get(key)
        if parts is None:
            parts = df.rdd.getNumPartitions()
            _SCAN_PARTS_CACHE[key] = parts
    else:
        # non-file plans (in-memory relations, joins): probe directly —
        # their width is not a stable function of any cacheable key
        parts = df.rdd.getNumPartitions()
    if parts < target:
        return df.repartition(target)
    return df


def write_parquet(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """Checkpoint sink (SURVEY §2-A3) — replaces the reference's
    ``np.save`` caches (``modelling CNN.ipynb:177 (cell 5)``)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink — the interchange format of LLM-corpus tooling.
    One JSON object per line; compression and sharding come from Spark's
    file committer (one file per partition)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. Always pass ``schema`` in production: without
    it Spark runs a full inference pre-pass over the data (double read),
    and inferred types drift with content (ints become doubles when a
    float sneaks in). Schema-on-read here mirrors the CSV reader's
    explicit-StructType policy (SURVEY §1.4)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str, partition_by: Sequence[str] = ()) -> None:
    """ORC sink — same columnar guarantees as parquet (predicate
    pushdown, column pruning, dictionary/RLE encoding) via Spark's
    native vectorized ORC support; the interchange choice when the
    downstream is Hive/Trino-flavored."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (schema self-describing, vectorized reader)."""
    return spark.read.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] = (),
) -> None:
    """Bucketed managed table: pre-shuffles once at write time so every
    later equi-join/aggregation on the bucket keys is co-located —
    Catalyst drops the Exchange on both bucketed sides.  The 100 TB
    idiom for fact tables that join repeatedly on the same key (e.g.
    claims bucketed by patient id); ``n_buckets`` should be sized so a
    bucket fits one task comfortably (~100-500 MB)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)

