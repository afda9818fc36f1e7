"""Data-layout sinks: the file-organization half of 100 TB scan
performance.

Parquet scans prune twice — partition directories first, then per-file
/ per-row-group min-max statistics ("zone maps"). Neither helps unless
the writer laid the data out for it: a key filter over randomly-written
files touches every footer, while the same filter over range-sorted
files touches exactly the files whose [min, max] straddle the key.
These sinks produce that layout; ``tests/test_layout.py`` proves the
property by reading the footers back.

Small-file compaction is the other chronic layout failure: streaming
ingest and over-parallel writers leave thousands of KB-scale files
whose open/footer overhead dominates the scan (and whose listing
dominates planning). ``compact_parquet`` rewrites a directory to
size-targeted files in one distributed pass.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Range-layout parquet write: ``repartitionByRange`` on the sort
    keys (global range partitioning — each output file owns a disjoint
    key interval) + ``sortWithinPartitions`` (rows ordered inside each
    file, so row-group zone maps are tight too).

    After this write, an equality/range predicate on ``sort_cols[0]``
    prunes to the files whose [min, max] contain the value — at scale
    the difference between opening every footer in the table and
    opening a handful. ``n_files`` controls the target file count
    (defaults to the current partition count).
    """
    parted = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files is not None
        else df.repartitionByRange(*sort_cols)
    )
    parted.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def parquet_file_ranges(path: str, col: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``col`` per data file, straight from the
    parquet footers — the statistics a zone-map scan prunes on. Driver
    side, metadata only (no row reads); used by tests and layout
    audits, not by query plans."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max:
                continue
            mins.append(stats.min)
            maxs.append(stats.max)
        if mins:
            out.append((name, min(mins), max(maxs)))
    return out


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a (small-file-fragmented) parquet directory to
    size-targeted files: one distributed read, a width computed from
    the directory's actual byte size, one write. Returns the target
    file count.

    ``coalesce`` (no shuffle) when shrinking the file count — the
    common compaction direction — so the rewrite is a map-only pass;
    ``repartition`` only if the directory needs *more* files than its
    current splits (rare: growing parallelism for a downstream job).
    """
    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(size / target_bytes))
    df = spark.read.parquet(src)
    cur = df.rdd.getNumPartitions()
    out = df.coalesce(n) if n <= cur else df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n


def _interleave_bits(a, b, bits: int = 16):
    """Z-value of two non-negative ints: bit-interleave ``a`` and ``b``
    (a in even positions, b in odd) — pure JVM bit arithmetic, built as
    a balanced OR tree of ``2*bits`` shifted single-bit terms."""
    from pyspark.sql import functions as F

    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int | None = None,
    bits: int = 16,
) -> None:
    """Z-order (Morton-curve) parquet layout over TWO columns: rank each
    column to a dense [0, 2^bits) domain (rank-based, so arbitrary /
    skewed value distributions map uniformly), bit-interleave the ranks
    into a z-value, then range-partition + sort on it.

    Where :func:`write_sorted` gives perfect pruning on ONE leading
    column and none on others, the space-filling curve keeps each
    file's bounding box small in BOTH dimensions — predicates on either column
    (or both) skip most files via the same parquet min/max stats. This
    is the layout Delta/Iceberg OPTIMIZE ZORDER produces; here it is
    plain Spark: two window ranks, one projection, one range write.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    max_rank = (1 << bits) - 1
    wa = Window.orderBy(F.col(col_a))
    wb = Window.orderBy(F.col(col_b))
    # percent_rank is [0,1]; scale to the bit domain. The global windows
    # are a one-pass sort each at write time — an offline layout job.
    ranked = df.withColumn(
        "__ra", (F.percent_rank().over(wa) * max_rank).cast("long")
    ).withColumn("__rb", (F.percent_rank().over(wb) * max_rank).cast("long"))
    z = ranked.withColumn(
        "__z", _interleave_bits(F.col("__ra"), F.col("__rb"), bits)
    )
    parted = (
        z.repartitionByRange(n_files, "__z")
        if n_files is not None
        else z.repartitionByRange("__z")
    )
    parted.sortWithinPartitions("__z").drop("__ra", "__rb", "__z").write.mode(
        "overwrite"
    ).parquet(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read across parquet generations: a table whose
    later shards added columns reads as the UNION schema
    (``mergeSchema`` — Spark reconciles the footers; missing columns
    come back NULL for old shards). The option costs a footer read per
    file at planning time, which is why it is opt-in here and off in
    the hot readers: at 100 TB you pin one merged schema once, then
    read with an explicit schema."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
