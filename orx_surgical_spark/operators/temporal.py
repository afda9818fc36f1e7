"""Temporal join operators Spark lacks as primitives — as-of join and
range join — built as shuffle-minimal compositions (beyond-reference
tier; the reference has no temporal joins, SURVEY §2-C note).

Both avoid the naive theta-join (cross product + filter), which is
O(n·m) and unrunnable at 100 TB:

- **as-of**: union the two tagged streams and run one window pass — a
  single shuffle on (key), no join at all.
- **range**: equi-join on coarse time buckets (each left row probes its
  own and the previous bucket), then filter the exact predicate —
  touches only pairs within bucket distance, never the cross product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    prefix: str = "asof_",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` for the same key (LEFT ASOF JOIN).

    Implementation: tag and union both inputs, then one
    ``last_value(..., ignoreNulls)`` window over rows-unbounded-preceding
    ordered by (ts, right-before-left tiebreak).  One shuffle on the
    key, no join operator at all — the classic scalable as-of shape.
    Ties (equal timestamps) match, like DuckDB/kdb ``asof``.

    Duplicate right rows per (key, ts): without ``tiebreak``, the
    PRECONDITION is that the right side is unique per (key, ts) — the
    window orders only by (ts, source-tag), so among several right rows
    at the same instant the carried row is whichever sorted last, which
    is plan/partitioning-dependent. Either pre-aggregate duplicates
    (e.g. keep the max/latest value per (key, ts)) before calling, as
    the catalog queries do, or pass ``tiebreak``: a right-side column
    appended to the window order, so the greatest-``tiebreak``
    duplicate deterministically wins. Pinned by ``tests/test_temporal.
    py::test_asof_duplicate_ts_deterministic_with_tiebreak``.

    All ``value_cols`` are carried as ONE struct through a single
    ``last(ignorenulls)`` (r6, ADVICE r5): they always come from the
    same winning right row, even when that row holds NULL in some
    value column — per-column ``last`` calls could previously fall
    back to a losing duplicate's (or earlier row's) non-null value.
    """
    if tiebreak is not None and tiebreak not in right.columns:
        raise ValueError(f"tiebreak column {tiebreak!r} not in right side")
    right_types = dict(right.dtypes)
    # One struct for ALL value columns: a single last(ignorenulls) can
    # then only ever carry a whole right row, never a column mix.
    struct_ddl = "struct<" + ",".join(
        f"`{c}`:{right_types[c]}" for c in value_cols
    ) + ">"
    l = left.withColumn("__src", F.lit(1)).withColumn(
        "__v", F.lit(None).cast(struct_ddl)
    )
    tb_type = right_types[tiebreak] if tiebreak is not None else "int"
    l = l.withColumn("__tb", F.lit(None).cast(tb_type))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("__src"),
        (F.col(tiebreak) if tiebreak is not None else F.lit(None).cast("int"))
        .alias("__tb"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__v"),
    )
    left_types = dict(left.dtypes)
    unioned = l.select(
        *left.columns, "__src", "__tb", "__v"
    ).unionByName(
        r.select(
            *[
                F.col(c)
                if c in (on, left_ts)
                else F.lit(None).cast(left_types[c]).alias(c)
                for c in left.columns
            ],
            "__src",
            "__tb",
            "__v",
        ),
        allowMissingColumns=False,
    )
    # right rows sort before left rows at equal ts, so ties match; among
    # equal-(ts) right rows the greatest __tb sorts last and wins (the
    # left rows' null __tb is inert: __src already orders them after).
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(left_ts).asc(), F.col("__src").asc(), F.col("__tb").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__v", ignorenulls=True).over(w).alias("__vw")
    ).select(
        "*",
        *[
            F.col("__vw").getField(c).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__src") == 1).drop(
        "__src", "__tb", "__v", "__vw"
    )


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs of rows with the same key whose timestamps lie within
    ``max_gap_seconds`` of each other (id_a < id_b) — a banded range
    self-join.

    Implementation: bucket time by the gap width; each pair within the
    gap is either in the same bucket or adjacent ones, so the left side
    probes (bucket, bucket+1) via an equi-join on (key, bucket) and the
    exact predicate filters the remainder.  Join input is ~2 rows per
    row regardless of corpus size — never a cross product.
    """
    bucket = F.floor(F.unix_timestamp(F.col(ts)) / max_gap_seconds)
    a = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("id_a"),
        F.col(ts).alias("__ts_a"),
        bucket.alias("__b"),
    )
    # Right side registers under its own bucket and the next one, so a
    # left probe on its bucket sees all candidates within one gap width.
    b = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("id_b"),
        F.col(ts).alias("__ts_b"),
        F.explode(F.array(bucket, bucket + 1)).alias("__b"),
    )
    # The probe only sees right rows in its own or the previous bucket
    # (i.e. the later row of a pair finds the earlier one), so the pair
    # is canonicalized by id afterwards — not filtered by id order in
    # the join, which would drop pairs whose ids are not time-ordered.
    pairs = a.join(b, on=["__k", "__b"]).filter(
        (F.col("id_a") != F.col("id_b"))
        & (
            F.abs(
                F.unix_timestamp("__ts_a") - F.unix_timestamp("__ts_b")
            )
            <= max_gap_seconds
        )
    )
    return pairs.select(
        F.col("__k").alias(key),
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.abs(
            F.unix_timestamp("__ts_a") - F.unix_timestamp("__ts_b")
        ).alias("gap_seconds"),
    ).distinct()


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key union of half-open intervals ``[start, end)``: merge
    every overlapping or touching pair into maximal disjoint periods —
    the interval-union primitive behind uptime/active-time accounting,
    coverage gap detection, and contiguous-span compaction (the batch
    complement of the gap-based sessionizer, which merges by
    inter-EVENT gaps; this merges by actual extents, so intervals of
    heterogeneous lengths compose correctly).

    Returns ``[key, period_start, period_end]``, one row per maximal
    period. Classic sweep: within a key, order by (start, end); a row
    opens a NEW period iff its start exceeds the running max of all
    previous ends; the running flag-sum labels periods, then one
    aggregate takes each period's extent.

    Scale shape: both window passes share one (key)-partitioned sort —
    Catalyst plans them over a single Exchange+Sort — and the closing
    groupBy re-uses the same key, so the whole operator is ONE shuffle
    of the interval table. No global windows; per-key data volume is
    the only skew axis, same as any sessionizer.
    """
    s, e = F.col(start_col), F.col(end_col)
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(prev_max_end.isNull() | (s > prev_max_end), 1).otherwise(0)
    grp = F.sum(opens).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    labeled = df.select(
        F.col(key_col), s.alias("__s"), e.alias("__e"), grp.alias("__grp")
    )
    return labeled.groupBy(key_col, "__grp").agg(
        F.min("__s").alias("period_start"),
        F.max("__e").alias("period_end"),
    ).drop("__grp")
