"""EDA profile report (SURVEY §2-G11) — the ``dataprep.eda
create_report`` analogue (reference ``dataprep_report.py:16-27``,
which emits univariate AND bivariate sections).

All statistics for all columns are ONE distributed aggregate pass
(count/nulls/mean/stddev/min/max/median/approx-distinct, plus pairwise
Pearson correlations for the bivariate section); only the tiny summary
reaches the driver, where it reshapes to tall form and renders to HTML.
A per-column ``df.agg`` loop would scan the input once per column —
the difference between 1 and N full-table scans at 100 TB.
"""

from __future__ import annotations

from itertools import combinations
from collections.abc import Sequence
from html import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATS = (
    "n", "n_null", "approx_distinct", "mean", "stddev",
    "min_val", "median", "max_val",
)


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column univariate profile as one small DataFrame (one row per
    column).  Numeric columns only.  One aggregate pass for ALL columns
    (every stat is a flat-map-side-combinable aggregate), reshaped to
    tall with ``stack`` on the single result row — no per-column scan,
    no union of N plans."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).cast("double").alias(f"n__{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("double").alias(f"n_null__{c}"),
            F.approx_count_distinct(c).cast("double").alias(f"approx_distinct__{c}"),
            F.round(F.avg(c), 6).alias(f"mean__{c}"),
            F.round(F.stddev_samp(c), 6).alias(f"stddev__{c}"),
            F.min(c).cast("double").alias(f"min_val__{c}"),
            F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias(f"median__{c}"),
            F.max(c).cast("double").alias(f"max_val__{c}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{s}__{c}`" for s in _STATS)
        )
        for c in cols
    )
    tall = wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column_name, {', '.join(_STATS)})"
    )
    return tall.select(
        "column_name",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("approx_distinct").cast("bigint").alias("approx_distinct"),
        "mean", "stddev", "min_val", "median", "max_val",
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Bivariate profile section (reference ``dataprep_report.py:27``
    renders per-pair correlation plots): pairwise Pearson r for every
    unordered column pair, as a tall (col_a, col_b, pearson_r) frame.
    One aggregate pass for ALL pairs — ``corr`` is a map-side
    combinable aggregate, so n*(n-1)/2 pairs still cost a single scan.
    """
    pairs = list(combinations(cols, 2))
    if not pairs:
        raise ValueError("correlation_matrix needs at least two columns")
    wide = df.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"r__{a}__{b}")
            for a, b in pairs
        ]
    )
    stack = ", ".join(f"'{a}', '{b}', `r__{a}__{b}`" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (col_a, col_b, pearson_r)"
    )


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Equi-width histogram via bucket arithmetic — one aggregate, no
    collect of raw data.

    Pass ``bounds=(lo, hi)`` when the caller already knows them (the
    profiler's main aggregate pass computes min/max for every column
    anyway) to skip the extra bounds scan — two scans of the column
    where one suffices is harmless at driver scale and untidy at
    100 TB (VERDICT r5 item 3). Without ``bounds`` the old standalone
    two-pass behavior is kept."""
    if bounds is not None:
        lo, hi = bounds
    else:
        lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    if lo is None or hi is None or lo == hi:
        return df.agg(F.count(col).alias("n")).select(
            F.lit(0).alias("bucket"), F.lit(lo).alias("lo"), F.lit(hi).alias("hi"), "n"
        )
    span = (hi - lo) / n_bins
    b = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(span)).cast("int"),
        F.lit(n_bins - 1),
    )
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(span)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(span)).alias("hi"),
            "n",
        )
        .orderBy("bucket")
    )


def histograms(
    df: DataFrame,
    bounds: dict[str, tuple[float, float]],
    n_bins: int = 10,
) -> DataFrame:
    """Equi-width histograms for MANY columns in ONE aggregate job.

    ``bounds`` maps column -> (min, max), as already computed by
    :func:`profile_columns`'s single stats pass. Each input row explodes
    into one (column_name, bucket) entry per non-null profiled column,
    then one hash aggregate counts all columns' buckets together —
    the whole distribution section of a report is a single scan +
    single shuffle, instead of 2 jobs per column. Columns whose bounds
    are degenerate (all-NULL, or min == max) land in bucket 0.
    Returns (column_name, bucket, lo, hi, n).
    """
    entries = []
    spans: list = []  # flat [name, span, name, span, ...] literal map
    los: list = []
    for c, (lo, hi) in bounds.items():
        if lo is None or hi is None:
            continue  # all-NULL column: nothing to bin
        span = (hi - lo) / n_bins if hi > lo else 0.0
        spans += [F.lit(c), F.lit(span)]
        los += [F.lit(c), F.lit(lo)]
        bucket = (
            F.least(
                F.floor((F.col(c) - F.lit(lo)) / F.lit(span)).cast("int"),
                F.lit(n_bins - 1),
            )
            if span > 0
            else F.lit(0)
        )
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(c).alias("column_name"), bucket.alias("bucket")
                ),
            )
        )
    if not entries:
        raise ValueError("histograms needs at least one non-degenerate column")
    exploded = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .where(F.col("e").isNotNull())
        .select("e.column_name", "e.bucket")
    )
    lo_map, span_map = F.create_map(*los), F.create_map(*spans)
    return (
        exploded.groupBy("column_name", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "column_name",
            "bucket",
            (
                lo_map[F.col("column_name")]
                + F.col("bucket") * span_map[F.col("column_name")]
            ).alias("lo"),
            (
                lo_map[F.col("column_name")]
                + (F.col("bucket") + 1) * span_map[F.col("column_name")]
            ).alias("hi"),
            "n",
        )
        # no orderBy here: a global sort's range-partition sampling
        # re-executes the aggregate subtree (a second scan) — callers
        # sort the tiny (cols x bins)-row result if they care.
    )


def _html_table(frame: DataFrame) -> str:
    rows = frame.collect()
    cols = frame.columns
    head = "".join(f"<th>{escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{escape(str(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return f"<table><tr>{head}</tr>{body}</table>"


def render_html(
    profile: DataFrame,
    title: str = "Profile report",
    bivariate: DataFrame | None = None,
    distributions: DataFrame | None = None,
) -> str:
    """Render the (tiny) profile DataFrame — and, when given, the
    bivariate correlation frame and the per-column histogram frame —
    to a standalone HTML document."""
    sections = f"<h2>Univariate</h2>{_html_table(profile)}"
    if bivariate is not None:
        sections += f"<h2>Bivariate (Pearson r)</h2>{_html_table(bivariate)}"
    if distributions is not None:
        sections += f"<h2>Distributions</h2>{_html_table(distributions)}"
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{escape(title)}</title>"
        "<style>table{border-collapse:collapse;font-family:monospace}"
        "td,th{border:1px solid #999;padding:4px 8px}</style></head>"
        f"<body><h1>{escape(title)}</h1>{sections}"
        "</body></html>"
    )


def save_report(
    df: DataFrame, cols: Sequence[str], path: str, title: str = "Profile report"
) -> str:
    """G11 end-to-end: profile ``cols`` and write the HTML report with
    univariate + bivariate + distribution sections (reference
    ``create_report(df).save(out)``, whose output bundles all three).

    Job budget (r6): ONE stats aggregate for every column (min/max ride
    along), ONE combined histogram job reusing those bounds, and (for
    >= 2 columns) ONE all-pairs correlation aggregate — <= 3 scans for
    the whole batch regardless of column count, where the old shape
    paid 2 extra scans per histogrammed column (VERDICT r5 item 3)."""
    prof = profile_columns(df, cols)
    prof_rows = prof.collect()  # tiny: one row per column
    bounds = {r["column_name"]: (r["min_val"], r["max_val"]) for r in prof_rows}
    hists = (
        histograms(df, bounds).orderBy("column_name", "bucket")
        if any(lo is not None for lo, _ in bounds.values())
        else None
    )
    corr = correlation_matrix(df, cols) if len(cols) >= 2 else None
    html = render_html(
        df.sparkSession.createDataFrame(prof_rows, prof.schema),
        title,
        bivariate=corr,
        distributions=hists,
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path
