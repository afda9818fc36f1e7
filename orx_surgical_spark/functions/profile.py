"""EDA profile report (SURVEY §2-G11) — the ``dataprep.eda
create_report`` analogue (reference ``dataprep_report.py:16-27``).

The statistics are one distributed pass of conditional aggregates per
column (count/nulls/mean/stddev/min/max/median/approx-distinct +
histogram); only the tiny per-column summary reaches the driver, where
it renders to HTML.
"""

from __future__ import annotations

from collections.abc import Sequence
from html import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column univariate profile as one small DataFrame (one row per
    column).  Numeric columns only."""
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(c).alias("column_name"),
                F.count(c).alias("n"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias("n_null"),
                F.approx_count_distinct(c).alias("approx_distinct"),
                F.round(F.avg(c), 6).alias("mean"),
                F.round(F.stddev_samp(c), 6).alias("stddev"),
                F.min(c).alias("min_val"),
                F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias("median"),
                F.max(c).alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def histogram(df: DataFrame, col: str, n_bins: int = 10) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` — one aggregate, no
    collect of raw data."""
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


def render_html(profile: DataFrame, title: str = "Profile report") -> str:
    """Render the (tiny) profile DataFrame to a standalone HTML table."""
    rows = profile.collect()
    cols = profile.columns
    head = "".join(f"<th>{escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{escape(str(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{escape(title)}</title>"
        "<style>table{border-collapse:collapse;font-family:monospace}"
        "td,th{border:1px solid #999;padding:4px 8px}</style></head>"
        f"<body><h1>{escape(title)}</h1><table><tr>{head}</tr>{body}</table>"
        "</body></html>"
    )


def save_report(
    df: DataFrame, cols: Sequence[str], path: str, title: str = "Profile report"
) -> str:
    """G11 end-to-end: profile ``cols`` and write the HTML report
    (reference ``create_report(df).save(out)``)."""
    html = render_html(profile_columns(df, cols), title)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)
    return path
