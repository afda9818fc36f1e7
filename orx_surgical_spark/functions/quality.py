"""Declarative data-quality constraints ("Deequ-lite").

A constraint set compiles to ONE aggregate pass over the checked table
(conditional sums — map-side partial, single shuffle to one row) plus
one left-anti join per foreign-key rule (key sides broadcast when
small). Violation counts come back as a single row, so a 100 TB table
costs one scan regardless of how many rules run — the property that
makes constraint checking cheap enough to gate every pipeline run.

Usage::

    report = check_constraints(
        orders,
        not_null("o_orderkey"),
        unique("o_orderkey"),
        in_set("o_orderstatus", ["O", "F", "P"]),
        in_range("o_totalprice", lo=0.0),
        foreign_key("o_custkey", customer, "c_custkey"),
    )

Each rule contributes a ``<rule>_violations`` bigint column; ``n_rows``
is always included.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # exactly one of: agg (a Column counting violations) | fk spec
    agg: Column | None = None
    fk_col: str | None = None
    fk_dim: DataFrame | None = None
    fk_dim_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(
        name=f"{col}_null",
        agg=F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(col: str) -> Rule:
    # violations = rows beyond the first per key = count - distinct count.
    return Rule(
        name=f"{col}_dup",
        agg=F.count(col) - F.count_distinct(F.col(col)),
    )


def in_set(col: str, allowed: Sequence[str]) -> Rule:
    return Rule(
        name=f"{col}_outside_set",
        agg=F.sum(
            F.when(~F.col(col).isin(*allowed) | F.col(col).isNull(), 1).otherwise(0)
        ),
    )


def in_range(col: str, lo=None, hi=None) -> Rule:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Rule(
        name=f"{col}_out_of_range",
        agg=F.sum(F.when(cond, 1).otherwise(0)),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        name=f"{col}_pattern",
        agg=F.sum(
            F.when(~F.col(col).rlike(pattern) | F.col(col).isNull(), 1).otherwise(0)
        ),
    )


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(name=f"{col}_orphans", fk_col=col, fk_dim=dim, fk_dim_col=dim_col)


def check_constraints(df: DataFrame, *rules: Rule) -> DataFrame:
    """One-row violations report. All expression rules share a single
    aggregate; each foreign-key rule adds one anti-join count, cross-
    joined in (every side is a single row, so the joins are free)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for r in rules:
        if r.agg is not None:
            aggs.append(r.agg.cast("bigint").alias(f"{r.name}_violations"))
    out = df.agg(*aggs)
    for r in rules:
        if r.fk_col is not None:
            orphans = (
                df.select(r.fk_col)
                .join(
                    r.fk_dim.select(F.col(r.fk_dim_col).alias(r.fk_col)),
                    on=r.fk_col,
                    how="left_anti",
                )
                .agg(F.count(F.lit(1)).alias(f"{r.name}_violations"))
            )
            out = out.crossJoin(orphans)
    return out


def observed_write(
    df: DataFrame,
    path: str,
    *metrics: Column,
    name: str = "observed",
    format: str = "parquet",
) -> dict:
    """Write ``df`` while piggybacking aggregate metrics on the same pass.

    ``Dataset.observe`` attaches accumulator-backed aggregates to the
    plan, so the metrics (row counts, null counts, sums for
    reconciliation) are collected DURING the sink job — at 100 TB this
    replaces the usual write-then-rescan-to-count pattern with zero
    extra scans. Only accumulator-safe aggregates are allowed (no
    distinct, no sort-based aggs); violations raise at analysis time.

    Returns the observed metrics as a dict.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *metrics)
    observed.write.mode("overwrite").format(format).save(path)
    return obs.get
