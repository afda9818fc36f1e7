"""The declared query catalog.

Every operator the engine claims (SURVEY §2) is registered here as a
named query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent ANSI-SQL string a DuckDB oracle can
run over the same parquet tables. The driver's correctness gate runs
both sides at sf0.01 and compares row count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- double-valued aggregates are ``round``-ed on both sides (sum order
  across engines/partitions differs in the last float bits);
- no ORDER BY is needed except under LIMIT (top-k), where a
  deterministic tiebreaker key makes the row *set* stable.

Importing this module pulls in all query-defining modules.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    bench: bool = False  # part of the bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Published to the driver via __spark_entry__? The driver's
    # correctness gate checks at most ~50 queries, so the exposed
    # surface is the standalone headliners plus composite panels
    # (queries/panel_specs.py); everything else stays internal.
    expose: bool = False


REGISTRY: dict[str, CatalogQuery] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a catalog query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate catalog query: {name}")
        REGISTRY[name] = CatalogQuery(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench, tags=tags,
        )
        return fn

    return deco


def _load_all() -> None:
    # Import for registration side effects.
    from orx_surgical_spark.queries import (  # noqa: F401
        analytics_queries,
        dedup_queries,
        encoder_queries,
        model_queries,
        multimodal_queries,
        olap_queries,
        relational_queries,
        similarity_queries,
        stats_queries,
        streaming_queries,
        temporal_queries,
        text_queries,
        timeseries_queries,
        tpch_queries,
    )
    # golden_queries/gate_queries wrap entries registered by the base
    # modules — import after ALL of them (registration order matters,
    # not alphabet: their module bodies dereference REGISTRY entries).
    from orx_surgical_spark.queries import gate_queries, golden_queries  # noqa: F401
    # Panels compose already-registered queries — import last. The env
    # guard lets scripts/gen_panel_dtypes.py bootstrap the generated
    # dtype snapshot that panel oracles are built from.
    import os

    if not os.environ.get("SPARK_GRAFT_SKIP_PANELS"):
        from orx_surgical_spark.queries import panels  # noqa: F401


def exposed() -> dict[str, CatalogQuery]:
    """The driver-facing subset (≤50 entries; see panel_specs.py)."""
    return {n: q for n, q in sorted(REGISTRY.items()) if q.expose}


_load_all()
