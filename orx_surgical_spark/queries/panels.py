"""Composite "panel" queries: the driver-facing consolidation layer.

A panel bundles several registry queries into ONE driver-checkable
query. Each member's result rows are serialized into a canonical
string column and tagged with the member name:

    (q: string = member name, r: string = 'v1|v2|...')

with columns taken in name-sorted order (mirroring the driver's
column-name sort before hashing). The DuckDB oracle applies the exact
same per-type serialization to each member's oracle SQL and UNION ALLs,
so the driver's rows+schema+hash comparison transitively checks every
member's full output.

Canonical cell encoding (must be byte-identical across Spark/DuckDB):

- NULL → ``<n>`` (any type)
- string → as-is
- integers → decimal string
- float/double → ``CAST(round(x, 6) AS DECIMAL(38,6))`` rendered with 6
  fractional digits; NaN → ``<nan>``, ±Inf → ``<inf>``/``<-inf>``.
  Registry convention already rounds double *aggregates* on both sides,
  so the further 6-dp fix never sits on a rounding boundary.
- date → ISO string; timestamp → epoch microseconds (DuckDB reads the
  events table as TIMESTAMP_NS; casting to TIMESTAMP truncates to µs
  exactly like the Spark reader's ``ts div 1000``).
- boolean → 0/1

Panels are registered in the main REGISTRY (so the local oracle-parity
suite covers them like any query) and flagged ``expose=True``;
``__spark_entry__`` publishes only exposed entries to the driver.
"""

from __future__ import annotations

from dataclasses import replace
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.queries.catalog import REGISTRY, register
from orx_surgical_spark.queries.panel_dtypes import PANEL_MEMBER_DTYPES
from orx_surgical_spark.queries.panel_specs import (
    ALL_PANELS,
    EAGER_PANELS,
    EXPOSED_STANDALONE,
    ORACLE_PANELS,
    ROWS_ONLY_PANELS,
)

NULL_S = "<n>"

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}


def _canon_spark(col: str, dtype: str) -> str:
    """Spark SQL expression rendering one column to its canonical string."""
    c = f"`{col}`"
    if dtype in _FLOAT_TYPES or dtype.startswith("decimal"):
        return (
            f"CASE WHEN {c} IS NULL THEN '{NULL_S}' "
            f"WHEN isnan(CAST({c} AS DOUBLE)) THEN '<nan>' "
            f"WHEN CAST({c} AS DOUBLE) = CAST('Infinity' AS DOUBLE) THEN '<inf>' "
            f"WHEN CAST({c} AS DOUBLE) = CAST('-Infinity' AS DOUBLE) THEN '<-inf>' "
            f"ELSE CAST(CAST(round(CAST({c} AS DOUBLE), 6) AS DECIMAL(38,6)) AS STRING) END"
        )
    if dtype in _INT_TYPES:
        return f"coalesce(CAST({c} AS STRING), '{NULL_S}')"
    if dtype.startswith("timestamp"):
        return f"coalesce(CAST(unix_micros(CAST({c} AS TIMESTAMP)) AS STRING), '{NULL_S}')"
    if dtype == "date":
        return f"coalesce(CAST({c} AS STRING), '{NULL_S}')"
    if dtype == "boolean":
        return f"coalesce(CAST(CAST({c} AS INT) AS STRING), '{NULL_S}')"
    if dtype == "string":
        return f"coalesce({c}, '{NULL_S}')"
    raise TypeError(f"no canonical serialization for column {col!r} of type {dtype}")


def _canon_duck(col: str, dtype: str) -> str:
    """DuckDB expression producing the identical canonical string.

    ``dtype`` is the *Spark* dtype of the column — the Spark schema is
    authoritative for which encoding a column gets, so both engines
    always agree on the encoding class.
    """
    c = f'"{col}"'
    if dtype in _FLOAT_TYPES or dtype.startswith("decimal"):
        return (
            f"CASE WHEN {c} IS NULL THEN '{NULL_S}' "
            f"WHEN isnan(CAST({c} AS DOUBLE)) THEN '<nan>' "
            f"WHEN CAST({c} AS DOUBLE) = 'Infinity'::DOUBLE THEN '<inf>' "
            f"WHEN CAST({c} AS DOUBLE) = '-Infinity'::DOUBLE THEN '<-inf>' "
            f"ELSE CAST(CAST(round(CAST({c} AS DOUBLE), 6) AS DECIMAL(38,6)) AS VARCHAR) END"
        )
    if dtype in _INT_TYPES:
        return f"coalesce(CAST({c} AS VARCHAR), '{NULL_S}')"
    if dtype.startswith("timestamp"):
        return (
            f"coalesce(CAST(epoch_us(CAST({c} AS TIMESTAMP)) AS VARCHAR), '{NULL_S}')"
        )
    if dtype == "date":
        return f"coalesce(CAST({c} AS VARCHAR), '{NULL_S}')"
    if dtype == "boolean":
        return f"coalesce(CAST(CAST({c} AS INT) AS VARCHAR), '{NULL_S}')"
    if dtype == "string":
        return f"coalesce({c}, '{NULL_S}')"
    raise TypeError(f"no canonical serialization for column {col!r} of type {dtype}")


def serialize_tall(df: DataFrame, tag: str) -> DataFrame:
    """Render every row of ``df`` to the canonical (q, r) string pair."""
    dtypes = dict(df.dtypes)
    parts = [F.expr(_canon_spark(c, dtypes[c])) for c in sorted(df.columns)]
    return df.select(F.lit(tag).alias("q"), F.concat_ws("|", *parts).alias("r"))


def panel_fn(members: tuple[str, ...], eager: bool = False):
    """Composite query callable: run + serialize + union each member.

    ``eager=True`` materializes each member (Arrow round-trip to a
    LocalRelation) before the union: every member runs as its own job
    and the union sees only its tiny serialized (q, r) strings, so
    heavyweight plans — MLlib model transforms whose UDF closures drag
    the fitted model (and, via ``trainingSummary``, a non-serializable
    SparkSession reference) into any RDD re-serialization — never
    co-execute inside one UnionExec.  ``localCheckpoint`` is NOT usable
    here for exactly that reason: its closure cleaning trips over
    ``BinaryLogisticRegressionTrainingSummaryImpl``.  The round-trip is
    bounded: these are correctness-panel results (scored test rows at
    check SF), not a production operator path.

    Cost caveat: an eager panel executes its full member pipelines
    (MLlib fits included) at ``fn()`` BUILD time — callers wanting only
    the plan/schema still pay full execution (~1 min for the three
    model panels at sf0.001, as the plan-sweep test observes).
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        frames = [
            serialize_tall(REGISTRY[m].fn(spark, sf_dir), m) for m in members
        ]
        if eager:
            frames = [
                spark.createDataFrame(f.toPandas(), schema=f.schema)
                for f in frames
            ]
        return reduce(DataFrame.unionAll, frames)

    return fn


def panel_oracle(members: tuple[str, ...]) -> str:
    """Composite DuckDB oracle: serialize + UNION ALL each member oracle.

    Column types come from the generated ``PANEL_MEMBER_DTYPES`` snapshot
    of each member's Spark schema (regenerate with
    ``scripts/gen_panel_dtypes.py``; drift is caught by the oracle-parity
    suite, which compares this SQL against the live Spark plan).
    """
    selects = []
    for m in members:
        sub = REGISTRY[m].oracle
        if not sub:
            raise ValueError(f"panel member {m} has no oracle")
        dtypes = dict(PANEL_MEMBER_DTYPES[m])
        exprs = ", ".join(_canon_duck(c, dtypes[c]) for c in sorted(dtypes))
        selects.append(
            f"SELECT '{m}' AS q, concat_ws('|', {exprs}) AS r\nFROM (\n{sub}\n) \"__{m}\""
        )
    return "\nUNION ALL\n".join(selects)


def _register_panels() -> None:
    for name, members in ORACLE_PANELS.items():
        register(
            name,
            oracle=panel_oracle(members),
            doc=(
                "Driver-facing composite of "
                + ", ".join(members)
                + " (serialized rows, one hash-checked slot; see panel_specs.py)."
            ),
            tags=("panel",),
        )(panel_fn(members, eager=name in EAGER_PANELS))
    for name, members in ROWS_ONLY_PANELS.items():
        register(
            name,
            oracle=None,
            doc=(
                "Driver-facing rows-only composite of "
                + ", ".join(members)
                + " (no SQL-expressible oracle; see panel_specs.py)."
            ),
            tags=("panel",),
        )(panel_fn(members, eager=name in EAGER_PANELS))
    # Flag the driver-exposed surface: all panels + the standalone set.
    for name in list(ALL_PANELS) + list(EXPOSED_STANDALONE):
        REGISTRY[name] = replace(REGISTRY[name], expose=True)


_register_panels()
