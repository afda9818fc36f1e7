"""Composite "panel" queries: the driver-facing consolidation layer.

A panel bundles several registry queries into ONE driver-checkable
query. Each member's result rows are serialized into a canonical
string (columns in name-sorted order, mirroring the driver's
column-name sort before hashing) and then REDUCED inside the engine to
one order-free digest row per member:

    (q = member name, n = row count,
     h1, h2 = decimal-string sums of two 60-bit md5 chunks of each
              canonical row string)

The DuckDB oracle applies the byte-identical serialization and digest
arithmetic to each member's oracle SQL and UNION ALLs, so the driver's
rows+schema+hash comparison still transitively checks every member's
full output — any SINGLE differing/missing/extra member row moves n or
one of the 120 checksum bits with certainty, and any fixed set of k
independent row corruptions survives only if their md5-chunk deltas
cancel in BOTH 60-bit sums (~2^-120 for deltas modeled as uniform).
The sums are linear, so this is weaker than a hash over sorted rows —
an adversary could construct offsetting +delta/-delta row pairs — but
the digest guards against engine/plan drift, not adversaries, and
drift-shaped corruption (a changed aggregate, a lost row, a different
rounding) is exactly the single-row / independent-delta case. The
panel itself emits ONE ROW PER MEMBER instead of the full member row
volume. That keeps the correctness probe O(members), not
O(SF): before this change (r8) ``panel_olap`` alone serialized and
collected 24M rows at sf1 (198 s of the 1165 s probe wall) for what is
semantically a fixed-size equality certificate.

Digest sums are rendered as decimal STRINGS on both sides: the sums
exceed float53 precision (~n·2^60), and string rendering is the only
representation both engines' pandas paths return losslessly.

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


def _digest_chunk_spark(pos: int) -> str:
    """Spark SQL: order-free checksum over the canonical row strings —
    the sum of one 15-hex-digit (60-bit) md5 chunk per row, rendered as
    a decimal string. DECIMAL(38,0) headroom: overflow would need
    ~8.7e19 rows per member."""
    return (
        f"coalesce(CAST(SUM(CAST(conv(substr(md5(r), {pos}, 15), 16, 10) "
        f"AS DECIMAL(38,0))) AS STRING), '0')"
    )


def _digest_chunk_duck(pos: int) -> str:
    """DuckDB expression producing the identical chunk sum string."""
    return (
        f"coalesce(CAST(SUM(CAST(('0x' || substr(md5(r), {pos}, 15))::BIGINT "
        f"AS DECIMAL(38,0))) AS VARCHAR), '0')"
    )


def member_digest(df: DataFrame, tag: str) -> DataFrame:
    """Reduce one member's full output to its (q, n, h1, h2) digest row.

    The aggregate is a plain hash-free global agg with map-side partial
    combine: per task it folds its rows into three longs/decimals, so
    the data that crosses the final exchange is O(tasks), never O(rows)
    — the panel's cost is the member plan itself, not the certificate.
    """
    tall = serialize_tall(df, tag)
    return tall.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(_digest_chunk_spark(1)).alias("h1"),
        F.expr(_digest_chunk_spark(17)).alias("h2"),
    ).select(F.lit(tag).alias("q"), "n", "h1", "h2")


# Session-scoped digest-row cache for EAGER panel members, keyed by
# (applicationId, sf_dir, member). An eager panel must execute its full
# member pipelines (MLlib fits included) at fn() BUILD time — the cache
# makes the SECOND and later builds within one session (plan sweeps,
# repeated probes over the same immutable sf_dir) free instead of
# re-fitting models (VERDICT r9 item 5). Values are one 4-field Row per
# member, so the cache is O(members), never O(SF). Bench integrity is
# unaffected: no panel carries q.bench, so no timed lap ever sees a
# cache hit (see memory: bench-integrity-localcheckpoint).
_EAGER_DIGEST_CACHE: dict[tuple[str, str, str], list] = {}


def panel_fn(members: tuple[str, ...], eager: bool = False):
    """Composite query callable: run + digest + union each member.

    ``eager=True`` materializes each member's single digest row
    (collect + ``createDataFrame`` to a LocalRelation) before the
    union: every member runs as its own job and the union sees only a
    literal row, so heavyweight plans — MLlib model transforms whose
    UDF closures drag the fitted model (and, via ``trainingSummary``, a
    non-serializable SparkSession reference) into any RDD
    re-serialization — never co-execute inside one UnionExec.
    ``localCheckpoint`` is NOT usable here for exactly that reason: its
    closure cleaning trips over
    ``BinaryLogisticRegressionTrainingSummaryImpl``. Since the digest
    is one row, the materialization is a 4-field collect — no pandas
    round-trip (VERDICT r8 item 4).

    Cost caveat: an eager panel executes its full member pipelines
    (MLlib fits included) at the FIRST ``fn()`` build in a session;
    later builds over the same (session, sf_dir) reuse the memoized
    digest rows (``_EAGER_DIGEST_CACHE``), so plan sweeps and repeated
    schema probes no longer pay the ~1 min model-panel re-fit.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        if not eager:
            frames = [
                member_digest(REGISTRY[m].fn(spark, sf_dir), m)
                for m in members
            ]
            return reduce(DataFrame.unionAll, frames)
        app_id = spark.sparkContext.applicationId
        frames = []
        for m in members:
            key = (app_id, sf_dir, m)
            if key not in _EAGER_DIGEST_CACHE:
                d = member_digest(REGISTRY[m].fn(spark, sf_dir), m)
                _EAGER_DIGEST_CACHE[key] = (d.collect(), d.schema)
            rows, schema = _EAGER_DIGEST_CACHE[key]
            frames.append(spark.createDataFrame(rows, schema=schema))
        return reduce(DataFrame.unionAll, frames)

    return fn


def panel_oracle(members: tuple[str, ...]) -> str:
    """Composite DuckDB oracle: serialize + digest + UNION ALL each
    member oracle.

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
            f"SELECT '{m}' AS q,\n"
            f"       CAST(COUNT(*) AS BIGINT) AS n,\n"
            f"       {_digest_chunk_duck(1)} AS h1,\n"
            f"       {_digest_chunk_duck(17)} AS h2\n"
            f"FROM (\n"
            f"  SELECT concat_ws('|', {exprs}) AS r\n"
            f"  FROM (\n{sub}\n  ) \"__{m}\"\n"
            f") \"__r_{m}\""
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
