"""DuckDB-oracle parity harness.

Mirrors the driver's t2 correctness gate locally: run a catalog query's
Spark side and its DuckDB oracle over the same parquet tables, compare
row count, sorted column names, and an order-insensitive multiset of
normalized values. Used by ``tests/test_oracle_parity.py`` so every
registered query is validated before the driver ever sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from orx_surgical_spark.schemas import TPCH_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's pre-registered views.

    Multi-file tables (a DIRECTORY named ``<table>.parquet`` — the sf1
    scale tiles; any real dataset) are registered with a glob: DuckDB's
    ``read_parquet`` takes file paths, not directories."""
    import os

    con = duckdb.connect()
    for t in TPCH_TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def _norm_value(v: Any) -> str:
    """Normalize one cell for order-insensitive comparison."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # 12 significant digits: strict enough to catch logic errors,
        # loose enough for cross-engine float noise after our rounding.
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if hasattr(v, "tolist") and not hasattr(v, "isoformat"):
        # numpy array/scalar: DuckDB's fetch_df and Arrow-enabled Spark
        # sessions both hand back numpy — normalize via Python values so
        # the result doesn't depend on which conversion path ran.
        n = v.tolist()
        return (
            "[" + ",".join(_norm_value(x) for x in n) + "]"
            if isinstance(n, list)
            else _norm_value(n)
        )
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def normalize_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Sorted multiset of rows with name-sorted columns."""
    cols = sorted(df.columns)
    out = [
        tuple(_norm_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(out)


def compare_query(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive)."""
    con = duckdb_connection(sf_dir)
    try:
        oracle = con.execute(oracle_sql).fetch_df()
    finally:
        con.close()
    mine = spark_df.toPandas()

    assert sorted(mine.columns) == sorted(oracle.columns), (
        f"column mismatch: spark={sorted(mine.columns)} "
        f"oracle={sorted(oracle.columns)}"
    )
    assert len(mine) == len(oracle), (
        f"row count mismatch: spark={len(mine)} oracle={len(oracle)}"
    )
    a, b = normalize_frame(mine), normalize_frame(oracle)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for x, y in zip(a, b) if x != y)} rows); "
            f"first diffs:\n" + "\n".join(f"  spark={x}\n  duck ={y}" for x, y in diffs)
        )


def mhe_shaped_arrays(
    n: int = 2000, n_feats: int = 64, n_informative: int = 12, d: float = 0.15
):
    """Deterministic MHE-shaped parity corpus (numpy side).

    Balanced binary labels; sparse 0/1 features whose informative
    columns shift P(x=1) by ±``d`` with the label — signal calibrated
    so a well-fit scorer lands inside BASELINE.md's deep-model AUC band
    (CNN 0.8831 / RNN 0.7692 → band 0.73-0.88). Single source of truth
    for tests/test_model_parity.py's Spark fixture AND
    scripts/train_external_weights.py's offline training run, so the
    frozen external weights score exactly the corpus the band test
    rebuilds. Returns ``(x, y)`` numpy arrays.
    """
    import numpy as np

    rng = np.random.default_rng(7)
    y = np.arange(n) % 2
    p = np.full((n, n_feats), 0.5)
    p[:, :n_informative] = np.where(y[:, None] == 1, 0.5 + d, 0.5 - d)
    x = (rng.random((n, n_feats)) < p).astype(float)
    return x, y


def mhe_fullwidth_arrays(
    n: int = 500,
    n_feats: int = 366 * 516,
    n_informative: int = 175,
    d: float = 0.10,
    base: float = 0.02,
):
    """Full-reference-width MHE parity corpus: 188,856 dims — the
    reference's 366 codes x 516 positions tensor flattened
    (``cnn_model.ipynb:61 (cell 2)``) — at realistic MHE sparsity
    (~2% density).  Signal (175 informative dims shifted +0.10) is
    calibrated so the frozen full-width external checkpoint scores
    test AUC ~0.90, inside BASELINE.md's deep-model band around the
    reference CNN's 0.8831.  float32 throughout (the dense matrix is
    ~360 MB; float64 would double it for no parity value).  Single
    source of truth for scripts/train_external_weights.py and
    tests/test_model_parity.py's full-width band test.  Returns
    ``(x, y)``.
    """
    import numpy as np

    rng = np.random.default_rng(7)
    y = np.arange(n) % 2
    p = np.full((n, n_feats), base, dtype=np.float32)
    p[:, :n_informative] = np.where(
        y[:, None] == 1, base + d, base
    ).astype(np.float32)
    x = (rng.random((n, n_feats), dtype=np.float32) < p).astype(np.float32)
    return x, y
