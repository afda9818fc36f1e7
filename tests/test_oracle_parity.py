"""Every registered catalog query must match its DuckDB oracle —
exactly the driver's t2 correctness gate, run locally at sf0.001."""

import pytest

from orx_surgical_spark.queries.catalog import REGISTRY
from orx_surgical_spark.testing import compare_query

_WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
_ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    compare_query(q.fn(spark, sf_dir), q.oracle, sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
