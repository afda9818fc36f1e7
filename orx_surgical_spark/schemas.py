"""Explicit schemas for every table the engine reads.

The reference infers all dtypes from CSV and patches types downstream
(``DtypeWarning: mixed types`` in its executed notebooks — SURVEY §1.4;
reference ``cms_preprocess.py:45-49``). This engine declares
``StructType`` per table and makes downstream casts explicit, which is
idiomatic Spark and removes the mixed-type class of bugs.

Two table groups:

1. CMS claims tables mirroring the reference's five inputs
   (``cms_preprocess.py:6-16``) — used by the pipeline golden tests.
2. The driver's TPC-H-ish synthetic tables (TESTDATA.md) — used by the
   DuckDB-oracle operator tests and the bench.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# CMS claims tables (reference cms_preprocess.py:6-16)
# ---------------------------------------------------------------------------

N_DGNS_COLS = 10  # ICD9_DGNS_CD_1..10  (cms_preprocess.py:12-13)
N_PRCDR_COLS = 6  # ICD9_PRCDR_CD_1..6  (cms_preprocess.py:14-15)

DGNS_COLS = [f"ICD9_DGNS_CD_{i}" for i in range(1, N_DGNS_COLS + 1)]
PRCDR_COLS = [f"ICD9_PRCDR_CD_{i}" for i in range(1, N_PRCDR_COLS + 1)]

BEN_SCHEMA = T.StructType(
    [
        T.StructField("DESYNPUF_ID", T.StringType(), False),
        T.StructField("SP_RA_OA", T.IntegerType(), True),
        # Dates arrive as YYYYMMDD strings, possibly dirty; parsed
        # explicitly downstream (reference relies on pandas inference).
        T.StructField("BENE_BIRTH_DT", T.StringType(), True),
        T.StructField("BENE_SEX_IDENT_CD", T.IntegerType(), True),
    ]
)

IP_SCHEMA = T.StructType(
    [
        T.StructField("DESYNPUF_ID", T.StringType(), False),
        T.StructField("CLM_ID", T.StringType(), False),
        T.StructField("CLM_FROM_DT", T.StringType(), True),
        T.StructField("CLM_DRG_CD", T.StringType(), True),
    ]
    + [T.StructField(c, T.StringType(), True) for c in DGNS_COLS]
    + [T.StructField(c, T.StringType(), True) for c in PRCDR_COLS]
)

PDE_SCHEMA = T.StructType(
    [
        T.StructField("DESYNPUF_ID", T.StringType(), False),
        T.StructField("PROD_SRVC_ID", T.StringType(), True),
    ]
)

# Crosswalks keep the raw quoted headers of the source files; the
# cleanup/rename is an explicit operator (reference cms_preprocess.py:122,
# 155-157, 163-165).
CROSSWALK_RAW_SCHEMA = T.StructType(
    [
        T.StructField("'ICD-9-CM CODE'", T.StringType(), True),
        T.StructField("'CCS CATEGORY'", T.StringType(), True),
    ]
)

CROSSWALK_SCHEMA = T.StructType(
    [
        T.StructField("ICD9", T.StringType(), False),
        T.StructField("CCS", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# TPC-H-ish synthetic tables (TESTDATA.md) — parquet is self-describing;
# these StructTypes document the expected shapes and back schema asserts.
# ---------------------------------------------------------------------------

TPCH_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TPCH_TABLES = list(TPCH_SCHEMAS)
