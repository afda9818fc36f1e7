"""Row-equivalence pins for the r14 Arrow (mapInArrow) dedup kernels.

The kernels MUST reproduce the expression chain's strings exactly —
the DuckDB oracles replay ``split(lower(trim(text)), '\\s+')`` + md5
verbatim, so any tokenization drift is an oracle failure. Fixtures
cover the divergence candidates between Java and Python semantics:
trim strips 0x20 only (not tabs), Java's \\s is the ASCII class, split
keeps leading empty strings, and array_distinct keeps first-occurrence
order.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from orx_surgical_spark.operators import dedup as D
from orx_surgical_spark.operators.text import shingles, tokens

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ADVERSARIAL = [
    (0, "alpha beta gamma delta epsilon"),
    (1, "a b"),                          # under 3 tokens -> no shingles
    (2, ""),                             # empty text
    (3, "   leading and trailing spaces   "),
    (4, "tab\tseparated words here ok"),  # \t is \s but NOT trimmed
    (5, "\tleading tab yields empty first token"),
    (6, "UPPER Case MiXeD lower case"),
    (7, "double  spaces   collapse to one split"),
    (8, "newline\nand\rcarriage and\x0bvt and\x0cff tokens"),
    (9, "dup dup dup dup dup"),          # repeated shingles -> distinct
    (10, "x " * 200),                    # long doc
    (11, "éclair café naïve unicode tokens"),
]


@pytest.fixture(scope="module")
def adv_docs(spark):
    return spark.createDataFrame(ADVERSARIAL, ["doc_id", "text"])


def _collect_sorted(df):
    return sorted(map(tuple, df.collect()))


def test_shingle_kernel_matches_expression_adversarial(spark, adv_docs):
    old = adv_docs.select("doc_id", shingles(tokens("text"), 3).alias("__sh"))
    new = D.shingle_rows_arrow(adv_docs)
    # exact rows INCLUDING element order (array_distinct keeps first
    # occurrence; the kernel must too)
    assert _collect_sorted(new) == _collect_sorted(old)


@pytest.mark.parametrize("ngram", [2, 4])
def test_shingle_kernel_matches_expression_other_ngrams(spark, adv_docs, ngram):
    old = adv_docs.select("doc_id", shingles(tokens("text"), ngram).alias("__sh"))
    new = D.shingle_rows_arrow(adv_docs, ngram=ngram)
    assert _collect_sorted(new) == _collect_sorted(old)


def test_band_kernel_matches_expression_adversarial(spark, adv_docs):
    old = D._minhash_bands_expr(adv_docs)
    new = D.minhash_bands(adv_docs)
    assert _collect_sorted(new) == _collect_sorted(old)
    assert old.schema == new.schema


def test_band_kernel_matches_expression_on_corpus(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    old = D._minhash_bands_expr(docs)
    new = D.minhash_bands(docs)
    assert _collect_sorted(new) == _collect_sorted(old)


def test_shingle_kernel_matches_expression_on_corpus(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    old = docs.select("doc_id", shingles(tokens("text"), 3).alias("__sh"))
    new = D.shingle_rows_arrow(docs)
    assert _collect_sorted(new) == _collect_sorted(old)


def test_band_kernel_ngram1_falls_back_to_expression(spark, adv_docs):
    # token-set mode keeps the expression path; rows must still match
    # the expression construction trivially (same function)
    plan = D.minhash_bands(adv_docs, ngram=1)._jdf.queryExecution().toString()
    assert "MapInArrow" not in plan


def test_gram_kernel_matches_expression_adversarial(spark, adv_docs):
    old = _gram_rows_expr(adv_docs, k=4, stride=1)
    new = D.gram_rows_arrow(adv_docs, k=4, stride=1)
    assert _collect_sorted(new) == _collect_sorted(old)


@pytest.mark.parametrize("stride", [1, 3])
def test_gram_kernel_matches_expression_on_corpus(spark, stride):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    old = _gram_rows_expr(docs, k=20, stride=stride)
    new = D.gram_rows_arrow(docs, k=20, stride=stride)
    assert _collect_sorted(new) == _collect_sorted(old)


def _gram_rows_expr(df, k, stride, text_col="text", id_col="doc_id"):
    # the pre-r14 expression window stream, verbatim
    t = df.select(F.col(id_col), tokens(text_col).alias("toks")).withColumn(
        "n", F.size("toks")
    )
    starts = F.when(
        F.col("n") >= k, F.sequence(F.lit(0), F.col("n") - k, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return t.select(id_col, F.explode(starts).alias("p"), "toks").select(
        id_col,
        F.col("p").cast("int").alias("p"),
        F.md5(F.array_join(F.slice("toks", F.col("p") + 1, k), " ")).alias("gh"),
    )


def test_simhash_kernel_matches_expression(spark, adv_docs):
    old = D._simhash16_expr(adv_docs)
    new = D.simhash16(adv_docs)
    assert _collect_sorted(new) == _collect_sorted(old)
    assert old.schema == new.schema


def test_simhash_kernel_matches_expression_on_corpus(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    assert _collect_sorted(D.simhash16(docs)) == _collect_sorted(
        D._simhash16_expr(docs)
    )


def test_prefix_pairs_rows_unchanged_by_kernel(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(120)
    got = D.ngram_jaccard_pairs_prefix(docs, threshold=0.5, block_col="lang")
    want = D.ngram_jaccard_pairs(docs, threshold=0.5, block_col="lang")
    assert _collect_sorted(got) == _collect_sorted(want)


def test_jaccard_verify_rows_unchanged_by_kernel(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    cands = D.lsh_candidate_pairs(docs)
    got = D.jaccard_verify(cands, docs).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("j")
    )
    # baseline: the pure-expression verify (pre-r13/r14 naive shape)
    sh = docs.select(
        F.col("doc_id"), shingles(tokens("text"), 3).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    want = (
        cands.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(D.jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("j"))
    )
    assert _collect_sorted(got) == _collect_sorted(want)
