"""LSH bucket-cap behavior on a degenerate (all-identical) corpus: the
pathological case where every document lands in the same band buckets
and an uncapped expansion would emit n^2/2 pairs from one task."""

from pyspark.sql import functions as F

from orx_surgical_spark.operators import dedup as D


def _identical_corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every document body").alias(
            "text"
        ),
    )


def test_capped_expansion_is_bounded(spark):
    docs = _identical_corpus(spark)
    cap = 16
    for pre_thin in (False, True):
        pairs = D.lsh_candidate_pairs(docs, max_bucket=cap, pre_thin=pre_thin)
        n_pairs = pairs.count()
        # The slice hard-caps the expansion at cap ids per band key, so
        # even with every band colliding the distinct-pair output stays
        # around C(cap, 2) — far below the uncapped C(400, 2) = 79800.
        assert 0 < n_pairs <= cap * (cap - 1) * 2, (pre_thin, n_pairs)


def test_uncapped_matches_capped_below_cap(spark):
    """For buckets smaller than the cap the capped operator is exact."""
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique text "), (F.col("id") % 5).cast("string")).alias(
            "text"
        ),
    )
    capped = D.lsh_candidate_pairs(docs, max_bucket=1024)
    exact = D.lsh_candidate_pairs(docs, max_bucket=None)
    assert capped.exceptAll(exact).count() == 0
    assert exact.exceptAll(capped).count() == 0


def test_overflow_side_channel_reports_hot_buckets(spark):
    docs = _identical_corpus(spark)
    overflow = D.lsh_bucket_overflow(docs, max_bucket=16)
    rows = overflow.collect()
    assert rows, "all-identical corpus must report overflowing buckets"
    assert all(r["n_ids"] == 400 for r in rows)
    # The clean corpus reports nothing.
    clean = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string"), F.lit(" body")).alias(
            "text"
        ),
    )
    assert D.lsh_bucket_overflow(clean, max_bucket=16).count() == 0


def test_prefix_filtered_jaccard_equals_naive(spark, sf_dir):
    """ngram_jaccard_pairs_prefix must return byte-identically the
    naive quadratic operator's rows (the prefix filter is lossless for
    any global total order) — on the real documents table and on an
    adversarial mini-corpus with ties, empties, and exact dups."""
    from orx_surgical_spark.operators import dedup as D
    from orx_surgical_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    naive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, block_col="lang"
        ).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs_prefix(
            docs, n=3, threshold=0.5, block_col="lang"
        ).collect()
    }
    assert fast == naive

    rows = [
        (1, "a b c d e f", "en"),
        (2, "a b c d e f", "en"),      # exact dup of 1
        (3, "a b c d e zz", "en"),     # near dup of 1
        (4, "completely different words here now", "en"),
        (5, "a b", "en"),              # too short for 3-shingles
        (6, "a b c d e f", "de"),      # same text, other block
    ]
    mini = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    naive = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(
            mini, n=3, threshold=0.5, block_col="lang"
        ).collect()
    }
    fast = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs_prefix(
            mini, n=3, threshold=0.5, block_col="lang"
        ).collect()
    }
    assert fast == naive
    assert (1, 2, 1.0) in fast  # the exact dup survives the filter
