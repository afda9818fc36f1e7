"""Hand-computed fixtures for the repetition metrics and sequence
packing operators (the catalog oracle covers them end-to-end; these pin
the semantics on inputs where the arithmetic is checkable by eye)."""

import pytest

from orx_surgical_spark.operators import text as X


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y"), (3, "solo")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in X.repetition_stats(df).collect()}
    # doc 1: tokens [a b a b c]; bigrams [a b, b a, a b, b c]
    r = rows[1]
    assert r["n_bigrams"] == 4
    assert r["dup_token_frac"] == pytest.approx(1 - 3 / 5)
    assert r["dup_bigram_frac"] == pytest.approx(2 / 4)
    assert r["top_bigram"] == "a b"
    assert r["top_bigram_count"] == 2
    # 2 occurrences x 2 non-space chars / 5 non-space chars
    assert r["top_bigram_char_frac"] == pytest.approx(0.8)
    # doc 2: one bigram, nothing repeated
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["top_bigram"] == "x y"
    # doc 3: a single token has no bigrams -> excluded
    assert 3 not in rows


def test_repetition_stats_tie_breaks_lexicographic(spark):
    df = spark.createDataFrame([(1, "b c a a b c")], ["doc_id", "text"])
    # bigrams: [b c, c a, a a, a b, b c] -> "b c" wins on count;
    # among count-1 grams nothing matters, but force a count tie:
    df2 = spark.createDataFrame([(1, "z z y y")], ["doc_id", "text"])
    r = X.repetition_stats(df2).collect()[0]
    # bigrams [z z, z y, y y] all count 1 -> lexicographically smallest
    assert r["top_bigram"] == "y y"
    r1 = X.repetition_stats(df).collect()[0]
    assert (r1["top_bigram"], r1["top_bigram_count"]) == ("b c", 2)


def test_pack_sequences_chunk_assignment(spark):
    df = spark.createDataFrame(
        [(0, 4), (1, 5), (2, 3), (3, 6), (4, 0)], ["doc_id", "n_tok"]
    )
    out = {
        r["doc_id"]: r
        for r in X.pack_sequences(
            df, "n_tok", "doc_id", budget=10, n_shards=1
        ).collect()
    }
    assert 4 not in out  # zero-token doc dropped
    assert [(out[i]["pack_seq"], out[i]["start_offset"]) for i in range(4)] == [
        (0, 0), (0, 4), (0, 9), (1, 12)
    ]
    # doc 2 spans tokens 9..11: crosses the pack-0/pack-1 cut
    assert [out[i]["is_split"] for i in range(4)] == [False, False, True, False]


def test_pack_sequences_shards_are_independent(spark):
    df = spark.createDataFrame(
        [(i, 7) for i in range(20)], ["doc_id", "n_tok"]
    )
    out = X.pack_sequences(df, "n_tok", "doc_id", budget=21, n_shards=4)
    rows = out.collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    # each shard has 5 docs x 7 tokens = 35 tokens -> packs 0 and 1
    for s in range(4):
        packs = sorted(
            (r["pack_seq"], r["start_offset"])
            for r in rows
            if r["shard"] == s
        )
        assert [p for p, _ in packs] == [0, 0, 0, 1, 1]


def test_quantize_int8_hand_computed(spark):
    from orx_surgical_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id: long, embedding: array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # scale = 1/127; q = round(x * 127) = [127, -63.5->floor(-63.0)? ...]
    # x/scale = x*127: [127.0, -63.5, 31.75, 0] -> floor(x+0.5):
    # [127, floor(-63.0)=-63, floor(32.25)=32, 0]
    assert list(rows[1]["q"]) == [127, -63, 32, 0]
    assert rows[1]["scale"] == pytest.approx(1 / 127, abs=1e-6)
    assert list(rows[2]["q"]) == [0, 0, 0, 0]
    assert rows[2]["rmse"] == 0.0


def test_chunk_tokens_coverage_and_overlap(spark):
    """Every token appears in some chunk; consecutive chunks share
    exactly window-stride tokens; chunk count matches the formula."""
    from pyspark.sql import functions as F

    from orx_surgical_spark.operators.text import chunk_tokens

    W, S = 8, 6
    words = " ".join(f"w{i}" for i in range(25))  # n=25 -> 1+ceil(17/6)=4
    short = "a b c"  # n=3 <= W -> 1 chunk
    df = spark.createDataFrame([(1, words), (2, short)], "doc_id long, text string")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    idx, chunk_at = chunk_tokens(toks, window=W, stride=S)
    # chunk_at's slice references the toks expression over `text`, so
    # text must still be in scope where the chunk is projected.
    rows = (
        df.select("doc_id", "text", F.explode(idx).alias("i"))
        .select("doc_id", "i", chunk_at(F.col("i")).alias("chunk"))
        .collect()
    )
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.i] = list(r.chunk)
    assert len(by_doc[1]) == 4 and len(by_doc[2]) == 1
    # full coverage, order preserved inside chunks
    covered = []
    for i in sorted(by_doc[1]):
        covered.extend(by_doc[1][i][(W - S) if i else 0:])
    assert covered == [f"w{i}" for i in range(25)]
    # consecutive chunks overlap by exactly W - S tokens
    for i in range(3):
        assert by_doc[1][i][-(W - S):] == by_doc[1][i + 1][: W - S]
    assert by_doc[2][0] == ["a", "b", "c"]


def test_phrase_hits_counts_and_zero_rows(spark):
    """Exact positional semantics: overlapping occurrences both count,
    a 3-word phrase needs all offsets, a bag-of-words co-occurrence
    without adjacency is NOT a hit, and absent phrases still emit a
    0/0 row."""
    from orx_surgical_spark.operators.text import phrase_hits

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),        # "a b" at pos 0 and 2 (overlap via shared a? no — occurrences at 0,2)
            (2, "a b c d"),          # "a b c" once; "a b" once
            (3, "b a c"),            # has all of a,b,c but no "a b"
            (4, "x y z"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.phrase: (r.n_hits, r.n_docs)
        for r in phrase_hits(
            docs, ["a b", "a b c", "q z", "a"], id_col="doc_id"
        ).collect()
    }
    assert out["a b"] == (3, 2)      # doc1 twice, doc2 once
    assert out["a b c"] == (1, 1)    # doc2 only
    assert out["q z"] == (0, 0)      # zero row present
    assert out["a"] == (5, 3)        # single-word degenerate case
