"""Text-analysis catalog queries (beyond-reference tier) over the
``documents`` table: token statistics, language-ID heuristic, quality
scoring, content fingerprinting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators import text as X
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_SW_LIST = "[" + ", ".join(f"'{w}'" for w in X.EN_STOPWORDS) + "]"


@register(
    "token_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks, length(text) AS n_chars_raw
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
           CAST(n_chars_raw AS INTEGER) AS n_chars,
           ROUND(len(array_to_string(toks, '')) / len(toks), 6) AS avg_token_len
    FROM t
    """,
    doc="Per-document token counting: total/distinct token counts, char "
        "count, mean token length — all JVM-side array expressions.",
    bench=True,
    tags=("text",),
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    return docs.select(
        "doc_id",
        X.token_count(toks).alias("n_tokens"),
        X.distinct_token_count(toks).alias("n_distinct_tokens"),
        F.length("text").cast("int").alias("n_chars"),
        F.round(X.avg_token_length(toks), 6).alias("avg_token_len"),
    )


@register(
    "lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS} AS toks FROM documents
    ), r AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains({_SW_LIST}, x))) / len(toks)
                 AS ratio
      FROM t
    )
    SELECT doc_id, lang,
           ROUND(ratio, 6) AS stopword_ratio,
           CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang
    FROM r
    """,
    doc="Language-ID heuristic: English-stopword ratio per document with "
        "a threshold rule (n-gram-heuristic tier of a training-data "
        "pipeline).",
    tags=("text", "langid"),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    return docs.select(
        "doc_id",
        "lang",
        F.round(X.stopword_ratio(toks), 6).alias("stopword_ratio"),
        X.predict_lang(toks).alias("pred_lang"),
    )


@register(
    "quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             length(regexp_replace(lower(text), '[a-z0-9 \\t\\n]', '', 'g'))
               / greatest(length(lower(text)), 1) AS punct,
             len(list_filter(toks, x -> list_contains({_SW_LIST}, x))) / len(toks)
               AS sw
      FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           ROUND(punct, 6) AS punct_ratio,
           ROUND(least(n_tokens / 100.0, 1.0) * (1.0 - punct)
                 * (CASE WHEN sw >= 0.01 AND sw <= 0.6 THEN 1.0 ELSE 0.5 END), 6)
               AS quality
    FROM m
    """,
    doc="Document quality scoring: length saturation x punctuation "
        "cleanliness x stopword plausibility, fully SQL-expressible.",
    tags=("text", "quality"),
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    return docs.select(
        "doc_id",
        X.token_count(toks).alias("n_tokens"),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(X.quality_score("text"), 6).alias("quality"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))
               AS fingerprint
    FROM documents
    """,
    doc="Order-insensitive content fingerprint: md5 of the sorted "
        "distinct token set (cheap first-pass near-dup key).",
    tags=("text", "fingerprint"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint("text").alias("fingerprint"))


@register(
    "bpe_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{X.BPE_PRETOKEN_PATTERN.replace(chr(39), chr(39) * 2)}')) AS INTEGER)
               AS n_bpe_tokens,
           CAST(len({_TOKS}) AS INTEGER) AS n_word_tokens
    FROM documents
    """,
    doc="LLM token-cost estimate: BPE-style pre-tokenizer counts (the "
        "GPT-2 regex split, RE2-safe subset) next to whitespace word "
        "counts — the same pattern string runs verbatim on both engines.",
    tags=("text", "tokens"),
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(X.bpe_tokens("text")).alias("n_bpe_tokens"),
        X.token_count(X.tokens("text")).alias("n_word_tokens"),
    )


@register(
    "winnowing_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), sh AS (
      -- positional shingle stream: NO distinct (winnowing is order-based)
      SELECT doc_id,
             list_transform(
               range(1, greatest(len(toks) - 2, 0) + 1),
               i -> array_to_string(toks[i:i+2], ' ')) AS sh
      FROM t
    ), h AS (
      SELECT doc_id, list_transform(sh, s -> substr(md5(s), 1, 8)) AS hs
      FROM sh WHERE len(sh) > 0
    ), w AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               i -> list_min(hs[i:i+3]))) AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fp FROM w
    """,
    doc="Winnowing (rolling-hash) fingerprints: min md5-prefix per "
        "sliding window of 4 shingle hashes, exploded to (doc, fp) rows "
        "— the plagiarism-detection / long-match dedup scheme "
        "(Schleimer et al.), engine-independent by construction.",
    tags=("text", "fingerprint", "dedup"),
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.winnowing_fingerprints(docs, "text", "doc_id", n=3, window=4)


@register(
    "doc_repetition_stats",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS tk,
             length(regexp_replace(lower(trim(text)), '\s+', '', 'g'))
                 AS tok_chars
      FROM documents
    ), g AS (
      SELECT doc_id, tok_chars, len(tk) AS n_tok,
             len(list_distinct(tk)) AS n_tok_d,
             unnest(list_transform(range(1, len(tk)),
                                   i -> tk[i] || ' ' || tk[i+1])) AS gram
      FROM t
    ), pg AS (
      SELECT doc_id, tok_chars, n_tok, n_tok_d, gram, COUNT(*) AS c
      FROM g GROUP BY ALL
    ), rn AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS rn
      FROM pg
    )
    SELECT doc_id,
           CAST(SUM(c) AS INTEGER) AS n_bigrams,
           ROUND(1 - n_tok_d / CAST(n_tok AS DOUBLE), 6) AS dup_token_frac,
           ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                 / CAST(SUM(c) AS DOUBLE), 6) AS dup_bigram_frac,
           MAX(CASE WHEN rn = 1 THEN gram END) AS top_bigram,
           CAST(MAX(CASE WHEN rn = 1 THEN c END) AS INTEGER)
               AS top_bigram_count,
           ROUND(MAX(CASE WHEN rn = 1 THEN c END)
                 * (length(MAX(CASE WHEN rn = 1 THEN gram END)) - 1)
                 / CAST(tok_chars AS DOUBLE), 6) AS top_bigram_char_frac
    FROM rn
    GROUP BY doc_id, tok_chars, n_tok, n_tok_d
    """,
    doc="Gopher-style repetition metrics per document: duplicate-token "
        "fraction, duplicate-bigram fraction, top-bigram char coverage "
        "— the boilerplate/degenerate-text filters a training-data "
        "pipeline applies before dedup (Rae et al. 2021 heuristics).",
    tags=("text", "quality"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.repetition_stats(docs, "text", "doc_id")


@register(
    "pack_sequences_summary",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, len({_TOKS}) AS n_tokens,
             CAST(doc_id % 8 AS INTEGER) AS shard
      FROM documents
      WHERE len({_TOKS}) > 0
    ), c AS (
      SELECT *, SUM(n_tokens) OVER (
        PARTITION BY shard ORDER BY doc_id
        ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT shard,
           CAST(FLOOR((cum - n_tokens) / 2048.0) AS INTEGER) AS pack_seq,
           CAST(COUNT(*) AS INTEGER) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN FLOOR((cum - 1) / 2048.0)
                         <> FLOOR((cum - n_tokens) / 2048.0)
                    THEN 1 ELSE 0 END) AS INTEGER) AS n_split_docs
    FROM c
    GROUP BY 1, 2
    """,
    doc="GPT-style concat-and-chunk sequence packing: documents laid "
        "end-to-end per shard, token stream cut into 2048-token packs; "
        "per-pack doc/token/split counts.  Shard-parallel running-sum "
        "windows — the scalable packing layout for pretraining batches.",
    tags=("text", "encoder"),
)
def pack_sequences_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", X.token_count(X.tokens("text")).alias("n_tok")
    )
    packed = X.pack_sequences(d, "n_tok", "doc_id", budget=2048, n_shards=8)
    return packed.groupBy("shard", "pack_seq").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.col("is_split").cast("int")).cast("int").alias("n_split_docs"),
    )


@register(
    "decontamination_report",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> array_to_string(t[i:i+2], ' ')))) AS sh
      FROM tk
    ), ev AS (
      SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0
    ), co AS (
      SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0
    )
    SELECT co.doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_shared_shingles,
           COUNT(*) >= 2 AS contaminated
    FROM co JOIN ev USING (sh)
    GROUP BY co.doc_id
    """,
    doc="Benchmark decontamination: corpus documents sharing >=2 "
        "distinct 3-gram shingles with the held-out eval slice "
        "(doc_id % 97 == 0 stands in for the benchmark set) — the "
        "GPT-3-style n-gram collision check, eval side broadcast.",
    tags=("text", "dedup", "quality"),
)
def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    co = docs.where(F.col("doc_id") % 97 != 0)
    return X.contamination_report(co, ev, "text", "doc_id", n=3, min_shared=2)


@register(
    "token_budget_selection",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
    ), m AS (
      SELECT doc_id, len(toks) AS nt,
             length(regexp_replace(lower(text), '[a-z0-9 \\t\\n]', '', 'g'))
               / greatest(length(lower(text)), 1) AS punct,
             len(list_filter(toks, x -> list_contains({_SW_LIST}, x)))
               / len(toks) AS sw
      FROM t
    ), d AS (
      SELECT doc_id, nt,
             ROUND(least(nt / 100.0, 1.0) * (1.0 - punct)
                   * (CASE WHEN sw >= 0.01 AND sw <= 0.6
                      THEN 1.0 ELSE 0.5 END), 3) AS qb
      FROM m
    ), b AS (
      SELECT qb, SUM(nt) AS bt FROM d GROUP BY qb
    ), c AS (
      SELECT qb,
             SUM(bt) OVER (ORDER BY qb DESC ROWS UNBOUNDED PRECEDING)
                 AS cum,
             SUM(bt) OVER () AS tot
      FROM b
    ), sel AS (
      SELECT qb FROM c WHERE cum <= 0.4 * tot
    )
    SELECT (d.qb IN (SELECT qb FROM sel)) AS selected,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.nt) AS BIGINT) AS n_tokens
    FROM d
    GROUP BY 1
    """,
    doc="Token-budget corpus selection: highest-quality documents kept "
        "until 40% of the corpus token count is filled, bucket-granular "
        "cutoff from a tiny quality-bucket cumsum (no global sort) — "
        "the FineWeb-style quality curation step.",
    tags=("text", "quality", "sampling"),
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sel = X.token_budget_select(docs, "text", "doc_id",
                                budget_frac=0.4, bucket_dp=3)
    return sel.groupBy("selected").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


@register(
    "doc_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), p AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 64 THEN 1
                  ELSE CAST((len(toks) - 64 + 48 - 1) // 48 AS INTEGER) + 1
             END AS nch
      FROM t
    )
    SELECT doc_id,
           CAST(u.i AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(toks, u.i * 48 + 1, u.i * 48 + 64))
                AS INTEGER) AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, u.i * 48 + 1, u.i * 48 + 64),
                               ' ')) AS chunk_hash
    FROM p, UNNEST(range(0, nch)) AS u(i)
    """,
    doc="Context-window chunking (operators.text.chunk_tokens): split "
        "each document's token stream into 64-token chunks advancing "
        "by 48 (16-token overlap) — the step that turns long documents "
        "into model-context-sized training pieces. Pure JVM "
        "sequence/explode/slice: a map-only projection, no shuffle, no "
        "Python. Each chunk's exact content is pinned by an md5 of the "
        "space-joined tokens, matched against DuckDB's list_slice "
        "replay.",
    tags=("text", "chunking"),
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens("text")
    idx, chunk_at = X.chunk_tokens(toks, window=64, stride=48)
    exploded = docs.select(
        "doc_id", toks.alias("toks"), F.explode(idx).alias("chunk_idx")
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * 48 + 1, 64)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_hash"),
    )


@register(
    "unigram_perplexity_scores",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ), toks_ne AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), counts AS (
      SELECT token, COUNT(*) AS c FROM toks_ne GROUP BY token
    ), total AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS t FROM counts
    )
    SELECT tn.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-ln(c.c / total.t)), 6) AS cross_entropy,
           ROUND(exp(AVG(-ln(c.c / total.t))), 4) AS perplexity
    FROM toks_ne tn
    JOIN counts c ON tn.token = c.token
    CROSS JOIN total
    GROUP BY tn.doc_id
    """,
    doc="Perplexity quality filter: per-doc cross-entropy/perplexity "
        "under the corpus's own unigram distribution (outlier docs — "
        "boilerplate, gibberish, wrong language — score high). Global "
        "counts shuffle once on token; the token stream equi-joins the "
        "count table (co-shuffled, never broadcast — real vocabs are "
        "huge); one per-doc aggregate. See operators/text.py:"
        "unigram_perplexity.",
    tags=("text", "quality", "perplexity"),
)
def unigram_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.unigram_perplexity(docs)


# PII enrichment fragment shared by both engines: the synthetic corpus
# has no digits/addresses, so the query derives deterministic PII from
# doc_id arithmetic (same precedent as the derived-partsupp TPC-H
# tables) — both engines build the identical enriched string, then the
# detection/redaction regexes do the real work on it.
_PII_ENRICHED = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.example.com'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' from host 10.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 13) % 256 AS VARCHAR)"
    " ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' ref '"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " ELSE '' END"
)

_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_ID = r"\b\d{3}-\d{2}-\d{4}\b"


@register(
    "pii_redaction_stats",
    oracle=(
        "WITH t AS (SELECT doc_id, " + _PII_ENRICHED + " AS enriched"
        " FROM documents)"
        " SELECT doc_id,"
        " CAST(len(regexp_extract_all(enriched, '" + _PII_EMAIL + "'))"
        "   AS INTEGER) AS n_emails,"
        " CAST(len(regexp_extract_all(enriched, '" + _PII_IPV4 + "'))"
        "   AS INTEGER) AS n_ips,"
        " CAST(len(regexp_extract_all(enriched, '" + _PII_ID + "'))"
        "   AS INTEGER) AS n_ids,"
        " CAST(length(regexp_replace(regexp_replace(regexp_replace(enriched,"
        " '" + _PII_EMAIL + "', '[EMAIL]', 'g'),"
        " '" + _PII_IPV4 + "', '[IP]', 'g'),"
        " '" + _PII_ID + "', '[ID]', 'g')) AS INTEGER) AS redacted_len,"
        " md5(regexp_replace(regexp_replace(regexp_replace(enriched,"
        " '" + _PII_EMAIL + "', '[EMAIL]', 'g'),"
        " '" + _PII_IPV4 + "', '[IP]', 'g'),"
        " '" + _PII_ID + "', '[ID]', 'g')) AS redacted_md5"
        " FROM t"
    ),
    doc="PII detection + redaction over deterministically-enriched text "
        "(emails / IPv4 / SSN-shaped ids derived from doc_id arithmetic "
        "— both engines build the identical enriched string): per-type "
        "regexp_count on the original, chained regexp_replace redaction, "
        "scrubbed text pinned by md5. Map-only, zero shuffle.",
    tags=("text", "pii"),
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" reach user"), s(did), F.lit("@mail"), s(did % 10),
            F.lit(".example.com"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" from host 10."), s(did % 256), F.lit("."),
            s((did * 7) % 256), F.lit("."), s((did * 13) % 256),
        ),
    ).otherwise(F.lit(""))
    idnum = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" ref "), F.lpad(s(did % 1000), 3, "0"), F.lit("-"),
            F.lpad(s(did % 100), 2, "0"), F.lit("-"),
            F.lpad(s(did % 10000), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    enriched = docs.select(
        "doc_id", F.concat(F.col("text"), email, ip, idnum).alias("enriched")
    )
    counts = X.pii_counts("enriched")
    red = X.pii_redact("enriched")
    return enriched.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ips"),
        counts["id_number"].alias("n_ids"),
        F.length(red).cast("int").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


@register(
    "source_boilerplate_stripped",
    oracle="""
    WITH enriched AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 2 = 0
                  THEN 'promo header from ' || source || ' click here now '
                       || text
                  ELSE text END AS text
      FROM documents
    ), base AS (
      SELECT doc_id, source,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM enriched
    ), pfx AS (
      SELECT doc_id, source, toks,
             array_to_string(toks[1:7], ' ') AS prefix
      FROM base
    ), boiler AS (
      SELECT source, prefix
      FROM pfx GROUP BY source, prefix
      HAVING COUNT(*) * 1.0
             / (SELECT COUNT(*) FROM pfx p2 WHERE p2.source = pfx.source)
             >= 0.3
    ), stripped AS (
      SELECT p.doc_id, p.source,
             (b.prefix IS NOT NULL) AS was_stripped,
             CASE WHEN b.prefix IS NOT NULL THEN p.toks[8:len(p.toks)]
                  ELSE p.toks END AS out_toks
      FROM pfx p LEFT JOIN boiler b
        ON p.source = b.source AND p.prefix = b.prefix
    )
    SELECT doc_id, source, was_stripped,
           CAST(len(out_toks) AS INTEGER) AS n_tokens_out,
           md5(array_to_string(out_toks, ' ')) AS cleaned_md5
    FROM stripped
    """,
    doc="Per-source boilerplate-prefix removal (operators.text."
        "strip_source_boilerplate): a 7-token prefix shared by >= 30%% "
        "of a source's docs is that source's boilerplate; detection is "
        "two tiny (source, prefix) aggregates broadcast back, the strip "
        "a map-only projection — the corpus never shuffles. The "
        "deterministic header enrichment (even doc_ids get a per-source "
        "promo header; same precedent as the PII / partsupp "
        "constructions) gives both engines identical boilerplate to "
        "find; cleaned text pinned by md5.",
    tags=("text", "boilerplate"),
)
def source_boilerplate_stripped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("promo header from "),
                F.col("source"),
                F.lit(" click here now "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return X.strip_source_boilerplate(
        enriched, prefix_tokens=7, min_frac=0.3
    )


_PHRASES = (
    "hash join",
    "sort merge",
    "big table",
    "fast table",
    "sort merge join",
)


def _phrase_oracle(phrases=_PHRASES) -> str:
    """Per-phrase CTE chain over a positional posting list — the
    DuckDB half of operators/text.phrase_hits (posexplode is 0-based,
    generate_subscripts 1-based; only position DIFFERENCES matter, so
    the engines agree)."""
    parts = [f"""
    WITH toks AS (
      SELECT doc_id,
             unnest({_TOKS}) AS tok,
             generate_subscripts({_TOKS}, 1) AS pos
      FROM documents
    )"""]
    selects = []
    for pi, phrase in enumerate(phrases):
        words = phrase.split()
        joins = []
        for i, w in enumerate(words[1:], start=1):
            joins.append(
                f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id "
                f"AND t{i}.pos = t0.pos + {i} AND t{i}.tok = '{w}'"
            )
        parts.append(f"""
    , p{pi} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
             CAST(COUNT(DISTINCT t0.doc_id) AS BIGINT) AS n_docs
      FROM toks t0 {' '.join(joins)}
      WHERE t0.tok = '{words[0]}'
    )""")
        selects.append(
            f"SELECT '{phrase}' AS phrase, n_hits, n_docs FROM p{pi}"
        )
    parts.append("\n    " + "\n    UNION ALL\n    ".join(selects))
    return "".join(parts)


@register(
    "phrase_match_docs",
    oracle=_phrase_oracle(),
    doc="Exact phrase search over a positional inverted index: "
        "occurrence and doc-frequency counts for five probe phrases "
        "(incl. one three-word phrase and phrases with zero hits, so "
        "the zero row shape is pinned). The order-sensitive complement "
        "of bm25_topk — the primitive behind exact-phrase benchmark "
        "decontamination and boilerplate-slogan tracking. Postings are "
        "filtered to the probe vocabulary BEFORE any shuffle (only "
        "probe-term document frequency moves); each extra phrase word "
        "is one equi-join on the near-unique (doc, pos) key, so no "
        "skew at any corpus size.",
    tags=("text", "phrase"),
)
def phrase_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.phrase_hits(docs, list(_PHRASES))


@register(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
      -- list_filter mirrors the Spark side's empty-token drop: an
      -- empty/whitespace-only text would otherwise yield a [''] token
      -- here but none there (ADVICE r8).
      SELECT doc_id, source,
             unnest(list_filter({_TOKS}, t -> t <> '')) AS tok
      FROM documents
    ), cnt AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), vocab AS (
      SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT 32
    )
    SELECT t.source,
           CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS oov_tokens,
           ROUND(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.source
    """,
    doc="Tokenizer-vocabulary build + out-of-vocabulary coverage: the "
        "top-32 corpus tokens by (count DESC, token) — the pinned tie "
        "rule makes the truncation deterministic — then per-source OOV "
        "token counts and rates against that vocabulary. The "
        "vocabulary-sizing / domain-coverage primitive of a training "
        "pipeline (which sources will fragment under a candidate "
        "vocab?). Plan: one token aggregate, a TakeOrderedAndProject "
        "top-V (never a global sort), and the V-row vocab broadcast "
        "back into the coverage join — the corpus shuffles once for "
        "the count and once for the per-source rollup.",
    tags=("text", "vocab"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(X.tokens("text"), lambda t: t != F.lit(""))
    exploded = docs.select(
        "doc_id", "source", F.explode(toks).alias("tok")
    )
    vocab = (
        exploded.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(32)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    flagged = exploded.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return flagged.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.sum(oov).alias("oov_tokens"),
        F.round(
            F.sum(oov) * F.lit(1.0) / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )
