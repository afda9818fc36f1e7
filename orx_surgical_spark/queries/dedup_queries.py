"""Deduplication catalog queries (beyond-reference tier) over the
``documents`` table.

The md5-based MinHash/SimHash constructions are engine-independent, so
even the LSH tiers are DuckDB-oracle-checkable; only the MLlib
``MinHashLSH`` wrapper (JVM-internal seeds) falls back to a rows-only
check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators import dedup as D
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table
from orx_surgical_spark.sources.readers import ensure_min_partitions

# Shared DuckDB fragments ----------------------------------------------------

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_DTOKS = f"list_distinct({_TOKS})"
# distinct 3-gram shingles of the token array (guarded for short docs)
_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(toks) - 2, 0) + 1), "
    "i -> array_to_string(toks[i:i+2], ' ')))"
)

_N_HASHES = 8
_BAND_SIZE = 2

_SIG_COLS = ",\n         ".join(
    f"list_min(list_transform(sh, t -> substr(md5('s{i // 4}:' || t), "
    f"{1 + 8 * (i % 4)}, 8))) AS mh{i}"
    for i in range(_N_HASHES)
)

_BAND_ROWS = "\n      UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"md5(mh{b * _BAND_SIZE} || '|' || mh{b * _BAND_SIZE + 1}) AS band_hash FROM s"
    for b in range(_N_HASHES // _BAND_SIZE)
)

_BANDS_CTE = f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, {_SHINGLES} AS sh FROM t
    ), s AS (
      SELECT doc_id,
         {_SIG_COLS}
      FROM sh
    ), bands AS (
      {_BAND_ROWS}
    )
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY content_hash
    """,
    doc="Exact dedup groups: md5 of whitespace/case-normalized text, one "
        "hash aggregate (dedup ladder tier 1).",
    bench=True,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "minhash_bands",
    oracle=_BANDS_CTE + """
    SELECT doc_id, CAST(band_idx AS INTEGER) AS band_idx, band_hash
    FROM bands
    WHERE band_hash IS NOT NULL
    """,
    doc="MinHash signatures (8 md5 min-hashes over 3-gram shingles) "
        "banded into 4 LSH band keys per doc — engine-independent, "
        "oracle-checked construction (dedup ladder tier 3).",
    tags=("dedup", "minhash"),
)
def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_bands(ensure_min_partitions(load_table(spark, sf_dir, "documents")))


@register(
    "minhash_candidates",
    oracle=_BANDS_CTE + """
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
    WHERE a.doc_id < b.doc_id
    """,
    doc="LSH candidate pairs: docs sharing any MinHash band. The join is "
        "on band keys (tiny buckets), never all-pairs — the 100 TB "
        "near-dup path.",
    bench=True,
    tags=("dedup", "minhash"),
)
def minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.lsh_candidate_pairs(ensure_min_partitions(load_table(spark, sf_dir, "documents")))


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, {_SHINGLES} AS sh FROM t
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(
               CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
                    ELSE len(list_intersect(a.sh, b.sh)) * 1.0
                         / len(list_distinct(list_concat(a.sh, b.sh)))
               END, 6) AS jaccard
      FROM s a CROSS JOIN s b
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
    """,
    doc="Exact 3-gram-shingle Jaccard near-dup pairs (all-pairs exact "
        "baseline; at scale, run only on minhash_candidates).",
    tags=("dedup", "jaccard"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return D.ngram_jaccard_pairs(docs, n=3, threshold=0.5)


@register(
    "ngram_jaccard_blocked",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, lang, {_SHINGLES} AS sh FROM t
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND(
               CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
                    ELSE len(list_intersect(a.sh, b.sh)) * 1.0
                         / len(list_distinct(list_concat(a.sh, b.sh)))
               END, 6) AS jaccard
      FROM s a JOIN s b ON a.lang = b.lang
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
    """,
    doc="Exact 3-gram-shingle Jaccard near-dup pairs, lang-blocked AND "
        "prefix-filtered (r6): language blocking alone is quadratic in "
        "block size (the sf1 soak measured the all-pairs-within-lang "
        "shape at 50x its sf0.1 wall), so candidates now come from the "
        "lossless AllPairs/PPJoin prefix filter — an equi-join on "
        "(lang, rare-first prefix shingle) plus a size band; only "
        "candidates pay the exact intersect/union. Output is "
        "byte-identical to the naive spec (the DuckDB oracle), pinned "
        "against the registry-internal quadratic baseline in tests.",
    tags=("dedup", "jaccard"),
)
def ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return D.ngram_jaccard_pairs_prefix(docs, n=3, threshold=0.5, block_col="lang")


def _simhash_oracle() -> str:
    bit_sums = []
    for b in range(16):
        nib = f"(strpos('0123456789abcdef', substr(h, {1 + b // 4}, 1)) - 1)"
        bit = f"(({nib} >> {b % 4}) & 1)"
        bit_sums.append(
            f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{b}"
        )
    packed = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DTOKS}) AS tok FROM documents
    ), h AS (
      SELECT doc_id, md5(tok) AS h FROM tok
    ), bits AS (
      SELECT doc_id,
        {",        ".join(bit_sums)}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({packed} AS INTEGER) AS simhash FROM bits
    """


@register(
    "simhash_docs",
    oracle=_simhash_oracle(),
    doc="16-bit SimHash per document from distinct-token md5 bit votes — "
        "explode -> 16 conditional sums -> repack; same formula on both "
        "engines (dedup ladder, SimHash variant).",
    tags=("dedup", "simhash"),
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash16(ensure_min_partitions(load_table(spark, sf_dir, "documents")))


@register(
    "mllib_minhash_pairs",
    oracle=None,  # MLlib hash seeds are JVM-internal -> rows-only check
    doc="MLlib MinHashLSH near-dup candidate pairs over HashingTF binary "
        "token vectors (Spark-native scale path; rows-only check).",
    tags=("dedup", "minhash", "mllib"),
)
def mllib_minhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.mllib_minhash_pairs(ensure_min_partitions(load_table(spark, sf_dir, "documents")))


@register(
    "lsh_verified_pairs",
    oracle=_BANDS_CTE + f"""
    , cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ), shn AS (
      SELECT doc_id, {_SHINGLES} AS sh
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    )
    SELECT c.id_a, c.id_b,
           ROUND(
             CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) = 0 THEN 0.0
                  ELSE len(list_intersect(x.sh, y.sh)) * 1.0
                       / len(list_distinct(list_concat(x.sh, y.sh)))
             END, 6) AS jaccard
    FROM cand c
    JOIN shn x ON c.id_a = x.doc_id
    JOIN shn y ON c.id_b = y.doc_id
    WHERE CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) = 0 THEN 0.0
               ELSE len(list_intersect(x.sh, y.sh)) * 1.0
                    / len(list_distinct(list_concat(x.sh, y.sh)))
          END >= 0.5
    """,
    doc="The end-to-end near-dup pipeline at scale: MinHash-LSH "
        "candidate pairs verified by exact shingle Jaccard >= 0.5 — "
        "exact verification touches only the LSH candidates, never "
        "all-pairs (the composition the exact baseline ngram_jaccard_"
        "pairs exists to validate).",
    tags=("dedup", "minhash", "jaccard"),
)
def lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    cands = D.lsh_candidate_pairs(docs)
    # jaccard_verify shingles only the candidate-pair endpoints (a
    # semi-join first), so the verify stage is priced by |candidates|,
    # not |corpus| — the oracle's inner joins have the same semantics.
    return (
        D.jaccard_verify(cands, docs)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation (the flagship training-data pipeline)
# ---------------------------------------------------------------------------

_ELIGIBLE_BANDS_CTE = f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, toks FROM (
        SELECT doc_id, {_TOKS} AS toks FROM documents
      ) WHERE len(toks) >= 10
    ), sh AS (
      SELECT doc_id, {_SHINGLES} AS sh FROM t
    ), s AS (
      SELECT doc_id,
         {_SIG_COLS}
      FROM sh
    ), bands AS (
      {_BAND_ROWS}
    )
"""


@register(
    "corpus_curation_summary",
    oracle=_ELIGIBLE_BANDS_CTE + f"""
    , cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ), verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN sh x ON c.id_a = x.doc_id
      JOIN sh y ON c.id_b = y.doc_id
      WHERE CASE WHEN len(list_distinct(list_concat(x.sh, y.sh))) = 0 THEN 0.0
                 ELSE len(list_intersect(x.sh, y.sh)) * 1.0
                      / len(list_distinct(list_concat(x.sh, y.sh)))
            END >= 0.5
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION SELECT id_b, id_a FROM verified
    ), cc(node, label) AS (
      SELECT a, a FROM sym
      UNION
      SELECT s.b, c.label FROM cc c JOIN sym s ON s.a = c.node
      WHERE c.label < s.b
    ), resolved AS (
      SELECT node, MIN(label) AS component FROM cc GROUP BY node
    ), kept AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             CASE WHEN r.component IS NULL OR r.component = d.doc_id
                  THEN 1 ELSE 0 END AS keep
      FROM documents d
      JOIN t ON t.doc_id = d.doc_id
      LEFT JOIN resolved r ON r.node = d.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_eligible,
           CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_dup_dropped,
           CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM kept GROUP BY lang
    """,
    doc="End-to-end corpus curation, the pipeline an LLM-data team runs "
        "before training: token-count eligibility filter -> MinHash-LSH "
        "candidate pairs -> exact-Jaccard verification (>= 0.5, "
        "candidates only) -> connected-components duplicate clustering "
        "(operators.graph) -> keep the min-id canonical doc per cluster "
        "-> per-language kept/dropped summary. Every stage is the "
        "at-scale shape: LSH instead of all-pairs, component labels "
        "instead of pairwise deletes, one aggregate at the end; the "
        "DuckDB oracle replays the identical pipeline (recursive CTE "
        "for the clustering) so the whole composition is hash-checked.",
    bench=True,
    tags=("dedup", "pipeline", "curation"),
)
def corpus_curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.graph import connected_components
    from orx_surgical_spark.operators.text import tokens

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    eligible = docs.where(F.size(tokens("text")) >= 10)
    cands = D.lsh_candidate_pairs(eligible)
    # Verify shingles only candidate-pair endpoints (semi-join inside
    # jaccard_verify): the corpus is shingled once (in the LSH stage),
    # not twice, and only candidate shingle payloads hit the shuffle.
    verified = (
        D.jaccard_verify(cands, eligible)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    comp = connected_components(
        verified.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        # verified pairs are distinct with id_a < id_b by construction
        edges_distinct=True,
    )
    kept = (
        eligible.join(comp, eligible["doc_id"] == comp["node"], "left")
        .select(
            "lang",
            "n_chars",
            F.when(
                F.col("component").isNull()
                | (F.col("component") == F.col("doc_id")),
                1,
            )
            .otherwise(0)
            .alias("keep"),
        )
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_eligible"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("keep")).cast("bigint").alias("n_dup_dropped"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("kept_chars"),
    )


@register(
    "paragraph_dedup_docs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, CAST(u.i AS INT) AS seg_idx,
             array_to_string(toks[u.i*20+1:u.i*20+20], ' ') AS seg
      FROM t, unnest(range(CAST(ceil(len(toks)/20.0) AS BIGINT))) AS u(i)
    ), k AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (
               PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn
      FROM s
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_segs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INTEGER)
               AS n_kept,
           CAST(length(coalesce(
               string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                          ORDER BY seg_idx), '')) AS INTEGER)
               AS cleaned_len,
           md5(coalesce(
               string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                          ORDER BY seg_idx), '')) AS cleaned_md5
    FROM k GROUP BY doc_id
    """,
    doc="Paragraph-level (sub-document) dedup, Dolma/FineWeb-style: "
        "20-token segments, first global occurrence wins (ordered by "
        "doc_id, seg_idx), documents reassembled from surviving "
        "segments. One shuffle on the segment hash + one per-doc "
        "re-aggregation; reassembled text pinned by md5.",
    tags=("dedup", "text"),
)
def paragraph_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.paragraph_dedup(docs, seg_tokens=20)


_NORM_HASH = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


@register(
    "incremental_dedup_decisions",
    oracle=f"""
    WITH idx AS (
      SELECT DISTINCT {_NORM_HASH} AS content_hash
      FROM documents WHERE doc_id % 2 = 0
    ), inc AS (
      SELECT doc_id, {_NORM_HASH} AS content_hash
      FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + 10000000, {_NORM_HASH}
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 20000000, {_NORM_HASH}
      FROM documents WHERE doc_id % 2 = 1 AND doc_id % 25 = 0
    ), r AS (
      SELECT i.doc_id, i.content_hash,
             (x.content_hash IS NOT NULL) AS in_idx,
             row_number() OVER (
               PARTITION BY i.content_hash ORDER BY i.doc_id) AS rn
      FROM inc i LEFT JOIN idx x USING (content_hash)
    )
    SELECT doc_id, content_hash,
           CASE WHEN in_idx THEN 'dup_index'
                WHEN rn > 1 THEN 'dup_batch'
                ELSE 'new' END AS decision
    FROM r
    """,
    doc="Ingest-time dedup of a new shard against a frozen corpus "
        "index (even doc_ids play the historical index, odd ones the "
        "incoming shard): per-doc dup_index / dup_batch / new decision "
        "via one LEFT join on the content hash + a min-id window — the "
        "continuously-fed pipeline mode where the accepted corpus "
        "exists only as a compact hash index, never re-read. The "
        "incoming shard is enriched with deterministic re-ingestions "
        "(copies of doc_id%10=0 index docs under new ids -> dup_index; "
        "second copies of doc_id%25=0 odd docs -> dup_batch), so all "
        "three decision branches fire at every SF — the synthetic "
        "corpus has no natural cross-doc duplicates at sf<=0.01.",
    tags=("dedup", "incremental"),
)
def incremental_dedup_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.text import normalized_text

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    index = docs.where(did % 2 == 0).select(
        F.md5(normalized_text("text")).alias("content_hash")
    )
    odd = docs.where(did % 2 == 1)
    incoming = (
        odd.select("doc_id", "text")
        .unionByName(
            docs.where(did % 10 == 0).select(
                (did + 10000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            odd.where(did % 25 == 0).select(
                (did + 20000000).alias("doc_id"), "text"
            )
        )
    )
    return D.incremental_dedup(incoming, index)


_ESK = 20  # exact-substring window length (tokens)
_ESS_FAST_STRIDE = 4  # declared throughput variant's window-start stride


def _ess_oracle(stride: int) -> str:
    """DuckDB oracle for exact_substring_coverage at a given window
    stride — identical interval-merge arithmetic; only the window-start
    generator steps by ``stride`` (matching F.sequence(0, n-k, stride)
    on the Spark side)."""
    return f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id, CAST(u.i AS INT) AS p,
             md5(array_to_string(toks[u.i+1:u.i+{_ESK}], ' ')) AS gh
      FROM t, unnest(range(0, CAST(greatest(len(toks) - {_ESK} + 1, 0)
                           AS BIGINT), {stride})) AS u(i)
    ), d AS (
      SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
    ), h AS (
      SELECT g.doc_id, g.p FROM g JOIN d USING (gh)
    ), s AS (
      SELECT doc_id, p,
             lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS lp
      FROM h
    ), a AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN lp IS NULL THEN {_ESK}
                           ELSE least({_ESK}, p - lp) END) AS INTEGER)
                 AS ndup,
             CAST(SUM(CASE WHEN lp IS NULL OR p - lp > {_ESK}
                           THEN 1 ELSE 0 END) AS INTEGER) AS nspans
      FROM s GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(COALESCE(a.ndup, 0) AS INTEGER) AS n_dup_tokens,
           ROUND(COALESCE(a.ndup, 0) * 1.0 / len(toks), 6) AS dup_ratio,
           CAST(COALESCE(a.nspans, 0) AS INTEGER) AS n_dup_spans
    FROM t LEFT JOIN a USING (doc_id)
    """


@register(
    "exact_substring_coverage",
    oracle=_ess_oracle(1),
    doc="Exact-substring cross-document dedup (the Lee-et-al "
        "suffix-array tier, built the Spark way): per document, the "
        "token positions covered by a stride-1 20-token window that "
        "occurs verbatim in >= 2 distinct documents — catches shared "
        "substrings at ARBITRARY offsets, unlike 20-token-aligned "
        "paragraph segments. Narrow (id, start, md5) window stream, "
        "one gram-hash aggregate, one left-semi join, one per-doc "
        "interval-merge window; no suffix array, no all-pairs.",
    tags=("dedup", "text"),
)
def exact_substring_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return D.exact_substring_coverage(docs, k=_ESK)


@register(
    "exact_substring_coverage_fast",
    oracle=_ess_oracle(_ESS_FAST_STRIDE),
    doc="Declared throughput variant of exact_substring_coverage "
        f"(r12, VERDICT r11 item 7): window starts sampled at stride "
        f"{_ESS_FAST_STRIDE}, cutting the gram stream / aggregate / "
        "semi-join ~4-fold — the 100 TB knob for the exact tier's "
        "intrinsic ~1-row-per-corpus-token cost (2155 s of the sf10 "
        "soak at stride 1). Semantics are honest lower bounds: sampled "
        "hits are a subset of the stride-1 hit set (every reported "
        "count/ratio underestimates, never overestimates), detection "
        "guaranteed only for occurrences offset-aligned mod 4 spanning "
        ">= k+3 tokens (tests/test_pii_paragraph.py pins both). The "
        "knob itself is oracle-checked here: DuckDB replays the SAME "
        "strided window generator, so a drifting stride or off-by-one "
        "in the sampled starts breaks the panel hash.",
    tags=("dedup", "text"),
)
def exact_substring_coverage_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    return D.exact_substring_coverage(docs, k=_ESK, stride=_ESS_FAST_STRIDE)
