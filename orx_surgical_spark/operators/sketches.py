"""Mergeable frequency sketches (beyond-reference tier).

Completes the sketch family alongside the HLL distinct-count shard
union (`queries/relational_queries.py:hll_shard_union`) and the KLL
rank bands (`sketch_aggregates`): a Misra–Gries heavy-hitters summary
— the deterministic, mergeable answer to "which keys are hot?" when
the key stream is too large for an exact count (hot-join-key
detection at 100 TB, stopword/vocab trimming over a token stream).

Shape at scale: one pass over the keys with ``mapInPandas`` (the MG
eviction loop has no Catalyst-expression equivalent; Arrow batches
keep it off the per-row pickling path). Each partition emits AT MOST
``k`` counter rows plus one slack row, so the merge stage aggregates
``<= (k+1) * n_partitions`` rows — the reduction the sketch exists
for. Merging is counter addition (Agarwal et al. 2012, "Mergeable
summaries"): per-partition guarantees sum, so the global bound holds
for ANY partitioning of the input.

Guarantee (the gate `heavy_hitters_mg` asserts it): for every key,
``0 <= exact_count - est <= total_slack`` where ``est`` is the summed
counter (0 if absent) and ``total_slack`` the summed per-partition
eviction debt. Both inequalities are partitioning-invariant, so the
gate booleans are deterministic even though the sketch contents are
not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_heavy_hitters(df: DataFrame, key_col: str, k: int = 8) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``df[key_col]``.

    Returns ``[key_col string, est long, slack long]``: up to ``k``
    counter rows per partition (``slack = 0``) plus one NULL-key row
    per partition carrying its accumulated eviction debt. Callers sum
    ``est`` per key and ``slack`` globally; see the module docstring
    for the resulting error bound.

    The prune step is the weighted-update form of MG: after folding a
    batch's value_counts into the counter dict, subtract the
    (k+1)-th largest counter value ``d`` from every counter and drop
    the non-positives — at most ``k`` survive, every key's estimate
    fell by at most ``d``, and no estimate ever exceeds the key's true
    occurrence count (counters only ever add true occurrences and
    subtract). ``slack += d`` therefore upper-bounds the undercount.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        slack = 0
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                d = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: v - d for key, v in counters.items() if v - d > 0
                }
                slack += d
        yield pd.DataFrame(
            {
                key_col: list(counters) + [None],
                "est": list(counters.values()) + [0],
                "slack": [0] * len(counters) + [slack],
            }
        )

    return df.mapInPandas(run, schema=f"{key_col} string, est long, slack long")


# ---------------------------------------------------------------------------
# Count-min sketch — engine-exact, mergeable, all-JVM.
# ---------------------------------------------------------------------------
#
# Unlike the MG summary above (whose counter CONTENTS are partitioning
# dependent, hence gate-checked), a count-min sketch is a pure function
# of the multiset of keys once the hash family is pinned: cell (j, b)
# holds |{x : h_j(x) = b}| occurrences. With md5-derived row hashes the
# sketch — and every estimate read from it — is bit-identical in any
# engine, so CMS queries are FULL value-hash oracle material.
#
# Mergeability is cell-wise addition: sketch(A ∪ B) = sketch(A) +
# sketch(B) for any split of the stream — the property that lets 1000
# executors (or 1000 daily shards) each sketch locally and a
# coordinator add d×w-cell grids. Estimates are biased UP only:
# est(x) = min_j cell(j, h_j(x)) >= true(x) always, and the classic
# bound est <= true + eps*N holds per row with prob 1 - (1/2)^d for
# w = 2/eps (Cormode & Muthukrishnan 2005).
#
# Scale shape: build is one projection (explode ×depth) into ONE hash
# aggregate whose map-side combine caps each task's shuffle output at
# depth*width rows — the whole sketch crossing the wire is d*w rows
# regardless of input size. Estimation broadcasts the (tiny) sketch
# into a join against the probe keys.

def _cms_bucket(key: Column, j: Column, width: int) -> Column:
    """Row-``j`` bucket of ``key``: first 16 bits of
    ``md5('cms<j>:<key>')`` mod ``width`` — the engine-independent hash
    family (same value from DuckDB's md5; see encoders.hash_fraction
    for the idiom precedent)."""
    salted = F.concat(
        F.lit("cms"), j.cast("string"), F.lit(":"), key.cast("string")
    )
    h16 = F.conv(F.substring(F.md5(salted.cast("binary")), 1, 4), 16, 10)
    return (h16.cast("int") % F.lit(width)).alias("bucket")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    shard_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``df[key_col]`` occurrences:
    ``[shard?, j int, bucket int, cnt long]`` with at most
    ``depth * width`` rows (per shard). Pass ``shard_col`` to build
    per-shard sketches for a later :func:`cms_merge` — the
    shard-then-merge result is cell-identical to the direct build.
    """
    cols = [F.col(shard_col).alias("shard")] if shard_col else []
    rows = df.select(
        *cols,
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    )
    return rows.groupBy(
        *(["shard"] if shard_col else []),
        "j",
        _cms_bucket(F.col("__k"), F.col("j"), width),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge per-shard sketches by cell-wise addition (drops the shard
    column): the mergeable-summaries contract."""
    return sketches.groupBy("j", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    est_col: str = "est",
) -> DataFrame:
    """Point-frequency estimates for each probe key:
    ``est = min_j cell(j, h_j(key))``, 0 for never-seen keys. The
    sketch side is at most ``depth * width`` rows — broadcast it so
    probing never shuffles the probe table."""
    from pyspark.sql.functions import broadcast

    p = probes.select(F.col(key_col)).distinct()
    pe = p.select(
        key_col,
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    )
    pe = pe.select(
        key_col, "j", _cms_bucket(F.col(key_col), F.col("j"), width)
    )
    joined = pe.join(broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col)
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) bottom-k sketch — mergeable distinct
# estimation + deterministic uniform sampling in one structure.
# ---------------------------------------------------------------------------
#
# The bottom-k rows of a group by md5-hex order are simultaneously
# (a) a uniform random sample of the group's DISTINCT keys (md5 is the
# shared "random" order — reproducible under any partitioning), and
# (b) a distinct-cardinality sketch: with U(k) the kth smallest hash
# as a fraction of hash space, E[distinct] ~ (k-1)/U(k) (Bar-Yossef
# et al. 2002). Both read-outs are pure functions of the key SET, so
# — unlike the HLL shard union, whose register contents only an error
# band can check — KMV queries value-hash exactly in any md5 engine.
#
# Merge rule: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) —
# if a hash is among the k smallest of the union it is among the k
# smallest of whichever side contains it. Shards ship k rows each.
#
# Scale shape: one distinct-shuffle on (group, key), then a bottom-k
# per group via row_number — Spark >= 3.5 plans a rank <= k filter as
# WindowGroupLimit, so every map task pre-trims to k rows per group
# before the shuffle (tests/test_scale_shapes.py pins the node).

# 16^12 = 2^48: hash space of the 12-hex-digit prefix used for the
# cardinality read-out (exact integers well under 2^53 both engines).
KMV_HASH_SPACE = 16**12


def kmv_bottomk(
    df: DataFrame, group_col: str, key_col: str, k: int = 16
) -> DataFrame:
    """Bottom-``k`` distinct keys per group by md5-hex order:
    ``[group, key, h (md5 hex), rn (1-based hash rank)]``."""
    from pyspark.sql import Window

    d = df.select(
        F.col(group_col).alias("grp"), F.col(key_col).alias("key")
    ).distinct()
    h = d.withColumn(
        "h", F.md5(F.col("key").cast("string").cast("binary"))
    )
    w = Window.partitionBy("grp").orderBy("h", "key")
    return h.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )


def kmv_estimate(bottomk: DataFrame, k: int = 16) -> DataFrame:
    """Distinct-count read-out per group from a bottom-k table:
    exact when the group holds fewer than ``k`` distinct keys (the
    sketch IS the key set), else ``(k-1) * 2^48 / h48(kth)`` rounded
    to 4 dp — every step integer-exact or shared-IEEE across engines.
    """
    agg = bottomk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_in_sketch"),
        F.max("h").alias("hk"),
    )
    h48 = F.conv(F.substring("hk", 1, 12), 16, 10).cast("bigint")
    est = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
    ).otherwise(
        F.round(F.lit((k - 1) * KMV_HASH_SPACE) / h48, 4)
    )
    return agg.select("grp", est.alias("kmv_est"))


# ---------------------------------------------------------------------------
# Mergeable Bloom filter — engine-exact membership sketch.
# ---------------------------------------------------------------------------
#
# Completes the sketch family: distinct (HLL gate / KMV exact),
# frequency (CMS exact / MG gate), and now membership. Same md5 hash
# family as CMS, so the filter CONTENTS are a pure function of the key
# set — full value-hash oracle material. Guarantees pinned by the
# catalog query: no false negatives (a theorem — every inserted key's
# bits are set), and merge-by-OR equals the direct build (bit-wise OR
# is the Bloom merge rule; Broder & Mitzenmacher 2004).
#
# Representation: BLOOM_BITS bits as BLOOM_WORDS x 32-bit words, each
# carried in a BIGINT column (w0..w7) — 32 bits per word keeps every
# set-bit value (2^31 max) positive and shift-free in both engines
# (cross-engine contribution = CAST(POW(2, bit) AS BIGINT), exact for
# bit <= 31). Scale shape: build is one conditional-bit_or aggregate
# whose map-side combine emits ONE row per task; the finished sketch
# is a single 8-column row, broadcast for probing.

BLOOM_BITS = 256
BLOOM_WORDS = BLOOM_BITS // 32
BLOOM_HASHES = 3


def _bloom_word_bit(key: Column, j: Column) -> tuple[Column, Column]:
    """(word, bit) of hash-``j`` for ``key``: first 16 bits of
    ``md5('bf<j>:<key>')`` mod BLOOM_BITS, split into a 32-bit word
    index and bit offset."""
    salted = F.concat(
        F.lit("bf"), j.cast("string"), F.lit(":"), key.cast("string")
    )
    h16 = F.conv(F.substring(F.md5(salted.cast("binary")), 1, 4), 16, 10)
    pos = h16.cast("int") % F.lit(BLOOM_BITS)
    return (pos / F.lit(32)).cast("int"), pos % F.lit(32)


def _word_aggs() -> list[Column]:
    word, bit = F.col("__word"), F.col("__bit")
    contrib = F.pow(F.lit(2.0), bit).cast("bigint")
    return [
        F.bit_or(
            F.when(word == i, contrib).otherwise(F.lit(0).cast("bigint"))
        ).alias(f"w{i}")
        for i in range(BLOOM_WORDS)
    ]


def bloom_build(
    df: DataFrame, key_col: str, shard_col: str | None = None
) -> DataFrame:
    """Build a 256-bit / 3-hash Bloom filter of ``df[key_col]``: ONE
    row (per shard) with word columns ``w0..w7``. Pass ``shard_col``
    for per-shard filters that :func:`bloom_merge` ORs together —
    bit-identical to the direct build."""
    cols = [F.col(shard_col).alias("shard")] if shard_col else []
    rows = df.select(
        *cols,
        F.col(key_col).cast("string").alias("__k"),
        F.explode(
            F.array(*[F.lit(j) for j in range(BLOOM_HASHES)])
        ).alias("__j"),
    )
    word, bit = _bloom_word_bit(F.col("__k"), F.col("__j"))
    grid = rows.select(*([F.col("shard")] if shard_col else []),
                       word.alias("__word"), bit.alias("__bit"))
    if shard_col:
        return grid.groupBy("shard").agg(*_word_aggs())
    return grid.agg(*_word_aggs())


def bloom_merge(sketches: DataFrame) -> DataFrame:
    """OR per-shard filters into one: the Bloom merge rule (drops the
    shard column)."""
    return sketches.agg(
        *[F.bit_or(f"w{i}").alias(f"w{i}") for i in range(BLOOM_WORDS)]
    )


def bloom_probe(
    sketch: DataFrame, probes: DataFrame, key_col: str,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """Membership test per probe key: true iff ALL hash bits are set.
    The sketch is one row — broadcast into a nested-loop join with a
    bounded (1-row) build side, then a per-probe conjunction over the
    BLOOM_HASHES bit tests."""
    from pyspark.sql.functions import broadcast

    p = probes.select(F.col(key_col)).distinct()
    joined = p.crossJoin(broadcast(sketch))
    # bit_or over an EMPTY build yields NULL words — an empty filter
    # must reject (0 bits set), not return NULL verdicts.
    words = F.array(
        *[
            F.coalesce(F.col(f"w{i}"), F.lit(0).cast("bigint"))
            for i in range(BLOOM_WORDS)
        ]
    )
    tests = []
    for j in range(BLOOM_HASHES):
        word, bit = _bloom_word_bit(F.col(key_col), F.lit(j))
        mask = F.pow(F.lit(2.0), bit).cast("bigint")
        tests.append(
            F.element_at(words, word + 1).bitwiseAND(mask) != F.lit(0)
        )
    hit = tests[0]
    for t in tests[1:]:
        hit = hit & t
    return joined.select(key_col, hit.alias(hit_col))
