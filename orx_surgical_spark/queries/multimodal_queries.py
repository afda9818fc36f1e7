"""Multimodal catalog queries (beyond-reference tier) over the
synthetic media table (documents -> binary payload + typed metadata).

All queries here are DuckDB-oracle-checked (since r5): the
metadata-plane ones are pure JVM expressions over the deterministic
construction, and the decoded-pixel tiers (media_decode_stats /
media_byte_features / media_resize) run the deterministic fake codec
inside ``mapInPandas`` whose byte math the oracle replays via
hex-nibble extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.operators import multimodal as MM
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table
from orx_surgical_spark.sources.readers import ensure_min_partitions

# DuckDB side of multimodal.attach_fake_media's metadata derivation.
_MEDIA_CTE = """
    WITH media AS (
      SELECT doc_id,
             encode(text) AS payload,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             CAST(16 + (doc_id % 16) * 8 AS INTEGER) AS width,
             -- // (floor div): CAST(x/16 AS INTEGER) would ROUND
             -- half-to-even where Spark's double->int cast truncates;
             -- caught by the byte-level media_decode_stats oracle (r5)
             CAST(16 + ((doc_id // 16) % 16) * 8 AS INTEGER) AS height,
             CAST(doc_id % 30 + 1 AS INTEGER) AS n_frames
      FROM documents
    )
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.attach_fake_media(load_table(spark, sf_dir, "documents"))


@register(
    "media_metadata_summary",
    oracle=_MEDIA_CTE + """
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
           CAST(MAX(width) AS INTEGER) AS max_width,
           CAST(MAX(height) AS INTEGER) AS max_height,
           ROUND(AVG(n_frames), 6) AS avg_frames
    FROM media GROUP BY media_type
    """,
    doc="Metadata-plane rollup of the media table: per media_type count, "
        "payload bytes, max dimensions. Catalyst prunes the payload "
        "column out of a metadata-only variant; here payload length "
        "forces the binary read (both sides identical construction).",
    tags=("multimodal",),
)
def media_metadata_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("metadata.width").alias("max_width"),
        F.max("metadata.height").alias("max_height"),
        F.round(F.avg("metadata.n_frames"), 6).alias("avg_frames"),
    )


@register(
    "frame_sample_plan",
    oracle=_MEDIA_CTE + """
    SELECT doc_id, CAST(unnest(range(0, n_frames, 5)) AS INTEGER) AS frame_idx
    FROM media WHERE media_type = 'video'
    """,
    doc="Video frame-sampling schedule: every 5th frame index per video "
        "via sequence/explode — the sampling plan is pure JVM; only "
        "frame decode would need the (stubbed) codec.",
    tags=("multimodal", "video"),
)
def frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.frame_sample_indices(_media(spark, sf_dir), stride=5)


# Byte value at hex-string position i (1-based), DuckDB hex() is
# uppercase: two nibble lookups.
_NIB = "strpos('0123456789ABCDEF', substr({h}, {i}, 1)) - 1"


@register(
    "media_decode_stats",
    oracle=_MEDIA_CTE + f"""
    , b AS (
      SELECT doc_id, octet_length(payload) AS len,
             width * height AS need, hex(payload) AS h
      FROM media
    ), bytes AS (
      SELECT doc_id, need, len,
             ({_NIB.format(h='h', i='2 * i - 1')}) * 16
               + ({_NIB.format(h='h', i='2 * i')}) AS v
      FROM b, UNNEST(range(1, least(len, need) + 1)) AS t(i)
    )
    SELECT b.doc_id,
           CAST(b.len AS INTEGER) AS n_bytes,
           CAST(COALESCE(SUM(y.v), 0) AS BIGINT) AS sum_px,
           CAST(COALESCE(SUM(y.v * y.v), 0) AS BIGINT) AS sumsq_px,
           CAST(COALESCE(MAX(y.v), 0) AS INTEGER) AS max_px
    FROM b LEFT JOIN bytes y USING (doc_id)
    GROUP BY b.doc_id, b.len
    """,
    doc="Decode each payload (deterministic fake codec behind the real "
        "mapInPandas plumbing) and emit raster stats per item. The fake "
        "decode is pure byte math (payload zero-padded/truncated to "
        "width*height), so DuckDB replays it exactly via hex-nibble "
        "byte extraction — the pixel plane is hash-checked (r5; "
        "previously rows-only). The driver surface carries the EXACT "
        "integer pixel sums (zero-padding contributes 0, truncation "
        "caps at width*height bytes): raster means are dyadic "
        "rationals that can land exactly on a decimal rounding "
        "boundary, where Spark's BigDecimal HALF_UP and a "
        "double-scaled round disagree — integers cannot. The float "
        "mean/std stay on the operator output for consumers.",
    tags=("multimodal", "decode"),
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = ensure_min_partitions(_media(spark, sf_dir))
    return MM.decode_stats(m).select(
        "doc_id", "n_bytes", "sum_px", "sumsq_px", "max_px"
    )


@register(
    "media_byte_features",
    oracle=_MEDIA_CTE + """
    SELECT doc_id,
           CAST(16 AS INTEGER) AS dim,
           CAST(CASE WHEN octet_length(payload) > 0 THEN 1.0 ELSE 0.0 END
                AS DOUBLE) AS l1_norm
    FROM media
    """,
    doc="16-bin normalized byte-histogram embedding per payload "
        "(mapInPandas, Arrow-batched) — multimodal features ready for "
        "the similarity tier; returns (doc_id, dim, l1_norm). The "
        "surfaced invariants are exact (dim = n_bins; a normalized "
        "histogram's L1 norm is 1 for non-empty payloads, 0 for empty — "
        "float32 bin rounding stays ~1e-7, far under the 4dp round), so "
        "they oracle-check (r5); per-bin values are pinned by "
        "tests/test_multimodal.py.",
    tags=("multimodal", "features"),
)
def media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = ensure_min_partitions(_media(spark, sf_dir))
    feats = MM.byte_histogram_features(m)
    return feats.select(
        "doc_id",
        F.size("features").alias("dim"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4)
        .alias("l1_norm"),
    )


@register(
    "media_resize",
    oracle=_MEDIA_CTE + """
    SELECT doc_id, media_type,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(64 AS INTEGER) AS n_bytes
    FROM media
    """,
    doc="Block-average resize to 8x8 through the stubbed decode; "
        "payload and metadata rewritten in one mapInPandas pass; "
        "returns (doc_id, media_type, new dims, payload bytes). The "
        "surfaced contract (8x8 metadata, 64-byte payload for every "
        "item) is exact, so it oracle-checks (r5); the block-average "
        "pixel values are pinned by tests/test_multimodal.py.",
    tags=("multimodal", "resize"),
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = ensure_min_partitions(_media(spark, sf_dir))
    out = MM.resize_media(m, 8, 8)
    return out.select(
        "doc_id", "media_type",
        F.col("metadata.width").alias("width"),
        F.col("metadata.height").alias("height"),
        F.length("payload").alias("n_bytes"),
    )
