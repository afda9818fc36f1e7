"""Multimodal catalog queries (beyond-reference tier) over the
synthetic media table (documents -> binary payload + typed metadata).

Metadata-plane queries (pure JVM expressions over the deterministic
construction) are DuckDB-oracle-checked; the decoded-pixel tiers go
through the fake codec inside ``mapInPandas`` and are rows-only.
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
             CAST(16 + ((CAST(doc_id / 16 AS INTEGER)) % 16) * 8 AS INTEGER) AS height,
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


@register(
    "media_decode_stats",
    oracle=None,  # fake-codec pixel plane -> rows-only check
    doc="Decode each payload (deterministic fake codec behind the real "
        "mapInPandas plumbing) and emit raster stats per item.",
    tags=("multimodal", "decode"),
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = ensure_min_partitions(_media(spark, sf_dir))
    return MM.decode_stats(m)


@register(
    "media_byte_features",
    oracle=None,  # array<float> embedding payload -> rows-only check
    doc="16-bin normalized byte-histogram embedding per payload "
        "(mapInPandas, Arrow-batched) — multimodal features ready for "
        "the similarity tier; returns (doc_id, dim, l1_norm).",
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
    oracle=None,  # resized payload bytes -> rows-only check
    doc="Block-average resize to 8x8 through the stubbed decode; "
        "payload and metadata rewritten in one mapInPandas pass; "
        "returns (doc_id, media_type, new dims, payload bytes).",
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
