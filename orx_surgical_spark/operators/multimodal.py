"""Multimodal columns (beyond-reference tier): image/audio/video as
opaque ``BinaryType`` payloads + a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` stages.

The real media codecs (PIL/ffmpeg/torchaudio) are not in this
container, so the *decode* step is a deterministic fake — payload bytes
reinterpreted as a (height, width) uint8 raster — clearly marked below;
everything Spark-side (schema, partitioning, UDF signatures, Arrow
batch shapes, the feature/resize/sample math) is real.  Swapping the
fake for a codec changes one function body, not the plan.

At 100 TB the payload column dominates IO: keep media in its own
parquet (or object-store refs) partitioned by ``media_type``, prune
columns so metadata-only queries never read payload bytes (Catalyst
drops the column at the scan), and size ``maxPartitionBytes`` so one
task holds a few hundred payloads, not one giant row group.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_TYPES = ("image", "audio", "video")


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table derived from ``documents``:
    payload = utf-8 bytes of the text, media_type/dimensions derived
    from ``doc_id`` arithmetic.  Pure JVM expressions (reproducible in
    any engine — the DuckDB oracles build the same table)."""
    width = (F.lit(16) + (F.col("doc_id") % 16) * 8).cast("int")
    height = (F.lit(16) + ((F.col("doc_id") / 16).cast("int") % 16) * 8).cast("int")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("metadata"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODE (deterministic fake): reinterpret payload bytes as a
    (height, width) uint8 raster, truncating or zero-padding.  A real
    build replaces this body with e.g. ``PIL.Image.open(BytesIO(...))``
    — same signature, same downstream math."""
    buf = np.frombuffer(payload or b"", dtype=np.uint8)
    need = width * height
    if len(buf) < need:
        buf = np.pad(buf, (0, need - len(buf)))
    return buf[:need].reshape(height, width)


def decode_stats(df: DataFrame) -> DataFrame:
    """Decode each payload (fake codec) and emit per-item raster stats.
    ``mapInPandas``: one Arrow batch in, one out — the decode loop runs
    per batch, never per row round-trip."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("sum_px", T.LongType()),
            T.StructField("sumsq_px", T.LongType()),
            T.StructField("mean_px", T.DoubleType()),
            T.StructField("std_px", T.DoubleType()),
            T.StructField("max_px", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rasters = [
                _fake_decode(p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["metadata"])
            ]
            # sum/sumsq are EXACT integers (cross-engine hashable with
            # no float-rounding ties — raster means are dyadic rationals
            # whose decimal expansions can land exactly on a rounding
            # boundary); mean/std stay for human consumption.
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sum_px": [int(r.sum(dtype=np.int64)) for r in rasters],
                    "sumsq_px": [
                        int((r.astype(np.int64) ** 2).sum()) for r in rasters
                    ],
                    "mean_px": [float(r.mean()) for r in rasters],
                    "std_px": [float(r.std()) for r in rasters],
                    "max_px": [int(r.max()) for r in rasters],
                }
            )

    return df.mapInPandas(run, schema)


def byte_histogram_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction: normalized ``n_bins``-bin byte histogram of
    each payload as an ``array<float>`` embedding column — the
    multimodal analogue of text fingerprints, ready for the similarity
    tier (cosine_topk / LSH) downstream."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, n_bins + 1)
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                buf = np.frombuffer(p or b"", dtype=np.uint8)
                hist, _ = np.histogram(buf, bins=edges)
                total = max(len(buf), 1)
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})

    return df.mapInPandas(run, schema)


def resize_media(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize: decode (fake), block-average down to (out_h, out_w),
    re-emit payload + updated metadata.  The averaging math is the real
    thing; only the decode is the stub."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("metadata", MEDIA_METADATA_TYPE),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["metadata"]):
                r = _fake_decode(p, m["width"], m["height"]).astype(np.float64)
                h, w = r.shape
                ry = np.linspace(0, h, out_h + 1).astype(int)
                rx = np.linspace(0, w, out_w + 1).astype(int)
                small = np.empty((out_h, out_w), dtype=np.uint8)
                for i in range(out_h):
                    for j in range(out_w):
                        block = r[ry[i]:max(ry[i + 1], ry[i] + 1),
                                  rx[j]:max(rx[j + 1], rx[j] + 1)]
                        small[i, j] = int(block.mean())
                payloads.append(small.tobytes())
                metas.append(
                    {
                        "width": out_w,
                        "height": out_h,
                        "n_frames": m["n_frames"],
                        "sample_rate": m["sample_rate"],
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": payloads,
                    "media_type": pdf["media_type"].values,
                    "metadata": metas,
                }
            )

    return df.mapInPandas(run, schema)


def frame_sample_indices(df: DataFrame, stride: int = 5) -> DataFrame:
    """Frame sampling plan: every ``stride``-th frame index per video —
    pure JVM ``sequence``/``explode`` (the sampling *schedule* needs no
    Python; only actual frame decode would)."""
    frames = F.sequence(
        F.lit(0), F.col("metadata.n_frames") - 1, F.lit(stride)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select("doc_id", F.explode(frames).alias("frame_idx"))
    )
