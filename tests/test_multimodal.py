"""Multimodal tier invariants the oracle can't express: decoded raster
shape, feature normalization, resize payload size, determinism of the
fake codec."""

import numpy as np
from pyspark.sql import functions as F

from orx_surgical_spark.operators import multimodal as MM
from orx_surgical_spark.sources import load_table


def _media(spark, sf_dir):
    return MM.attach_fake_media(load_table(spark, sf_dir, "documents"))


def test_fake_decode_shape_and_padding():
    r = MM._fake_decode(b"abc", width=4, height=2)
    assert r.shape == (2, 4)
    assert r.dtype == np.uint8
    assert list(r.flatten()) == [97, 98, 99, 0, 0, 0, 0, 0]  # zero-padded


def test_byte_histogram_is_normalized(spark, sf_dir):
    m = _media(spark, sf_dir)
    feats = MM.byte_histogram_features(m, n_bins=16)
    checked = feats.select(
        F.size("features").alias("dim"),
        F.aggregate("features", F.lit(0.0), lambda a, x: a + x).alias("s"),
    )
    row = checked.agg(
        F.min("dim"), F.max("dim"), F.min("s"), F.max("s")
    ).collect()[0]
    assert row[0] == row[1] == 16
    assert 0.999 < row[2] and row[3] < 1.001  # histogram over all bytes sums to 1


def test_resize_rewrites_payload_and_metadata(spark, sf_dir):
    m = _media(spark, sf_dir)
    out = MM.resize_media(m, 8, 8)
    row = out.select(
        F.min(F.length("payload")), F.max(F.length("payload")),
        F.min("metadata.width"), F.max("metadata.height"),
    ).collect()[0]
    assert row[0] == row[1] == 64  # 8x8 uint8
    assert row[2] == 8 and row[3] == 8


def test_decode_stats_deterministic(spark, sf_dir):
    m = _media(spark, sf_dir)
    a = {r["doc_id"]: r["mean_px"] for r in MM.decode_stats(m).collect()}
    b = {
        r["doc_id"]: r["mean_px"]
        for r in MM.decode_stats(m.repartition(5)).collect()
    }
    assert a == b


def test_media_schema_typed(spark, sf_dir):
    m = _media(spark, sf_dir)
    dt = dict(m.dtypes)
    assert dt["payload"] == "binary"
    assert dt["metadata"].startswith("struct<width:int,height:int")
