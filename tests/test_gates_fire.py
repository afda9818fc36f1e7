"""Negative tests for the r6 hash-gate machinery: a gate that can never
fail is decoration, not a gate. Each test forces the failure condition
and asserts the boolean actually flips — the same flip that would break
the driver's panel value-hash."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def test_ann_recall_gate_fires_on_unreachable_floor(spark, sf_dir):
    """With an impossible floor the recall gate must report
    meets_floor = false (and would therefore hash-mismatch the oracle's
    TRUE)."""
    from orx_surgical_spark.queries.gate_queries import _ann_recall_fn

    row = _ann_recall_fn("ann_lsh_topk", "rp_lsh", 1.01)(spark, sf_dir).collect()[0]
    assert row["meets_floor"] is False
    assert row["n_queries"] == 10


def test_sample_split_band_fires_on_impossible_band(spark, sf_dir):
    """Shrink the band to the empty interval around an impossible
    fraction: every label row must flag out-of-band."""
    import orx_surgical_spark.queries.gate_queries as G

    raw = G.REGISTRY["seeded_sample_split"].fn(spark, sf_dir)
    agg = raw.groupBy("label").agg(
        F.sum("n").alias("n_total"),
        F.sum(F.when(F.col("split") == "train", F.col("n")).otherwise(0)).alias(
            "n_train"
        ),
    )
    frac = F.col("n_train") / F.col("n_total")
    rows = agg.select(
        ((frac >= 0.999) & (frac <= 1.0)).alias("in_band")
    ).collect()
    assert rows and all(r["in_band"] is False for r in rows)


def test_golden_wrapper_fires_on_tampered_golden(spark, sf_dir, tmp_path, monkeypatch):
    """Tamper one frozen score and the wrapper's drift_ok must flip for
    exactly that row — the engine-vs-frozen-self check is live, not a
    constant TRUE."""
    import orx_surgical_spark.queries.golden_queries as G

    src = G.golden_path("lasso_scores")
    pdf = pq.read_table(src).to_pandas()
    pdf.loc[pdf.index[0], "score"] = pdf.loc[pdf.index[0], "score"] + 0.5
    tampered_id = pdf.loc[pdf.index[0], "event_id"]
    tampered_n_events = pdf.loc[pdf.index[0], "n_events"]
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "lasso_scores.parquet"),
    )
    monkeypatch.setattr(G, "GOLDEN_DIR", str(tmp_path))

    # Probe at the SF whose golden slice we tampered (skip if this test
    # SF's events count isn't the tampered slice's).
    from orx_surgical_spark.sources import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    if n_events != tampered_n_events:
        pytest.skip("tampered slice belongs to a different SF")

    out = G._golden_fn("lasso_scores", "event_id", ("score",))(
        spark, sf_dir
    ).collect()
    flags = {r["event_id"]: r["drift_ok"] for r in out}
    assert flags[tampered_id] is False
    assert sum(1 for v in flags.values() if not v) == 1


def test_golden_wrapper_fires_on_cardinality_drift(spark, sf_dir, tmp_path, monkeypatch):
    """Drop a golden row: the cardinality check must flip EVERY row's
    drift_ok (a missing live row is invisible to the left join, so the
    count guard is what catches it — prove it works)."""
    import orx_surgical_spark.queries.golden_queries as G
    from orx_surgical_spark.sources import load_table

    src = G.golden_path("positive_probe")
    pdf = pq.read_table(src).to_pandas()
    n_events = load_table(spark, sf_dir, "events").count()
    slice_ = pdf[pdf.n_events == n_events]
    if slice_.empty:
        pytest.skip("no golden slice at this SF")
    pdf = pdf.drop(index=slice_.index[0])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "positive_probe.parquet"),
    )
    monkeypatch.setattr(G, "GOLDEN_DIR", str(tmp_path))

    out = G._golden_fn("positive_probe", "event_id", ("score",))(
        spark, sf_dir
    ).collect()
    assert out and all(r["drift_ok"] is False for r in out)
