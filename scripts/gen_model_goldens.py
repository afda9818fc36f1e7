"""Freeze the MLlib model-score queries' outputs as golden parquets.

The four score queries (lasso/logreg/mlp/rf) are deterministic on this
data: the whole training path is map-only over a single-split parquet
scan (events.parquet < spark's 4 MB open-cost floor at every checked
SF), so partitioning, row order, and therefore every seeded MLlib fit
are identical across sessions — verified bit-exact between a vanilla
driver-parity session and the repo session (r6 probe, and pinned by
tests/test_model_goldens.py).

That makes an engine-vs-frozen-self oracle possible where an
engine-vs-DuckDB one is not (DuckDB cannot re-run an MLlib solver):
each golden parquet carries the scored rows for BOTH graded scale
factors, tagged with ``n_events`` (the events-table row count — the
scale selector both the Spark side and the DuckDB oracle can compute
from the data itself, so one oracle string serves every SF).

Regenerate ONLY when the model/feature code changes intentionally:

    python scripts/gen_model_goldens.py

and commit the resulting ``goldens/*.parquet``.  A silent solver/seed
drift then shows up as ``drift_ok = false`` rows in
``panel_model_scores_a/b``, which breaks the driver's value hash.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# Goldens feed the golden wrappers that panels are composed from —
# skip panel registration to break the bootstrap cycle (same pattern
# as gen_panel_dtypes.py).
os.environ["SPARK_GRAFT_SKIP_PANELS"] = "1"

#: member -> join/sort key column (everything else is value-compared).
GOLDEN_MEMBERS: dict[str, str] = {
    "lasso_scores": "event_id",
    "logreg_scores": "event_id",
    "mlp_scores": "event_id",
    "rf_scores": "event_id",
    "cv_fold_stats": "fold",
    "positive_probe": "event_id",
}
#: Graded SFs plus the soak scales (VERDICT r6 item 6: without frozen
#: rows at the scales the soak actually runs, its drift check was a
#: no-op).  ``.scale/sf1`` is included when present — it is itself a
#: deterministic function of sf0.1 (gen_scale_tiles.py), so its golden
#: is reproducible even though the tiles are gitignored.
SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
_SCALE_SF1 = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".scale", "sf1")
)
if os.path.isdir(_SCALE_SF1):
    SF_DIRS = SF_DIRS + (_SCALE_SF1,)
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")


def main() -> None:
    from pyspark.sql import SparkSession

    # Vanilla session on purpose: goldens must be what the grading
    # driver's own session computes (ANSI on, no repo confs).
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        # Heap only — the conf SURFACE stays vanilla (no repo confs);
        # 1 g default cannot hold the sf1 golden materialization.
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from orx_surgical_spark.queries.catalog import REGISTRY
    from orx_surgical_spark.sources import load_table

    os.makedirs(OUT_DIR, exist_ok=True)
    import pandas as pd

    for member, key_col in GOLDEN_MEMBERS.items():
        frames = []
        for sf_dir in SF_DIRS:
            n_events = load_table(spark, sf_dir, "events").count()
            pdf = REGISTRY[member].fn(spark, sf_dir).toPandas()
            pdf["n_events"] = n_events
            frames.append(pdf)
        out = pd.concat(frames, ignore_index=True)
        # Stable on-disk row order (content order is irrelevant to the
        # hash, but a deterministic file makes git diffs meaningful).
        out = out.sort_values(["n_events", key_col]).reset_index(drop=True)
        path = os.path.join(OUT_DIR, f"{member}.parquet")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), path)
        print(f"wrote {path}: {len(out)} rows, cols {list(out.columns)}")


if __name__ == "__main__":
    main()
