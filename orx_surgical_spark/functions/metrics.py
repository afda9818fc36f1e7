"""Evaluation / metric operators (SURVEY §2-G) as distributed
aggregations.

The reference computes every metric driver-side with sklearn over dense
NumPy arrays (``cnn_model.ipynb:237 (cell 4)``, ``ml_models.ipynb``).
Here each metric is a conditional aggregation over a (score, label)
DataFrame: one scan, map-side partial aggregation, tiny result — the
shape that survives a 100 TB scored table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scored_with_thresholds(
    df: DataFrame, score: str, label: str, n_thresholds: int = 20
) -> DataFrame:
    """Cross the scored rows with an ``n_thresholds``-row threshold table
    (broadcast — never shuffles the scored side). Kept as the explicit
    row-expansion form; :func:`threshold_sweep` uses the expansion-free
    aggregate fold instead."""
    thresholds = df.sparkSession.range(n_thresholds).select(
        (F.col("id") * (1.0 / n_thresholds)).alias("threshold")
    )
    return df.select(
        F.col(score).alias("__score"), F.col(label).alias("__label")
    ).crossJoin(F.broadcast(thresholds))


def threshold_sweep(
    df: DataFrame, score: str, label: str, n_thresholds: int = 20
) -> DataFrame:
    """Threshold sweep (SURVEY §2-G1; reference ``thresholds =
    arange(0,1,0.01)`` + per-threshold ``f1_score``, ``cnn_model.ipynb:237
    (cell 4)``).

    One pass over the scored table with NO row expansion: the threshold
    grid is static, so all ``4 * n_thresholds`` confusion cells are
    conditional aggregates in a single global agg (map-side partial,
    one scalar row), unpacked to one row per threshold via ``inline``.
    The previous shape — broadcast cross join against an
    ``n_thresholds``-row table — multiplied the scored table by 20 and
    shuffled it by threshold; at a 100 TB scored table that's 2 PB of
    shuffle input for the same 80 numbers.
    """
    # Expressions are built as SQL strings and shipped in TWO selectExpr
    # calls: 4*n_thresholds Column objects via the Python API cost one
    # py4j round trip each (~1.2s of driver chatter for n=20, measured),
    # while the JVM parses the equivalent SQL in milliseconds.
    # repr(float) is round-trippable, so the CAST'd literals are the
    # exact i/n doubles.
    pos = f"(`{label}` = 1)"
    cells_exprs: list[str] = []
    for i in range(n_thresholds):
        t = repr(i * (1.0 / n_thresholds))
        pred = f"(`{score}` > CAST('{t}' AS DOUBLE))"
        cells_exprs += [
            f"SUM(CASE WHEN {pos} AND {pred} THEN 1 ELSE 0 END) AS tp_{i}",
            f"SUM(CASE WHEN NOT {pos} AND {pred} THEN 1 ELSE 0 END) AS fp_{i}",
            f"SUM(CASE WHEN {pos} AND NOT {pred} THEN 1 ELSE 0 END) AS fn_{i}",
            f"SUM(CASE WHEN NOT {pos} AND NOT {pred} THEN 1 ELSE 0 END) AS tn_{i}",
        ]
    cells = df.selectExpr(*cells_exprs)
    structs = ", ".join(
        f"struct(CAST('{repr(i * (1.0 / n_thresholds))}' AS DOUBLE) AS threshold,"
        f" tp_{i} AS tp, fp_{i} AS fp, fn_{i} AS fn, tn_{i} AS tn)"
        for i in range(n_thresholds)
    )
    agg = cells.selectExpr(f"inline(array({structs}))")
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    precision = F.when(tp + fp == 0, F.lit(0.0)).otherwise(tp / (tp + fp))
    recall = F.when(tp + fn == 0, F.lit(0.0)).otherwise(tp / (tp + fn))
    f1 = F.when(2 * tp + fp + fn == 0, F.lit(0.0)).otherwise(
        2 * tp / (2 * tp + fp + fn)
    )
    return agg.select(
        F.round("threshold", 6).alias("threshold"),
        "tp", "fp", "fn", "tn",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def best_threshold(df: DataFrame, score: str, label: str, n_thresholds: int = 100):
    """Argmax-F1 threshold (driver-side over the tiny sweep result)."""
    rows = threshold_sweep(df, score, label, n_thresholds).collect()
    best = max(rows, key=lambda r: (r["f1"], -r["threshold"]))
    return best["threshold"], best["f1"]


def binarize(score, threshold: float):
    """Hard 0/1 prediction at a threshold (SURVEY §2-G2)."""
    c = F.col(score) if isinstance(score, str) else score
    return F.when(c > threshold, 1).otherwise(0)


def confusion_matrix(
    df: DataFrame, label: str, prediction: str
) -> DataFrame:
    """Confusion matrix as a grouped count (SURVEY §2-G3; reference
    ``confusion_matrix(y, preds)``)."""
    return df.groupBy(
        F.col(label).alias("label"), F.col(prediction).alias("prediction")
    ).agg(F.count(F.lit(1)).alias("n"))


def roc_points(
    df: DataFrame, score: str, label: str, n_thresholds: int = 100
) -> DataFrame:
    """(fpr, tpr) points from the threshold sweep (SURVEY §2-G6)."""
    sweep = threshold_sweep(df, score, label, n_thresholds)
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return sweep.select(
        "threshold",
        F.round(F.when(fp + tn == 0, 0.0).otherwise(fp / (fp + tn)), 6).alias("fpr"),
        F.round(F.when(tp + fn == 0, 0.0).otherwise(tp / (tp + fn)), 6).alias("tpr"),
    )


def trapezoid_auc(points: Sequence[tuple[float, float]]) -> float:
    """Trapezoidal AUC over (x, y) points, driver-side (the point list is
    n_thresholds long — tiny). Reference: ``auc(fpr, tpr)`` (§2-G6)."""
    pts = sorted(points)
    area = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        area += (x1 - x0) * (y0 + y1) / 2.0
    return area


def roc_auc(df: DataFrame, score: str, label: str, n_thresholds: int = 200) -> float:
    """ROC AUC via the distributed sweep + driver trapezoid (SURVEY §2-G4).

    Feed hard 0/1 predictions as ``score`` to reproduce the reference's
    AUC-of-binarized-predictions quirk (``cnn_model.ipynb:352 (cell 6)``).
    """
    pts = [(r["fpr"], r["tpr"]) for r in roc_points(df, score, label, n_thresholds).collect()]
    pts += [(0.0, 0.0), (1.0, 1.0)]
    return trapezoid_auc(pts)


def pr_points(
    df: DataFrame, score: str, label: str, n_thresholds: int = 100
) -> DataFrame:
    """(recall, precision) points (SURVEY §2-G5)."""
    sweep = threshold_sweep(df, score, label, n_thresholds)
    return sweep.select("threshold", "recall", "precision")


def precision_at_recall(
    df: DataFrame, score: str, label: str, target_recall: float = 0.9,
    n_thresholds: int = 200, mode: str = "interp",
) -> float:
    """Precision at a recall level (SURVEY §2-G5), two reference modes:

    - ``interp``: linear interpolation between the bracketing sweep
      points — ``np.interp(0.9, recall, precision)`` semantics.
    - ``nearest``: precision at the sweep point whose recall is closest
      to the target — the ``precision[np.argmin(np.abs(recall - t))]``
      variant (``modelling CNN.ipynb:1076 (cell 31)``); equal-distance
      ties take the first point in threshold order (np.argmin first-hit).
    """
    if mode == "nearest":
        rows = sorted(
            pr_points(df, score, label, n_thresholds).collect(),
            key=lambda r: r["threshold"],
        )
        best = min(rows, key=lambda r: abs(r["recall"] - target_recall))
        return best["precision"]
    if mode != "interp":
        raise ValueError(f"unknown mode: {mode!r}")
    pts = sorted(
        (r["recall"], r["precision"])
        for r in pr_points(df, score, label, n_thresholds).collect()
    )
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if target_recall <= xs[0]:
        return ys[0]
    if target_recall >= xs[-1]:
        return ys[-1]
    # Exact hit on a sweep point with duplicated recall: np.interp
    # resolves to the LAST duplicate's precision (its interval search
    # lands on the segment where x stops repeating).
    exact = [y for x, y in pts if x == target_recall]
    if exact:
        return exact[-1]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if x0 < target_recall < x1:
            return y0 + (y1 - y0) * (target_recall - x0) / (x1 - x0)
    return ys[-1]
