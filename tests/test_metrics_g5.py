"""G5 precision@recall semantics pinned against an independent NumPy
reimplementation of the sweep — np.interp IS the reference formula
(``dataprep`` path), and the argmin-nearest variant reproduces
``modelling CNN.ipynb:1076 (cell 31)``."""

import numpy as np
import pytest

from orx_surgical_spark.functions import metrics

SCORES = [0.03, 0.08, 0.15, 0.22, 0.29, 0.36, 0.43, 0.48, 0.55, 0.62,
          0.69, 0.74, 0.81, 0.88, 0.93, 0.97, 0.11, 0.57, 0.66, 0.85]
LABELS = [0, 0, 0, 1, 0, 0, 1, 0, 1, 1,
          0, 1, 1, 1, 1, 1, 0, 0, 1, 0]
N_T = 20


def _numpy_sweep():
    """Independent reimplementation: same i/n threshold grid, same
    strict score > t rule, positive-class precision/recall with the
    0-denominator convention and 6-dp rounding."""
    s = np.array(SCORES)
    y = np.array(LABELS)
    recall, precision = [], []
    for i in range(N_T):
        t = i * (1.0 / N_T)  # identical arithmetic to the Spark grid
        pred = s > t
        tp = int(np.sum(pred & (y == 1)))
        fp = int(np.sum(pred & (y == 0)))
        fn = int(np.sum(~pred & (y == 1)))
        p = 0.0 if tp + fp == 0 else tp / (tp + fp)
        r = 0.0 if tp + fn == 0 else tp / (tp + fn)
        precision.append(round(p, 6))
        recall.append(round(r, 6))
    return np.array(recall), np.array(precision)


@pytest.fixture()
def scored(spark):
    return spark.createDataFrame(
        list(zip(SCORES, (float(v) for v in LABELS))), "score double, label double"
    )


def test_precision_at_recall_matches_np_interp(scored):
    recall, precision = _numpy_sweep()
    order = np.lexsort((precision, recall))  # the operator's tuple sort
    for target in (0.5, 0.75, 0.9):
        expected = float(np.interp(target, recall[order], precision[order]))
        got = metrics.precision_at_recall(
            scored, "score", "label", target_recall=target, n_thresholds=N_T
        )
        assert got == pytest.approx(expected, abs=1e-9), target


def test_precision_at_recall_nearest_matches_argmin(scored):
    recall, precision = _numpy_sweep()
    for target in (0.5, 0.75, 0.9):
        expected = float(precision[np.argmin(np.abs(recall - target))])
        got = metrics.precision_at_recall(
            scored, "score", "label",
            target_recall=target, n_thresholds=N_T, mode="nearest",
        )
        assert got == pytest.approx(expected, abs=1e-9), target


def test_interp_clamps_outside_observed_recall(scored):
    recall, precision = _numpy_sweep()
    order = np.lexsort((precision, recall))
    lo = metrics.precision_at_recall(
        scored, "score", "label", target_recall=0.0, n_thresholds=N_T
    )
    hi = metrics.precision_at_recall(
        scored, "score", "label", target_recall=1.0, n_thresholds=N_T
    )
    assert lo == pytest.approx(float(precision[order][0]))
    assert hi == pytest.approx(float(precision[order][-1]))
