"""Offline training run for the external-model F3 parity checkpoint.

The reference trains its deep models OUTSIDE the engine (Keras,
``cnn_model.ipynb:61 (cell 2)``) and the engine's job is inference
over the saved checkpoint (``cnn_model.ipynb:237 (cell 4)``'s manual
30-chunk predict loop → ``operators/inference.py:batch_score``). This
script is that external training run, minus the TF dependency this
container doesn't have: the reference CNN's kernel equals its full
input, i.e. one global linear map + sigmoid (SURVEY §2-F3), so
full-batch logistic regression trained with plain numpy IS the same
model family — trained here on exactly the MHE-shaped parity corpus
the band test rebuilds (``testing.mhe_shaped_arrays``, train split =
event_id % 5 != 0).

Deterministic by construction (fixed rng, fixed iteration count, full
batch — no stochastic minibatching), so the saved weights are a stable
committed artifact:

    python scripts/train_external_weights.py
    -> goldens/external_cnn_weights.json

``tests/test_model_parity.py::test_external_checkpoint_auc_in_band``
loads the checkpoint through the real ``predict_batch_udf`` path and
asserts test-split AUC inside BASELINE.md's deep-model band.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(
    os.path.dirname(__file__), "..", "goldens", "external_cnn_weights.json"
)


def main() -> None:
    from orx_surgical_spark.testing import mhe_shaped_arrays

    x, y = mhe_shaped_arrays()
    train = np.arange(len(y)) % 5 != 0
    xt, yt = x[train], y[train].astype(float)

    # Full-batch gradient descent on logistic loss + small L2: exactly
    # reproducible (no minibatch order, no library solver internals).
    w = np.zeros(xt.shape[1])
    b = 0.0
    lr, l2 = 0.5, 1e-3
    for _ in range(500):
        z = xt @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - yt
        w -= lr * (xt.T @ g / len(yt) + l2 * w)
        b -= lr * float(g.mean())

    with open(OUT, "w") as f:
        json.dump(
            {
                "weights": [round(float(v), 12) for v in w],
                "bias": round(float(b), 12),
                "n_train": int(train.sum()),
                "arch": "global-linear-map+sigmoid (reference CNN kernel==input)",
            },
            f,
            indent=1,
        )
    print(f"wrote {OUT}: {len(w)} weights, bias {b:.6f}")
    train_fullwidth()


def train_fullwidth() -> None:
    """The same offline run at the REFERENCE's width: 188,856 dims
    (366x516 MHE tensor flattened, ``cnn_model.ipynb:61 (cell 2)``) —
    VERDICT r6 item 7 asked for external-weight parity at full width,
    not the 64-dim miniature.  float32 full-batch GD, deterministic;
    weights land in ``goldens/external_cnn_weights_full.json`` (~2 MB,
    committed) and are band-asserted through the identical
    ``predict_batch_udf`` path by
    ``tests/test_model_parity.py::test_external_checkpoint_fullwidth_auc_in_band``.
    """
    from orx_surgical_spark.testing import mhe_fullwidth_arrays

    x, y = mhe_fullwidth_arrays()
    train = np.arange(len(y)) % 5 != 0
    xt, yt = x[train], y[train].astype(np.float32)

    w = np.zeros(xt.shape[1], dtype=np.float32)
    b = 0.0
    lr, l2 = 0.5, 1e-3
    for _ in range(300):
        z = xt @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - yt
        w -= lr * (xt.T @ g / len(yt) + l2 * w)
        b -= lr * float(g.mean())

    out = OUT.replace(".json", "_full.json")
    with open(out, "w") as f:
        # 8 significant digits ~ float32 precision; keeps the committed
        # JSON ~2 MB instead of ~5.
        json.dump(
            {
                "weights": [float(f"{float(v):.8g}") for v in w],
                "bias": round(float(b), 12),
                "n_train": int(train.sum()),
                "shape": [366, 516],
                "arch": "global-linear-map+sigmoid (reference CNN kernel==input)",
            },
            f,
        )
    print(f"wrote {out}: {len(w)} weights, bias {b:.6f}")


if __name__ == "__main__":
    main()
