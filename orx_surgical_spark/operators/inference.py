"""Batched model inference (SURVEY §2-E9/F5).

The reference bounds inference memory by manually splitting arrays into
30 chunks and looping ``model.predict`` (``cnn_model.ipynb:237 (cell
4)``, ``rnn_model.ipynb:299 (cell 5)``).  That is exactly Spark's
execution model: ``predict_batch_udf`` runs the model per Arrow batch
inside each partition — chunk count becomes ``batch_size``, the loop
becomes the task scheduler, and the model loads once per executor (the
``make_predict_fn`` closure), not once per row.

The external-DL parity path (Keras CNN/GRU, SURVEY §2-F3/F4) plugs in
here: ``make_predict_fn`` would load the saved model and return
``model.predict``; the deterministic linear stub below stands in for it
in this container (no TF) while exercising the identical plumbing.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def linear_sigmoid_model(
    weights: Sequence[float], bias: float = 0.0
) -> Callable[[], Callable]:
    """A ``make_predict_fn`` factory: deterministic stand-in for an
    external model — scores = sigmoid(X @ w + b).  (The reference CNN
    is exactly one global linear map + sigmoid per filter, SURVEY
    §2-F3, so this stub is also its honest functional skeleton.)"""
    w = np.asarray(weights, dtype=np.float64)
    b = float(bias)

    def make_predict_fn():
        # Runs once per python worker (the model "load"), like loading
        # a Keras checkpoint would.
        def predict(x: np.ndarray) -> np.ndarray:
            x = np.asarray(x, dtype=np.float64)
            return 1.0 / (1.0 + np.exp(-(x @ w + b)))

        return predict

    return make_predict_fn


#: Register-once cache for scoring UDFs (keyed by caller-supplied model
#: identity): a production pipeline registers its scorer ONCE and reuses
#: it across query executions; re-wrapping the same model per call gives
#: every wrap a fresh UDF id, which forces each Python worker to rebuild
#: its cached predict fn on the first task it sees — pure overhead that
#: showed up as 60-80% run-to-run spread in the r8 bench.
_UDF_CACHE: dict = {}


def batch_score(
    df: DataFrame,
    make_predict_fn: Callable[[], Callable],
    feature_cols: Sequence[str],
    out: str = "score",
    batch_size: int = 1024,
    cache_key: str | None = None,
) -> DataFrame:
    """E9: score every row with an Arrow-batched model UDF.

    One projection — no shuffle, no driver collect, no manual chunking;
    ``batch_size`` bounds per-batch memory the way the reference's 30
    chunks did, but per executor and in parallel.  Feature columns are
    combined into one (batch, n_features) tensor — the model sees the
    same matrix the reference fed ``model.predict``.

    ``cache_key``: opt-in register-once semantics — callers whose model
    is a process-stable pure function (deterministic weights, no
    captured session state) pass a key naming it, and repeated calls
    reuse one UDF id (see ``_UDF_CACHE``). Callers wrapping per-call
    state must leave it None."""
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql import functions as F

    key = (cache_key, tuple(feature_cols), batch_size)
    udf = _UDF_CACHE.get(key) if cache_key is not None else None
    if udf is None:
        udf = predict_batch_udf(
            make_predict_fn,
            return_type=T.DoubleType(),
            batch_size=batch_size,
            input_tensor_shapes=[[len(feature_cols)]],
        )
        if cache_key is not None:
            _UDF_CACHE[key] = udf
    return df.withColumn(out, udf(F.array(*[F.col(c) for c in feature_cols])))


def batch_score_array(
    df: DataFrame,
    make_predict_fn: Callable[[], Callable],
    array_col: str,
    n_features: int,
    out: str = "score",
    batch_size: int = 64,
) -> DataFrame:
    """E9 at reference width: score rows whose features already live in
    ONE array column.

    :func:`batch_score` assembles ``F.array(col, ...)`` from named
    columns — fine at 64 features, absurd at the reference's 188,856
    (366x516 MHE tensor, ``cnn_model.ipynb:61 (cell 2)``): wide data
    belongs in an array/vector column, and the scorer takes it as-is.
    Same ``predict_batch_udf`` plumbing (Arrow batches, model loaded
    once per worker); ``batch_size`` bounds per-batch tensor memory
    (64 rows x 188,856 float64 ~ 97 MB)."""
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql import functions as F

    udf = predict_batch_udf(
        make_predict_fn,
        return_type=T.DoubleType(),
        batch_size=batch_size,
        input_tensor_shapes=[[n_features]],
    )
    return df.withColumn(out, udf(F.col(array_col)))


def external_checkpoint_model(path: str) -> Callable[[], Callable]:
    """A ``make_predict_fn`` factory over a REAL saved checkpoint.

    This is the external-DL parity path with actual trained weights
    (scripts/train_external_weights.py — the offline stand-in for the
    reference's Keras training run, ``cnn_model.ipynb:61 (cell 2)``):
    the checkpoint file is opened INSIDE ``make_predict_fn``, i.e. once
    per python worker, exactly where a Keras ``load_model`` would run —
    the closure ships only the path string to executors, never the
    weights themselves.
    """

    def make_predict_fn():
        import json

        with open(path) as f:
            ckpt = json.load(f)
        w = np.asarray(ckpt["weights"], dtype=np.float64)
        b = float(ckpt["bias"])

        def predict(x: np.ndarray) -> np.ndarray:
            x = np.asarray(x, dtype=np.float64)
            return 1.0 / (1.0 + np.exp(-(x @ w + b)))

        return predict

    return make_predict_fn
