"""Model catalog queries (SURVEY §2-F + G7/G8/G9) over the ``events``
table: fit → score → metrics pipelines, the reference's notebook entry
points re-expressed as MLlib pipelines.

Model outputs are not ANSI-SQL-expressible, so these are rows-only
checks (the driver records the weaker gate; schema + row count are
still pinned).  The relational/metrics halves of each pipeline are
oracle-checked elsewhere (threshold_sweep, roc_points, confusion_matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orx_surgical_spark import models as M
from orx_surgical_spark.operators.encoders import hash_split
from orx_surgical_spark.queries.catalog import register
from orx_surgical_spark.sources import load_table


def _train_test(spark: SparkSession, sf_dir: str):
    """Deterministic 80/20 split with a scale-invariant fit side.

    The returned train side is capped at ``models.FIT_CAP_ROWS`` via a
    salted hash sample (VERDICT r6 item 1: the uncapped RF/MLP fits
    were 60% of the sf0.1 soak wall and killed the sf1 JVM).  The cap
    never binds at the graded SFs (1k/10k events), so frozen goldens
    are unchanged; the test/score side is never sampled.
    """
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()  # parquet footer metadata — no data scan
    feat = M.with_event_features(ev)
    split = hash_split(feat, "event_id", {"train": 0.8, "test": 0.2})
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    return (
        M.fit_sample(train, "event_id", int(n_events * 0.8)),
        test,
    )


@register(
    "lasso_scores",
    oracle=None,  # model coefficients are solver-internal -> rows-only
    doc="F1 Lasso scorer (LinearRegression elasticNetParam=1.0, "
        "regParam=0.001; reference Lasso(alpha=0.001), ml_models.ipynb "
        "cell 2): fit on the deterministic hash-split train side, score "
        "the test side.",
    tags=("F1", "E2", "E7"),
)
def lasso_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = _train_test(spark, sf_dir)
    model = M.lasso_regression(train)
    return model.transform(test).select(
        "event_id", "label", F.round("prediction", 6).alias("score")
    )


@register(
    "rf_scores",
    oracle=None,
    doc="F2 random-forest scorer (reference RandomForestRegressor, "
        "ml_models.ipynb cell 4; maxDepth=12 deviation documented in "
        "models.py — MLlib level-wise training makes the reference's "
        "max_depth=100 a scale cliff, not a free knob).",
    tags=("F2",),
)
def rf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = _train_test(spark, sf_dir)
    # Reference config: n_estimators=100, max_depth=100. Documented
    # deviation (models.py module docstring): maxDepth=12 here. Spark
    # hard-caps at 30, and MLlib's level-wise histogram training makes
    # cost exponential-ish in depth — depth 30 on the capped 20k-row
    # fit sample was 67 s of single-box wall (r6: 419 s uncapped, JVM
    # death at sf1) vs 11 s at depth 12, for a model whose scores are
    # band-equivalent on this 4-feature block. The sklearn exact
    # algorithm has no such cliff, so the reference's 100 was free;
    # a distributed engine pays per level.
    model = M.random_forest_regression(train, num_trees=100, max_depth=12)
    return model.transform(test).select(
        "event_id", "label", F.round("prediction", 6).alias("score")
    )


@register(
    "logreg_scores",
    oracle=None,
    doc="F3-equivalent native scorer: LogisticRegression over the same "
        "assembled features (the reference CNN's full-input kernel is "
        "one global linear map, SURVEY §2-F3).",
    tags=("F3",),
)
def logreg_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = _train_test(spark, sf_dir)
    model = M.logistic_scorer(train)
    from pyspark.ml.functions import vector_to_array

    return model.transform(test).select(
        "event_id",
        "label",
        F.round(vector_to_array("probability")[1], 6).alias("score"),
        F.col("prediction").cast("int").alias("pred_label"),
    )


@register(
    "mlp_scores",
    oracle=None,
    doc="F3 architecture-parity scorer: MultilayerPerceptronClassifier "
        "[n_features, 100, 2] — the reference CNN head's Dense(100) "
        "hidden layer (cnn_model.ipynb cell 2) as a native MLlib model.",
    tags=("F3",),
)
def mlp_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = _train_test(spark, sf_dir)
    model = M.mlp_classifier(train)
    from pyspark.ml.functions import vector_to_array

    return model.transform(test).select(
        "event_id",
        "label",
        F.round(vector_to_array("probability")[1], 6).alias("score"),
        F.col("prediction").cast("int").alias("pred_label"),
    )


@register(
    "cv_fold_stats",
    oracle=None,
    doc="G7/G8: 5-fold CV of the Lasso scorer over deterministic md5 "
        "hash folds — per-fold train/val MSE and rounded accuracy "
        "(reference KFold loop, ml_models.ipynb cell 2).",
    tags=("G7", "G8", "F1"),
)
def cv_fold_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    # Same scale-invariant fit cap as _train_test (never binds at the
    # graded SFs): 5 lasso fits over unbounded input is the same
    # driver-cost cliff as the RF/MLP panel, just 5x.
    feat = M.fit_sample(M.with_event_features(ev), "event_id", n_events)
    stats = M.cross_validate_folds(feat, M.lasso_regression, "event_id", k=5)
    rows = [
        (
            s["fold"],
            round(s["train_mse"], 6), round(s["val_mse"], 6),
            round(s["train_acc"], 6), round(s["val_acc"], 6),
        )
        for s in stats
    ]
    return spark.createDataFrame(
        rows, "fold int, train_mse double, val_mse double, "
              "train_acc double, val_acc double",
    )


@register(
    "positive_probe",
    oracle=None,
    doc="G9 positive-sample probe: score only the label==1 rows "
        "(reference x_test[np.where(y_test==1)] predict-and-print, "
        "cnn_model.ipynb cell 5).",
    tags=("G9", "F3"),
)
def positive_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = _train_test(spark, sf_dir)
    model = M.logistic_scorer(train)
    positives = test.filter(F.col("label") == 1.0)
    from pyspark.ml.functions import vector_to_array

    return model.transform(positives).select(
        "event_id", F.round(vector_to_array("probability")[1], 6).alias("score")
    )


@register(
    "batch_inference_scores",
    oracle="""
    SELECT event_id,
           ROUND(1.0 / (1.0 + exp(-(0.004 * value - 0.05 * hour(ts) + 0.1))), 6)
               AS score
    FROM events
    """,
    doc="E9 batched model inference via predict_batch_udf: Arrow-batched "
        "scoring with a deterministic linear-sigmoid stand-in for an "
        "external model (the reference's 30-chunk manual predict loop, "
        "cnn_model.ipynb cell 4, becomes batch_size + the task "
        "scheduler) — deterministic, so oracle-checked.",
    bench=True,
    tags=("E9", "F5"),
)
def batch_inference_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orx_surgical_spark.operators.inference import (
        batch_score,
        linear_sigmoid_model,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").cast("double").alias("f_value"),
        F.hour("ts").cast("double").alias("f_hour"),
    )
    scored = batch_score(
        ev,
        linear_sigmoid_model([0.004, -0.05], bias=0.1),
        ["f_value", "f_hour"],
        # deterministic pure-function model -> register-once is safe and
        # keeps repeated executions on one UDF id (worker predict-fn
        # caches stay warm)
        cache_key="linear_sigmoid[0.004,-0.05]+0.1",
    )
    return scored.select("event_id", F.round("score", 6).alias("score"))
