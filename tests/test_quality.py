"""Unit tests for the declarative constraint checker: every rule type
flags exactly the violating rows on a hand-built fixture."""

from orx_surgical_spark.functions import quality as Q


def test_each_rule_counts_its_violations(spark):
    rows = [
        (1, "O", 10.0, "AB-1"),
        (1, "O", 20.0, "AB-2"),     # duplicate id
        (None, "F", 30.0, "AB-3"),  # null id
        (4, "X", -5.0, "nope"),     # bad status, negative price, bad pattern
        (5, None, 40.0, "AB-5"),    # null status counts as outside set
    ]
    df = spark.createDataFrame(rows, ["id", "status", "price", "code"])
    dim = spark.createDataFrame([(1,), (4,), (5,)], ["dim_id"])

    report = Q.check_constraints(
        df,
        Q.not_null("id"),
        Q.unique("id"),
        Q.in_set("status", ["O", "F", "P"]),
        Q.in_range("price", lo=0.0, hi=35.0),
        Q.matches("code", r"^AB-\d$"),
        Q.foreign_key("id", dim, "dim_id"),
    ).collect()[0]

    assert report["n_rows"] == 5
    assert report["id_null_violations"] == 1
    assert report["id_dup_violations"] == 1       # 4 non-null ids, 3 distinct
    assert report["status_outside_set_violations"] == 2  # 'X' + null
    assert report["price_out_of_range_violations"] == 2  # -5 and 40
    assert report["code_pattern_violations"] == 1        # only 'nope'
    assert report["id_orphans_violations"] == 1          # the null id row


def test_clean_table_reports_zero(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F")], ["id", "status"])
    r = Q.check_constraints(
        df, Q.not_null("id"), Q.unique("id"), Q.in_set("status", ["O", "F"])
    ).collect()[0]
    assert r["n_rows"] == 2
    assert r["id_null_violations"] == 0
    assert r["id_dup_violations"] == 0
    assert r["status_outside_set_violations"] == 0


def test_observed_write_metrics_match_direct_agg(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from orx_surgical_spark.functions.quality import observed_write
    from orx_surgical_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    got = observed_write(
        orders,
        str(tmp_path / "orders_out"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpos_price"
        ),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    direct = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpos_price"
        ),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"]
    assert got["nonpos_price"] == direct["nonpos_price"]
    assert got["total_price"] == direct["total_price"]
    # the write actually landed
    assert spark.read.parquet(str(tmp_path / "orders_out")).count() == got["n_rows"]
