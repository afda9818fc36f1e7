"""G11 profile report: distributed per-column stats + histogram +
HTML rendering (the dataprep create_report analogue)."""

from orx_surgical_spark.functions import profile
from orx_surgical_spark.sources import load_table


def test_profile_columns_stats(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    prof = profile.profile_columns(li, ["l_quantity", "l_discount"])
    rows = {r["column_name"]: r for r in prof.collect()}
    assert set(rows) == {"l_quantity", "l_discount"}
    q = rows["l_quantity"]
    assert q["n"] > 0 and q["n_null"] == 0
    assert q["min_val"] <= q["median"] <= q["max_val"]
    assert q["approx_distinct"] > 0


def test_histogram_covers_all_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hist = profile.histogram(li, "l_extendedprice", n_bins=10)
    rows = hist.collect()
    assert len(rows) <= 10
    assert sum(r["n"] for r in rows) == li.filter("l_extendedprice is not null").count()
    assert all(r["lo"] < r["hi"] for r in rows)


def test_save_report_html(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = profile.save_report(li, ["l_quantity"], str(tmp_path / "report.html"))
    html = open(out).read()
    assert html.startswith("<!doctype html>")
    assert "l_quantity" in html and "median" in html


def test_correlation_matrix_values_and_single_pass(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    corr = profile.correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )
    rows = {(r["col_a"], r["col_b"]): r["pearson_r"] for r in corr.collect()}
    assert set(rows) == {
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
    }
    assert all(-1.0 <= v <= 1.0 for v in rows.values())
    # exact-correctness pin via a duplicated column (r == 1)
    dup = li.withColumn("l_quantity2", li["l_quantity"])
    self_r = profile.correlation_matrix(dup, ["l_quantity", "l_quantity2"])
    assert abs(self_r.collect()[0]["pearson_r"] - 1.0) < 1e-9
    # one aggregate pass: the plan contains no Union of per-pair scans
    assert "Union" not in corr._jdf.queryExecution().executedPlan().toString()


def test_save_report_bivariate_section(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = profile.save_report(
        li, ["l_quantity", "l_discount"], str(tmp_path / "report2.html")
    )
    html = open(out).read()
    assert "Bivariate (Pearson r)" in html and "pearson_r" in html
    assert "Univariate" in html


def test_histograms_one_job_matches_per_column(spark, sf_dir):
    """The combined multi-column histogram must (a) reproduce the
    per-column histogram counts exactly and (b) run as ONE Spark job
    for the whole batch (VERDICT r5 item 3: no 2-scans-per-column)."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    row = li.agg(
        *[
            agg
            for c in cols
            for agg in (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))
        ]
    ).collect()[0]
    bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}

    combined = profile.histograms(li, bounds, n_bins=10)

    # One SCAN for the whole batch (the claim that matters at 100 TB)
    plan = combined._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup()
    got = combined.collect()
    new_jobs = [j for j in tracker.getJobIdsForGroup() if j not in before]
    # <= 2: AQE runs the shuffle-map stage and the result stage as
    # separate jobs; both belong to the same single-scan query.
    assert len(new_jobs) <= 2, (
        f"combined histogram must be one single-scan query, saw "
        f"{len(new_jobs)} jobs"
    )

    for c in cols:
        solo = {
            r["bucket"]: r["n"]
            for r in profile.histogram(li, c, n_bins=10, bounds=bounds[c]).collect()
        }
        comb = {r["bucket"]: r["n"] for r in got if r["column_name"] == c}
        assert comb == solo, f"{c}: combined histogram diverges from per-column"


def test_save_report_distribution_section(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = profile.save_report(
        li, ["l_quantity", "l_discount"], str(tmp_path / "report3.html")
    )
    html = open(out).read()
    assert "Distributions" in html and "bucket" in html
