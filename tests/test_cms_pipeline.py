"""Pipeline golden tests (SURVEY §5 item 2): the CMS entry points run
on deterministic CMS-shaped fixtures (FIXTURES.md §1) and are checked
against an independent pandas re-implementation of the reference
semantics plus the hand-checkable invariants FIXTURES.md lists."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from orx_surgical_spark.pipelines import cms as P
from tests.cms_fixtures import YEARS, _make_fixtures, _pandas_cohort

@pytest.fixture(scope="module")
def cms(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cms_fixtures")
    frames = _make_fixtures(root)
    return {"dir": str(root), "frames": frames}


@pytest.fixture(scope="module")
def cohort(spark, cms):
    t = P.load_cms_tables(spark, cms["dir"])
    return P.arthritis_cohort(t["ben"], t["ip"]).cache()


def test_enrollment_filter_exact_patient_set(cms, cohort):
    expected = set(_pandas_cohort(cms["frames"]["ben"], cms["frames"]["ip"])["DESYNPUF_ID"])
    got = {r[0] for r in cohort.select("DESYNPUF_ID").distinct().collect()}
    assert got == expected
    assert len(got) > 10  # fixture keeps a meaningful cohort


def test_cohort_row_set_matches_pandas(cms, cohort):
    expected = _pandas_cohort(cms["frames"]["ben"], cms["frames"]["ip"])
    assert cohort.count() == len(expected)
    assert {r[0] for r in cohort.select("CLM_ID").collect()} == set(expected["CLM_ID"])


def test_age_rule(cms, cohort):
    row = cohort.filter(F.col("BENE_BIRTH_DT") != "").first()
    clm = pd.to_datetime(str(int(row["CLM_FROM_DT"])), format="%Y%m%d")
    birth = pd.to_datetime(row["BENE_BIRTH_DT"], format="%Y%m%d")
    assert row["Age"] == pytest.approx((clm - birth).days / 365, abs=1e-9)


def test_crosswalk_cleanup(spark, cms):
    t = P.load_cms_tables(spark, cms["dir"])
    dx = P.clean_crosswalk(t["dx"])
    got = {(r["ICD9"], r["CCS"]) for r in dx.collect()}
    expected = {(f"D{i:03d}", 100 + i % 12) for i in range(30)}
    assert got == expected  # quotes/dots/padding all cleaned


def test_occurrence_vector_exact_indices(spark, cms, cohort):
    t = P.load_cms_tables(spark, cms["dir"])
    dx, pcs = P.clean_crosswalk(t["dx"]), P.clean_crosswalk(t["pcs"])
    dx_vocab, pcs_vocab = P.crosswalk_vocab(dx), P.crosswalk_vocab(pcs)
    remapped = P.remap_and_label(cohort, dx, pcs).cache()
    encoded = P.occurrence_columns(remapped, dx_vocab, pcs_vocab)

    dx_map = {f"D{i:03d}": 100 + i % 12 for i in range(30)}
    raw = {r["CLM_ID"]: r for r in cohort.limit(20).collect()}
    enc = {r["CLM_ID"]: r for r in encoded.filter(
        F.col("CLM_ID").isin(list(raw))).collect()}
    for clm_id, r in raw.items():
        want = {
            dx_map[r[f"ICD9_DGNS_CD_{i}"]]
            for i in range(1, 11)
            if r[f"ICD9_DGNS_CD_{i}"] in dx_map
        }
        got = {v for v in dx_vocab if enc[clm_id][f"dx_ccs_{v}"] == 1}
        assert got == want, clm_id


def test_label_rule(cms, cohort):
    t_dir = cms["dir"]
    spark = cohort.sparkSession
    t = P.load_cms_tables(spark, t_dir)
    dx, pcs = P.clean_crosswalk(t["dx"]), P.clean_crosswalk(t["pcs"])
    remapped = P.remap_and_label(cohort, dx, pcs)
    bad = remapped.filter(
        (F.col("label") == 1) != F.col("CLM_DRG_CD").isin("469", "470")
    )
    assert bad.count() == 0


def test_aov_width_and_split(spark, cms):
    aov = P.get_aov(spark, cms["dir"], leak_label=True)
    v = 12 + 8  # dx + pcs CCS vocabulary sizes from the fixture
    # id + 3 years x (Age, sex, codes, leaked label) + label + split
    assert len(aov.columns) == 1 + 3 * (2 + v + 1) + 1 + 1
    assert aov.count() > 10
    # no-leak default drops exactly the 3 per-year label columns
    aov2 = P.get_aov(spark, cms["dir"], leak_label=False)
    assert len(aov2.columns) == len(aov.columns) - 3
    splits = {r[0] for r in aov2.select("split").distinct().collect()}
    assert splits == {"train", "test"}


def test_mhe_single_day_row_and_indices(spark, cms):
    mhe = P.get_mhe(spark, cms["dir"]).cache()
    v = 12 + 8
    # every active index lies in the (366, v) grid and shares one day row
    checked = mhe.select(
        "CLM_ID",
        F.size("mhe_idx").alias("n"),
        F.array_distinct(
            F.transform("mhe_idx", lambda i: F.floor(i / v))
        ).alias("day_rows"),
        F.array_max("mhe_idx").alias("mx"),
    )
    assert checked.filter(F.size("day_rows") > 1).count() == 0  # one nonzero day
    assert checked.filter(F.col("mx") >= 366 * v).count() == 0
    assert checked.filter(F.col("n") > 0).count() > 0
    dt = dict(mhe.dtypes)
    assert dt["dv_age"] == "float" and dt["dv_sex"] == "float"


def test_mhe_rebalance_keeps_positives(spark, cms):
    t = P.load_cms_tables(spark, cms["dir"])
    cohort_df = P.arthritis_cohort(t["ben"], t["ip"])
    dx, pcs = P.clean_crosswalk(t["dx"]), P.clean_crosswalk(t["pcs"])
    dx_vocab, pcs_vocab = P.crosswalk_vocab(dx), P.crosswalk_vocab(pcs)
    encoded = P.occurrence_columns(
        P.remap_and_label(cohort_df, dx, pcs), dx_vocab, pcs_vocab
    )
    n_pos = encoded.filter(F.col("label") == 1).count()
    rows = n_pos + 10
    sampled = P.mhe_samples(encoded, dx_vocab, pcs_vocab, rows=rows)
    counts = dict(
        (r["label"], r["n"])
        for r in sampled.groupBy("label").agg(F.count("*").alias("n")).collect()
    )
    assert counts.get(1, 0) == n_pos  # all positives kept (E5)
    assert counts.get(0, 0) == 10


def test_remap_join_tier_matches_literal_tier(spark, cms, cohort):
    """Above map_literal_max the remap switches to broadcast lookup
    joins; results must be identical and the plan must probe a reused
    broadcast per crosswalk instead of pasting 16 map literals."""
    t = P.load_cms_tables(spark, cms["dir"])
    dx, pcs = P.clean_crosswalk(t["dx"]), P.clean_crosswalk(t["pcs"])
    lit_tier = P.remap_and_label(cohort, dx, pcs)  # default: literals
    join_tier = P.remap_and_label(cohort, dx, pcs, map_literal_max=0)
    cols = sorted(lit_tier.columns)
    assert sorted(join_tier.columns) == cols
    a = lit_tier.select(*cols).exceptAll(join_tier.select(*cols))
    b = join_tier.select(*cols).exceptAll(lit_tier.select(*cols))
    assert a.count() == 0 and b.count() == 0
    plan = join_tier._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "create_map" not in plan.lower()
