"""Pipeline golden tests (SURVEY §5 item 2): the CMS entry points run
on deterministic CMS-shaped fixtures (FIXTURES.md §1) and are checked
against an independent pandas re-implementation of the reference
semantics plus the hand-checkable invariants FIXTURES.md lists."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from orx_surgical_spark.pipelines import cms as P

N_PATIENTS = 200
YEARS = (2008, 2009, 2010)


def _make_fixtures(root) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(42)

    dx_codes = [f"D{i:03d}" for i in range(30)]
    dx_ccs = [100 + i % 12 for i in range(30)]
    pcs_codes = [f"P{i:03d}" for i in range(20)]
    pcs_ccs = [200 + i % 8 for i in range(20)]

    def raw_code(c: str, i: int) -> str:
        if i % 3 == 0:
            return f"'{c}.0'"  # quoted + dotted
        if i % 3 == 1:
            return f"' {c} '"  # quoted + padded
        return c

    dx = pd.DataFrame(
        {
            "'ICD-9-CM CODE'": [raw_code(c, i) for i, c in enumerate(dx_codes)],
            "'CCS CATEGORY'": [f"'{c}'" for c in dx_ccs],
        }
    )
    pcs = pd.DataFrame(
        {
            "'ICD-9-CM CODE'": [raw_code(c, i) for i, c in enumerate(pcs_codes)],
            "'CCS CATEGORY'": [str(c) for c in pcs_ccs],
        }
    )

    patients = [f"P{i:06d}" for i in range(N_PATIENTS)]
    ben = pd.DataFrame(
        {
            "DESYNPUF_ID": patients,
            "SP_RA_OA": rng.choice([1, 2], N_PATIENTS, p=[0.6, 0.4]),
            "BENE_BIRTH_DT": [
                ""
                if i % 97 == 0
                else f"{rng.integers(1920, 1981)}{rng.integers(1, 13):02d}{rng.integers(1, 29):02d}"
                for i in range(N_PATIENTS)
            ],
            "BENE_SEX_IDENT_CD": rng.choice([1, 2], N_PATIENTS),
        }
    )

    rows = []
    clm = 0
    for i, pid in enumerate(patients):
        # ~70% of patients have claims in all three years; others miss one
        pat_years = list(YEARS) if i % 10 < 7 else [y for y in YEARS if y != YEARS[i % 3]]
        for y in pat_years:
            for _ in range(int(rng.integers(1, 4))):
                clm += 1
                if clm % 53 == 0:
                    date = ""  # exercises B2/B3 null-on-error + drop
                else:
                    date = f"{y}{rng.integers(1, 13):02d}{rng.integers(1, 29):02d}"
                drg = (
                    str(rng.choice(["469", "470"]))
                    if rng.random() < 0.04
                    else str(rng.integers(100, 468))
                )
                dgns = [
                    (
                        str(rng.choice(dx_codes))
                        if rng.random() < 0.4
                        else ("UNK" + str(rng.integers(99)) if rng.random() < 0.2 else "")
                    )
                    for _ in range(10)
                ]
                prcd = [
                    (
                        str(rng.choice(pcs_codes))
                        if rng.random() < 0.25
                        else ("UNKP" + str(rng.integers(99)) if rng.random() < 0.1 else "")
                    )
                    for _ in range(6)
                ]
                rows.append([pid, f"C{clm:07d}", date, drg, *dgns, *prcd])
    ip = pd.DataFrame(
        rows,
        columns=["DESYNPUF_ID", "CLM_ID", "CLM_FROM_DT", "CLM_DRG_CD"]
        + [f"ICD9_DGNS_CD_{i}" for i in range(1, 11)]
        + [f"ICD9_PRCDR_CD_{i}" for i in range(1, 7)],
    )
    pde = pd.DataFrame(
        {"DESYNPUF_ID": patients[:50], "PROD_SRVC_ID": [f"N{i}" for i in range(50)]}
    )

    out = {"ben": ben, "ip": ip, "pde": pde, "dx": dx, "pcs": pcs}
    for name, df in out.items():
        df.to_csv(root / f"{name}.csv", index=False)
    return out


def _pandas_cohort(ben: pd.DataFrame, ip: pd.DataFrame) -> pd.DataFrame:
    """Independent reference-semantics cohort (cms_preprocess.py:54-101)."""
    m = ben.merge(ip, on="DESYNPUF_ID", how="inner")
    m["CLM_FROM_DT"] = pd.to_numeric(m["CLM_FROM_DT"], errors="coerce")
    m = m.dropna(subset=["CLM_FROM_DT"])
    m["Year"] = pd.to_datetime(
        m["CLM_FROM_DT"].astype(int).astype(str), format="%Y%m%d"
    ).dt.year
    m = m[(m["Year"] >= YEARS[0]) & (m["Year"] <= YEARS[-1])]
    m = m[m["SP_RA_OA"] == 1]
    m = m[
        ~(
            m["Year"].isin([YEARS[0], YEARS[0] + 1])
            & m["CLM_DRG_CD"].astype(str).isin(["469", "470"])
        )
    ]
    ok = m.groupby("DESYNPUF_ID")["Year"].transform(lambda x: set(x) >= set(YEARS))
    return m[ok]


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
