"""Deterministic CMS-shaped fixture generation (FIXTURES.md §1) and
the independent pandas re-implementation of the reference cohort
semantics, shared by the pipeline golden tests and the model parity
tests."""

from __future__ import annotations

import numpy as np
import pandas as pd

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


