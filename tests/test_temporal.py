"""Temporal join semantics the oracle query doesn't isolate: as-of tie
matching, no-prior-match nulls, and range-join bucket boundaries."""

from pyspark.sql import functions as F

from orx_surgical_spark.operators.temporal import asof_join, range_join_pairs


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in df.dtypes:
        if c == "ts" and t == "string":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def test_asof_matches_latest_prior_and_ties(spark):
    left = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "L1"),
         (1, "2024-01-01 12:00:00", "L2"),
         (2, "2024-01-01 09:00:00", "L3")],
        "k long, ts string, lid string",
    )
    right = _ts(
        spark,
        [(1, "2024-01-01 09:30:00", 10.0),
         (1, "2024-01-01 10:00:00", 20.0),   # tie with L1 -> matches
         (1, "2024-01-01 11:00:00", 30.0),
         (2, "2024-01-01 09:30:00", 99.0)],  # after L3 -> no match
        "k long, ts string, v double",
    )
    out = {
        r["lid"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out == {"L1": 20.0, "L2": 30.0, "L3": None}


def test_range_join_boundary_inclusive_and_cross_bucket(spark):
    df = _ts(
        spark,
        [(1, 100, "2024-01-01 10:00:00"),
         (1, 101, "2024-01-01 10:05:00"),   # exactly 300s -> included
         (1, 102, "2024-01-01 10:09:59"),   # 299s from 101 (crosses bucket)
         (1, 103, "2024-01-01 11:00:00"),   # far from all
         (2, 104, "2024-01-01 10:00:30")],  # other key
        "user_id long, event_id long, ts string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["gap_seconds"]
        for r in range_join_pairs(
            df, key="user_id", ts="ts", id_col="event_id", max_gap_seconds=300
        ).collect()
    }
    assert pairs == {(100, 101): 300, (101, 102): 299}


def test_range_join_finds_pairs_regardless_of_id_order(spark):
    # later event has the SMALLER id: the canonicalization must still
    # surface the pair exactly once
    df = _ts(
        spark,
        [(1, 200, "2024-01-01 10:04:00"),
         (1, 50, "2024-01-01 10:05:00")],
        "user_id long, event_id long, ts string",
    )
    rows = range_join_pairs(
        df, key="user_id", ts="ts", id_col="event_id", max_gap_seconds=300
    ).collect()
    assert len(rows) == 1
    assert (rows[0]["id_a"], rows[0]["id_b"]) == (50, 200)

def test_asof_duplicate_ts_deterministic_with_tiebreak(spark):
    """Duplicate right rows at the same (key, ts): with ``tiebreak`` the
    greatest-tiebreak duplicate must win, for every value column from
    the same winning row, regardless of input partitioning."""
    left = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "L1")],
        "k long, ts string, lid string",
    )
    dup_rows = [
        (1, "2024-01-01 09:00:00", 10.0, "a", 1),
        (1, "2024-01-01 09:00:00", 20.0, "b", 3),  # greatest seq -> wins
        (1, "2024-01-01 09:00:00", 30.0, "c", 2),
    ]
    right = _ts(spark, dup_rows, "k long, ts string, v double, tag string, seq int")
    for n_parts in (1, 3, 7):
        out = asof_join(
            left,
            right.repartition(n_parts),
            on="k",
            left_ts="ts",
            right_ts="ts",
            value_cols=["v", "tag"],
            tiebreak="seq",
        ).collect()
        assert len(out) == 1
        assert (out[0]["asof_v"], out[0]["asof_tag"]) == (20.0, "b"), (
            f"partitioning {n_parts}: tie-break not deterministic"
        )


def test_asof_null_in_winning_row_stays_null(spark):
    """ADVICE r5: when the greatest-tiebreak duplicate holds NULL in a
    value column, that NULL must be carried — a per-column last() would
    fall back to a losing duplicate's (or an earlier row's) non-null
    value, silently mixing rows. The struct carrier makes the winning
    row atomic."""
    left = _ts(
        spark,
        [(1, "2024-01-01 10:00:00", "L1")],
        "k long, ts string, lid string",
    )
    right = _ts(
        spark,
        [
            (1, "2024-01-01 08:00:00", 5.0, "old", 1),
            (1, "2024-01-01 09:00:00", 10.0, "a", 1),
            (1, "2024-01-01 09:00:00", None, "b", 3),  # wins, v is NULL
        ],
        "k long, ts string, v double, tag string, seq int",
    )
    for n_parts in (1, 3):
        out = asof_join(
            left,
            right.repartition(n_parts),
            on="k",
            left_ts="ts",
            right_ts="ts",
            value_cols=["v", "tag"],
            tiebreak="seq",
        ).collect()
        assert len(out) == 1
        assert out[0]["asof_tag"] == "b"
        assert out[0]["asof_v"] is None, (
            "NULL in the winning row must not fall back to another row"
        )


def test_asof_tiebreak_unknown_column_raises(spark):
    import pytest as _pytest

    left = _ts(spark, [(1, "2024-01-01 10:00:00")], "k long, ts string")
    right = _ts(spark, [(1, "2024-01-01 09:00:00", 1.0)], "k long, ts string, v double")
    with _pytest.raises(ValueError, match="tiebreak"):
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], tiebreak="nope",
        )


def test_merge_intervals_union_semantics(spark):
    """Overlap, touch, containment, disjoint, and duplicate intervals:
    the union must produce maximal disjoint periods per key."""
    from orx_surgical_spark.operators.temporal import merge_intervals

    rows = [
        # u1: [0,10) [5,20) touch [20,30) -> one period [0,30);
        #     [50,60) disjoint -> second period
        (1, 0, 10), (1, 5, 20), (1, 20, 30), (1, 50, 60),
        # u2: containment + duplicate
        (2, 0, 100), (2, 10, 20), (2, 0, 100),
        # u3: single
        (3, 7, 8),
    ]
    df = spark.createDataFrame(rows, "k int, s long, e long")
    got = sorted(
        (r.k, r.period_start, r.period_end)
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [(1, 0, 30), (1, 50, 60), (2, 0, 100), (3, 7, 8)]


def test_merge_intervals_single_shuffle_plan(spark):
    """Both window passes and the closing aggregate share the key
    partitioning: exactly ONE Exchange in the plan, and every
    windowspecdefinition is key-partitioned."""
    from orx_surgical_spark.operators.temporal import merge_intervals
    from orx_surgical_spark.plans import plan_str

    df = spark.createDataFrame([(1, 0, 1)], "k int, s long, e long")
    plan = plan_str(merge_intervals(df, "k", "s", "e"))
    # one Exchange: the two windows share the (k) sort, and the closing
    # groupBy(k, grp) is satisfied by the existing hash-partitioning on
    # k (a superset-key aggregate needs no re-shuffle).
    tree_nodes = [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and ") Exchange" in l
    ]
    assert len(tree_nodes) == 1, plan
    specs = [l for l in plan.splitlines() if "windowspecdefinition(" in l]
    assert specs and all("windowspecdefinition(k#" in s for s in specs), specs
