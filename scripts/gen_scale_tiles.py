"""Tile the driver's sf0.1 parquet into an sf1-scale probe dataset.

The driver generates sf{0.001,0.01,0.1} only, but the engineering
question the soak exists to answer is 100x-the-graded-scale behavior
(VERDICT r5 item 5 asks for an sf1 run). This script builds that probe
INPUT by tiling sf0.1 ten times with FK-consistent key offsets —
replica k's keys shift by k * (max_key + 1) per key family, so joins
resolve within a replica and every FK keeps exactly its original
fan-out. Non-key columns are untouched; region/nation are shared
dimensions and are not replicated (supplier.s_nationkey stays valid).

This is a SCALE probe, not a correctness input: the graded correctness
gates run only on the driver's own parquet (sf0.01), and the output
lives under ``.scale/`` (gitignored — only the soak JSON artifact is
committed).

Deliberate semantic notes:
- documents/text repeats across replicas, so the dedup tier sees a
  corpus that is ~90% near-duplicate — the realistic stress case for
  the LSH ladder, and the reason dedup row counts stay ~constant
  while inputs grow 10x.
- embeddings repeat; the ANN queries keep their replica-0 query set
  (vec_id < 10) against a 10x corpus.

Usage::

    python scripts/gen_scale_tiles.py [--src /root/testdata/sf0.1]
                                      [--out /root/repo/.scale/sf1]
                                      [--tiles 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# key column -> offset family; every column in a family shifts by the
# same stride (max+1 of the family's defining column at the source SF).
FAMILIES: dict[str, list[tuple[str, str]]] = {
    # family: [(table, column), ...]; first entry defines the stride
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}

SHARED_DIMS = ("region", "nation")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", ".scale", "sf1"))
    ap.add_argument("--tiles", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.src}/{t}.parquet')"
        )

    strides: dict[tuple[str, str], int] = {}
    for family, cols in FAMILIES.items():
        t0, c0 = cols[0]
        stride = con.execute(f"SELECT MAX({c0}) + 1 FROM {t0}").fetchone()[0]
        for t, c in cols:
            strides[(t, c)] = stride

    for t in TABLES:
        dest = os.path.join(args.out, f"{t}.parquet")
        if t in SHARED_DIMS:
            con.execute(f"COPY (SELECT * FROM {t}) TO '{dest}' (FORMAT PARQUET)")
            print(f"{t}: shared dim, copied as-is")
            continue
        # One FILE PER TILE under a directory named <table>.parquet
        # (spark.read.parquet handles the directory transparently): a
        # single monolithic file caps the scan at file-size/4MB splits
        # — the first sf1 soak attempt trained the RF on 3 cores
        # because of exactly that. Many files is also the layout real
        # datasets actually have.
        os.makedirs(dest, exist_ok=True)
        cols = [d[0] for d in con.execute(f"DESCRIBE {t}").fetchall()]
        for k in range(args.tiles):
            exprs = []
            for c in cols:
                stride = strides.get((t, c))
                if stride is not None:
                    exprs.append(f"{c} + {k} * {stride} AS {c}")
                else:
                    exprs.append(c)
            con.execute(
                f"COPY (SELECT {', '.join(exprs)} FROM {t}) TO "
                f"'{dest}/tile-{k:02d}.parquet' (FORMAT PARQUET)"
            )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dest}/*.parquet')"
        ).fetchone()[0]
        print(f"{t}: tiled x{args.tiles} -> {n} rows in {args.tiles} files")


if __name__ == "__main__":
    main()
