"""Attach a ``scaling_vs_sf0.1`` section to an sf1 bench artifact.

The per-query spark/duckdb ratios at sf0.1 are dominated by Spark's
fixed job-scheduling floor (~0.3-0.5 s) over 10-100 ms DuckDB
denominators; re-measuring the same queries at 10x the data shows
whether each gap was floor or plan cost. A falling ratio = floor.

    python scripts/bench_scaling.py BENCH_sf01.json BENCH_sf1_raw.json \
        BENCH_sf1_out.json [--note "..."]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf01")
    ap.add_argument("sf1_raw")
    ap.add_argument("out")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    with open(args.sf01) as f:
        b01 = json.load(f)
    with open(args.sf1_raw) as f:
        b1 = json.load(f)

    queries = {}
    improved = 0
    for name in sorted(b1.get("queries", {})):
        if name not in b01.get("queries", {}):
            continue
        s01, s1 = b01["queries"][name], b1["queries"][name]
        d01 = b01.get("duckdb_s", {}).get(name)
        d1 = b1.get("duckdb_s", {}).get(name)
        entry = {"spark_s_sf0.1": s01, "spark_s_sf1": s1}
        # `is not None` + explicit zero guard: a legitimate 0.0 DuckDB
        # timing must not silently drop the entry (ADVICE r8).
        if d01 is not None and d1 is not None and d01 > 0 and d1 > 0:
            r01 = round(s01 / d01, 2)
            r1 = round(s1 / d1, 2)
            entry.update(
                {
                    "duckdb_s_sf0.1": d01,
                    "duckdb_s_sf1": d1,
                    "ratio_sf0.1": r01,
                    "ratio_sf1": r1,
                    "ratio_improved": r1 < r01,
                }
            )
            improved += r1 < r01
        queries[name] = entry

    b1["scaling_vs_sf0.1"] = {
        "ratio_total_sf0.1": b01.get("ratio_total"),
        "ratio_total_sf1": b1.get("ratio_total"),
        "note": args.note
        or (
            "per-query spark/duckdb ratio at 10x the bench SF: a falling "
            "ratio means the sf0.1 gap was fixed job-scheduling floor, "
            f"not plan cost ({improved}/{len(queries)} fell)."
        ),
        "queries": queries,
    }
    with open(args.out, "w") as f:
        json.dump(b1, f, indent=1)
    print(
        f"wrote {args.out}: ratio_total {b01.get('ratio_total')} (sf0.1) "
        f"-> {b1.get('ratio_total')} (sf1); {improved}/{len(queries)} "
        "per-query ratios improved"
    )


if __name__ == "__main__":
    main()
