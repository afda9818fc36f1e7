"""Attach a ``scaling_vs_<base>`` section to a larger-SF bench artifact.

The per-query spark/duckdb ratios at sf0.1 are dominated by Spark's
fixed job-scheduling floor (~0.3-0.5 s) over 10-100 ms DuckDB
denominators; re-measuring the same queries at a larger SF shows
whether each gap was floor or plan cost. A falling ratio = floor.

    python scripts/bench_scaling.py BENCH_sf01.json BENCH_sf1_raw.json \
        BENCH_sf1_out.json [--base-label sf0.1] [--target-label sf1] \
        [--note "..."]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("target_raw")
    ap.add_argument("out")
    ap.add_argument("--base-label", default="sf0.1")
    ap.add_argument("--target-label", default="sf1")
    ap.add_argument("--note", default="")
    args = ap.parse_args()
    lo, hi = args.base_label, args.target_label

    with open(args.base) as f:
        b01 = json.load(f)
    with open(args.target_raw) as f:
        b1 = json.load(f)

    queries = {}
    improved = 0
    for name in sorted(b1.get("queries", {})):
        if name not in b01.get("queries", {}):
            continue
        s01, s1 = b01["queries"][name], b1["queries"][name]
        d01 = b01.get("duckdb_s", {}).get(name)
        d1 = b1.get("duckdb_s", {}).get(name)
        entry = {f"spark_s_{lo}": s01, f"spark_s_{hi}": s1}
        # `is not None` + explicit zero guard: a legitimate 0.0 DuckDB
        # timing must not silently drop the entry (ADVICE r8).
        if d01 is not None and d1 is not None and d01 > 0 and d1 > 0:
            r01 = round(s01 / d01, 2)
            r1 = round(s1 / d1, 2)
            entry.update(
                {
                    f"duckdb_s_{lo}": d01,
                    f"duckdb_s_{hi}": d1,
                    f"ratio_{lo}": r01,
                    f"ratio_{hi}": r1,
                    "ratio_improved": r1 < r01,
                }
            )
            improved += r1 < r01
        queries[name] = entry

    b1[f"scaling_vs_{lo}"] = {
        f"ratio_total_{lo}": b01.get("ratio_total"),
        f"ratio_total_{hi}": b1.get("ratio_total"),
        "note": args.note
        or (
            f"per-query spark/duckdb ratio at {hi} vs {lo}: a falling "
            f"ratio means the {lo} gap was fixed job-scheduling floor, "
            f"not plan cost ({improved}/{len(queries)} fell)."
        ),
        "queries": queries,
    }
    with open(args.out, "w") as f:
        json.dump(b1, f, indent=1)
    print(
        f"wrote {args.out}: ratio_total {b01.get('ratio_total')} ({lo}) "
        f"-> {b1.get('ratio_total')} ({hi}); {improved}/{len(queries)} "
        "per-query ratios improved"
    )


if __name__ == "__main__":
    main()
