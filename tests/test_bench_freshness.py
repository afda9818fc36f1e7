"""Bench-artifact freshness (VERDICT r11 'What's wrong' 1 / item 2).

All three committed r11 laps were captured BEFORE the round's final
perf commit, so the evidence tree showed a regression the code had
already fixed. The rule, made mechanical: every bench artifact records
the HEAD sha it was captured at (``git_head``, bench.py), and the
NEWEST committed lap per scale factor must have no engine-source
commits (``orx_surgical_spark/`` or ``bench.py``) after that sha — an
engine change invalidates the standing laps until they are re-captured
at the new HEAD.

Pre-r12 artifacts predate the field and are historical record, not
current evidence; they are exempt (only artifacts carrying ``git_head``
participate).
"""

import json
import os
import subprocess

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
ENGINE_PATHS = ["orx_surgical_spark", "bench.py"]


def _git(*argv: str) -> str:
    out = subprocess.run(
        ["git", *argv], cwd=ROOT, capture_output=True, text=True, timeout=30
    )
    if out.returncode != 0:
        pytest.skip(f"git unavailable for freshness check: {out.stderr[:200]}")
    return out.stdout


def test_newest_committed_lap_per_sf_is_at_engine_head():
    tracked = [
        n for n in _git("ls-files", "BENCH*.json").split() if n.strip()
    ]
    by_sf: dict[float, list[tuple[int, str, str]]] = {}
    for name in tracked:
        with open(os.path.join(ROOT, name)) as f:
            art = json.load(f)
        sha = art.get("git_head")
        if not sha:
            continue  # pre-r12 artifact: historical, exempt
        # capture-time ordering via the recorded sha's commit timestamp
        ts = int(_git("show", "-s", "--format=%ct", sha).strip())
        by_sf.setdefault(float(art.get("sf", -1)), []).append((ts, sha, name))
    if not by_sf:
        pytest.skip("no committed bench artifacts record git_head yet")
    stale = []
    for sf, laps in sorted(by_sf.items()):
        ts, sha, name = max(laps)
        after = _git(
            "log", "--oneline", f"{sha}..HEAD", "--", *ENGINE_PATHS
        ).strip()
        if after:
            stale.append(
                f"sf{sf} lap {name} (captured at {sha[:9]}) predates engine "
                f"commits:\n{after}"
            )
    assert not stale, (
        "stale bench evidence — re-capture these laps at HEAD:\n"
        + "\n".join(stale)
    )
