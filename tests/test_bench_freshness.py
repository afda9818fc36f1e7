"""Bench-artifact freshness (VERDICT r11 'What's wrong' 1 / item 2).

All three committed r11 laps were captured BEFORE the round's final
perf commit, so the evidence tree showed a regression the code had
already fixed. The rule, made mechanical: every bench artifact records
the HEAD sha it was captured at (``git_head``, bench.py), and the
NEWEST committed lap per (scale factor, mode) must have no
engine-source commits (``orx_surgical_spark/`` or ``bench.py``) after
that sha — an engine change invalidates the standing laps until they
are re-captured at the new HEAD. Laps are grouped by ``mode`` too
(r13): an ``--isolate`` sidecar is its own evidence line and must be
fresh, but must not stand in for the full lap at its SF.

Two ADVICE r12 hardenings:

- a nonzero git exit no longer silently skips the whole check — only
  a missing/broken git binary does (probed once via ``rev-parse
  HEAD``); an artifact recording a sha that ``git show`` cannot
  resolve (rebased away, typo) is a FAILURE for that artifact, not a
  skip.
- an artifact recording ``git_dirty: true`` fails outright: a lap
  captured over uncommitted engine edits records a clean-looking
  ``git_head`` while certifying code that is not actually HEAD — the
  exact failure mode this machinery exists to prevent. Artifacts
  predating the field (no ``git_dirty`` key) are historical record
  and exempt, as with ``git_head``.

Pre-r12 artifacts predate ``git_head`` and are historical record, not
current evidence; they are exempt (only artifacts carrying ``git_head``
participate).
"""

import json
import os
import subprocess

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
ENGINE_PATHS = ["orx_surgical_spark", "bench.py"]


def _git_raw(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["git", *argv], cwd=ROOT, capture_output=True, text=True, timeout=30
    )


def _git_available() -> bool:
    try:
        return _git_raw("rev-parse", "HEAD").returncode == 0
    except OSError:
        return False


def _git(*argv: str) -> str:
    """git output, asserting success — by the time this runs the
    availability probe has passed, so a nonzero exit means the QUERY
    failed (e.g. an unresolvable recorded sha) and must surface as a
    test failure, not a skip (ADVICE r12: the old skip-on-any-error
    let one bad artifact disable the whole freshness check)."""
    out = _git_raw(*argv)
    assert out.returncode == 0, (
        f"git {' '.join(argv)} failed: {out.stderr.strip()[:300]}"
    )
    return out.stdout


def _tracked_artifacts() -> list[tuple[str, dict]]:
    names = [
        n
        for pat in ("BENCH*.json", "ISOLATE*.json")
        for n in _git("ls-files", pat).split()
        if n.strip()
    ]
    arts = []
    for name in names:
        with open(os.path.join(ROOT, name)) as f:
            arts.append((name, json.load(f)))
    return arts


def test_newest_committed_lap_per_sf_is_at_engine_head():
    if not _git_available():
        pytest.skip("git unavailable for freshness check")
    by_key: dict[tuple[float, str], list[tuple[int, str, str]]] = {}
    for name, art in _tracked_artifacts():
        sha = art.get("git_head")
        if not sha:
            continue  # pre-r12 artifact: historical, exempt
        # capture-time ordering via the recorded sha's commit timestamp;
        # an unresolvable sha is a hard failure inside _git()
        ts = int(_git("show", "-s", "--format=%ct", sha).strip())
        key = (float(art.get("sf", -1)), str(art.get("mode", "full")))
        by_key.setdefault(key, []).append((ts, sha, name))
    if not by_key:
        pytest.skip("no committed bench artifacts record git_head yet")
    stale = []
    for (sf, mode), laps in sorted(by_key.items()):
        ts, sha, name = max(laps)
        after = _git(
            "log", "--oneline", f"{sha}..HEAD", "--", *ENGINE_PATHS
        ).strip()
        if after:
            stale.append(
                f"sf{sf}/{mode} lap {name} (captured at {sha[:9]}) predates "
                f"engine commits:\n{after}"
            )
    assert not stale, (
        "stale bench evidence — re-capture these laps at HEAD:\n"
        + "\n".join(stale)
    )


def test_no_committed_lap_was_captured_from_a_dirty_tree():
    if not _git_available():
        pytest.skip("git unavailable for freshness check")
    dirty = [
        name
        for name, art in _tracked_artifacts()
        if art.get("git_dirty") is True
    ]
    assert not dirty, (
        "bench artifacts captured over uncommitted engine edits — their "
        f"git_head certifies code that never existed as HEAD: {dirty}"
    )
