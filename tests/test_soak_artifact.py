"""Soak artifact hygiene (VERDICT r6 'What's wrong' 3): a red probe
run must never silently replace green committed scale evidence."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "soak",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "soak.py"),
)
soak = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(soak)


def test_green_run_writes_to_requested_path():
    assert soak.artifact_path("SOAK.json", 0, False) == "SOAK.json"
    assert soak.artifact_path("SOAK.json", 0, True) == "SOAK.json"


def test_red_run_is_diverted_unless_forced():
    assert soak.artifact_path("SOAK.json", 3, False) == "SOAK.json.failed.json"
    assert soak.artifact_path("SOAK.json", 3, True) == "SOAK.json"


def test_committed_soak_artifacts_cited_as_evidence_are_green():
    """Doc-sync (VERDICT r6 item 8): any SOAK_*.json committed at the
    repo root is presented as scale evidence — none may contain
    failures. A red run belongs in *.failed.json (gitignored history),
    not in the evidence tree."""
    import json

    root = os.path.join(os.path.dirname(__file__), "..")
    for name in sorted(os.listdir(root)):
        if (
            name.startswith("SOAK_")
            and name.endswith(".json")
            # a *.failed.json is the DIVERSION target — it exists
            # precisely to hold a red run without posing as evidence
            # (gitignored; advisor r10 low finding)
            and not name.endswith(".failed.json")
        ):
            with open(os.path.join(root, name)) as f:
                art = json.load(f)
            assert art.get("n_failures") == 0, (
                f"{name} is red (n_failures={art.get('n_failures')}): "
                "a failing artifact must not be committed as evidence"
            )


def test_committed_soak_artifacts_respect_exposed_row_bound():
    """VERDICT r11 item 6: the exposure layer must stay O(1)-ish — the
    soak fails any exposed entry collecting more than its row bound,
    and committed artifacts that RECORD the bound must also respect it
    (older artifacts predate the field and are exempt; the enforcement
    for new evidence is soak.py's rowbound/<name> failure, which the
    green-artifact test above already rejects)."""
    import json

    root = os.path.join(os.path.dirname(__file__), "..")
    for name in sorted(os.listdir(root)):
        if (
            name.startswith("SOAK_")
            and name.endswith(".json")
            and not name.endswith(".failed.json")
        ):
            with open(os.path.join(root, name)) as f:
                art = json.load(f)
            bound = art.get("row_bound")
            if bound is None:
                continue
            # The bound governs the EXPOSED surface: derive the max from
            # the per-entry rows of un-prefixed keys (gate/, drift/,
            # recall/, late/ are auxiliary reads — a drift golden
            # legitimately collects its full frozen relation, 200k rows
            # at sf10). Older artifacts without a queries dict fall back
            # to the summary field.
            qs = art.get("queries") or {}
            exposed_rows = [
                v.get("rows", 0)
                for k, v in qs.items()
                if "/" not in k and isinstance(v, dict)
            ]
            observed = (
                max(exposed_rows)
                if exposed_rows
                else art.get("memory_attribution", {}).get(
                    "max_collected_rows", 0
                )
            )
            assert observed <= bound, (
                f"{name}: max exposed-entry rows {observed} exceed the "
                f"exposed-surface bound {bound}"
            )


def test_err_summary_keeps_root_cause_head_and_causal_chain():
    """VERDICT r10 item 3: the sf10 failure artifact held only the tail
    of a Java stack (thread-pool frames); the summary must keep the
    exception head and the Caused-by chain instead."""
    java_stack = (
        "An error occurred while calling o123.collectToPython.\n"
        ": org.apache.spark.SparkException: Job aborted due to stage "
        "failure: Task 3 in stage 7.0 failed 1 times\n"
        + "\tat filler.Frame.run(Frame.java:1)\n" * 200
        + "Caused by: java.lang.OutOfMemoryError: Java heap space\n"
        + "\tat java.base/java.util.concurrent.ThreadPoolExecutor"
        ".runWorker(ThreadPoolExecutor.java:1136)\n"
    )
    try:
        raise RuntimeError(java_stack)
    except RuntimeError as exc:
        s = soak.err_summary(exc)
    assert "Job aborted due to stage failure" in s
    assert "Caused by: java.lang.OutOfMemoryError" in s
    assert len(s) <= 2400


def test_readme_cited_soak_artifacts_exist_and_are_green():
    """Every SOAK_*.json the README cites must exist and be green —
    the r6 failure mode was exactly a red artifact sitting behind a
    green claim."""
    import json
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "README.md")) as f:
        cited = set(re.findall(r"SOAK_\w+\.json", f.read()))
    assert cited, "README no longer documents the soak evidence"
    for name in sorted(cited):
        path = os.path.join(root, name)
        assert os.path.exists(path), f"README cites missing artifact {name}"
        with open(path) as f:
            art = json.load(f)
        assert art.get("n_failures") == 0, f"README cites red artifact {name}"
