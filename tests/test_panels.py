"""Invariants of the driver-facing consolidation layer (queries/panels.py).

Value parity of each panel against its composite DuckDB oracle is
covered by tests/test_oracle_parity.py (panels register in REGISTRY
like any query); here we pin the structural contract: the exposed
surface stays under the driver's ~50-query check window while covering
every registry query exactly once.
"""

from orx_surgical_spark.queries.catalog import REGISTRY, exposed
from orx_surgical_spark.queries.panel_dtypes import PANEL_MEMBER_DTYPES
from orx_surgical_spark.queries.panel_specs import (
    ALL_PANELS,
    EXPOSED_STANDALONE,
    ORACLE_PANELS,
    REGISTRY_INTERNAL,
    ROWS_ONLY_PANELS,
    WRAPPER_COVERED,
)


def test_exposed_fits_driver_window():
    exp = exposed()
    assert len(exp) <= 50, f"driver checks ~50 queries; exposing {len(exp)}"
    assert set(exp) == set(ALL_PANELS) | set(EXPOSED_STANDALONE)


def test_every_registry_query_covered_exactly_once():
    """Each non-panel query is standalone-exposed, in exactly one panel,
    or wrapped by an exposed wrapper (WRAPPER_COVERED: the wrapper
    executes the base query's full plan and value-checks its output
    against a frozen golden) — nothing silently drops out of the
    driver's gate. The only exceptions are the documented quadratic
    exact baselines in REGISTRY_INTERNAL (ground truth for unit tests,
    never exposed)."""
    members: list[str] = [m for ms in ALL_PANELS.values() for m in ms]
    assert len(members) == len(set(members)), "query in two panels"
    wrapped = {w for ws in WRAPPER_COVERED.values() for w in ws}
    covered = set(members) | set(EXPOSED_STANDALONE) | wrapped
    non_panel = {n for n in REGISTRY if "panel" not in REGISTRY[n].tags}
    missing = non_panel - covered - REGISTRY_INTERNAL
    assert not missing, f"queries invisible to the driver: {sorted(missing)}"
    unknown = covered - non_panel
    assert not unknown, f"spec names unregistered queries: {sorted(unknown)}"


def test_wrapper_covered_wrappers_are_exposed_and_wrap_live_plans():
    """A WRAPPER_COVERED entry only counts as coverage if the wrapper
    itself reaches the driver (panel member or standalone) and the
    wrapped base query is not ALSO covered some other way (no double
    counting, no stale mappings)."""
    members = {m for ms in ALL_PANELS.values() for m in ms}
    for wrapper, bases in WRAPPER_COVERED.items():
        assert wrapper in REGISTRY, f"unknown wrapper {wrapper}"
        assert wrapper in members or wrapper in EXPOSED_STANDALONE, (
            f"wrapper {wrapper} never reaches the driver"
        )
        assert REGISTRY[wrapper].oracle, f"wrapper {wrapper} has no oracle"
        for base in bases:
            assert base in REGISTRY, f"unknown wrapped query {base}"
            assert base not in members and base not in EXPOSED_STANDALONE, (
                f"{base} is wrapper-covered AND directly covered"
            )


def test_registry_internal_is_exactly_the_exact_baselines():
    """The internal allowlist can't silently grow: it is exactly the two
    documented all-pairs baselines, they exist in the registry, and they
    are genuinely invisible (not standalone, not in any panel)."""
    assert REGISTRY_INTERNAL == {"embedding_neardup_exact", "ngram_jaccard_pairs"}
    members = {m for ms in ALL_PANELS.values() for m in ms}
    for name in REGISTRY_INTERNAL:
        assert name in REGISTRY, f"{name} not registered"
        assert name not in EXPOSED_STANDALONE
        assert name not in members, f"{name} leaked into a panel"


def test_driver_contract_docs_in_sync():
    """The driver-contract docs (COVERAGE.md header, panel_specs
    docstring, __spark_entry__ docstring) must quote the live counts —
    they drifted for three rounds before this test existed."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    n_exposed = len(exposed())
    n_standalone = len(EXPOSED_STANDALONE)
    n_panels = len(ALL_PANELS)
    n_registry = len(REGISTRY)
    assert n_exposed == n_standalone + n_panels

    # Whitespace-normalized so an innocuous paragraph reflow can't fail
    # the test while the counts are right (ADVICE r5).
    coverage = " ".join((root / "COVERAGE.md").read_text().split())
    assert f"publishes {n_exposed} entries: {n_standalone} standalone" in coverage, (
        f"COVERAGE.md header stale: live counts are {n_exposed} = "
        f"{n_standalone} standalone + {n_panels} panels"
    )
    assert f"{n_panels} composite **panels**" in coverage

    import orx_surgical_spark.queries.panel_specs as specs_mod

    assert f"{n_registry} fine-grained" in (specs_mod.__doc__ or ""), (
        f"panel_specs.py docstring stale: registry has {n_registry} entries"
    )

    entry = (root / "__spark_entry__.py").read_text()
    assert f"of the {n_registry} registry queries" in entry, (
        f"__spark_entry__.py docstring stale: registry has {n_registry} entries"
    )

    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    readme = " ".join((root / "README.md").read_text().split())
    assert f"({n_oracle} of {n_registry} registry entries)" in readme, (
        f"README.md correctness counts stale: {n_oracle} of {n_registry}"
    )
    n_exposed_oracle = sum(1 for q in exposed().values() if q.oracle)
    assert (
        f"all {n_exposed_oracle} driver-exposed entries carry a value-hash"
        in readme
    ), "README.md driver-exposure claim stale"


def test_oracle_panels_have_oracle_members_only():
    for panel, ms in ORACLE_PANELS.items():
        for m in ms:
            assert REGISTRY[m].oracle, f"{panel} member {m} lacks an oracle"
        assert REGISTRY[panel].oracle
    for panel, ms in ROWS_ONLY_PANELS.items():
        assert REGISTRY[panel].oracle is None


def test_dtype_snapshot_covers_all_members():
    members = {m for ms in ALL_PANELS.values() for m in ms}
    assert set(PANEL_MEMBER_DTYPES) >= members


def test_dtype_snapshot_matches_live_schema(spark, sf_dir):
    """The generated snapshot must match each member's live Spark schema
    (cheap drift guard: schemas only, no execution for most plans)."""
    drifted = []
    for panel, ms in ORACLE_PANELS.items():
        for m in ms:
            live = REGISTRY[m].fn(spark, sf_dir).dtypes
            if live != PANEL_MEMBER_DTYPES[m]:
                drifted.append((m, PANEL_MEMBER_DTYPES[m], live))
    assert not drifted, (
        "panel_dtypes.py is stale — rerun scripts/gen_panel_dtypes.py: "
        + "; ".join(f"{m}: {old} -> {new}" for m, old, new in drifted[:3])
    )


def test_member_digest_empty_and_known_values(spark):
    """Digest arithmetic edge cases: an empty member digests to
    (n=0, h1='0', h2='0') — the coalesce path both engines share — and
    a known row digests to the exact md5-chunk sums (hand-computed), so
    the cross-engine contract is pinned against a constant, not just
    engine-vs-engine."""
    import hashlib

    from orx_surgical_spark.queries.panels import member_digest, serialize_tall

    df = spark.createDataFrame([(1, "a")], "id int, s string")
    empty = df.filter("id < 0")
    row = member_digest(empty, "m").collect()[0]
    assert (row.q, row.n, row.h1, row.h2) == ("m", 0, "0", "0")

    one = member_digest(df, "m").collect()[0]
    # canonical string: columns name-sorted -> "1|a"
    canon = serialize_tall(df, "m").collect()[0].r
    assert canon == "1|a"
    h = hashlib.md5(canon.encode()).hexdigest()
    assert one.n == 1
    assert one.h1 == str(int(h[0:15], 16))
    assert one.h2 == str(int(h[16:31], 16))
