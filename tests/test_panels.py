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
    ROWS_ONLY_PANELS,
)


def test_exposed_fits_driver_window():
    exp = exposed()
    assert len(exp) <= 50, f"driver checks ~50 queries; exposing {len(exp)}"
    assert set(exp) == set(ALL_PANELS) | set(EXPOSED_STANDALONE)


def test_every_registry_query_covered_exactly_once():
    """Each non-panel query is either standalone-exposed or in exactly
    one panel — nothing silently drops out of the driver's gate."""
    members: list[str] = [m for ms in ALL_PANELS.values() for m in ms]
    assert len(members) == len(set(members)), "query in two panels"
    covered = set(members) | set(EXPOSED_STANDALONE)
    non_panel = {n for n in REGISTRY if "panel" not in REGISTRY[n].tags}
    missing = non_panel - covered
    assert not missing, f"queries invisible to the driver: {sorted(missing)}"
    unknown = covered - non_panel
    assert not unknown, f"spec names unregistered queries: {sorted(unknown)}"


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
