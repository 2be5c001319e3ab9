"""Driver-window rotation gate (VERDICT r7 directive 5): the rule
that every entry needing a fresh driver record is registered within
the first 50 of ``queries()`` must not depend on builder memory.

``tools/rotation.py`` computes, from git history alone (diff against
the driver's last ``round N:`` seal commit) plus a static AST
dependency analysis, which entries are unproven (P0) or stale-proven
(P1). This test fails the suite when the registration order violates
the priority rule."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rotation import WINDOW, analyze, window_violations  # noqa: E402


def test_driver_window_priority_order():
    """The window fills strictly by class — P0 (never proven), P0b
    (rotated out of the latest record), P1 (changed since the seal),
    P2 (proven + unchanged) — and every never-proven entry fits.

    Only the P0 property hard-fails: a never-driver-proven entry
    outside the window has NO record anywhere, so shipping that
    ordering loses proof coverage outright. P0b/P1 ordering
    violations are the normal state of the tree the moment the
    driver drops the new round's CORRECTNESS record (the "latest
    record" shifts and reclassifies everything), so they surface as
    warnings demanding the mechanical re-rotation — not as a suite
    failure that precedes any code defect (ADVICE r8)."""
    import warnings

    a = analyze()
    window = set(a["order"][:WINDOW])
    missing = set(a["p0"]) - window
    assert not missing, f"never-proven entries outside the window: {sorted(missing)}"
    assert len(a["p0"]) <= WINDOW, (
        f"{len(a['p0'])} never-proven entries cannot fit the {WINDOW}-slot window"
    )
    for v in window_violations(a):
        warnings.warn(f"rotation pending: {v}", stacklevel=1)


def test_rotation_analysis_is_sound():
    """Sanity on the analyzer itself: every entry classified exactly
    once, and the dependency extraction sees through module aliases
    and helper calls (search entries must map to the query module;
    token_budget_pack must transitively reach util.py via
    sampling.py)."""
    from tools.rotation import _EntryAnalyzer, _closure, package_import_graph

    a = analyze()
    assert sorted(a["p0"] + a["p0b"] + a["p1"] + a["p2"]) == sorted(a["order"])

    src = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py")
    ).read()
    an = _EntryAnalyzer(src)
    graph = package_import_graph()
    deps = _closure(an.entry_modules("q_search_term"), graph)
    assert "toshokan_spark.query" in deps, deps
    deps = _closure(an.entry_modules("q_token_budget_pack"), graph)
    assert "toshokan_spark.operators.sampling" in deps
    assert "toshokan_spark.operators.util" in deps, (
        "transitive closure lost sampling.py -> util.py"
    )
