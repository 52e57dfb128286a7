"""Registry-integrity guards (VERDICT r06 item #4).

The f42 incident (fixed in a1a931a): a later module-level re-definition of
``chunk_documents`` in operators/text.py silently shadowed the builder an
existing @graded closure resolved by global name lookup — the registry's
duplicate-*name* check cannot see it because the graded name never changed,
only the function it eventually called.  These tests make that class of
regression fail fast without relying on the affected query happening to be
in a behavioral test.
"""

from __future__ import annotations

import ast
import pathlib

import pulsar_message_filter_spark.registry as registry

_PKG = pathlib.Path(registry.__file__).resolve().parent


def _module_files():
    return sorted(_PKG.rglob("*.py"))


def test_no_duplicate_toplevel_definitions():
    """No module may define the same top-level function/class twice.

    A duplicate top-level ``def`` is exactly the shadowing shape that broke
    f42_doc_chunking: Python silently rebinds the module global, so every
    closure that looks the name up late gets the NEW body.  There is no
    legitimate duplicate in this package (conditional try/except fallbacks
    live in nested scopes), so any hit is a bug.
    """
    offenders = []
    for path in _module_files():
        seen: dict[str, int] = {}
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if node.name in seen:
                    offenders.append(
                        f"{path.relative_to(_PKG.parent)}:{node.lineno} "
                        f"re-defines {node.name!r} (first at line "
                        f"{seen[node.name]})"
                    )
                seen[node.name] = node.lineno
    assert not offenders, "top-level shadowing detected:\n" + "\n".join(offenders)


def test_graded_fns_are_distinct_objects():
    """Every graded name must map to its own function object.

    Two names sharing one fn means a registration raced a rebind (or a
    copy-paste registered the same builder twice under different names).
    """
    graded = registry.all_graded()
    by_id: dict[int, list[str]] = {}
    for name, g in graded.items():
        by_id.setdefault(id(g.fn), []).append(name)
    dupes = {id_: names for id_, names in by_id.items() if len(names) > 1}
    assert not dupes, f"graded names sharing one fn object: {list(dupes.values())}"


def test_verified_sets_consistent_with_registry():
    """_DRIVER_VERIFIED / _LOCALLY_VERIFIED must reference real names and
    stay disjoint — a rotation paste error would otherwise corrupt the
    window ordering silently."""
    graded = set(registry.all_graded())
    drv = registry._DRIVER_VERIFIED
    loc = registry._LOCALLY_VERIFIED
    assert drv <= graded, f"stale driver-verified names: {sorted(drv - graded)}"
    assert loc <= graded, f"stale locally-verified names: {sorted(loc - graded)}"
    assert not (drv & loc), f"names in both sets: {sorted(drv & loc)}"


def test_window_holds_least_evidenced_oracle_checked_names():
    """The first 50 entries of queries() (the driver's graded window) must
    be never-driver-graded; while oracle-checked debt remains, the window
    must prefer oracle-checked names over rows-only ones."""
    graded = registry.all_graded()
    names = list(graded)
    drv = registry._DRIVER_VERIFIED
    window = names[:50]
    # Driver-verified names may appear in the window ONLY as fillers once
    # every never-driver-graded name already fits (end-game state: fewer
    # than 50 unverified names remain).
    unverified = [n for n in names if n not in drv]
    if len(unverified) >= 50:
        assert not [n for n in window if n in drv], "driver-verified name in window"
    else:
        assert set(unverified) <= set(window), (
            "never-driver-graded names pushed out of the window by "
            "driver-verified fillers"
        )
    debt = [n for n in names if n not in drv and graded[n].oracle is not None]
    expected_oracle_slots = min(50, len(debt))
    actual = sum(1 for n in window if graded[n].oracle is not None)
    assert actual >= expected_oracle_slots, (
        f"window wastes slots on rows-only names while {len(debt)} "
        f"oracle-checked names remain unverified"
    )


def test_verified_round_map_consistent():
    """Every _DRIVER_VERIFIED_ROUND entry must reference a real graded name
    with a plausible round number, and _DRIVER_VERIFIED must be exactly its
    key view — a rotation paste error would otherwise corrupt the window
    ordering silently."""
    graded = set(registry.all_graded())
    rounds = registry._DRIVER_VERIFIED_ROUND
    assert set(rounds) <= graded, f"stale names: {sorted(set(rounds) - graded)}"
    assert all(isinstance(r, int) and r >= 1 for r in rounds.values())
    assert registry._DRIVER_VERIFIED == frozenset(rounds)


def test_window_regrades_stalest_evidence_first():
    """Evidence-freshness policy (round 9): once every name carries driver
    evidence, the window's driver-verified fillers must be exactly the
    names whose last green round is OLDEST — no name's evidence may sit
    behind a fresher name's re-grade."""
    graded = registry.all_graded()
    names = list(graded)
    rounds = registry._DRIVER_VERIFIED_ROUND
    window = [n for n in names[:50] if n in rounds]
    if not window:
        return  # pure verification-debt window: nothing to check
    outside = [n for n in names[50:] if n in rounds]
    max_in = max(rounds[n] for n in window)
    min_out = min((rounds[n] for n in outside), default=max_in)
    assert max_in <= min_out, (
        f"window re-grades round-{max_in} evidence while round-{min_out} "
        "names wait outside"
    )
