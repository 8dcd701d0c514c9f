"""Gate-composition validator — the executable form of the rotation
policy (VERDICT r5 item 1: the r5 rotation silently dropped
doc_boilerplate_scrub at position 50 because the check was a comment,
not a test).

The driver records CORRECTNESS rows for exactly the FIRST 50 names in
``__spark_entry__._ordered_names()``; everything here fails a rotation
commit that would push a must-gate query past the cap.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as entry

GATE_CAP = 50


def _correctness_files() -> list[str]:
    """Git-TRACKED CORRECTNESS recordings only (r8 advice): the driver
    drops CORRECTNESS_r{N}.json into the working tree BEFORE the next
    round's rotation can land, so reading untracked files would make
    every record-then-rotate sequence transit a guaranteed-red commit
    state. Falls back to a plain listdir outside a git checkout."""
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    except (OSError, subprocess.CalledProcessError):
        out = [
            f
            for f in os.listdir(REPO)
            if f.startswith("CORRECTNESS_r") and f.endswith(".json")
        ]
    # the index can list a file deleted/renamed in the worktree —
    # filter to what actually exists so the tests fail on their own
    # contracts, not on FileNotFoundError (r9 review)
    return sorted(f for f in out if os.path.exists(os.path.join(REPO, f)))


def test_must_gate_set_is_inside_the_cap():
    gated = entry._ordered_names()[:GATE_CAP]
    missing = [n for n in entry._MUST_GATE if n not in gated]
    assert not missing, (
        f"must-gate queries outside the first {GATE_CAP}: {missing} "
        f"(positions: {[entry._ordered_names().index(n) for n in missing]})"
    )


def test_rotation_lists_are_consistent_with_the_catalog():
    names = list(entry._catalog.QUERIES)
    ordered = entry._ordered_names()
    # rotation lists must not contain stale names or duplicates
    for lst, label in ((entry._EARLY, "_EARLY"), (entry._TAIL, "_TAIL")):
        stale = [n for n in lst if n not in names]
        assert not stale, f"stale names in {label}: {stale}"
        assert len(lst) == len(set(lst)), f"duplicates in {label}"
    assert not set(entry._EARLY) & set(entry._TAIL), "_EARLY/_TAIL overlap"
    # ordering is a permutation of the catalog — nothing silently dropped
    assert sorted(ordered) == sorted(names)


def test_gate_union_across_rounds_plus_this_round_covers_catalog():
    """Every catalog entry either has a green row in some recorded
    round or sits inside this round's first 50 (or is explicitly
    rows-only by design)."""
    covered = set()
    for f in _correctness_files():
        d = json.load(open(os.path.join(REPO, f)))
        covered |= {
            k
            for k, v in d.items()
            if isinstance(v, dict) and v.get("hash_match")
        }
    covered |= set(entry._ordered_names()[:GATE_CAP])
    rows_only = {
        n for n, (_, sql) in entry._catalog.QUERIES.items() if sql is None
    }
    uncovered = set(entry._catalog.QUERIES) - covered - rows_only
    assert not uncovered, f"queries with no driver row and not gated: {uncovered}"


def test_catalog_respects_the_rotation_capacity_ceiling():
    """The 50-seat/2-round freshness contract implies a HARD catalog
    ceiling (VERDICT r11 item 4; derivation NOTES r11): steady-state
    binding load per round is |catalog| − |union of the last two
    rounds' greens| = |catalog| − 100, so seats free for new entries or
    changed-code re-gates = 150 − |catalog|. At 150 the rotation is
    exactly full with ZERO slack — a single changed-code re-gate would
    break the freshness guard. Hold the catalog at ≤147 (3 free
    seats/round): new work beyond that must CONSOLIDATE — one gating
    member per family, derived statistics pytest-grade by documented
    decision (the hll_estimate / cdc_dedup_stats precedent)."""
    assert len(entry._catalog.QUERIES) <= 147, (
        f"catalog has {len(entry._catalog.QUERIES)} entries — past 147 "
        "the 50-seat rotation loses its re-gate slack (see docstring); "
        "consolidate families instead of registering more entries"
    )


def test_rotation_planner_agrees_with_the_freshness_guard():
    """probes/rotation_plan.py automates the next round's seat math; its
    binding set must equal what this file's own freshness recomputation
    implies: every oracle-backed entry NOT green in either of the two
    most recent recorded rounds. A drift between the planner and the
    guard would hand the next rotation a wrong seed."""
    sys.path.insert(0, os.path.join(REPO, "probes"))
    from rotation_plan import compute_plan

    plan = compute_plan(entry)
    by_round: dict[int, set] = {}
    for f in _correctness_files():
        rnd = int(f[len("CORRECTNESS_r"):].split(".")[0])
        d = json.load(open(os.path.join(REPO, f)))
        by_round[rnd] = {
            k
            for k, v in d.items()
            if isinstance(v, dict)
            and v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match")
            and not v.get("err")
        }
    recent = set()
    for rnd in sorted(by_round)[-2:]:
        recent |= by_round[rnd]
    rows_only = {
        n for n, (_f, sql) in entry._catalog.QUERIES.items() if sql is None
    }
    want = set(entry._catalog.QUERIES) - recent - rows_only
    assert set(plan["binding"]) == want
    assert plan["free"] == GATE_CAP - len(want)


def test_demoted_registry_is_disjoint_and_oracle_backed():
    """A name registered in BOTH QUERIES and DEMOTED would gate through
    the driver while the consolidation note claims it's pytest-grade —
    the two registries must stay disjoint. And a demoted entry keeps
    the SAME exact-oracle bar (that's the consolidation contract), so
    sql=None is not allowed there."""
    from slacken_spark.plans.catalog import DEMOTED

    overlap = set(DEMOTED) & set(entry._catalog.QUERIES)
    assert not overlap, f"names in both QUERIES and DEMOTED: {sorted(overlap)}"
    no_oracle = [n for n, (_f, sql) in DEMOTED.items() if sql is None]
    assert not no_oracle, f"demoted entries without an oracle: {no_oracle}"
    # demoted names must also not linger in the rotation lists
    for lst, label in ((entry._EARLY, "_EARLY"), (entry._TAIL, "_TAIL")):
        stale = [n for n in lst if n in DEMOTED]
        assert not stale, f"demoted names in {label}: {stale}"


def test_plan_census_tracks_the_catalog():
    """PLAN_CENSUS.json (the probes/plan_census.py baseline) must name
    exactly the registered entries — registering, renaming, or removing
    a query without regenerating the census would leave the
    plan-regression detector diffing against a stale universe. Key-set
    equality only (no Spark): the SIGNATURES are compared by the probe
    on demand, not in CI, because the iterative contraction entries'
    plans embed a round count that can wobble under co-tenant load
    (see the probe docstring) — a flaky CI red would gate commits on
    host weather."""
    import json

    path = os.path.join(REPO, "PLAN_CENSUS.json")
    assert os.path.exists(path), (
        "PLAN_CENSUS.json missing — run probes/plan_census.py --write"
    )
    census = set(json.load(open(path)))
    registered = set(entry._catalog.QUERIES)
    assert census == registered, (
        f"census out of date — missing {sorted(registered - census)}, "
        f"stale {sorted(census - registered)}; regenerate with "
        "probes/plan_census.py --write"
    )


def test_rolling_green_window_stays_fresh():
    """The freshness guard (VERDICT r7 item 7): union coverage alone
    lets an entry's newest green row age silently — r7 left 34 entries
    two rounds stale. With 50 seats a round and a ~130-entry catalog,
    steady-state rotation re-gates everything within 3 rounds, so the
    enforced bound is: every oracle-backed catalog entry must either
    sit inside THIS round's first 50 or hold a green row in one of the
    TWO most recent recorded rounds. A rotation edit that would let an
    entry fall three rounds stale fails here, at commit time, instead
    of surfacing as a verdict finding."""
    by_round: dict[int, set] = {}
    for f in _correctness_files():
        rnd = int(f[len("CORRECTNESS_r"):].split(".")[0])
        d = json.load(open(os.path.join(REPO, f)))
        by_round[rnd] = {
            k
            for k, v in d.items()
            if isinstance(v, dict)
            and v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match")
            and not v.get("err")
        }
    recent = set()
    for rnd in sorted(by_round)[-2:]:
        recent |= by_round[rnd]
    gated = set(entry._ordered_names()[:GATE_CAP])
    rows_only = {
        n for n, (_, sql) in entry._catalog.QUERIES.items() if sql is None
    }
    stale = set(entry._catalog.QUERIES) - gated - recent - rows_only
    assert not stale, (
        f"entries neither gated this round nor green in the last two "
        f"recorded rounds: {sorted(stale)}"
    )
