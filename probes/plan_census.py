"""Physical-plan census: a structural signature per catalog entry,
diffed against the committed PLAN_CENSUS.json — the plan-REGRESSION
detector the per-entry pins in tests/test_plans.py can't be (they pin
a handful of load-bearing invariants; this catches a new Exchange, a
broadcast silently degrading to sort-merge, or Python appearing in ANY
of the 147 plans).

Signature = node counts over the pre-execution physical plan at
sf0.01 (AdaptiveSparkPlan initial plan — deterministic for a fixed
SF/conf, no runtime re-plan noise): shuffle exchanges, broadcast
exchanges, sort-merge vs broadcast-hash joins, sorts, Arrow kernels
(MapInPandas / FlatMapGroupsInPandas), and per-row Python
(BatchEvalPython — also rejected catalog-wide by test_plans).

Usage:
    python probes/plan_census.py          # diff against committed JSON
    python probes/plan_census.py --write  # regenerate the baseline

Prints per-entry drift lines and a final `PLAN CENSUS FAILS: N`
(N = entries whose signature changed; new/removed entries print as
informational NEW/GONE lines and count as drift only when --strict).
Entries that execute work at plan-build time (streaming drivers,
collect-backed mixes) are signed by their RESULT's plan — the same
frame the driver gates.

Loop-entry normalization (r13, VERDICT r12 item 4): the contraction-
maintenance entries (LOOP_ENTRIES below) compose persisted/memoized
subtrees whose plan STRINGS re-print under every reference, so their
counts are large and scale with the contraction loop's TRAJECTORY —
observed once at r12: a census taken beside a concurrent JVM's memory
pressure read mixed ~one contraction pass higher (a UNIFORM
few-exchange delta; outputs stayed oracle-exact). Signatures are
in-session deterministic (probe: 4 builds × 2 orders, byte-identical),
so the diff for exactly these entries tolerates a uniform proportional
rescale of all nonzero fields (±1 after scaling) and nothing else:
zero fields (python_per_row, nested loops, arrow kernels) stay EXACT,
and a shape change — a broadcast degrading to sort-merge shifts the
field MIX, not the scale — still flags. Tolerated diffs print a
TOLERATED line so they stay visible.

Baselines must be healthy: --write refuses (exit 3) when any entry
errors at plan-build time, and an {"error": ...} entry on either side
of a diff is unconditional drift — a permanently broken entry can
never diff as stable/clean (r12 ADVICE).
"""
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CENSUS_PATH = os.path.join("/root/repo", "PLAN_CENSUS.json")

PATTERNS = {
    # hashpartitioning / rangepartitioning / RoundRobinPartitioning /
    # SinglePartition — the four shuffle-exchange partitionings Spark
    # prints (r12 review: a 'rounds' typo left repartition(n)'s
    # RoundRobinPartitioning invisible, under-counting the baseline)
    "shuffle_exchanges": (
        r"\bExchange (?:hash|range|RoundRobin|SinglePartition)"
    ),
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "sorts": r"\bSort\b(?!MergeJoin)",
    "arrow_kernels": r"\b(?:MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython)\b",
    "python_per_row": r"\bBatchEvalPython\b",
    "aggregates": r"\bHashAggregate\b|\bSortAggregate\b|\bObjectHashAggregate\b",
}


def signature(plan: str) -> dict:
    return {k: len(re.findall(p, plan)) for k, p in PATTERNS.items()}


# Entries whose plan string scales with the contraction loop's
# trajectory (see docstring) — diffed under the uniform-rescale
# tolerance instead of exact equality.
LOOP_ENTRIES = {
    "dedup_components_delta",
    "dedup_components_drop",
    "dedup_components_mixed",
}


def loop_tolerated(base: dict, cur: dict) -> bool:
    """True iff ``cur`` is ``base`` under a uniform proportional rescale
    of the nonzero count fields (±1 per field after scaling) with every
    zero field still exactly zero — the loop-trajectory wobble shape.
    Any field-mix change (broadcast→SMJ, new Python, new nested loop)
    fails."""
    if "error" in base or "error" in cur:
        return False
    keys = set(base) | set(cur)
    if any(
        not isinstance(base.get(k, 0), int) or not isinstance(cur.get(k, 0), int)
        for k in keys
    ):
        return False
    if any(cur.get(k, 0) != 0 for k in keys if base.get(k, 0) == 0):
        return False
    total_b = sum(base.values())
    total_c = sum(cur.values())
    if total_b <= 0 or total_c <= 0:
        return False
    # Exact integer arithmetic: |cur[k] - base[k]*(total_c/total_b)| <= 1
    # rearranged to avoid float rounding at the tolerance boundary
    # (e.g. base[k]*(total_c/total_b) = 222.99999999999997 made an exact
    # proportional rescale read as 1.0000000000000284 > 1.0 and flag).
    return all(
        abs(cur.get(k, 0) * total_b - base[k] * total_c) <= total_b
        for k in keys
        if base.get(k, 0) != 0
    )


def main() -> None:
    write = "--write" in sys.argv
    strict = "--strict" in sys.argv
    from slacken_spark.plans import catalog, load_all
    from slacken_spark.session import get_spark

    load_all()
    spark = get_spark("plan_census")
    census: dict[str, dict] = {}
    for name, (fn, _sql) in catalog.QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            census[name] = signature(plan)
        except Exception as e:  # a census must be total — record the error
            census[name] = {"error": str(e)[:200]}
    if write:
        errs = {n: s["error"] for n, s in census.items() if "error" in s}
        if errs:
            # a baseline holding error entries would diff as stable
            # forever (r12 ADVICE) — refuse to write it
            for n, msg in sorted(errs.items()):
                print(f"ERROR {n}: {msg}")
            print(
                f"REFUSING to write baseline: {len(errs)} entries failed"
                " at plan-build time (fix them first)"
            )
            spark.stop()
            sys.exit(3)
        with open(CENSUS_PATH, "w") as f:
            json.dump(census, f, indent=1, sort_keys=True)
        print(f"wrote {CENSUS_PATH} ({len(census)} entries)")
        spark.stop()
        return
    try:
        base = json.load(open(CENSUS_PATH))
    except FileNotFoundError:
        print("no committed PLAN_CENSUS.json — run with --write first")
        spark.stop()
        sys.exit(2)
    fails = 0
    for name in sorted(set(base) | set(census)):
        if name not in census:
            print(f"GONE {name}")
            fails += strict
        elif name not in base:
            print(f"NEW  {name} {census[name]}")
            fails += strict
        elif "error" in base[name] or "error" in census[name]:
            # identical error strings would otherwise compare stable —
            # an error entry is unconditional drift wherever it appears
            print(
                f"DRIFT {name}: error entry"
                f" (base={base[name].get('error')!r},"
                f" current={census[name].get('error')!r})"
            )
            fails += 1
        elif census[name] != base[name]:
            drift = {
                k: (base[name].get(k), census[name].get(k))
                for k in set(base[name]) | set(census[name])
                if base[name].get(k) != census[name].get(k)
            }
            # an error on either side is unconditional drift (r12
            # ADVICE); loop entries get the uniform-rescale tolerance
            if name in LOOP_ENTRIES and loop_tolerated(base[name], census[name]):
                scale = sum(census[name].values()) / sum(base[name].values())
                print(
                    f"TOLERATED {name}: uniform rescale x{scale:.4f}"
                    f" (loop-trajectory wobble) {drift}"
                )
            else:
                print(f"DRIFT {name}: {drift}")
                fails += 1
    print(f"PLAN CENSUS FAILS: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
