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

Known env-sensitivity (observed once at the first census, r12): the
iterative contraction entries (dedup_components_{delta,drop,mixed,
predistinct}) embed the loop's ROUND COUNT in their plan, and one
census taken while the full pytest suite ran in a second JVM read
mixed at 184 shuffle exchanges vs the stable 181 (~one extra
contraction pass). Reproduction attempts: 3× alone, 3× with the
family's cache context, and 3× under a 24-core external CPU burn all
read 181 — pure CPU contention does NOT reproduce it; the residual
suspect is the concurrent JVM's memory pressure perturbing a runtime
decision that feeds the loop's contraction TRAJECTORY (never its
result — outputs are oracle-gated exact regardless of round count).
A DRIFT line on exactly that family with a uniform few-exchange delta
taken beside heavy co-tenant work is that wobble; re-diff on a quiet
host before reading it as a regression.
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
        elif census[name] != base[name]:
            drift = {
                k: (base[name].get(k), census[name].get(k))
                for k in set(base[name]) | set(census[name])
                if base[name].get(k) != census[name].get(k)
            }
            print(f"DRIFT {name}: {drift}")
            fails += 1
    print(f"PLAN CENSUS FAILS: {fails}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
