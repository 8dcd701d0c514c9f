"""Rotation planner: recompute every catalog entry's freshest green
driver round from the tracked CORRECTNESS_r*.json files and print the
NEXT round's seat plan — the manual bookkeeping behind each round's
``_MUST_GATE``/``_TAIL`` rewrite, made executable (the same
recomputation the judge performs when auditing seat math).

Prints:
  - the freshness histogram (entries per freshest-green round),
  - the BINDING set for the next round (entries whose freshest green
    row becomes two rounds old the moment this round's file lands —
    they must sit in the next round's first 50),
  - free-seat count (50 − binding), and
  - a ready-to-paste ordered seed for the next ``_MUST_GATE`` (binding
    entries in the current ``_TAIL`` queue order, which preserves the
    promotion-queue discipline) plus the re-promotion queue remainder.

Run AFTER the driver records this round's CORRECTNESS file (it reads
git-tracked files only, mirroring tests/test_gate.py). Purely
read-only — the human still edits __spark_entry__.py; the planner just
removes the arithmetic.
"""
import json
import os
import subprocess
import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

GATE_CAP = 50


def tracked_correctness():
    out = subprocess.run(
        ["git", "ls-files", "CORRECTNESS_r*.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return sorted(f for f in out if os.path.exists(os.path.join(REPO, f)))


def compute_plan(entry):
    """The planner's arithmetic, separated from printing so
    tests/test_gate.py can pin it against an independent recomputation.
    Returns {latest, freshest, binding, free, rows_only}."""
    freshest: dict[str, int] = {}
    rounds = []
    for f in tracked_correctness():
        rnd = int(f[len("CORRECTNESS_r"):].split(".")[0])
        rounds.append(rnd)
        d = json.load(open(os.path.join(REPO, f)))
        for k, v in d.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            ):
                freshest[k] = max(freshest.get(k, -1), rnd)
    latest = max(rounds)
    catalog = list(entry._catalog.QUERIES)
    rows_only = {
        n for n, (_f, sql) in entry._catalog.QUERIES.items() if sql is None
    }
    # binding at r(latest+1): the freshness guard accepts a green row in
    # the TWO most recent recorded rounds, which during r(latest+1) are
    # {latest-1, latest} — so entries whose freshest green row is
    # <= latest-2 must sit inside that round's first 50
    binding = [
        n
        for n in catalog
        if n not in rows_only and freshest.get(n, -1) <= latest - 2
    ]
    # order by the current _TAIL queue (promotion discipline), then
    # catalog order for anything the queue doesn't mention
    queue_pos = {n: i for i, n in enumerate(entry._TAIL)}
    binding.sort(key=lambda n: (queue_pos.get(n, 10_000), catalog.index(n)))
    return {
        "latest": latest,
        "freshest": freshest,
        "binding": binding,
        "free": GATE_CAP - len(binding),
        "rows_only": rows_only,
    }


def main():
    import __spark_entry__ as entry

    plan = compute_plan(entry)
    latest, freshest = plan["latest"], plan["freshest"]
    nxt = latest + 1
    catalog = list(entry._catalog.QUERIES)
    rows_only = plan["rows_only"]
    hist: dict[int, int] = {}
    for n in catalog:
        if n in rows_only:
            continue
        hist[freshest.get(n, -1)] = hist.get(freshest.get(n, -1), 0) + 1
    print(f"latest recorded round: r{latest}; planning r{nxt}")
    print("freshness histogram (freshest green round -> entries):")
    for rnd in sorted(hist, reverse=True):
        label = f"r{rnd}" if rnd >= 0 else "NEVER GREEN"
        print(f"  {label}: {hist[rnd]}")
    binding = plan["binding"]
    never = [n for n in binding if freshest.get(n, -1) < 0]
    if never:
        print(f"WARNING: entries with NO green row anywhere: {never}")
    free = plan["free"]
    print(f"\nbinding at r{nxt}: {len(binding)} entries; free seats: {free}")
    if free < 0:
        print(
            "ERROR: binding set exceeds the 50-seat cap — the freshness"
            " guard WILL fail; consolidate entries before rotating"
        )
    print("\n_MUST_GATE seed (binding, in promotion-queue order):")
    for n in binding:
        print(f'    "{n}",')
    rest = [
        n
        for n in entry._TAIL + [q for q in entry._EARLY if q not in entry._TAIL]
        if n not in set(binding)
    ]
    print(f"\n_TAIL remainder seed ({len(rest)} entries, current order):")
    for n in rest[:5]:
        print(f'    "{n}",')
    print(f"    ... ({len(rest) - 5} more — full list with --full)")
    if "--full" in sys.argv:
        for n in rest[5:]:
            print(f'    "{n}",')
    sys.exit(1 if free < 0 else 0)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` is a normal way to use this
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        sys.exit(0)
