#!/usr/bin/env python
"""Benchmark harness: runs the catalog's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized with a noop-format write (full plan executes,
nothing is collected to the driver, no column pruning shortcut like
count() would take).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _loadavg():
    try:
        return round(os.getloadavg()[0], 2)
    except (OSError, AttributeError):
        return None


# ---------------------------------------------------------------------------
# External-CPU attribution (the r11 burst detector). The 1-min loadavg
# cannot tell the bench's OWN local[32] work from an external burst —
# the first absolute-threshold cut marked 85/144 queries hot on a quiet
# host because the bench itself drives the load to 6-9 mid-run. The
# exact signal is /proc arithmetic over each query's own measurement
# window: external busy jiffies = (all-CPU busy delta) − (our process
# SUBTREE's delta, python driver + the Spark JVM + its python workers,
# reaped children included via cutime/cstime). Zero timing overhead —
# two /proc sweeps (~ms) bracketing work that is being timed anyway.
# ---------------------------------------------------------------------------

try:
    _CLK_TCK = os.sysconf("SC_CLK_TCK")
except (OSError, AttributeError, ValueError):
    _CLK_TCK = None


def _proc_snapshot():
    """(total busy jiffies across all CPUs, {pid: (ppid, jiffies)})
    where jiffies = utime+stime+cutime+cstime (self + reaped children
    — each reaped descendant lands exactly once, in its reaper's
    cutime). None when /proc is unavailable."""
    if _CLK_TCK is None:
        return None
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        busy = sum(vals) - vals[3] - vals[4]  # minus idle + iowait
        procs = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    s = f.read()
            except OSError:
                continue  # process exited mid-sweep
            rest = s[s.rindex(")") + 2:].split()  # comm may hold spaces
            procs[int(d)] = (
                int(rest[1]),
                int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14]),
            )
        return busy, procs
    except OSError:
        return None


def _subtree_jiffies(procs: dict) -> int:
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        total += procs[p][1]
        stack.extend(kids.get(p, []))
    return total


def _external_cores(snap0, snap1, dt: float) -> float | None:
    """Average EXTERNAL cores busy over the window — the burst signal.
    None when /proc attribution is unavailable (detector off)."""
    if snap0 is None or snap1 is None or dt <= 0:
        return None
    ext = (snap1[0] - snap0[0]) - (
        _subtree_jiffies(snap1[1]) - _subtree_jiffies(snap0[1])
    )
    return max(0.0, ext / _CLK_TCK / dt)


def _measure(name, fn, n_runs, spark, sf_dir, ext_max, timings, hot, cold):
    """min-of-n timing; a query stays `hot` until at least one run
    executes with external CPU below ext_max (or the detector is
    unavailable — which never requeues). A FAILURE only clears the hot
    annotation when no timing was ever recorded: if a prior successful
    run's min is contaminated (the reason the query was requeued), the
    annotation must survive the failed re-measure so the JSON doesn't
    report a burst-inflated timing as clean (r11 advice).

    ``cold`` records each entry's FIRST-ever run wall time: for the
    maintenance entries whose first invocation builds an app-scoped
    stored-table stand-in (dedup/_base_pairs, genomic index, ...), the
    min structurally excludes that build cost — the cold number makes
    it attributable instead of invisible (r13 verdict item 3)."""
    best = timings.get(name, -1.0)
    if name not in timings:
        hot.add(name)
    try:
        for _ in range(n_runs):
            snap0 = _proc_snapshot()
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            elapsed = time.perf_counter() - start
            ext = _external_cores(snap0, _proc_snapshot(), elapsed)
            if name not in cold:
                cold[name] = round(elapsed, 3)
            best = elapsed if best < 0 else min(best, elapsed)
            if ext is None or ext <= ext_max:
                hot.discard(name)
    except Exception as e:  # record failures as negative sentinel
        print(f"bench: {name} FAILED: {e}", file=sys.stderr)
        if best < 0:
            best = -1.0  # a pre-failure min is still evidence
            hot.discard(name)
    timings[name] = round(best, 3)


def main() -> None:
    # Load-gated start (r9 lesson: a file recorded at host load ~3 cost
    # a round of regression adjudication on unchanged code): when an
    # EXTERNAL burst is running at startup, wait — bounded — for the
    # 1-min load to drop below SPARK_GRAFT_LOAD_MAX before timing, so
    # the committed JSON is clean evidence rather than burst-annotated.
    # The wait and the pre-wait load are recorded either way; a burst
    # arriving MID-run is still visible via load_avg_end.
    load_pre_wait = _loadavg()
    # default scales with the host: 5% of the cores, floored at 1.0 —
    # a flat 1.0 on a big box would burn the whole wait budget on
    # ambient daemon load the bench wouldn't even notice
    default_max = max(1.0, 0.05 * (os.cpu_count() or 1))
    load_max = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", str(default_max)))
    wait_budget = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "300"))
    waited = 0.0
    while (
        load_pre_wait is not None
        and waited < wait_budget
        and (_loadavg() or 0.0) > load_max
    ):
        if waited == 0.0:
            print(
                f"bench: host load {load_pre_wait} > {load_max}, waiting "
                f"(budget {wait_budget:.0f}s)",
                file=sys.stderr,
            )
        time.sleep(15)
        waited += 15
    load_start = _loadavg()
    if waited >= wait_budget and (load_start or 0.0) > load_max:
        print(
            f"bench: wait budget exhausted at load {load_start} — timings "
            "will be burst-annotated (see load_avg_* fields)",
            file=sys.stderr,
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from slacken_spark.plans import catalog, load_all

    load_all()
    from slacken_spark.session import get_spark

    spark = get_spark("slacken_spark_bench")

    # warm up the JVM/session so the first measured query isn't charged
    # session-startup cost: codegen, Arrow init, Python UDF worker pool
    # spin-up, parquet reader, shuffle machinery, broadcast exchange
    # (~20 s of one-time costs on local[32])
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    base = spark.range(1_000_000).select(
        (F.col("id") % 100).alias("k"), _warm(F.col("id")).alias("x")
    )
    small = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("y"))
    (
        base.join(F.broadcast(small), "k")
        .groupBy("k")
        .agg(F.collect_list("x").alias("xs"), F.sum("x").alias("s"))
        .select(_warm(F.element_at("xs", 1)).alias("h"), "s")
        .selectExpr("sum(h+s)")
        .collect()
    )
    spark.range(10).toPandas()
    # touch every input table once so footer parsing + OS page cache
    # aren't charged to whichever query reads a table first
    for tbl in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        try:
            spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:
            pass

    # min of N runs per query: this host intermittently stalls a core
    # for tens of seconds, and a single-shot timing randomly charges
    # that to one unlucky query. The minimum is the reproducible cost.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # a query's timing counts as CLEAN once at least one of its runs
    # saw fewer than ext_max EXTERNAL cores busy during its own
    # measurement window (/proc attribution — the bench's own work is
    # subtracted exactly, so its local[32] self-load never trips the
    # detector; an absolute-loadavg cut cannot make that distinction
    # and mis-flagged 85/144 queries on a quiet host).
    ext_max = float(os.environ.get("SPARK_GRAFT_EXT_CORES_MAX", "2.0"))
    repasses = int(os.environ.get("SPARK_GRAFT_BENCH_REPASSES", "2"))

    timings: dict[str, float] = {}
    hot: set[str] = set()
    cold: dict[str, float] = {}

    def measure(name, fn, n_runs):
        _measure(name, fn, n_runs, spark, sf_dir, ext_max, timings, hot, cold)

    for name, (fn, _sql) in catalog.QUERIES.items():
        measure(name, fn, runs)

    # Mid-run burst defense (the r10 lesson: the start gate can't help
    # when the burst arrives mid-run — all six r10 attempts recorded
    # clean starts and 2-4x inflated tails): queries whose EVERY run
    # executed under external contention get re-measured — after
    # waiting, bounded, for the burst to pass — and keep their min.
    # Bounded at `repasses` extra passes over only the affected
    # queries, so a permanently-loaded host still terminates with the
    # burst honestly annotated in `hot_queries`.
    def _external_now(window: float = 1.0) -> float | None:
        s0 = _proc_snapshot()
        time.sleep(window)
        return _external_cores(s0, _proc_snapshot(), window)

    repassed: list[str] = []
    for _ in range(repasses):
        if not hot:
            break
        rewait, ext_now = 0.0, _external_now()
        while rewait < wait_budget and not (
            ext_now is None or ext_now <= ext_max
        ):
            time.sleep(14)
            rewait += 15
            ext_now = _external_now()
        requeue = sorted(hot)
        print(
            f"bench: re-measuring {len(requeue)} burst-hit queries "
            f"(waited {rewait:.0f}s, external cores now {ext_now})",
            file=sys.stderr,
        )
        repassed.extend(q for q in requeue if q not in repassed)
        for name in requeue:
            measure(name, catalog.QUERIES[name][0], 1)

    # sub-0.5 s entries are dominated by fixed costs and swing 2-3x run
    # to run on this host (r11 verdict item 5) — one bounded extra pass
    # over just those (min kept) tames the variance for ~a second of
    # total wall; the count is recorded in the JSON so a reader knows
    # the small entries are min-of-(runs+N). Selected AFTER the burst
    # repass (r12 ADVICE): a first-pass timing inflated past the cutoff
    # by a burst would otherwise hide a genuinely-small query from its
    # variance-taming extra run.
    small_extra = int(os.environ.get("SPARK_GRAFT_BENCH_SMALL_RUNS", "1"))
    small_cut = float(os.environ.get("SPARK_GRAFT_BENCH_SMALL_CUTOFF", "0.5"))
    small = [n for n, v in timings.items() if 0 <= v < small_cut]
    for _ in range(small_extra):
        for name in small:
            measure(name, catalog.QUERIES[name][0], 1)

    total = round(sum(v for v in timings.values() if v > 0), 3)

    # host 1-min load average at start/end: this VM takes external
    # load bursts (NOTES "Environment gotchas") that inflate untouched
    # queries uniformly — recording both lets a reader tell a real
    # regression from a burst without re-running
    load_end = _loadavg()
    record = json.dumps(
        {
            "metric": "catalog_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "runs_per_query": runs,
            "small_query_extra_runs": small_extra,
            "small_query_cutoff_sec": small_cut,
            "queries_first_run": cold,
            "load_avg_start": load_start,
            "load_avg_end": load_end,
            "load_pre_wait": load_pre_wait,
            "load_waited_sec": waited,
            "ext_cores_max": ext_max,
            "repassed_queries": repassed,
            "hot_queries": sorted(hot),
        },
        separators=(",", ":"),
    )
    # Stop the session BEFORE printing the record so no JVM shutdown
    # chatter can land after the JSON in a combined stdout+stderr
    # capture — the r12 bench record was lost to exactly that kind of
    # tail truncation (r13 verdict item 3). The stderr copy printed
    # first is a redundant record; stdout still carries exactly ONE
    # JSON line, as the driver contract requires.
    spark.stop()
    print(record, file=sys.stderr)
    sys.stderr.flush()
    print(record)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
