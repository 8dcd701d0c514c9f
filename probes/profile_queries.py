#!/usr/bin/env python
"""Targeted per-query profiler for the optimization rounds.

Runs the named catalog queries in ONE warm session, N trials each
(noop sink, same methodology as bench.py), prints min/median and can
dump .explain('formatted') plans. Usage:

    python probes/profile_queries.py [--sf DIR] [--trials N]
        [--plans OUTDIR] name [name ...]

Unlike bench.py this is a developer tool: it never writes the bench
JSON and the timings are for A/B comparison inside one session, not
for committing as anchors.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump formatted plans here")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument(
        "--metrics",
        action="store_true",
        help="enable the UI and report per-query task time / shuffle bytes"
        " from the REST API (noise-immune structural numbers)",
    )
    args = ap.parse_args()

    from slacken_spark.plans import catalog, load_all

    load_all()
    from slacken_spark.session import get_spark

    extra = {"spark.ui.enabled": "true"} if args.metrics else None
    spark = get_spark("profile_queries", extra_conf=extra)

    # same warmup as bench.py (JIT, Arrow, python workers, page cache)
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
    for tbl in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        try:
            spark.read.parquet(os.path.join(args.sf, f"{tbl}.parquet")).write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:
            pass

    def _rest_metrics(group: str):
        """Aggregate task metrics for one job group via the REST API."""
        import json
        import urllib.request

        base = spark.sparkContext.uiWebUrl + "/api/v1/applications/" + (
            spark.sparkContext.applicationId
        )
        jobs = json.loads(urllib.request.urlopen(base + "/jobs").read())
        stage_ids = set()
        njobs = 0
        for j in jobs:
            if j.get("jobGroup") == group:
                njobs += 1
                stage_ids.update(j.get("stageIds", []))
        agg = {
            "jobs": njobs,
            "stages": 0,
            "tasks": 0,
            "task_time_s": 0.0,
            "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0,
            "input_mb": 0.0,
        }
        stages = json.loads(
            urllib.request.urlopen(base + "/stages?status=complete").read()
        )
        for s in stages:
            if s["stageId"] in stage_ids:
                agg["stages"] += 1
                agg["tasks"] += s.get("numCompleteTasks", 0)
                agg["task_time_s"] += s.get("executorRunTime", 0) / 1000.0
                agg["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
                agg["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
                agg["input_mb"] += s.get("inputBytes", 0) / 1e6
        return agg

    for name in args.names:
        fn = catalog.QUERIES[name][0]
        times = []
        for i in range(args.trials):
            group = f"profile:{name}#{i}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            if args.metrics and i == args.trials - 1:
                m = _rest_metrics(group)
                print(
                    f"{name} [metrics last trial]: jobs={m['jobs']}"
                    f" stages={m['stages']} tasks={m['tasks']}"
                    f" task_time={m['task_time_s']:.2f}s"
                    f" shuffle_r={m['shuffle_read_mb']:.1f}MB"
                    f" shuffle_w={m['shuffle_write_mb']:.1f}MB"
                    f" input={m['input_mb']:.1f}MB",
                    flush=True,
                )
        spark.sparkContext.setJobDescription(None)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        print(
            f"{name}: min={min(times):.3f} med={statistics.median(times):.3f} "
            f"all={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
