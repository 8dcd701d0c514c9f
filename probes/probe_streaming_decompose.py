"""Decompose every streaming bench entry against the measured
availableNow fixed-cost floor (VERDICT r12 item 6).

probe_streaming_floor.py measured a zero-row availableNow query at
0.41 s min / 0.43 s median — per-QUERY startup (stream planning,
offset/commit-log I/O, micro-batch scheduling), not per-row work. This
probe counts the streaming queries each catalog entry actually starts
(DataStreamWriter.start/toTable instrumented) and times the entry at
the bench SF, printing per entry:

    wall ≈ n_queries x floor + marginal

so a bench swing on a streaming entry can be attributed to floor
stacking (n_queries x host-sensitive startup) vs marginal sketch/agg
work without re-deriving the decomposition. Results table lives in
EXPLAIN.md "Streaming entries decomposed".
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

FLOOR_MIN = 0.41
FLOOR_MED = 0.43


def main():
    import pyspark.sql.streaming.readwriter as srw

    from slacken_spark.plans import catalog, load_all
    from slacken_spark.session import get_spark

    load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_streaming_decompose")

    counts = {"n": 0}
    orig_start = srw.DataStreamWriter.start
    orig_totable = srw.DataStreamWriter.toTable

    def start(self, *a, **k):
        counts["n"] += 1
        return orig_start(self, *a, **k)

    def to_table(self, *a, **k):
        counts["n"] += 1
        return orig_totable(self, *a, **k)

    srw.DataStreamWriter.start = start
    srw.DataStreamWriter.toTable = to_table

    names = sorted(n for n in catalog.QUERIES if n.startswith("streaming_"))
    out = {}
    for name in names:
        fn, _ = catalog.QUERIES[name]
        fn(spark, sf_dir).collect()  # warm: scan caches, JIT, shuffle dirs
        best = None
        for _ in range(2):
            counts["n"] = 0
            t0 = time.time()
            fn(spark, sf_dir).collect()
            wall = time.time() - t0
            if best is None or wall < best[0]:
                best = (wall, counts["n"])
        wall, n_q = best
        out[name] = {
            "n_streaming_queries": n_q,
            "wall_min2_warm_sec": round(wall, 2),
            "floor_cost_sec": round(n_q * FLOOR_MIN, 2),
            "marginal_sec": round(wall - n_q * FLOOR_MIN, 2),
        }
        print(json.dumps({name: out[name]}))
    print(
        json.dumps(
            {
                "floor_min_sec": FLOOR_MIN,
                "floor_median_sec": FLOOR_MED,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
