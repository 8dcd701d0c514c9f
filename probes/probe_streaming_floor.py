"""Streaming fixed-cost floor probe (r11 verdict item 6): the
availableNow micro-batch machinery has a per-QUERY startup cost —
stream-query planning, checkpoint/offset-log I/O, micro-batch
scheduling — that dominates the catalog's streaming entries (10 of the
15 most expensive bench rows). This measures that floor directly so
per-entry bench numbers can be read as floor + marginal work:

  1. EMPTY floor: one availableNow query over a ZERO-ROW parquet file
     (one micro-batch, zero rows end to end) through foreachBatch.
  2. Marginal work: the same query over 100k rows.

Prints min/median of N runs for both plus the implied floor share.
The floor is a per-QUERY cost: sharing one streaming context across a
family's bench entries would amortize it, but each catalog entry is
contractually one self-contained query — the honest number is the
per-query one. Not a FAILS-style probe (nothing to violate); evidence
recorded in EXPLAIN.md.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from slacken_spark.session import get_spark  # noqa: E402
from slacken_spark.streaming import ops  # noqa: E402

spark = get_spark("probe_streaming_floor")

tmp = tempfile.mkdtemp(prefix="stream_floor_")
empty_dir = os.path.join(tmp, "empty")
full_dir = os.path.join(tmp, "full")
spark.range(0).selectExpr("id AS k", "id AS v").write.parquet(empty_dir)
spark.range(100_000).selectExpr("id % 100 AS k", "id AS v").write.parquet(
    full_dir
)

SCHEMA = "k long, v long"


def run_once(path: str) -> float:
    got: list = []

    def sink(bdf, _epoch):
        got.append(bdf.groupBy("k").count().count())

    # checkpoint location is run_foreach_to_completion's own throwaway
    # scratch dir (it overrides the option) — the same wiring every
    # catalog streaming entry uses, so the floor measured here is the
    # floor those entries pay (r12 review: a per-run option here was
    # dead code)
    t0 = time.perf_counter()
    writer = ops.file_stream(spark, path, SCHEMA).writeStream.foreachBatch(
        sink
    )
    ops.run_foreach_to_completion(writer, "floor_probe")
    return time.perf_counter() - t0


def stats(path: str, n: int = 5):
    walls = sorted(run_once(path) for _ in range(n))
    return walls[0], walls[n // 2]


# one throwaway run to absorb first-stream-query session costs (state
# store coordinator etc.), charged to neither measurement
run_once(empty_dir)
e_min, e_med = stats(empty_dir)
f_min, f_med = stats(full_dir)
print(f"empty-stream floor:  min {e_min:.2f}s  median {e_med:.2f}s")
print(f"100k-row query:      min {f_min:.2f}s  median {f_med:.2f}s")
print(
    f"floor share of the 100k query: {e_min / f_min:.0%} (min/min) — "
    "per-query startup, not per-row work"
)
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
