"""Long-horizon streaming-maintainer probe: 24 sequential CDC
advancements of a 200k-row base through ops._advance_base (the shared
advancement every streaming maintainer uses), measuring per-batch wall,
optimized-plan size, and the plan's size-estimate bit length.

What it pins, beyond soak_ivm's correctness checks: with the r10
_stats_free wiring, BOTH the plan text length and the stats bit length
must stay FLAT across checkpoint generations (pre-r10, the estimate
compounded one join per checkpoint — linear bit growth, the same trap
that went super-exponential in the self-joining dedup loops), and
per-batch wall must not trend upward across 6 checkpoint cycles.
Prints FAILS != 0 when the last checkpoint cycle's plan/stats exceed
the first cycle's (growth where boundedness is the contract)."""
import sys
import time

sys.path.insert(0, '/root/repo')
from slacken_spark.session import get_spark
from slacken_spark.streaming import ops

spark = get_spark('probe_longstream', master='local[8]', shuffle_partitions=8)
fails = 0

base = spark.range(200_000).selectExpr(
    "id AS doc_id", "concat('t', id) AS text"
).localCheckpoint(eager=True)
state: dict = {}
k = ops._ADVANCE_CKPT_EVERY
plan_at_ckpt, bits_at_ckpt, walls = [], [], []
cur = base
for b in range(1, 6 * k + 1):
    batch = spark.range(500).selectExpr(
        f"(id * 97 + {b}) % 300000 AS doc_id",
        f"concat('v{b}_', id) AS text",
    )
    t0 = time.perf_counter()
    cur = ops._advance_base(cur, batch, "doc_id", state)
    n = cur.count()  # one action per batch, like a maintainer's sink
    walls.append(time.perf_counter() - t0)
    if b % k == 0:
        qe = cur._jdf.queryExecution()
        plan_at_ckpt.append(len(qe.optimizedPlan().toString()))
        bits_at_ckpt.append(
            int(str(qe.optimizedPlan().stats().sizeInBytes())).bit_length()
        )
        print(f"batch={b} rows={n} wall={walls[-1]:.2f}s "
              f"plan_chars={plan_at_ckpt[-1]} stats_bits={bits_at_ckpt[-1]}",
              flush=True)
# boundedness: the 6th checkpoint generation must look like the 1st
if plan_at_ckpt[-1] > plan_at_ckpt[0] * 1.1:
    fails += 1
    print(f"  plan grew: {plan_at_ckpt}")
if bits_at_ckpt[-1] > bits_at_ckpt[0] + 8:
    fails += 1
    print(f"  stats bits grew: {bits_at_ckpt}")
# wall flatness: mean of the last cycle vs the first (3x slack for VM noise)
first, last = sum(walls[:k]) / k, sum(walls[-k:]) / k
print(f"wall first-cycle={first:.2f}s last-cycle={last:.2f}s")
if last > first * 3:
    fails += 1
    print("  wall trending up")
ops._release_advance_ckpt(state)
print("LONGSTREAM PROBE FAILS:", fails)
spark.stop()
