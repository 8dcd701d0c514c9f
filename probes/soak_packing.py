"""Soak the packing family against Python models: token_blocks (exact
stream-slicing arithmetic vs a sequential model, bucketing-invariant),
pack_greedy (budget invariant + exact chain equality vs a sequential
greedy model at shards=1), epoch_shuffle (per-shard positions are a
dense 1..n_s permutation, address stability across calls, global
reshuffle across epochs)."""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from slacken_spark.functions.packing import epoch_shuffle, pack_greedy, token_blocks
from slacken_spark.session import get_spark

spark = get_spark('soak_pack', master='local[8]', shuffle_partitions=8)
fails = 0
for seed in (57, 58):
    rng = np.random.default_rng(seed)
    # --- token_blocks vs sequential model ---
    docs = [(i, int(rng.integers(0, 900))) for i in range(400)]  # incl. 0-size
    df = spark.createDataFrame(docs, "doc_id long, ntok long")
    L = 512
    want = set()
    start = 0
    for i, sz in docs:
        if sz <= 0: continue
        first, last = start // L, (start + sz - 1) // L
        for b in range(first, last + 1):
            lo = max(start, b * L); hi = min(start + sz, (b + 1) * L)
            want.add((i, b, lo - start, lo - b * L, hi - lo))
        start += sz
    for buckets in (7, 64):
        got = {(r["doc_id"], r["block_id"], r["doc_offset"], r["block_offset"], r["n_toks"])
               for r in token_blocks(df, L, buckets=buckets).collect()}
        s = "OK" if got == want else "FAIL"
        if s == "FAIL": fails += 1
        print(f"seed={seed} token_blocks buckets={buckets} {s} ({len(want)} rows)", flush=True)
    # --- pack_greedy shards=1 vs sequential model ---
    rows = [(["s1", "s2", "hot"][int(rng.integers(0, 3))], i, int(rng.integers(1, 300)))
            for i in range(300)]
    pdf = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    B = 700
    got = {(r["source"], r["doc_id"]): r["pack_id"] for r in
           pack_greedy(pdf, B, shards=1).collect()}
    bad = 0
    for g in ("s1", "s2", "hot"):
        seq = sorted((i, sz) for s, i, sz in rows if s == g)
        pid, acc = 0, 0
        for i, sz in seq:
            if acc + sz > B and acc > 0:
                pid += 1; acc = 0
            acc += sz
            if got[(g, i)] != pid: bad += 1
    s = "OK" if bad == 0 else f"FAIL({bad})"
    if bad: fails += 1
    print(f"seed={seed} pack_greedy chain {s}", flush=True)
    # hash-sharded: budget invariant only (composition differs by design)
    over = [r for r in pack_greedy(pdf, B, shards=4, shard_by="hash")
            .groupBy("source", "shard_id", "pack_id")
            .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
            .where((F.col("tot") > B) & (F.col("n") > 1)).collect()]
    s = "OK" if not over else "FAIL"
    if over: fails += 1
    print(f"seed={seed} pack_greedy hash-shard budget {s}", flush=True)
    # --- epoch_shuffle ---
    ids = spark.createDataFrame([(int(i),) for i in rng.choice(100000, 500, replace=False)],
                                "doc_id long")
    e1 = {(r["doc_id"]): (r["shard"], r["position"]) for r in
          epoch_shuffle(ids, shards=8, epoch=1).collect()}
    e1b = {(r["doc_id"]): (r["shard"], r["position"]) for r in
           epoch_shuffle(ids, shards=8, epoch=1).collect()}
    e2 = {(r["doc_id"]): (r["shard"], r["position"]) for r in
          epoch_shuffle(ids, shards=8, epoch=2).collect()}
    stable = e1 == e1b
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    dense = True
    by_shard = {}
    for s_, p in e1.values(): by_shard.setdefault(s_, []).append(p)
    for s_, ps in by_shard.items():
        if sorted(ps) != list(range(1, len(ps) + 1)): dense = False
    ok = stable and dense and moved > 400
    if not ok: fails += 1
    print(f"seed={seed} epoch_shuffle stable={stable} dense={dense} moved={moved}/500 {'OK' if ok else 'FAIL'}", flush=True)
print("PACKING SOAK FAILS:", fails)
spark.stop()
