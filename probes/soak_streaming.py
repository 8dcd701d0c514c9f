"""Soak the streaming grouped-sums maintainer: random base + a random
5-file CDC sequence through the real FileStreamSource (one file per
micro-batch); every per-batch view snapshot must equal a driver-side
recompute over the prefix of batches applied so far."""
import glob
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from slacken_spark.streaming import ops
from slacken_spark.session import get_spark

spark = get_spark('soak_stream', master='local[8]', shuffle_partitions=8)
GROUPS = ["a", "b", "c", "d", "newg"]
fails = 0
for seed in (31, 32, 33):
    rng = np.random.default_rng(seed)
    tmp = tempfile.mkdtemp(prefix=f"soak_stream_{seed}_")
    def row(i, lo=0, hi=4):
        return (int(i), GROUPS[int(rng.integers(lo, hi))], int(rng.integers(1, 300)))
    base_rows = [row(i) for i in range(300)]
    base = spark.createDataFrame(base_rows, "doc_id long, source string, sz long")
    view = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("n_tokens"))
    batches = []
    for b in range(5):
        batch = [row(int(i), 0, 5) for i in rng.choice(320, size=25, replace=False)]
        batches.append(batch)
        spark.createDataFrame(batch, "doc_id long, source string, sz long").coalesce(1)\
            .write.parquet(f"{tmp}/cdc/b{b}.parquet")
    for b in range(5):  # backdate: strictly increasing mtimes in order
        for f in glob.glob(f"{tmp}/cdc/b{b}.parquet/*.parquet"):
            st = os.stat(f)
            os.utime(f, (st.st_atime, st.st_mtime - 1000 + b * 100))
    stream = (spark.readStream.schema("doc_id long, source string, sz long")
              .option("maxFilesPerTrigger", 1).format("parquet")
              .load(f"{tmp}/cdc/*/"))
    snaps = []
    def sink(view_df, epoch):
        snaps.append({r["source"]: (r["n_docs"], r["n_tokens"]) for r in view_df.collect()})
    ops.run_foreach_to_completion(
        ops.grouped_sums_stream(base, view, stream, "source", F.col("sz"), sink))
    ok = len(snaps) == 5
    rows = {i: (g, s) for i, g, s in base_rows}
    for b, batch in enumerate(batches):
        for i, g, s in batch:
            rows[i] = (g, s)
        want = {}
        for g, s in rows.values():
            n, t = want.get(g, (0, 0))
            want[g] = (n + 1, t + s)
        if b < len(snaps) and snaps[b] != want:
            ok = False
            print(f"  batch {b} mismatch: {set(want.items()) ^ set(snaps[b].items())}")
    if not ok: fails += 1
    print(f"seed={seed} batches={len(snaps)}/5 {'OK' if ok else 'FAIL'}", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)
print("STREAMING SOAK FAILS:", fails)
spark.stop()
