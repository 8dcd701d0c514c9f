"""Soak maintain_zone_maps: random corpora + random CDC batches where
rows MOVE shards, shards empty, and new shards appear; maintained
stats must equal a from-scratch zone_maps rebuild after every batch."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from slacken_spark.functions.skipping import (
    zone_maps, maintain_zone_maps, layout_shard)
from slacken_spark.session import get_spark

spark = get_spark('soak_zm', master='local[8]', shuffle_partitions=8)
W = 100
fails = 0
def rows_of(zm):
    return {tuple(r) for r in zm.collect()}
for seed in (81, 82, 83):
    rng = np.random.default_rng(seed)
    def row(i):
        return (int(i), int(rng.integers(0, 2000)), int(rng.integers(-500, 500)))
    corpus = {i: row(i) for i in range(800)}
    base_df = spark.createDataFrame(sorted(corpus.values()), "id long, layout long, v long")
    zm = zone_maps(base_df, layout_shard("layout", W), ["v", "layout"]).persist()
    for step in range(3):
        # replacements that often move shards + some net-new ids; also
        # try to EMPTY a shard: move every row of one existing shard
        batch = {}
        ids = rng.choice(800, size=40, replace=False)
        for i in ids: batch[int(i)] = row(int(i))
        victims = [i for i, (a, l, v) in corpus.items()
                   if l // W == 3]
        for i in victims:
            batch[int(i)] = (int(i), int(rng.integers(1500, 2000)), int(rng.integers(-500, 500)))
        for k in range(5):
            nid = 800 + step * 10 + k
            batch[nid] = (nid, int(rng.integers(0, 2500)), int(rng.integers(-500, 500)))
        batch_df = spark.createDataFrame(sorted(batch.values()), "id long, layout long, v long")
        zm2 = maintain_zone_maps(zm, base_df, batch_df, "id", "layout", W, ["v", "layout"]).persist()
        corpus.update(batch)
        base_df = spark.createDataFrame(sorted(corpus.values()), "id long, layout long, v long")
        want = rows_of(zone_maps(base_df, layout_shard("layout", W), ["v", "layout"]))
        got = rows_of(zm2)
        s = "OK" if got == want else "FAIL"
        if s == "FAIL":
            fails += 1
            print("missing:", want - got); print("extra:", got - want)
        print(f"seed={seed} step={step} batch={len(batch)} shards={len(want)} {s}", flush=True)
        zm.unpersist(); zm = zm2
print("ZM SOAK FAILS:", fails)
spark.stop()
