"""Soak lsh_delta: random vector corpora + random replacement/delete
batches; applying the delta to the full bucket index must equal a
from-scratch bucket index over the merged corpus."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from slacken_spark.functions.similarity import lsh_delta, lsh_hyperplane_buckets
from slacken_spark.session import get_spark

spark = get_spark('soak_lsh', master='local[8]', shuffle_partitions=8)
_prng = np.random.default_rng(9)
PLANES = [[float(x) for x in _prng.normal(size=16)] for _ in range(5)]
D = 16
fails = 0
def full_index(df):
    b = lsh_hyperplane_buckets(df, "embedding", PLANES)
    return {(r["bucket"], r["n_vecs"], tuple(r["members"])) for r in
            b.groupBy("bucket").agg(
                F.count(F.lit(1)).cast("long").alias("n_vecs"),
                F.sort_array(F.collect_list("vec_id")).alias("members"),
            ).collect()}
for seed in (71, 72, 73):
    rng = np.random.default_rng(seed)
    def vec(): return [float(x) for x in rng.normal(size=D)]
    corpus = {i: vec() for i in range(500)}
    base = spark.createDataFrame([(i, v) for i, v in corpus.items()],
                                 "vec_id long, embedding array<double>")
    upd_ids = [int(i) for i in rng.choice(500, size=30, replace=False)]
    upd = {i: vec() for i in upd_ids[:20]}
    upd.update({500 + k: vec() for k in range(8)})     # net-new
    del_ids = set(upd_ids[15:30])                       # overlap [15:20] with upd: replacement wins
    upd_df = spark.createDataFrame([(i, v) for i, v in upd.items()],
                                   "vec_id long, embedding array<double>")
    del_df = spark.createDataFrame([(int(i),) for i in sorted(del_ids)], "vec_id long")
    delta = lsh_delta(base, upd_df, PLANES, deletes=del_df)
    # merged truth: deletes remove, but an id also in upd is a replacement
    merged = dict(corpus)
    for i in del_ids: merged.pop(i, None)
    merged.update(upd)
    mdf = spark.createDataFrame([(i, v) for i, v in merged.items()],
                                "vec_id long, embedding array<double>")
    want = full_index(mdf)
    # apply delta to the base full index: replace affected buckets
    base_full = full_index(base)
    drows = {(r["bucket"], r["n_vecs"], tuple(r["members"])) for r in delta.collect()}
    affected = {b for b, _, _ in drows}
    got = {row for row in base_full if row[0] not in affected} | {r for r in drows if r[1] > 0}
    s = "OK" if got == want else "FAIL"
    if s == "FAIL":
        fails += 1
        print("missing:", want - got); print("extra:", got - want)
    print(f"seed={seed} delta-applied≡rebuild {s} (buckets={len(want)}, delta rows={len(drows)})", flush=True)
print("LSH SOAK FAILS:", fails)
spark.stop()
