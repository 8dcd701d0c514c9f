"""Soak maintain_grouped_sums: random corpora + CDC sequences with
group moves, inserts, and group-emptying batches; maintained view must
equal a from-scratch rebuild after every step."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from slacken_spark.functions.ivm import maintain_grouped_sums
from slacken_spark.session import get_spark

spark = get_spark('soak_ivm', master='local[8]', shuffle_partitions=8)
GROUPS = ["a", "b", "c", "d", "e", "rare"]
fails = 0
def rebuild(df):
    return {(r["source"], r["n_docs"], r["n_tokens"]) for r in
            df.groupBy("source").agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("sz").cast("long").alias("n_tokens")).collect()}
for seed in (91, 92, 93):
    rng = np.random.default_rng(seed)
    def row(i, g=None):
        g = g or GROUPS[int(rng.integers(0, 5))]
        return (int(i), g, int(rng.integers(1, 400)))
    corpus = {i: row(i) for i in range(600)}
    corpus[600] = (600, "rare", 50)   # sole member — a later batch moves it out
    base_df = spark.createDataFrame(sorted(corpus.values()), "doc_id long, source string, sz long")
    view = base_df.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("n_tokens")).persist()
    for step in range(3):
        batch = {}
        for i in rng.choice(601, size=50, replace=False):
            batch[int(i)] = row(int(i))          # random moves
        if step == 1:
            batch[600] = (600, "a", 10)          # empty the 'rare' group
        for k in range(4):
            nid = 601 + step * 10 + k
            batch[nid] = row(nid, g=GROUPS[int(rng.integers(0, 6))])  # inserts, maybe new group
        batch_df = spark.createDataFrame(sorted(batch.values()), "doc_id long, source string, sz long")
        view2 = maintain_grouped_sums(view, base_df, batch_df, "source",
                                      F.col("sz"), id_col="doc_id").persist()
        corpus.update(batch)
        base_df = spark.createDataFrame(sorted(corpus.values()), "doc_id long, source string, sz long")
        want = rebuild(base_df)
        got = {(r["source"], r["n_docs"], r["n_tokens"]) for r in view2.collect()}
        s = "OK" if got == want else "FAIL"
        if s == "FAIL":
            fails += 1
            print("missing:", want - got); print("extra:", got - want)
        print(f"seed={seed} step={step} groups={len(want)} {s}", flush=True)
        view.unpersist(); view = view2
print("IVM SOAK FAILS:", fails)
spark.stop()
