"""Soak the inverted-index maintenance family: random corpora + random
CDC replacement batches; patched index must be row-identical to a
from-scratch rebuild on the merged corpus, then compaction must equal
the coarse-built index."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from slacken_spark.functions.inverted import (
    inverted_index, delta_index, apply_delta, compact_segments)
from slacken_spark.session import get_spark

spark = get_spark('soak_inv', master='local[8]', shuffle_partitions=8)
VOCAB = [f"w{i}" for i in range(120)]
fails = 0
def toks_expr():
    return F.split(F.col("text"), " ")
def rows_of(df):
    return {(r["term"], r["segment"], r["df_segment"], tuple(r["postings"]))
            for r in df.collect()}
for seed in (41, 42, 43):
    rng = np.random.default_rng(seed)
    def doc(i):
        n = int(rng.integers(3, 20))
        return (i, " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), n)))
    corpus = [doc(i) for i in range(400)]
    base = spark.createDataFrame(corpus, "doc_id long, text string")
    # CDC batch: replace 25 random docs + add 10 new ids
    upd_ids = rng.choice(400, size=25, replace=False)
    upd = [doc(int(i))[0:2] for i in upd_ids]
    upd = [(int(i), " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), int(rng.integers(3, 20))))) for i in upd_ids]
    upd += [(400 + int(k), " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), 8))) for k in range(10)]
    upd_df = spark.createDataFrame(upd, "doc_id long, text string")
    idx = inverted_index(base, toks_expr(), segment_rows=16)
    delta = delta_index(base, upd_df, toks_expr(), segment_rows=16)
    patched = apply_delta(idx, delta)
    merged = {i: t for i, t in corpus}
    merged.update({i: t for i, t in upd})
    merged_df = spark.createDataFrame(sorted(merged.items()), "doc_id long, text string")
    want = rows_of(inverted_index(merged_df, toks_expr(), segment_rows=16))
    got = rows_of(patched)
    s1 = "OK" if got == want else "FAIL"
    if s1 == "FAIL": fails += 1
    # compaction: factor 4 over the patched index == coarse rebuild
    comp = rows_of(compact_segments(patched, 4))
    want_c = rows_of(inverted_index(merged_df, toks_expr(), segment_rows=64))
    s2 = "OK" if comp == want_c else "FAIL"
    if s2 == "FAIL": fails += 1
    print(f"seed={seed} patch≡rebuild {s1} ({len(got)} rows)  compact≡coarse {s2} ({len(comp)} rows)", flush=True)
print("INV SOAK FAILS:", fails)
spark.stop()
