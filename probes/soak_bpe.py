"""Soak bpe_train vs the pure-Python reference on fresh random corpora
(word distributions with heavy tails, unicode-ish tokens, punctuation)."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from slacken_spark.functions.bpe import bpe_train, bpe_train_reference
from slacken_spark.session import get_spark

spark = get_spark('soak_bpe', master='local[8]', shuffle_partitions=8)
fails = 0
BASE = ["the", "cat", "sat", "mat", "catalog", "thematic", "scatter",
        "concatenate", "matter", "them", "hat", "chat", "that"]
for seed in (21, 22, 23):
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(120):
        n = int(rng.integers(3, 15))
        words = [BASE[int(i)] for i in rng.zipf(1.6, n) % len(BASE)]
        punct = [".", ",", "!", " -", "'s"]
        line = " ".join(words) + punct[int(rng.integers(0, len(punct)))]
        texts.append(line)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    n_merges = int(rng.integers(5, 25))
    got = bpe_train(df, "text", n_merges)
    want = bpe_train_reference(texts, n_merges)
    s = "OK" if got == want else "FAIL"
    if s == "FAIL":
        fails += 1
        for i, (a, b) in enumerate(zip(got, want)):
            if a != b: print(f"  first diff at merge {i}: got={a} want={b}"); break
    print(f"seed={seed} n_merges={n_merges} {s} ({len(got)} merges)", flush=True)
print("BPE SOAK FAILS:", fails)
spark.stop()
