"""Soak the vectorized Bracken window kernel vs the naive per-window
model on fresh random worlds (varying core/unique structure, 3-level
taxonomies, several (k, m) configs)."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from slacken_spark.bracken import BrackenWeights, classify_all_reads
from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels import bitseq
from slacken_spark.kernels.minimizers import (
    MinimizerConfig, mmer_priorities, window_minimizers)
from slacken_spark.kernels.taxonomy import NONE, ROOT, Taxonomy
from slacken_spark.session import get_spark

def naive_dests(seq, lookup, tax, cfg, read_len):
    codes = bitseq.encode_codes(seq)
    ranks = mmer_priorities(codes, cfg)
    _, pos = window_minimizers(ranks, cfg.window)
    mmers = bitseq.pack_kmers(codes, cfg.m)
    mmers = bitseq.canonical_packed(mmers, cfg.m)
    M = mmers[pos]
    lca = np.array([lookup.get((int(m), 0), NONE) for m in M])
    run_id = np.zeros(len(M), dtype=int)
    run_id[1:] = np.cumsum(M[1:] != M[:-1])
    W = read_len - cfg.k + 1
    sd = tax.sdepth
    out = []
    for w in range(len(seq) - read_len + 1):
        seg = slice(w, w + W)
        groups = len(set(run_id[seg].tolist()))
        taxa = [t for t in lca[seg] if t != NONE]
        out.append(NONE if groups < 2 or not taxa
                   else int(max(taxa, key=lambda t: sd[t])))
    return out

spark = get_spark('soak_bw', master='local[8]', shuffle_partitions=8)
fails = 0
CONFIGS = [MinimizerConfig(k=15, m=9, spaces=0, canonical=True),
           MinimizerConfig(k=21, m=15, spaces=2, canonical=True),
           MinimizerConfig(k=31, m=21, spaces=0, canonical=True)]
for seed in (13, 14):
    rng = np.random.default_rng(seed)
    def g(n): return "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    for cfg in CONFIGS:
        read_len = int(rng.integers(cfg.k + 10, 80))
        ids = [5, 6, 101, 102, 103]
        parents = [ROOT, 5, 5, 5, 6]
        tax = Taxonomy.from_edges(ids, parents)
        core = g(250)
        genomes = {101: core + g(300), 102: core + g(300), 103: g(550)}
        gdf = spark.createDataFrame([(f"g{t}", s) for t, s in genomes.items()],
                                    "header string, nucleotides string")
        ldf = spark.createDataFrame([(f"g{t}", t) for t in genomes],
                                    "header string, taxon int")
        idx = KeyValueIndex.build(spark, gdf, ldf, tax, cfg, buckets=4)
        records = {(r["id1"], 0): r["taxon"] for r in idx.records.collect()}
        for t, seq in genomes.items():
            got = classify_all_reads(seq, cfg, records, tax, read_len).tolist()
            want = naive_dests(seq, records, tax, cfg, read_len)
            if got != want:
                d = [i for i, (a, b) in enumerate(zip(got, want)) if a != b][:5]
                print(f"FAIL seed={seed} k={cfg.k} m={cfg.m} L={read_len} genome={t} first_diffs={d}", flush=True)
                fails += 1
        print(f"seed={seed} k={cfg.k} m={cfg.m} s={cfg.spaces} L={read_len} ok", flush=True)
print("BRACKEN SOAK FAILS:", fails)
spark.stop()
