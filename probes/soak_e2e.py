import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from slacken_spark.classify import Classifier, ClassifyParams
from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels.minimizers import MinimizerConfig, uniform_random_table
from slacken_spark.kernels.taxonomy import Taxonomy
from slacken_spark.session import get_spark

CONFIGS = [
    ("default", MinimizerConfig(k=35, m=31, spaces=7), False),
    ("short", MinimizerConfig(k=21, m=15, spaces=2), False),
    ("lexicographic", MinimizerConfig(k=31, m=21, spaces=0, xor_mask=0), False),
    ("wide_exact", MinimizerConfig(k=40, m=35, spaces=0), False),
    ("wide_hashed", MinimizerConfig(k=40, m=35, spaces=0, wide="hashed"), False),
    ("extra_wide", MinimizerConfig(k=70, m=65, spaces=0, wide="hashed"), False),
    ("min_table", MinimizerConfig(k=24, m=10, spaces=0), True),
]

spark = get_spark('soak', master='local[8]', shuffle_partitions=8)
fails = 0
for seed in (101, 202, 303, 404):
    RNG = np.random.default_rng(seed)
    n = 60
    ids = list(range(2, n + 2))
    parents = [int(RNG.integers(1, i)) for i in ids]
    tax = Taxonomy.from_edges(ids, parents)
    leaves = [t for t in ids if tax.is_leaf(t)][:12]
    genomes = {t: "".join("ACGT"[i] for i in RNG.integers(0, 4, 1500)) for t in leaves}
    gdf = spark.createDataFrame([(f"g{t}", s) for t, s in genomes.items()],
                                "header string, nucleotides string")
    ldf = spark.createDataFrame([(f"g{t}", t) for t in genomes],
                                "header string, taxon int")
    reads = []
    for t, seq in genomes.items():
        for j in range(5):
            off = int(RNG.integers(0, len(seq) - 150))
            reads.append((f"r{t}_{j}", t, seq[off:off+150]))
    rdf = spark.createDataFrame([(h, s) for h, _t, s in reads],
                                "header string, nucleotides string")
    sources = {h: t for h, t, _s in reads}
    for name, cfg, use_table in CONFIGS:
        table = uniform_random_table(cfg.m, seed=99) if use_table else None
        idx = KeyValueIndex.build(spark, gdf, ldf, tax, cfg, buckets=4,
                                  priority_table=table)
        out = Classifier(idx).classify(rdf, ClassifyParams(min_hit_groups=2)).collect()
        n_cl = 0
        for r in out:
            if r["classified"]:
                n_cl += 1
                src = sources[r["header"]]
                if not tax.has_ancestor(src, r["taxon"]):
                    print(f"LINEAGE FAIL seed={seed} cfg={name} read={r['header']} src={src} got={r['taxon']}", flush=True)
                    fails += 1
        if n_cl < 50:
            print(f"SENSITIVITY FAIL seed={seed} cfg={name} n_classified={n_cl}", flush=True)
            fails += 1
        print(f"seed={seed} cfg={name} ok n_cl={n_cl}", flush=True)
print("SOAK FAILS:", fails)
spark.stop()
