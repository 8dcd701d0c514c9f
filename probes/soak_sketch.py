"""Soak the sketch maintainers (CMS grid, quantile histogram, HLL
register table) and their mergeability: random corpora, random CDC
replacement/append batches, random slice splits — maintained ≡ rebuilt
cell-for-cell (register-for-register), merge(slices) ≡ whole, and HLL
registers ≡ a pure-Python model off-seed."""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from slacken_spark.functions.sketch import (
    cms_maintain, cms_merge, cms_sketch,
    histogram_maintain, histogram_merge, histogram_sketch)
from slacken_spark.session import get_spark

spark = get_spark('soak_sketch', master='local[8]', shuffle_partitions=8)
VOCAB = [f"t{i}" for i in range(200)]
GROUPS = ["a", "b", "c"]
fails = 0
def occ_df(docs):
    rows = [(i, t) for i, terms in docs.items() for t in terms]
    return spark.createDataFrame(rows, "doc_id long, term string")
def grid_rows(g):
    return {(r["row"], r["pos"], r["c"]) for r in g.collect()}
def hist_rows(h):
    return {(r["grp"], r["bin"], r["n"]) for r in h.collect()}
for seed in (51, 52, 53):
    rng = np.random.default_rng(seed)
    docs = {i: [VOCAB[int(j)] for j in rng.zipf(1.5, int(rng.integers(4, 25))) % 200]
            for i in range(300)}
    grid = cms_sketch(occ_df(docs), depth=3, width=64)
    # CDC: replace 30 docs, insert 5
    old_ids = [int(i) for i in rng.choice(300, size=30, replace=False)]
    old_occ = occ_df({i: docs[i] for i in old_ids})
    newdocs = {i: [VOCAB[int(j)] for j in rng.zipf(1.5, int(rng.integers(4, 25))) % 200]
               for i in old_ids}
    newdocs.update({300 + k: [VOCAB[int(j)] for j in rng.integers(0, 200, 6)] for k in range(5)})
    new_occ = occ_df(newdocs)
    maintained = grid_rows(cms_maintain(grid, old_occ, new_occ, depth=3, width=64))
    merged_docs = dict(docs); merged_docs.update(newdocs)
    rebuilt = grid_rows(cms_sketch(occ_df(merged_docs), depth=3, width=64))
    s1 = "OK" if maintained == rebuilt else "FAIL"
    # mergeability: random 3-way slice of the merged corpus
    ids = list(merged_docs)
    slice_of = {i: int(rng.integers(0, 3)) for i in ids}
    grids = None
    for sl in range(3):
        part = cms_sketch(occ_df({i: merged_docs[i] for i in ids if slice_of[i] == sl}),
                          depth=3, width=64)
        grids = part if grids is None else grids.unionByName(part)
    s2 = "OK" if grid_rows(cms_merge(grids)) == rebuilt else "FAIL"
    # histogram: same docs' token counts as 'cents'
    vals = [(i, GROUPS[i % 3], len(t) * 100) for i, t in merged_docs.items()]
    vdf = spark.createDataFrame(vals, "id long, g string, cents long")
    hist = histogram_sketch(
        spark.createDataFrame([v for v in vals if v[0] < 290], "id long, g string, cents long"),
        "g", F.col("cents"), 300)
    h_old = spark.createDataFrame([v for v in vals if 200 <= v[0] < 290], "id long, g string, cents long")
    h_new = spark.createDataFrame(
        [(i, g, c + int(rng.integers(-200, 1200))) for i, g, c in vals if 200 <= i < 290]
        + [v for v in vals if v[0] >= 290], "id long, g string, cents long")
    h_maint = hist_rows(histogram_maintain(hist, h_old, h_new, "g", F.col("cents"), 300))
    final_rows = {v[0]: v for v in vals if v[0] < 200}
    for r in h_new.collect(): final_rows[r["id"]] = (r["id"], r["g"], r["cents"])
    h_rebuilt = hist_rows(histogram_sketch(
        spark.createDataFrame(sorted(final_rows.values()), "id long, g string, cents long"),
        "g", F.col("cents"), 300))
    s3 = "OK" if h_maint == h_rebuilt else "FAIL"
    for s in (s1, s2, s3):
        if s == "FAIL": fails += 1
    print(f"seed={seed} cms_maintain≡rebuild {s1}  cms_merge(slices)≡whole {s2}  hist_maintain≡rebuild {s3}", flush=True)

# --- HLL register table: model parity, merge, append maintenance ---
import hashlib
from slacken_spark.functions.sketch import hll_maintain, hll_merge, hll_registers

def hll_model(values, p):
    m, regs = 1 << p, {}
    for v in values:
        h = int(hashlib.md5(f"hll_{v}".encode()).hexdigest()[:15], 16)
        reg, w = h % m, h // m
        rho = 61 - p - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs

for seed in (71, 72, 73):
    rng = np.random.default_rng(seed)
    p = int(rng.choice([5, 9, 12]))
    data = {}
    for g in GROUPS:
        n = int(rng.integers(3, 4000))
        data[g] = [f"v{int(x)}" for x in rng.integers(0, n, n)]
    df = spark.createDataFrame(
        [(g, v) for g, vs in data.items() for v in vs], "g string, v string")
    got = {(r["g"], r["reg"]): r["rho"]
           for r in hll_registers(df, ["g"], "v", p).collect()}
    want = {}
    for g, vs in data.items():
        for reg, rho in hll_model(set(vs), p).items():
            want[(g, reg)] = rho
    s1 = "OK" if got == want else "FAIL"
    # random slice split: merge(slices) == whole
    rows = [(g, v) for g, vs in data.items() for v in vs]
    cut = int(rng.integers(1, len(rows) - 1))
    ra = hll_registers(spark.createDataFrame(rows[:cut], "g string, v string"), ["g"], "v", p)
    rb = hll_registers(spark.createDataFrame(rows[cut:], "g string, v string"), ["g"], "v", p)
    merged = {(r["g"], r["reg"]): r["rho"]
              for r in hll_merge(ra.unionByName(rb), ["g"]).collect()}
    s2 = "OK" if merged == got else "FAIL"
    # append maintenance == rebuild
    batch = spark.createDataFrame(rows[cut:], "g string, v string")
    maint = {(r["g"], r["reg"]): r["rho"]
             for r in hll_maintain(ra, batch, ["g"], "v", p).collect()}
    s3 = "OK" if maint == got else "FAIL"
    for s in (s1, s2, s3):
        if s == "FAIL": fails += 1
    print(f"seed={seed} p={p} hll≡model {s1}  hll_merge(slices)≡whole {s2}  hll_maintain≡rebuild {s3}", flush=True)
print("SKETCH SOAK FAILS:", fails)
spark.stop()
