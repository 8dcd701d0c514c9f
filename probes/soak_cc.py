import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
from slacken_spark.functions.dedup import connected_components_contract
from slacken_spark.session import get_spark

def ground_truth(edges):
    # BFS/union-find model
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb: parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges: union(a, b)
    # min-label per component
    lbl = {}
    for x in list(parent):
        r = find(x)
        lbl[r] = min(lbl.get(r, r), x)
    return {x: lbl[find(x)] for x in parent}

spark = get_spark('soak_cc', master='local[8]', shuffle_partitions=8)
fails = 0
shapes = [
    ("erdos_sparse", lambda rng: rng.integers(0, 60000, (50000, 2))),
    ("erdos_dense", lambda rng: rng.integers(0, 5000, (50000, 2))),
    ("perm_chain", None),   # high diameter, scattered
    ("star_hub", lambda rng: np.stack([np.zeros(30000, dtype=np.int64), rng.integers(1, 200000, 30000)], axis=1)),
]
for seed in (11, 22, 33):
    rng = np.random.default_rng(seed)
    for name, gen in shapes:
        if name == "perm_chain":
            permv = rng.permutation(40000)
            e = np.stack([permv[:-1], permv[1:]], axis=1)
        else:
            e = np.asarray(gen(rng), dtype=np.int64)
        e = e[e[:,0] != e[:,1]]
        edges = [(int(a), int(b)) for a, b in e]
        want = ground_truth(edges)
        df = spark.createDataFrame(e.tolist(), "id_a long, id_b long")
        t0 = time.time()
        got = {r["node"]: r["component"] for r in
               connected_components_contract(df, loop_partitions=8).collect()}
        dt = time.time() - t0
        bad = sum(1 for n, c in want.items() if got.get(n) != c)
        extra = sum(1 for n in got if n not in want)
        status = "OK" if bad == 0 and extra == 0 and len(got) == len(want) else "FAIL"
        if status == "FAIL": fails += 1
        print(f"seed={seed} {name}: n_nodes={len(want)} wall={dt:.1f}s bad={bad} extra={extra} {status}", flush=True)
print("CC SOAK FAILS:", fails)
spark.stop()
