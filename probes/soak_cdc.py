"""Soak the CDC component maintainers: random base graph, then a random
sequence of add / drop / mixed batches; after every step the maintained
labels must equal a from-scratch ground-truth recompute over the
current edge set."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
from slacken_spark.functions.dedup import (
    components_add_edges, components_drop_edges, connected_components_contract)
from slacken_spark.session import get_spark

def gt(edges):
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]; x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb: parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges: union(a, b)
    lbl = {}
    for x in list(parent):
        r = find(x); lbl[r] = min(lbl.get(r, r), x)
    return {x: lbl[find(x)] for x in parent}

spark = get_spark('soak_cdc', master='local[8]', shuffle_partitions=8)
# SLACKEN_RELIABLE=1 re-runs the whole soak under the reliable-
# checkpoint posture (session.pin routes every maintainer pin site to
# checkpoint()), extending the fixed-fixture identity tests to random
# add/drop/mixed sequences
import os as _os
if _os.environ.get("SLACKEN_RELIABLE") == "1":
    import tempfile as _tf

    from slacken_spark.session import RELIABLE_CHECKPOINT_CONF

    spark.sparkContext.setCheckpointDir(_tf.mkdtemp(prefix="soak_ckpt_"))
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    print("soak_cdc: RELIABLE posture enabled")
fails = 0
for seed in (5, 6, 7):
    rng = np.random.default_rng(seed)
    base = {(int(a), int(b)) for a, b in rng.integers(0, 3000, (4000, 2)) if a != b}
    cur = set(base)
    df = spark.createDataFrame(sorted(cur), "id_a long, id_b long")
    labels = connected_components_contract(df, loop_partitions=8).persist()
    for step in range(4):
        op = ["add", "drop", "mixed"][int(rng.integers(0, 3))]
        adds = {(int(a), int(b)) for a, b in rng.integers(0, 3500, (300, 2)) if a != b} - cur
        drops = set(list(cur)[:0])
        if op in ("drop", "mixed") and len(cur) > 400:
            drop_list = sorted(cur)
            idx = rng.choice(len(drop_list), size=200, replace=False)
            drops = {drop_list[i] for i in idx}
        if op == "add":
            cur |= adds
            labels2 = components_add_edges(
                labels, spark.createDataFrame(sorted(adds), "id_a long, id_b long"),
                loop_partitions=8)
        elif op == "drop":
            cur -= drops
            labels2 = components_drop_edges(
                labels, spark.createDataFrame(sorted(cur), "id_a long, id_b long"),
                spark.createDataFrame(sorted(drops), "id_a long, id_b long"),
                loop_partitions=8)
        else:
            cur -= drops
            mid = components_drop_edges(
                labels, spark.createDataFrame(sorted(cur), "id_a long, id_b long"),
                spark.createDataFrame(sorted(drops), "id_a long, id_b long"),
                loop_partitions=8).persist()
            cur |= adds
            labels2 = components_add_edges(
                mid, spark.createDataFrame(sorted(adds), "id_a long, id_b long"),
                loop_partitions=8)
        labels2 = labels2.persist()
        got = {r["node"]: r["component"] for r in labels2.collect()}
        want = gt(sorted(cur))
        bad = sum(1 for n, c in want.items() if got.get(n) != c)
        # maintained labels may keep isolated nodes (degree-0 after drops) — they must self-label
        extra_bad = sum(1 for n, c in got.items() if n not in want and c != n)
        status = "OK" if bad == 0 and extra_bad == 0 else "FAIL"
        if status == "FAIL": fails += 1
        print(f"seed={seed} step={step} op={op} edges={len(cur)} nodes={len(want)} bad={bad} extra_bad={extra_bad} {status}", flush=True)
        labels.unpersist(); labels = labels2
print("CDC SOAK FAILS:", fails)
spark.stop()
