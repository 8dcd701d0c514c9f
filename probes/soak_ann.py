"""Soak the similarity surface vs numpy brute force: cosine_topk exact
equality (rounded sims, ascending-id tie-break), ivf_assign nearest-
centroid agreement, and ivf_topk(nprobe) ≡ brute force restricted to
the probed lists — the recall accounting, not just the ranking."""
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
from slacken_spark.functions.similarity import cosine_topk, ivf_assign, ivf_topk
from slacken_spark.session import get_spark

spark = get_spark('soak_ann', master='local[8]', shuffle_partitions=8)
fails = 0
D = 24
for seed in (67, 68):
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(200, D)); C /= np.linalg.norm(C, axis=1, keepdims=True)
    Q = C[:25] + 0.3 * rng.normal(size=(25, D))
    cdf = spark.createDataFrame([(i, [float(x) for x in v]) for i, v in enumerate(C)],
                                "c_id long, c_vec array<double>")
    qdf = spark.createDataFrame([(i, [float(x) for x in v]) for i, v in enumerate(Q)],
                                "q_id long, q_vec array<double>")
    # exact topk
    got = {(r["q_id"], r["rnk"]): (r["c_id"], r["sim"]) for r in
           cosine_topk(qdf, cdf, k=5).collect()}
    sims = (Q @ C.T) / (np.linalg.norm(Q, axis=1, keepdims=True) * np.linalg.norm(C, axis=1))
    sims_r = np.round(sims, 4)
    bad = 0
    for qi in range(len(Q)):
        order = sorted(((float(-sims_r[qi, ci]), ci) for ci in range(len(C)) if ci != qi))
        for rnk in range(1, 6):
            want_ci = order[rnk - 1][1]
            g_ci, g_sim = got[(qi, rnk)]
            if g_ci != want_ci or abs(g_sim - sims_r[qi, want_ci]) > 1e-12:
                bad += 1
    s1 = "OK" if bad == 0 else f"FAIL({bad})"
    if bad: fails += 1
    # IVF assignment vs numpy argmax (first occurrence on ties)
    cents = [[float(x) for x in v] for v in rng.normal(size=(8, D))]
    ca = {r["c_id"]: r["centroid_id"] for r in ivf_assign(cdf, "c_vec", cents).collect()}
    CM = np.array(cents)
    csims = (C @ CM.T) / (np.linalg.norm(C, axis=1, keepdims=True) * np.linalg.norm(CM, axis=1))
    want_assign = np.argmax(csims, axis=1)
    bad2 = sum(1 for i in range(len(C)) if ca[i] != want_assign[i])
    s2 = "OK" if bad2 == 0 else f"FAIL({bad2})"
    if bad2: fails += 1
    # ivf_topk(nprobe=2) ≡ brute force over the probed lists
    got_ivf = {}
    for r in ivf_topk(qdf, cdf, cents, k=3, nprobe=2).collect():
        got_ivf.setdefault(r["q_id"], []).append((r["rnk"], r["c_id"]))
    qsims = (Q @ CM.T) / (np.linalg.norm(Q, axis=1, keepdims=True) * np.linalg.norm(CM, axis=1))
    bad3 = 0
    for qi in range(len(Q)):
        probes = set(np.argsort(-np.round(qsims[qi], 12))[:2])
        # replicate the engine's probe choice: top-2 centroid sims,
        # first-occurrence tie-break
        order = sorted(((float(-np.round(qsims[qi, c], 4)), c) for c in range(len(cents))))
        probes = {order[0][1], order[1][1]}
        cand = [ci for ci in range(len(C)) if ci != qi and want_assign[ci] in probes]
        want = [ci for _, ci in sorted(((float(-sims_r[qi, ci]), ci) for ci in cand))][:3]
        gl = [ci for _, ci in sorted(got_ivf.get(qi, []))]
        if gl != want: bad3 += 1
    s3 = "OK" if bad3 == 0 else f"FAIL({bad3})"
    if bad3: fails += 1
    print(f"seed={seed} cosine_topk {s1}  ivf_assign {s2}  ivf_topk_nprobe2 {s3}", flush=True)
print("ANN SOAK FAILS:", fails)
spark.stop()
