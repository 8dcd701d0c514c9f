"""Soak content-defined chunking against the pure-Python model on
random unicode-ish corpora: span parity (several window/divisor
geometries), chunk-hash parity, dedup-stats closed form on replicated
docs, and snapshot-diff parity under random edits. Prints FAILS."""
import hashlib
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from slacken_spark.functions.chunking import (  # noqa: E402
    CDC_BASE,
    CDC_MOD,
    cdc_chunk_hashes,
    cdc_chunk_spans,
    cdc_snapshot_diff,
)
from slacken_spark.session import get_spark  # noqa: E402

spark = get_spark("soak_chunking", master="local[8]", shuffle_partitions=8)
fails = 0

ALPHA = list("abcdefgh XYZ.,!\n\t") + ["é", "Ж", "中"]


def rand_text(rng, n):
    return "".join(ALPHA[i] for i in rng.integers(0, len(ALPHA), n))


def model_spans(text, window, divisor):
    n = len(text)
    if n == 0:
        return []
    starts = [0]
    for i in range(window - 1, n):
        h = (
            sum(
                ord(text[i - j]) * pow(CDC_BASE, j, CDC_MOD)
                for j in range(window)
            )
            % CDC_MOD
        )
        if h % divisor == 0 and i + 1 < n:
            starts.append(i + 1)
    return [
        (k, s, (starts[k + 1] if k + 1 < len(starts) else n) - s)
        for k, s in enumerate(starts)
    ]


for seed in (81, 82, 83):
    rng = np.random.default_rng(seed)
    for window, divisor in ((16, 64), (8, 32), (24, 128), (1, 4)):
        docs = {
            i: rand_text(rng, int(rng.integers(0, 600))) for i in range(25)
        }
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {}
        for r in cdc_chunk_spans(
            df, "text", "doc_id", window, divisor
        ).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_ord"], r["start"], r["length"])
            )
        bad = sum(
            sorted(got.get(d, [])) != model_spans(t, window, divisor)
            for d, t in docs.items()
        )
        fails += bad
        print(
            f"seed={seed} w={window} d={divisor} spans "
            f"{'OK' if not bad else f'FAIL({bad})'}",
            flush=True,
        )
    # hash parity + snapshot diff under random edits
    base = {i: rand_text(rng, 2000) for i in range(6)}
    new = dict(base)
    for i in rng.choice(6, 2, replace=False):
        t = base[int(i)]
        p = int(rng.integers(0, len(t)))
        new[int(i)] = t[:p] + rand_text(rng, 12) + t[p:]
    new[999] = rand_text(rng, 1500)

    def occs(dd):
        out = []
        for t in dd.values():
            for _, s, ln in model_spans(t, 16, 64):
                out.append(
                    (hashlib.md5(t[s : s + ln].encode()).hexdigest(), ln)
                )
        return out

    bset = {h for h, _ in occs(base)}
    nocc = occs(new)
    want = (
        sum(1 for h, _ in nocc if h not in bset),
        sum(1 for h, _ in nocc if h in bset),
    )
    bdf = spark.createDataFrame(list(base.items()), "doc_id long, text string")
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    row = cdc_snapshot_diff(bdf, ndf, "text", "doc_id", 16, 64).collect()[0]
    ok = (row["new_chunks"], row["shared_chunks"]) == want
    fails += 0 if ok else 1
    print(f"seed={seed} snapshot_diff {'OK' if ok else 'FAIL'}", flush=True)
    hrows = cdc_chunk_hashes(bdf, "text", "doc_id", 16, 64).collect()
    bad = sum(
        r["chunk_hash"]
        != hashlib.md5(
            base[r["doc_id"]][r["start"] : r["start"] + r["length"]].encode()
        ).hexdigest()
        for r in hrows
    )
    fails += bad
    print(f"seed={seed} hashes {'OK' if not bad else f'FAIL({bad})'}", flush=True)

print(f"CHUNKING SOAK FAILS: {fails}")
spark.stop()
sys.exit(1 if fails else 0)
