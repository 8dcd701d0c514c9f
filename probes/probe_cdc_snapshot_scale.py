"""Scale probe for ``cdc_snapshot_diff`` (VERDICT r12 item 7): the one
CDC stage without a 100x number — its extra join of hash-distinct sides
on top of the two span-kernel passes.

Two synthetic crawl snapshots at each scale: snapshot A is a
deterministic pseudo-text corpus (md5-chain hex, ~448 chars/doc, JVM-
generated — no Python in the data path); snapshot B re-fetches the
same corpus with a REALISTIC edit rate (10% of docs get a short string
inserted mid-document — the crawl-delta shape CDC exists for; CDC
re-aligns after an insertion, so ~all chunks outside the edited window
stay shared). Timed min-of-3 warm at 1x (~sf0.1 chars) and 100x;
prints per-scale wall, chars/s, the 100x/1x slope, and the result row
(sanity: shared_chars must dominate at a 10% edit rate).

Usage: python probes/probe_cdc_snapshot_scale.py [--scales 1,100]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from slacken_spark.functions.chunking import cdc_snapshot_diff  # noqa: E402
from slacken_spark.session import get_spark  # noqa: E402

# 1x ≈ sf0.1's documents table: 5k docs, ~2.2M chars
DOCS_1X = 5_000
HASH_CHAIN = 14  # 14 md5 hex blocks = 448 chars/doc


def snapshots(spark, n_docs):
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            *[F.md5((F.col("id") * 131 + i).cast("string")) for i in range(HASH_CHAIN)]
        ).alias("text"),
    )
    # 10% of docs edited: insert a 9-char marker mid-document; the rest
    # byte-identical (a crawl re-fetch)
    pos = (F.col("doc_id") * 37 % 300 + 50).cast("int")
    edited = F.concat(
        F.substring(F.col("text"), F.lit(1), pos),
        F.lit("EDITEDV2!"),
        F.expr("substring(text, pos + 1)"),
    )
    new = base.withColumn("pos", pos).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, edited).otherwise(F.col("text")).alias("text"),
    )
    return base, new


def main():
    scales = [1, 100]
    for i, a in enumerate(sys.argv):
        if a == "--scales":
            scales = [int(x) for x in sys.argv[i + 1].split(",")]
    spark = get_spark("probe_cdc_snapshot_scale")
    out = {}
    for scale in scales:
        n = DOCS_1X * scale
        base, new = snapshots(spark, n)
        chars = n * 32 * HASH_CHAIN
        times = []
        row = None
        for _ in range(3):
            t0 = time.time()
            row = cdc_snapshot_diff(base, new, "text", "doc_id").collect()[0]
            times.append(time.time() - t0)
        d = row.asDict()
        shared_frac = d["shared_chars"] / (d["shared_chars"] + d["new_chars"])
        out[scale] = {
            "docs": n,
            "chars_per_snapshot": chars,
            "wall_min3_sec": round(min(times), 2),
            "chars_per_sec_both_sides": round(2 * chars / min(times)),
            "result": d,
            "shared_char_frac": round(shared_frac, 4),
        }
        print(json.dumps({str(scale): out[scale]}))
        assert shared_frac > 0.8, (
            f"10% edit rate must leave most chars shared: {shared_frac}"
        )
    if len(scales) == 2 and all(s in out for s in scales):
        lo, hi = scales
        ratio_data = hi / lo
        ratio_wall = out[hi]["wall_min3_sec"] / out[lo]["wall_min3_sec"]
        print(
            json.dumps(
                {
                    "slope": {
                        "data_ratio": ratio_data,
                        "wall_ratio": round(ratio_wall, 2),
                        "per_unit": round(ratio_wall / ratio_data, 4),
                    }
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
