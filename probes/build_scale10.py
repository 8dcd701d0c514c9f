"""Rebuild the 10x probe corpus at /tmp/sf_scale10 from sf0.1.

Replication rules (each preserves WITHIN-copy structure exactly while
preventing cross-copy duplicate/near-dup pairs, so a 10x corpus keeps
the 1x dup-rate — the honest scale probe):
- documents: copy k prefixes every token with ``ck_`` → copies share
  zero vocabulary; within-copy Jaccard/shingles unchanged.
- embeddings: copy k flips the sign of dim i where hash(k*131+i) is
  even → coordinate-wise Rademacher; within-copy dot products exact,
  cross-copy cosine ~0 (a cyclic roll is NOT enough: these structured
  fixtures keep cosine ~1 under small rolls — measured round 9).
- events: plain replication under id shifts (same per-type value
  distribution, 10x rows per group).
- id shifts divisible by every fixture modulus so per-copy fixture
  behavior is identical (doc: 50,97,7,40,3,13,10000,100,10; vec:
  50,70; event: 10,25; user: 10,256).
Other tables symlink to sf0.1.
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf_scale10"
DOC_SHIFT = 264810000
EV_SHIFT = 12800000
assert all(DOC_SHIFT % m == 0 for m in (50, 97, 7, 40, 3, 13, 10000, 100, 10, 70))
assert all(EV_SHIFT % m == 0 for m in (10, 25, 256))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

parts = []
for k in range(10):
    if k == 0:
        parts.append(f"SELECT doc_id, source, lang, text FROM read_parquet('{SRC}/documents.parquet')")
    else:
        parts.append(
            f"SELECT doc_id + {k*DOC_SHIFT} AS doc_id, source, lang, "
            f"regexp_replace(text, '(\\S+)', 'c{k}_\\1', 'g') AS text "
            f"FROM read_parquet('{SRC}/documents.parquet')")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/documents.parquet' (FORMAT PARQUET)")

parts = [f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet')"]
for k in range(1, 10):
    parts.append(
        f"SELECT vec_id + {k*DOC_SHIFT} AS vec_id, "
        f"list_transform(embedding, (x, i) -> CASE WHEN hash({k}*131 + i) % 2 = 0 THEN x ELSE -x END) AS embedding, "
        f"label FROM read_parquet('{SRC}/embeddings.parquet')")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")

parts = []
for k in range(10):
    parts.append(
        f"SELECT event_id + {k*EV_SHIFT} AS event_id, ts, user_id + {k*EV_SHIFT} AS user_id, "
        f"event_type, value, props FROM read_parquet('{SRC}/events.parquet')")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/events.parquet' (FORMAT PARQUET)")

for f in os.listdir(SRC):
    if f.endswith(".parquet") and not os.path.exists(os.path.join(DST, f)):
        os.symlink(os.path.join(SRC, f), os.path.join(DST, f))
for t in ("documents", "embeddings", "events"):
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
