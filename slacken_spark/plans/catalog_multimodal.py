"""Query catalog, part 5: multimodal operators over synthetic binary
payloads derived deterministically from the documents table (md5 bytes),
so the DuckDB oracle reproduces every byte and therefore every feature:
a full differential test of the binary-column plumbing.

Payload construction (both engines): 4 md5 blocks of the doc text →
128 hex chars → 64 bytes. Near-dup groups share a payload by hashing
``doc_id % 50`` instead of the text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slacken_spark.functions import multimodal as M
from slacken_spark.plans.catalog import register, t, tp

_N_BLOCKS = 4  # 4 md5 = 64 bytes


def _payload_expr(key_col):
    blocks = [
        F.md5(F.concat(key_col.cast("string"), F.lit(f":{b}")))
        for b in range(_N_BLOCKS)
    ]
    return F.unhex(F.concat(*blocks))


def _hex_sql(key_expr: str) -> str:
    return " || ".join(
        f"md5(CAST({key_expr} AS VARCHAR) || ':{b}')" for b in range(_N_BLOCKS)
    )


# bytes of the hex string as a DuckDB int list
_BYTES_SQL = (
    "list_transform(range(0, 64), i ->"
    " CAST('0x' || substr(hex, CAST(i*2+1 AS INT), 2) AS INT))"
)


def _images(spark, sf_dir, key_col="doc_id"):
    docs = tp(spark, sf_dir, "documents")
    key = F.col(key_col) if key_col == "doc_id" else (F.col("doc_id") % 50)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        _payload_expr(key).alias("payload"),
        F.struct(F.lit(8).alias("width"), F.lit(8).alias("height")).alias("meta"),
    )


@register(
    "media_image_stats",
    f"""
    WITH h AS (SELECT doc_id, {_hex_sql("doc_id")} AS hex FROM documents),
    b AS (SELECT doc_id, {_BYTES_SQL} AS bytes FROM h),
    m AS (SELECT doc_id, bytes, list_sum(bytes) / 64.0 AS mean_luma FROM b)
    SELECT doc_id AS media_id, 8 AS width, 8 AS height,
           CAST(64 AS BIGINT) AS n_bytes,
           mean_luma,
           CAST(list_sum(list_transform(range(0, 63), i ->
               CASE WHEN bytes[CAST(i+1 AS INT)] > mean_luma
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END))
             + CASE WHEN bytes[64] > mean_luma
                    THEN -9223372036854775808 ELSE 0 END AS BIGINT) AS phash
    FROM m
    """,
)
def media_image_stats(spark, sf_dir):
    """image_features over md5-derived payloads; the oracle recomputes
    mean luma (exact: /64 is a power-of-two division) and the 64-bit
    threshold phash, byte for byte, including two's-complement bit 63."""
    return M.image_features(_images(spark, sf_dir))


@register(
    "media_phash_neardup",
    """
    WITH g AS (SELECT doc_id, doc_id % 50 AS grp FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
    FROM g a JOIN g b ON a.grp = b.grp AND a.doc_id < b.doc_id
    """,
)
def media_phash_neardup(spark, sf_dir):
    """phash LSH banding finds exactly the groups that share payloads
    (hamming 0); random md5 phashes collide in no band otherwise — the
    oracle enumerates the expected pairs by construction."""
    feats = M.image_features(_images(spark, sf_dir, key_col="grp"))
    pairs = M.phash_near_dup_pairs(feats, max_hamming=0)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "media_audio_stats",
    f"""
    WITH h AS (SELECT doc_id, {_hex_sql("doc_id")} AS hex FROM documents),
    b AS (SELECT doc_id, {_BYTES_SQL} AS bytes FROM h),
    -- little-endian int16 from byte pairs
    s AS (SELECT doc_id, list_transform(range(0, 32), i ->
              CASE WHEN bytes[CAST(i*2+2 AS INT)] >= 128
                   THEN bytes[CAST(i*2+1 AS INT)] + 256*bytes[CAST(i*2+2 AS INT)] - 65536
                   ELSE bytes[CAST(i*2+1 AS INT)] + 256*bytes[CAST(i*2+2 AS INT)] END)
              AS pcm
          FROM b)
    SELECT doc_id AS media_id, 8000 AS sample_rate,
           CAST(32 AS BIGINT) AS n_samples,
           sqrt(list_sum(list_transform(pcm, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))) / 32.0) AS rms,
           CAST(list_sum(list_transform(range(1, 32), i ->
               CASE WHEN pcm[CAST(i AS INT)] * pcm[CAST(i+1 AS INT)] < 0 THEN 1 ELSE 0 END))
             AS BIGINT) AS zero_crossings
    FROM s
    """,
)
def media_audio_stats(spark, sf_dir):
    """audio_features over md5-derived PCM16; rms matches bitwise (sum of
    exact integer squares, /32 power-of-two, IEEE sqrt)."""
    docs = tp(spark, sf_dir, "documents")
    audio = docs.select(
        F.col("doc_id").alias("media_id"),
        _payload_expr(F.col("doc_id")).alias("payload"),
        F.struct(F.lit(8000).alias("sample_rate")).alias("meta"),
    )
    return M.audio_features(audio)


@register(
    "video_frame_plan",
    """
    WITH v AS (SELECT doc_id AS video_id,
                      24.0 + (doc_id % 3) * 3 AS fps,
                      (doc_id % 7) * 0.8 AS duration_s
               FROM documents),
    f AS (SELECT video_id, fps, duration_s,
                 unnest(range(0, GREATEST(CAST(floor(duration_s / 1.0) AS INT), 0)))
                   AS frame_idx
          FROM v)
    SELECT video_id, CAST(frame_idx AS INT) AS frame_idx,
           frame_idx * 1.0 AS frame_time_s,
           CAST(frame_idx * 1.0 * fps AS BIGINT) AS frame_no
    FROM f
    """,
)
def video_frame_plan(spark, sf_dir):
    """Declarative frame-sampling plan (sequence+explode) — the oracle
    reproduces the arithmetic; the decode step downstream is the stubbed
    codec boundary."""
    docs = tp(spark, sf_dir, "documents")
    videos = docs.select(
        F.col("doc_id").alias("video_id"),
        (24.0 + (F.col("doc_id") % 3) * 3).alias("fps"),
        ((F.col("doc_id") % 7) * 0.8).alias("duration_s"),
    )
    out = M.frame_sample_plan(videos, every_s=1.0)
    return out.select("video_id", "frame_idx", "frame_time_s", "frame_no")
