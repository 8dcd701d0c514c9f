"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

Design for 100 TB: media bytes ride in a ``binary`` column next to typed
metadata (codec, width/height, sample rate, …); all decode / feature
extraction runs in Arrow-batched ``mapInPandas`` so bytes never cross a
row-at-a-time Python boundary. The image/audio libraries are not
available in this container, so the codec step is STUBBED behind
``decoder_available()`` — with a deterministic fake decoder used by
default so the Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is fully real and tested; swapping in Pillow/ffmpeg later
changes only ``_decode_image_real``.

Media schema convention:
  media_id long, kind string ('image'|'audio'|'video'),
  payload binary, meta struct<...> (kind-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_bytes long,"
    " mean_luma double, phash long"
)

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, rms double, zero_crossings long"
)


def decoder_available() -> bool:
    """True when a real image codec is importable (Pillow)."""
    try:  # pragma: no cover - container has no Pillow
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(payload: bytes) -> dict:
    """Real decode path (requires Pillow): decode any PIL-supported
    format, grayscale, mean luma + 64-bit average-hash (8×8 downsample
    thresholded against its mean — same output contract as the fake).
    Skipped-if-absent tests exercise this when the environment has a
    codec (tests/test_multimodal.py::test_image_features_real_codec)."""
    from io import BytesIO

    import numpy as np

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - container has no Pillow
        raise NotImplementedError(
            "image codec not available in this environment; "
            "install Pillow to use decode with use_real=True"
        ) from e

    img = Image.open(BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype=np.float64)
    mean_luma = float(arr.mean()) if arr.size else 0.0
    small = np.asarray(
        img.resize((8, 8), Image.BILINEAR), dtype=np.float64
    ).ravel()
    bits = (small > small.mean()).astype(np.uint64)
    phash = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return {
        "mean_luma": mean_luma,
        "phash": phash - (1 << 64) if phash >= 1 << 63 else phash,
    }


def _decode_image_fake(payload: bytes, width: int, height: int) -> dict:
    """Deterministic fake decoder: derives pixel statistics from the raw
    bytes so tests exercise real data flow with stable results."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    mean_luma = float(arr.mean()) if len(arr) else 0.0
    # 64-bit perceptual-hash stand-in: threshold 64 evenly-spaced bytes
    # against the mean — deterministic, locality-ish
    if len(arr) >= 64:
        idx = (np.arange(64) * (len(arr) // 64)).clip(0, len(arr) - 1)
        bits = (arr[idx] > mean_luma).astype(np.uint64)
        phash = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    else:
        phash = 0
    # two's-complement into signed-long range for Spark LongType
    return {
        "mean_luma": mean_luma,
        "phash": phash - (1 << 64) if phash >= 1 << 63 else phash,
    }


def image_features(df: DataFrame, use_real: bool = False) -> DataFrame:
    """Decode + feature-extract images.

    Input: (media_id long, payload binary, meta struct<width int, height int>).
    Output: IMAGE_FEATURE_SCHEMA. Arrow-batched; one Python call per batch.
    """

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = r.meta if isinstance(r.meta, dict) else r.meta._asdict()
                payload = bytes(r.payload) if r.payload is not None else b""
                if use_real:
                    feats = _decode_image_real(payload)
                else:
                    feats = _decode_image_fake(
                        payload, meta["width"], meta["height"]
                    )
                rows.append(
                    (
                        r.media_id,
                        meta["width"],
                        meta["height"],
                        len(payload),
                        feats["mean_luma"],
                        feats["phash"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_bytes",
                    "mean_luma",
                    "phash",
                ],
            )

    return df.mapInPandas(gen, IMAGE_FEATURE_SCHEMA)


def audio_features(df: DataFrame) -> DataFrame:
    """PCM16 audio statistics (rms, zero crossings) — numpy over the raw
    payload; a real resampler would slot into the same batch loop.

    Input: (media_id long, payload binary, meta struct<sample_rate int>).
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = r.meta if isinstance(r.meta, dict) else r.meta._asdict()
                payload = bytes(r.payload) if r.payload is not None else b""
                pcm = np.frombuffer(
                    payload[: len(payload) // 2 * 2], dtype=np.int16
                ).astype(np.float64)
                rms = float(np.sqrt((pcm**2).mean())) if len(pcm) else 0.0
                zc = int(((pcm[1:] * pcm[:-1]) < 0).sum()) if len(pcm) > 1 else 0
                rows.append(
                    (r.media_id, meta["sample_rate"], len(pcm), rms, zc)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "rms",
                    "zero_crossings",
                ],
            )

    return df.mapInPandas(gen, AUDIO_FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, fps_col: str = "fps", duration_col: str = "duration_s",
    every_s: float = 1.0,
) -> DataFrame:
    """Video frame-sampling plan: explode each video row into the frame
    indices a decoder would extract (one row per sampled frame).

    Pure Spark (sequence + explode) — the expensive decode stays columnar
    and batched downstream; this declarative step lets Catalyst prune and
    repartition frames before any codec runs.
    """
    n_frames = F.floor(F.col(duration_col) / every_s).cast("int")
    return df.withColumn(
        "frame_idx",
        F.explode(
            F.when(
                n_frames > 0,
                F.sequence(F.lit(0), n_frames - 1),
            ).otherwise(F.array().cast("array<int>"))
        ),
    ).withColumn(
        "frame_time_s", F.col("frame_idx") * F.lit(every_s)
    ).withColumn(
        "frame_no", (F.col("frame_time_s") * F.col(fps_col)).cast("long")
    )


def phash_near_dup_pairs(features: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image candidates by perceptual-hash Hamming radius.

    Band the 64-bit phash into 4×16-bit bands (pigeonhole: ≤ max_hamming
    bits differ → at least one band equal when max_hamming < 4·
    (16-band tolerance)); equi-join on (band_id, band_value), then exact
    Hamming filter — the image twin of dedup.minhash_band_pairs.

    The feature source feeds BOTH sides of the self-join and Spark does
    not dedupe common subplans, so an expensive upstream (the batched
    image decode) would run once per side; project to the two columns
    the banding needs and pin (r13-opt) so the decode pass runs exactly
    once and both join sides read the materialized fixed-width rows
    (media_id, phash — 16 bytes/row, bounded by the media count).

    Scale shape (r14, guide §2.5/§8): the self-join runs over DISTINCT
    phashes, not media rows. Re-uploads/re-encodes concentrate on
    identical phashes, so a media-row band join's within-group pair
    output grows quadratically with duplication (the r13 10× probe
    measured a ~204 MB candidate shuffle) and every one of those pairs
    crossed the band exchange AND a final pair-distinct exchange. Here
    each distinct phash carries its sorted member list through one
    |media|-row groupBy; the band join, hamming filter, and pair
    DISTINCT all operate on rep pairs (bounded by distinct-phash
    collisions, not duplication); the media-level pairs are generated
    map-side AFTER the distinct — identical-phash groups via in-group
    index pairs (members sorted, so id_a < id_b by construction),
    cross-phash rep pairs via a member cross-product per rep pair. No
    media pair is produced twice (a pair's two phashes identify its
    unique source rep pair), so the quadratic output never crosses an
    exchange. Output is row-identical to the media-level join: same
    (share-a-band ∧ hamming ≤ max ∧ id_a < id_b) predicate, same
    columns.
    """
    from slacken_spark.session import pin as _pin

    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0: {max_hamming}")
    features = features.select("media_id", "phash")
    # one |media|-row shuffle: distinct phashes with their sorted members
    groups = _pin(
        features.groupBy("phash").agg(
            F.sort_array(F.collect_list("media_id")).alias("members")
        )
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftrightunsigned(F.col("phash"), 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_value"),
            )
            for b in range(4)
        ]
    )
    banded = groups.select("phash", F.explode(bands).alias("band")).select(
        "phash", "band.band_id", "band.band_value"
    )
    a, b = banded.alias("a"), banded.alias("b")
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a.phash") < F.col("b.phash")),
        )
        .select(
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    ga = groups.select(
        F.col("phash").alias("pa"), F.col("members").alias("ma")
    )
    gb = groups.select(
        F.col("phash").alias("pb"), F.col("members").alias("mb")
    )
    cross = (
        rep_pairs.join(ga, "pa")
        .join(gb, "pb")
        .select(
            F.explode("ma").alias("a_id"), F.col("mb"), F.col("hamming")
        )
        .select(
            "a_id", F.explode("mb").alias("b_id"), "hamming"
        )
        .select(
            F.least("a_id", "b_id").alias("id_a"),
            F.greatest("a_id", "b_id").alias("id_b"),
            "hamming",
        )
    )
    # identical-phash members: every in-group pair, hamming 0 (always
    # ≤ max_hamming since max_hamming ≥ 0); members are sorted so
    # pos_a < pos_b ⇒ id_a < id_b
    within = (
        groups.where(F.size("members") >= 2)
        .select(F.posexplode("members").alias("i", "id_a"), "members")
        .select(
            "id_a",
            F.explode(F.slice("members", F.col("i") + 2, F.size("members"))).alias(
                "id_b"
            ),
        )
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.lit(0).cast("long")).alias("hamming"),
        )
    )
    return cross.unionByName(within)
