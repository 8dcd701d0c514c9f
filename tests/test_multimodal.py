"""Multimodal plumbing tests: schema, batching, deterministic fake
decoders, frame-sample planning, phash near-dup banding."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def images(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(6):
        payload = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
        rows.append((i, payload, {"width": 64, "height": 64}))
    # row 6 duplicates row 0's payload exactly (near-dup hamming 0)
    rows.append((6, rows[0][1], {"width": 64, "height": 64}))
    return spark.createDataFrame(
        rows, "media_id long, payload binary, meta struct<width int, height int>"
    )


def test_image_features_schema_and_determinism(spark, images):
    out1 = {r["media_id"]: r for r in M.image_features(images).collect()}
    out2 = {r["media_id"]: r for r in M.image_features(images).collect()}
    assert len(out1) == 7
    for mid, r in out1.items():
        assert r["n_bytes"] == 4096
        assert 0 <= r["mean_luma"] <= 255
        assert r["phash"] == out2[mid]["phash"]  # deterministic
    assert out1[0]["phash"] == out1[6]["phash"]  # identical payloads


def test_real_decoder_is_gated(spark, images):
    if M.decoder_available():
        pytest.skip("Pillow present; real path active")
    with pytest.raises(Exception) as ei:
        M.image_features(images, use_real=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_audio_features(spark):
    # 1 kHz square-ish wave in PCM16: alternating +/- every 4 samples
    sig = np.tile(np.array([1000] * 4 + [-1000] * 4, dtype=np.int16), 100)
    df = spark.createDataFrame(
        [(1, sig.tobytes(), {"sample_rate": 8000})],
        "media_id long, payload binary, meta struct<sample_rate int>",
    )
    r = M.audio_features(df).first()
    assert r["n_samples"] == 800
    assert abs(r["rms"] - 1000.0) < 1e-9
    assert r["zero_crossings"] == 199


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 30.0, 2.5), (2, 24.0, 0.4)], "video_id long, fps double, duration_s double"
    )
    out = M.frame_sample_plan(df, every_s=1.0).collect()
    v1 = [r for r in out if r["video_id"] == 1]
    assert [r["frame_idx"] for r in v1] == [0, 1]
    assert [r["frame_no"] for r in v1] == [0, 30]
    assert not any(r["video_id"] == 2 for r in out)  # too short → no frames


def test_phash_near_dup_banding(spark, images):
    feats = M.image_features(images)
    pairs = M.phash_near_dup_pairs(feats, max_hamming=0).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 6)}
    assert pairs[0]["hamming"] == 0


def test_phash_near_dup_decodes_once(spark, images):
    """The feature source feeds BOTH sides of the band self-join;
    r13-opt pins the (media_id, phash) projection so the batched decode
    runs exactly once — the returned plan must read the pinned blocks
    (Scan ExistingRDD) on both sides and contain NO Python kernel of
    its own (the decode happened inside the one pin materialization)."""
    feats = M.image_features(images)
    pairs = M.phash_near_dup_pairs(feats, max_hamming=0)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, "decode subtree re-printed into the join"
    assert plan.count("Scan ExistingRDD") >= 2, "join sides not on pinned blocks"


@pytest.mark.skipif(
    not M.decoder_available(), reason="Pillow not installed in this env"
)
def test_image_features_real_codec(spark):
    """Real decode path: a generated PNG decodes to its known mean luma
    and a stable 64-bit average-hash (runs wherever Pillow exists)."""
    from io import BytesIO

    from PIL import Image

    def png_bytes(fill):
        img = Image.new("L", (16, 16), color=fill)
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png_bytes(10), {"width": 16, "height": 16}),
            (2, png_bytes(200), {"width": 16, "height": 16})]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, meta struct<width:int,height:int>"
    )
    out = {r["media_id"]: r for r in M.image_features(df, use_real=True).collect()}
    assert abs(out[1]["mean_luma"] - 10.0) < 1e-9
    assert abs(out[2]["mean_luma"] - 200.0) < 1e-9
    # constant image → no pixel above the mean → all-zero hash bits
    assert out[1]["phash"] == 0 and out[2]["phash"] == 0
    # deterministic across runs
    again = {r["media_id"]: r for r in M.image_features(df, use_real=True).collect()}
    assert {k: v["phash"] for k, v in out.items()} == {
        k: v["phash"] for k, v in again.items()
    }
