"""Multimodal binary-column plumbing tests (codec stubs, real Spark paths)."""

from __future__ import annotations

import pytest

from etl_spark.operators.multimodal import (
    decode_media_meta,
    extract_features,
    media_stats,
    pack_fake_media,
    resize_image,
    sample_frames,
    synthesize_media_df,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media_df(spark, n=48, seed=3)


def test_decode_meta_matches_header(media):
    out = decode_media_meta(media)
    n = out.count()
    assert n == 48
    assert (
        out.filter(
            "decoded_width = meta.width AND decoded_height = meta.height "
            "AND decoded_duration_ms = meta.duration_ms"
        ).count()
        == n
    )


def test_decode_meta_rejects_garbage(spark):
    from etl_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [("bad", "image", "image/fake", b"NOTMAGIC-garbage", (1, 1, 0, 16))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = decode_media_meta(df).first()
    assert r["decoded_width"] is None and r["payload_bytes"] is None


def test_feature_histogram_normalized(media):
    rows = extract_features(media, n_features=8).select("features").collect()
    for r in rows:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-3


def test_media_stats_prunes_blob_column(media, tmp_path):
    path = str(tmp_path / "media")
    media.write.parquet(path)
    df = media.sparkSession.read.parquet(path)
    plan = media_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "data" not in plan.split("ReadSchema")[-1][:400]


def test_resize_image_nearest_neighbor(spark):
    """Real resize on the raw format: a 4x4 gradient downsampled to 2x2
    must pick exactly the nearest-neighbor pixels; meta updates; non-image
    rows pass through unchanged."""
    import numpy as np

    from etl_spark.operators.multimodal import MEDIA_SCHEMA, _HDR_SIZE

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    rows = [
        ("img1", "image", "image/fake", pack_fake_media(4, 4, 0, img.tobytes()),
         (4, 4, 0, 16 + _HDR_SIZE)),
        ("aud1", "audio", "audio/fake", pack_fake_media(0, 0, 500, b"\x01\x02"),
         (0, 0, 500, 2 + _HDR_SIZE)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["asset_id"]: r for r in resize_image(media, 2, 2).collect()}
    resized = bytes(out["img1"]["data"])[_HDR_SIZE:]
    # ys = [0,2], xs = [0,2] -> pixels (0,0),(0,2),(2,0),(2,2) = 0,2,8,10
    assert list(resized) == [0, 2, 8, 10]
    assert out["img1"]["meta"]["width"] == 2 and out["img1"]["meta"]["height"] == 2
    assert bytes(out["aud1"]["data"]) == bytes(rows[1][3])  # untouched


def test_sample_frames_cadence(spark):
    """Real frame sampling: 3-frame video at 100ms cadence sampled every
    200ms yields frames 0 and 2 with correct bytes."""
    import numpy as np

    from etl_spark.operators.multimodal import MEDIA_SCHEMA, _HDR_SIZE

    frames = [np.full((2, 2), i, dtype=np.uint8) for i in range(3)]
    body = b"".join(f.tobytes() for f in frames)
    rows = [
        ("vid1", "video", "video/fake", pack_fake_media(2, 2, 300, body),
         (2, 2, 300, len(body) + _HDR_SIZE)),
        ("img1", "image", "image/fake", pack_fake_media(2, 2, 0, frames[0].tobytes()),
         (2, 2, 0, 4 + _HDR_SIZE)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sorted(
        (r["ts_ms"], r["frame_idx"], bytes(r["frame"])[0])
        for r in sample_frames(media, 200).collect()
    )
    assert got == [(0, 0, 0), (200, 2, 2)]  # image row produced nothing


def test_compressed_codec_paths_raise(spark):
    """Payloads that are not the raw raster format still raise with the
    documented library plug-point."""
    from etl_spark.operators.multimodal import MEDIA_SCHEMA, _HDR_SIZE

    rows = [  # image whose payload length != w*h -> "compressed"
        ("imgz", "image", "image/png", pack_fake_media(4, 4, 0, b"\x89PNG"),
         (4, 4, 0, 4 + _HDR_SIZE)),
        ("vidz", "video", "video/mp4", pack_fake_media(2, 2, 300, b"xyz"),
         (2, 2, 300, 3 + _HDR_SIZE)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception, match="image library|NotImplementedError"):
        resize_image(media, 2, 2).collect()
    with pytest.raises(Exception, match="ffmpeg|NotImplementedError"):
        sample_frames(media, 100).collect()


def test_pack_roundtrip():
    blob = pack_fake_media(12, 34, 567, b"abc")
    assert blob[:4] == b"ETLM" and blob.endswith(b"abc")
