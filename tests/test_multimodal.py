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


def test_codec_stubs_raise(media):
    with pytest.raises(NotImplementedError):
        resize_image(media, 8, 8)
    with pytest.raises(NotImplementedError):
        sample_frames(media, 1000)


def test_pack_roundtrip():
    blob = pack_fake_media(12, 34, 567, b"abc")
    assert blob[:4] == b"ETLM" and blob.endswith(b"abc")
