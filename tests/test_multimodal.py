from __future__ import annotations

import pytest

from connected_components_3d_spark.operators import multimodal as M


def test_synthetic_media_schema(spark):
    media = M.synthetic_media(spark, 50, kind="image")
    assert set(media.columns) == {
        "media_id",
        "kind",
        "payload",
        "width",
        "height",
        "duration_ms",
    }
    r = media.first()
    assert isinstance(bytes(r["payload"]), bytes) and len(bytes(r["payload"])) == 32


def test_extract_features_deterministic_and_partition_invariant(spark):
    media = M.synthetic_media(spark, 100)
    f1 = sorted(
        (r.media_id, tuple(r.feature))
        for r in M.extract_features(media.repartition(2), dim=8).collect()
    )
    f2 = sorted(
        (r.media_id, tuple(r.feature))
        for r in M.extract_features(media.repartition(13), dim=8).collect()
    )
    assert f1 == f2
    assert all(len(f) == 8 for _, f in f1)
    assert all(0.0 <= x < 1.0 for _, f in f1 for x in f)


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        M.decode_image_bytes(b"\x89PNG...")


def test_frame_sample_plan(spark):
    media = M.synthetic_media(spark, 20, kind="video")
    frames = M.frame_sample_plan(media, every_ms=1000)
    rows = frames.groupBy("media_id").count().collect()
    meta = {r.media_id: r.duration_ms for r in media.collect()}
    for r in rows:
        assert r["count"] == meta[r.media_id] // 1000 + 1
