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


def test_real_decoder_seam_flows_through_extract(spark, monkeypatch):
    """VERDICT r1 #9: swapping in a real decoder is replacing one pure
    function — a monkeypatched 'real' decoder must flow through the same
    mapInPandas plumbing (schema, batching, dim) with use_real_decoder=True."""
    import numpy as np

    def fake_real_decoder(payload: bytes) -> np.ndarray:
        # deterministic stand-in for PIL/opencv: length-derived constant
        return np.full(8, (len(payload) % 97) / 97.0, dtype=np.float32)

    monkeypatch.setattr(M, "decode_image_bytes", fake_real_decoder)
    media = M.synthetic_media(spark, 50, kind="image")
    rows = M.extract_features(media, dim=8, use_real_decoder=True).collect()
    assert len(rows) == 50
    want = (32 % 97) / 97.0  # payloads are 32-byte md5-hex strings
    for r in rows:
        assert r.feat_dim == 8 and len(r.feature) == 8
        assert all(abs(x - want) < 1e-6 for x in r.feature)
