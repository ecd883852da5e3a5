"""Multimodal decode tests: every synthesized payload is a REAL
container whose decoded metadata must equal the synthesis parameters
(no hash-derived fakes), and the stub fallback fires only for
unparseable payloads."""

from __future__ import annotations

from anno_spark.operators.multimodal import (
    decode_avi,
    decode_media,
    decode_png,
    decode_wav,
    make_avi,
    make_png,
    make_wav,
)


class TestContainerRoundtrip:
    def test_png(self):
        meta = decode_png(make_png(17, 9, 5))
        assert meta == {
            "width": 17, "height": 9, "duration_ms": 0, "decoder": "png-header",
        }

    def test_wav(self):
        meta = decode_wav(make_wav(250, 3))
        assert meta["duration_ms"] == 250 and meta["decoder"] == "wav-header"

    def test_avi(self):
        meta = decode_avi(make_avi(320, 240, 15, 15, 2))
        assert meta == {
            "width": 320, "height": 240,
            "duration_ms": (1_000_000 // 15) * 15 // 1000,  # 999: int µs/frame
            "decoder": "avi-header",
        }

    def test_stub_only_for_garbage(self):
        assert decode_media("video", b"not a container")["decoder"] == "stub"
        assert decode_media("video", make_avi(160, 120, 5, 10, 0))["decoder"] == "avi-header"
        assert decode_media("image", make_png(4, 4, 0))["decoder"] == "png-header"
        assert decode_media("audio", make_wav(100, 0))["decoder"] == "wav-header"


class TestSparkContract:
    def test_features_decode_every_kind_for_real(self, spark):
        from anno_spark.operators.multimodal import extract_features, synthesize_media

        feats = extract_features(synthesize_media(spark, 30)).collect()
        assert len(feats) == 30
        by_kind = {}
        for r in feats:
            by_kind.setdefault(r["kind"], []).append(r)
            assert len(r["feature"]) == 8 and r["n_bytes"] > 0
        assert set(by_kind) == {"image", "audio", "video"}
        assert all(r["decoder"] == "png-header" for r in by_kind["image"])
        assert all(r["decoder"] == "wav-header" for r in by_kind["audio"])
        assert all(r["decoder"] == "avi-header" for r in by_kind["video"])
        # metadata must match the synthesis parameters (media_id drives both)
        for r in by_kind["image"]:
            i = r["media_id"]
            assert (r["width"], r["height"]) == (8 + i % 24, 6 + i % 18)
        for r in by_kind["audio"]:
            assert r["duration_ms"] == 50 + (r["media_id"] % 20) * 25
        for r in by_kind["video"]:
            i = r["media_id"]
            fps = 10 + (i % 3) * 5
            assert (r["width"], r["height"]) == (160 + (i % 8) * 40, 120 + (i % 6) * 40)
            assert r["duration_ms"] == (1_000_000 // fps) * (5 + i % 20) // 1000
