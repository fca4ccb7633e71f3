"""Multimodal plumbing: deterministic fake decode, feature extraction,
nearest-neighbor resize, frame sampling — Spark results equal direct numpy
recomputation on the same payloads (the decode is the only stubbed step;
everything around it is real distributed work)."""

from __future__ import annotations

import numpy as np

from set_sketch_paper_spark.operators.multimodal import (
    N_HIST_BINS,
    _decode_fake,
    _resize_nearest,
    extract_image_features,
    resize_images,
    sample_video_frames,
    synthetic_assets,
)


def test_features_match_numpy(spark):
    assets = synthetic_assets(spark, 60, seed=7)
    src = {r["asset_id"]: r for r in assets.collect()}
    got = {r["asset_id"]: r for r in extract_image_features(assets).collect()}
    assert set(got) == set(src)
    for aid, r in got.items():
        s = src[aid]
        px = _decode_fake(bytes(s["payload"]), s["width"], s["height"])
        assert abs(r["mean"] - float(px.mean())) < 1e-9
        assert abs(r["std"] - float(px.std())) < 1e-9
        hist = np.histogram(px, bins=N_HIST_BINS, range=(0, 256))[0]
        assert [r[f"h{i}"] for i in range(N_HIST_BINS)] == hist.tolist()
        # histogram integrates to the pixel count
        assert sum(hist) == s["width"] * s["height"]


def test_resize_matches_numpy(spark):
    assets = synthetic_assets(spark, 40, seed=7)
    src = {r["asset_id"]: r for r in assets.collect()}
    out = {r["asset_id"]: r for r in resize_images(assets, 8, 12).collect()}
    assert set(out) == set(src)
    for aid, r in out.items():
        assert (r["width"], r["height"]) == (8, 12)
        s = src[aid]
        px = _decode_fake(bytes(s["payload"]), s["width"], s["height"])
        want = _resize_nearest(px, 8, 12)
        got_px = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(12, 8)
        assert (got_px == want).all()


def test_resize_nearest_identity_and_downscale():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert (_resize_nearest(px, 8, 8) == px).all()
    half = _resize_nearest(px, 4, 4)
    assert half.shape == (4, 4)
    # pixel-center sampling picks rows/cols 1,3,5,7
    assert (half == px[1::2, 1::2]).all()


def test_video_frame_sampling(spark):
    assets = synthetic_assets(spark, 30, seed=7)
    frames = sample_video_frames(assets, every_nth=4).collect()
    vids = {r["asset_id"]: r["n_frames"] for r in assets.collect() if r["kind"] == "video"}
    per = {}
    for r in frames:
        per.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert set(per) == set(vids)
    for aid, idxs in per.items():
        assert sorted(idxs) == list(range(0, vids[aid], 4))

# ---------------------------------------------------------------------------
# Pure-numpy codecs: byte-exact planted-pixel round trips
# ---------------------------------------------------------------------------

from set_sketch_paper_spark.operators.multimodal import (  # noqa: E402
    decode_image,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    to_gray,
)


def test_pgm_roundtrip_byte_exact():
    px = np.arange(16 * 24, dtype=np.uint8).reshape(16, 24) % 251
    assert (decode_image(encode_pgm(px)) == px).all()


def test_ppm_roundtrip_byte_exact():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (10, 7, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(rgb)) == rgb).all()


def test_bmp_roundtrip_byte_exact_odd_width():
    """Width 7 forces the 4-byte row padding path (7*3=21 -> stride 24)."""
    rng = np.random.RandomState(4)
    for w in (7, 8, 5, 1):
        rgb = rng.randint(0, 256, (6, w, 3), dtype=np.uint8)
        assert (decode_image(encode_bmp(rgb)) == rgb).all(), w


def test_pnm_comment_and_whitespace_header():
    px = np.full((2, 3), 9, dtype=np.uint8)
    payload = b"P5 # comment\n# another comment\n 3\t2 \n255\n" + px.tobytes()
    assert (decode_image(payload) == px).all()


def test_decode_rejects_unknown_magic():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image(b"\x89PNG1234")


def test_features_on_encoded_assets_match_numpy(spark):
    """End-to-end: genuinely encoded PGM/PPM/BMP payloads through the Spark
    feature extractor equal direct decode + numpy on the same bytes."""
    assets = synthetic_assets(spark, 45, seed=7, codec="encoded")
    src = {r["asset_id"]: r for r in assets.collect()}
    got = {
        r["asset_id"]: r
        for r in extract_image_features(assets, decode_backend="auto").collect()
    }
    assert set(got) == set(src)
    for aid, r in got.items():
        px = to_gray(decode_image(bytes(src[aid]["payload"])))
        assert px.shape == (src[aid]["height"], src[aid]["width"])
        assert abs(r["mean"] - float(px.mean())) < 1e-9
        assert abs(r["std"] - float(px.std())) < 1e-9
        hist = np.histogram(px, bins=N_HIST_BINS, range=(0, 256))[0]
        assert [r[f"h{i}"] for i in range(N_HIST_BINS)] == hist.tolist()


def test_resize_on_encoded_assets_byte_exact(spark):
    assets = synthetic_assets(spark, 30, seed=11, codec="encoded")
    src = {r["asset_id"]: r for r in assets.collect()}
    out = {
        r["asset_id"]: r
        for r in resize_images(assets, 8, 8, decode_backend="auto").collect()
    }
    for aid, r in out.items():
        px = to_gray(decode_image(bytes(src[aid]["payload"])))
        want = _resize_nearest(px, 8, 8)
        got_px = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(8, 8)
        assert (got_px == want).all()
