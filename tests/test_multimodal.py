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
