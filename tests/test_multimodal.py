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
    assets = synthetic_assets(spark, 45, seed=7, codec="encoded").filter(
        "kind != 'audio'"
    )
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
    assets = synthetic_assets(spark, 30, seed=11, codec="encoded").filter(
        "kind != 'audio'"
    )
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


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) codec + audio features
# ---------------------------------------------------------------------------

import struct  # noqa: E402
import pytest  # noqa: E402

from set_sketch_paper_spark.operators.multimodal import (  # noqa: E402
    AUDIO_BANDS,
    audio_feature_row,
    decode_wav,
    encode_wav,
    extract_audio_features,
)


def test_wav_roundtrip_byte_exact_mono_and_stereo():
    rng = np.random.RandomState(3)
    mono = rng.randint(-2**15, 2**15, 1601).astype(np.int16)  # odd data size? 1601*2 even; use n odd channels
    got, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and got.dtype == np.int16
    assert (got == mono).all()
    stereo = rng.randint(-2**15, 2**15, (500, 2)).astype(np.int16)
    got2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and got2.shape == (500, 2)
    assert (got2 == stereo).all()


def test_wav_chunk_walking_and_odd_padding():
    """decode_wav must walk past non-data chunks (LIST/INFO, odd-sized with
    pad byte) rather than assume the canonical 44-byte layout."""
    samples = np.arange(-50, 50, dtype=np.int16)
    canonical = encode_wav(samples, 16000)
    fmt_chunk = canonical[12:36]            # 'fmt ' + size + 16 bytes
    data_chunk = canonical[36:]             # 'data' + size + raster
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size -> pad
    body = b"WAVE" + junk + fmt_chunk + b"junk" + struct.pack("<I", 4) + b"abcd" + data_chunk
    crafted = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(crafted)
    assert rate == 16000
    assert (got == samples).all()


def test_wav_8bit_pcm():
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 3) + u8.tobytes() + b"\x00"
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(payload)
    assert got.tolist() == [(-128) << 8, 0, 127 << 8]


def test_wav_rejects_bad_payloads():
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 40)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # no chunks


def test_audio_features_pure_tone():
    """1 kHz tone at 16 kHz: zcr ~ 2*f/rate, centroid ~ 1 kHz, energy in
    band 1 (300-1000 is exclusive of 1000 -> band 2 [1000,3000) holds it)."""
    rate, f = 16000, 1000.0
    t = np.arange(4096) / rate
    s = (np.sin(2 * np.pi * f * t) * 20000).astype(np.int16)
    feats = audio_feature_row(s, rate)
    assert abs(feats["zcr"] - 2 * f / rate) < 0.01
    assert abs(feats["spectral_centroid"] - f) < 20.0
    assert feats["band2"] > 0.95
    assert abs(feats["rms"] - (20000 / 32768) / np.sqrt(2)) < 0.01
    assert feats["duration_sec"] == 4096 / rate


def test_audio_features_on_encoded_assets_match_numpy(spark):
    """End-to-end: genuine WAV payloads through the Spark extractor equal
    direct decode_wav + audio_feature_row on the same bytes."""
    assets = synthetic_assets(spark, 45, seed=7, codec="encoded")
    src = {r["asset_id"]: r for r in assets.filter("kind = 'audio'").collect()}
    got = {
        r["asset_id"]: r
        for r in extract_audio_features(assets, decode_backend="auto").collect()
    }
    assert set(got) == set(src) and len(got) == 15
    for aid, r in got.items():
        samples, rate = decode_wav(bytes(src[aid]["payload"]))
        want = audio_feature_row(samples, rate)
        assert r["sample_rate"] == rate == 16000
        for key, val in want.items():
            assert abs(r[key] - val) < 1e-12, (aid, key)
        assert abs(sum(r[f"band{i}"] for i in range(len(AUDIO_BANDS))) - 1.0) < 0.05


# ---------------------------------------------------------------------------
# Video: concatenated-PGM frame stream
# ---------------------------------------------------------------------------

from set_sketch_paper_spark.operators.multimodal import (  # noqa: E402
    decode_video,
    encode_video,
    sample_video_frames_decoded,
)


def test_video_roundtrip_byte_exact():
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (7, 12, 9), dtype=np.uint8)
    got = decode_video(encode_video(frames))
    assert got.shape == (7, 12, 9)
    assert (got == frames).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_video(b"P6\n1 1\n255\n\x00\x00\x00")  # not a P5 stream
    with _pytest.raises(ValueError):
        decode_video(b"")


def test_video_frame_sampling_decoded_matches_numpy(spark):
    """Sampled-frame stats from the Spark path equal direct decode_video +
    numpy on the same bytes, with the configured stride."""
    assets = synthetic_assets(spark, 30, seed=7, codec="encoded")
    src = {r["asset_id"]: r for r in assets.filter("kind = 'video'").collect()}
    got = {}
    for r in sample_video_frames_decoded(assets, every_nth=4).collect():
        got[(r["asset_id"], r["frame_idx"])] = r
    assert len(src) == 10
    assert len(got) == 10 * 3  # 12 frames, stride 4 -> frames 0, 4, 8
    for aid, srow in src.items():
        frames = decode_video(bytes(srow["payload"]))
        assert frames.shape[0] == srow["n_frames"] == 12
        for idx in range(0, 12, 4):
            r = got[(aid, idx)]
            assert r["n_frames"] == 12
            assert abs(r["mean"] - float(frames[idx].mean())) < 1e-9
            assert abs(r["std"] - float(frames[idx].std())) < 1e-9
    # frames genuinely differ (brightness ramp) -> stats are frame-specific
    means = [got[(aid, 0)]["mean"] for aid in src] + [got[(aid, 8)]["mean"] for aid in src]
    assert len(set(round(m, 6) for m in means)) > 10
