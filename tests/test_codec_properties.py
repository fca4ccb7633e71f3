"""Property-based codec roundtrips (hypothesis): every encoder/decoder pair
in operators/multimodal.py must roundtrip ARBITRARY valid arrays
byte-exactly, not just the fixed fixtures in test_multimodal.py.

Pure-numpy functions only — no Spark session, so hundreds of examples run
in seconds.  Shapes are bounded small; content is unconstrained bytes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from set_sketch_paper_spark.operators.multimodal import (
    decode_image,
    decode_video,
    decode_wav,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    encode_video,
    encode_wav,
    to_gray,
    _resize_nearest,
)

dims = st.integers(min_value=1, max_value=17)


def _arr(draw, h, w, channels=None):
    shape = (h, w) if channels is None else (h, w, channels)
    n = int(np.prod(shape))
    data = draw(st.binary(min_size=n, max_size=n))
    return np.frombuffer(data, dtype=np.uint8).reshape(shape)


@settings(max_examples=60, deadline=None)
@given(st.data(), dims, dims)
def test_pgm_roundtrip(data, h, w):
    px = _arr(data.draw, h, w)
    assert np.array_equal(decode_image(encode_pgm(px)), px)


@settings(max_examples=60, deadline=None)
@given(st.data(), dims, dims)
def test_ppm_roundtrip(data, h, w):
    rgb = _arr(data.draw, h, w, 3)
    assert np.array_equal(decode_image(encode_ppm(rgb)), rgb)


@settings(max_examples=60, deadline=None)
@given(st.data(), dims, dims)
def test_bmp_roundtrip(data, h, w):
    # BMP rows are 4-byte padded; arbitrary (h, w) exercises every padding
    rgb = _arr(data.draw, h, w, 3)
    assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)


@settings(max_examples=60, deadline=None)
@given(st.data(), dims, dims)
def test_to_gray_rec601_bounds(data, h, w):
    rgb = _arr(data.draw, h, w, 3)
    g = to_gray(rgb)
    assert g.shape == (h, w) and g.dtype == np.uint8
    lo = rgb.min(axis=2).astype(np.int32)
    hi = rgb.max(axis=2).astype(np.int32)
    # integer luma is a convex-ish combination: never outside [min-1, max]
    assert (g >= lo - 1).all() and (g <= hi).all()


@settings(max_examples=40, deadline=None)
@given(st.data(), st.integers(1, 5), dims, dims)
def test_video_roundtrip(data, n_frames, h, w):
    frames = np.stack([_arr(data.draw, h, w) for _ in range(n_frames)])
    assert np.array_equal(decode_video(encode_video(frames)), frames)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-(2**15), 2**15 - 1), min_size=1, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(samples, rate):
    arr = np.asarray(samples, dtype=np.int16)
    out, out_rate = decode_wav(encode_wav(arr, rate))
    assert out_rate == rate
    assert np.array_equal(out, arr)


@settings(max_examples=60, deadline=None)
@given(st.data(), dims, dims, dims, dims)
def test_resize_nearest_properties(data, h, w, nh, nw):
    px = _arr(data.draw, h, w)
    out = _resize_nearest(px, nw, nh)
    assert out.shape == (nh, nw)
    # every output pixel is an input pixel (nearest neighbor never blends)
    assert set(np.unique(out)) <= set(np.unique(px))
    # identity resize is exact
    assert np.array_equal(_resize_nearest(px, w, h), px)


# --- PNG (stdlib-zlib DEFLATE + numpy un-filtering) ---

from set_sketch_paper_spark.operators.multimodal import (  # noqa: E402
    _png_chunk,
    _PNG_MAGIC,
    decode_png,
    encode_png,
)


@settings(max_examples=60, deadline=None)
@given(st.data(), dims, dims)
def test_png_gray_roundtrip(data, h, w):
    px = _arr(data.draw, h, w)
    assert np.array_equal(decode_png(encode_png(px)), px)
    # and via the magic-sniffing entry
    assert np.array_equal(decode_image(encode_png(px)), px)


@settings(max_examples=60, deadline=None)
@given(st.data(), dims, dims)
def test_png_rgb_roundtrip(data, h, w):
    rgb = _arr(data.draw, h, w, 3)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Reference forward filtering (RFC 2083 §6) — builds a raster whose
    every row uses `ftype`, so decode_png must invert each filter path."""
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch).astype(np.int64)
    out = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        uleft = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - (left + prev) // 2
        else:
            p = left + prev - uleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - uleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, uleft)
            )
            filt = cur - pred
        out += bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    return out


@settings(max_examples=30, deadline=None)
@given(st.data(), st.integers(2, 11), st.integers(2, 11),
       st.sampled_from([0, 1, 2, 3, 4]), st.sampled_from([1, 3]))
def test_png_decode_inverts_every_filter(data, h, w, ftype, ch):
    """Hand-build a PNG whose rows all use filter `ftype` (our encoder only
    emits 0) and check decode recovers the image — exercises the Sub /
    Up / Average / Paeth inverse paths against the forward reference."""
    import struct as _s
    import zlib as _z

    img = _arr(data.draw, h, w) if ch == 1 else _arr(data.draw, h, w, 3)
    raw = _forward_filter(img, ftype)
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 0 if ch == 1 else 2, 0, 0, 0)
    payload = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


# --- baseline grayscale JPEG (operators/jpeg.py) ---

from set_sketch_paper_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    decode_jpeg_spectrum,
    encode_jpeg,
    quantized_blocks,
)


@settings(max_examples=40, deadline=None)
@given(st.data(), st.integers(1, 40), st.integers(1, 40),
       st.sampled_from([10, 50, 85, 95]))
def test_jpeg_entropy_layer_lossless(data, h, w, quality):
    """The lossy step is quantization ONLY: the Huffman/RLE/zigzag/DC-pred
    entropy layer must reproduce the encoder's quantized spectrum EXACTLY
    for arbitrary images, sizes (incl. non-multiples of 8) and qualities."""
    px = _arr(data.draw, h, w)
    payload = encode_jpeg(px, quality=quality)
    assert np.array_equal(quantized_blocks(px, quality)[3],
                          decode_jpeg_spectrum(payload))


@settings(max_examples=25, deadline=None)
@given(st.integers(9, 48), st.integers(9, 48), st.integers(0, 1000))
def test_jpeg_smooth_image_psnr(h, w, seed):
    """Smooth content at quality 90 decodes above 38 dB PSNR and through
    the magic-sniffing multimodal entry."""
    from set_sketch_paper_spark.operators.multimodal import decode_image

    x, y = np.meshgrid(np.arange(w), np.arange(h))
    img = (128 + 80 * np.sin((x + seed) / 6.0) * np.cos(y / 5.0)).astype(np.uint8)
    out = decode_image(encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 38.0, psnr


def test_jpeg_quality_monotone():
    """Higher quality -> larger file and better PSNR (sanity of the IJG
    quant scaling)."""
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    img = (128 + 80 * np.sin(x / 6.0) * np.cos(y / 5.0)).astype(np.uint8)
    sizes, psnrs = [], []
    for q in (10, 50, 90):
        p = encode_jpeg(img, quality=q)
        out = decode_jpeg(p)
        mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
        sizes.append(len(p))
        psnrs.append(10 * np.log10(255.0**2 / max(mse, 1e-9)))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_jpeg_rejects_bad_shapes_and_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 4), dtype=np.uint8))  # RGBA unsupported
    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


@settings(max_examples=25, deadline=None)
@given(st.data(), st.integers(8, 40), st.integers(8, 40),
       st.sampled_from([1, 2, 5]))
def test_jpeg_restart_markers_roundtrip(data, h, w, interval):
    """DRI/RSTn path: restart markers byte-align and reset DC prediction;
    the spectrum must still be recovered exactly."""
    px = _arr(data.draw, h, w)
    payload = encode_jpeg(px, quality=85, restart_interval=interval)
    assert b"\xff\xdd" in payload  # DRI present
    assert np.array_equal(quantized_blocks(px, 85)[3],
                          decode_jpeg_spectrum(payload))
    assert decode_jpeg(payload).shape == (h, w)


def test_jpeg_scan_time_linear_not_quadratic():
    """The bit accumulators must stay bounded: 4x the pixels may cost ~4x,
    never ~16x (the masked-accumulator regression gate)."""
    import time

    rng = np.random.RandomState(3)
    small = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    big = rng.randint(0, 256, (128, 128), dtype=np.uint8)

    def cost(img):
        t0 = time.perf_counter()
        p = encode_jpeg(img, quality=85)
        decode_jpeg(p)
        return time.perf_counter() - t0

    cost(small)  # warm
    ratio = cost(big) / max(cost(small), 1e-9)
    assert ratio < 10.0, ratio  # 4x data: linear ~4x, quadratic was ~16x


@settings(max_examples=30, deadline=None)
@given(st.data(), st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([50, 85, 95]), st.sampled_from([0, 3]))
def test_jpeg_color_entropy_layer_lossless(data, h, w, quality, interval):
    """Color (YCbCr 4:4:4) path: the interleaved-MCU entropy layer must
    reproduce all three quantized spectra exactly, with and without
    restart markers."""
    from set_sketch_paper_spark.operators.jpeg import quantized_blocks_color

    rgb = _arr(data.draw, h, w, 3)
    payload = encode_jpeg(rgb, quality=quality, restart_interval=interval)
    zz_enc = quantized_blocks_color(rgb, quality)[3]
    zz_dec = decode_jpeg_spectrum(payload)
    assert all(np.array_equal(a, b) for a, b in zip(zz_enc, zz_dec))
    assert decode_jpeg(payload).shape == (h, w, 3)


def test_jpeg_color_smooth_psnr():
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    rgb = np.stack([
        (128 + 80 * np.sin(x / 6.0)).astype(np.uint8),
        (128 + 80 * np.cos(y / 5.0)).astype(np.uint8),
        (128 + 60 * np.sin((x + y) / 7.0)).astype(np.uint8),
    ], axis=-1)
    out = decode_jpeg(encode_jpeg(rgb, quality=90))
    mse = ((out.astype(float) - rgb.astype(float)) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 38.0


@settings(max_examples=30, deadline=None)
@given(st.data(), st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([(2, 2), (2, 1)]),
       st.sampled_from([50, 85, 95]), st.sampled_from([0, 3]))
def test_jpeg_subsampled_entropy_layer_lossless(data, h, w, samp, quality, interval):
    """4:2:0 / 4:2:2 path: interleaved MCUs carry hf*vf luma blocks plus one
    block per chroma component; the entropy layer must reproduce all three
    component-resolution spectra exactly (plane-raster order on both
    sides), with and without restart markers."""
    from set_sketch_paper_spark.operators.jpeg import quantized_blocks_color

    rgb = _arr(data.draw, h, w, 3)
    payload = encode_jpeg(rgb, quality=quality, restart_interval=interval,
                          sampling=samp)
    zz_enc = quantized_blocks_color(rgb, quality, samp)[3]
    zz_dec = decode_jpeg_spectrum(payload)
    assert all(np.array_equal(a, b) for a, b in zip(zz_enc, zz_dec))
    # luma spectrum has samp[0]*samp[1] times the chroma block count
    assert len(zz_dec[0]) == samp[0] * samp[1] * len(zz_dec[1])
    assert decode_jpeg(payload).shape == (h, w, 3)


def test_jpeg_subsampled_smooth_psnr():
    """4:2:0 and 4:2:2 decode of a smooth image stays visually faithful
    (chroma is genuinely quarter-/half-res: expect a bit below the 4:4:4
    figure but far above noise)."""
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    rgb = np.stack([
        (128 + 80 * np.sin(x / 6.0)).astype(np.uint8),
        (128 + 80 * np.cos(y / 5.0)).astype(np.uint8),
        (128 + 60 * np.sin((x + y) / 7.0)).astype(np.uint8),
    ], axis=-1)
    for samp in [(2, 2), (2, 1)]:
        out = decode_jpeg(encode_jpeg(rgb, quality=90, sampling=samp))
        mse = ((out.astype(float) - rgb.astype(float)) ** 2).mean()
        assert 10 * np.log10(255.0**2 / mse) > 30.0, samp


def test_jpeg_subsampled_via_decode_image():
    """The multimodal sniffing path handles subsampled payloads end-to-end
    (the round-4 NotImplementedError gate is gone for 4:2:0/4:2:2)."""
    rng = np.random.RandomState(5)
    rgb = np.clip(
        128 + 40 * np.sin(np.arange(17 * 23 * 3).reshape(17, 23, 3) / 11.0)
        + rng.randint(-5, 5, (17, 23, 3)),
        0, 255,
    ).astype(np.uint8)
    out = decode_image(encode_jpeg(rgb, quality=90, sampling=(2, 2)))
    assert out.shape == (17, 23, 3)
    assert out.dtype == np.uint8


@settings(max_examples=25, deadline=None)
@given(st.data(), st.integers(0, 400))
def test_jpeg_truncation_raises_valueerror(data, frac):
    """EVERY truncation point of a valid subsampled+restart-marker file must
    raise ValueError (never IndexError) — the malformed-media contract
    (ADVICE r4): callers catch one exception type for all corrupt inputs."""
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (18, 18, 3), dtype=np.uint8)
    payload = encode_jpeg(rgb, quality=85, restart_interval=2, sampling=(2, 2))
    cut = 2 + (frac * (len(payload) - 3)) // 401
    try:
        decode_jpeg(payload[:cut])
    except ValueError:
        pass  # the contract
    # no exception is fine too (a cut at EOI can still parse)


def test_jpeg_trailing_ff_raises_valueerror():
    """A file ending mid-fill-bytes (0xFF run to EOF) must raise ValueError,
    not IndexError, from the header marker walk."""
    rng = np.random.RandomState(9)
    payload = encode_jpeg(rng.randint(0, 256, (8, 8), dtype=np.uint8))
    for tail in (b"\xff", b"\xff\xff\xff"):
        try:
            decode_jpeg(payload[:20] + tail)
        except ValueError:
            continue
        raise AssertionError("expected ValueError on truncated fill bytes")


# --- progressive JPEG (SOF2: spectral selection + successive approximation) ---


@settings(max_examples=40, deadline=None)
@given(st.data(), st.integers(1, 40), st.integers(1, 40),
       st.sampled_from([10, 50, 85]))
def test_jpeg_progressive_gray_lossless(data, h, w, quality):
    """The full progressive scan script (DC Al=1 -> banded AC first passes
    -> DC + AC refinement) must deliver EVERY quantized coefficient: the
    accumulated spectrum equals the baseline encoder's exactly, so
    progressive and baseline decodes of the same image are pixel-identical."""
    from set_sketch_paper_spark.operators.jpeg import encode_jpeg_progressive

    px = _arr(data.draw, h, w)
    payload = encode_jpeg_progressive(px, quality=quality)
    assert np.array_equal(quantized_blocks(px, quality)[3],
                          decode_jpeg_spectrum(payload))
    assert np.array_equal(decode_jpeg(payload),
                          decode_jpeg(encode_jpeg(px, quality=quality)))


@settings(max_examples=25, deadline=None)
@given(st.data(), st.integers(1, 24), st.integers(1, 24),
       st.sampled_from([50, 85]))
def test_jpeg_progressive_color_lossless(data, h, w, quality):
    """Color progressive: interleaved DC scan + per-component AC band scans
    + refinements reproduce all three 4:4:4 spectra exactly."""
    from set_sketch_paper_spark.operators.jpeg import (
        encode_jpeg_progressive,
        quantized_blocks_color,
    )

    rgb = _arr(data.draw, h, w, 3)
    payload = encode_jpeg_progressive(rgb, quality=quality)
    zz_enc = quantized_blocks_color(rgb, quality)[3]
    zz_dec = decode_jpeg_spectrum(payload)
    assert all(np.array_equal(a, b) for a, b in zip(zz_enc, zz_dec))
    assert decode_jpeg(payload).shape == (h, w, 3)


@settings(max_examples=20, deadline=None)
@given(st.data(), st.integers(1, 3), st.integers(1, 3),
       st.sampled_from([(2, 2), (2, 1)]))
def test_jpeg_progressive_subsampled_lossless(data, mh, mw, samp):
    """Subsampled progressive at MCU-aligned dims: non-interleaved AC scans
    cover exactly the component sub-grids, so all three spectra roundtrip
    (at non-aligned dims luma interleave-padding blocks legitimately stay
    AC-less — the pixel test below covers those)."""
    from set_sketch_paper_spark.operators.jpeg import (
        encode_jpeg_progressive,
        quantized_blocks_color,
    )

    h, w = mh * 8 * samp[1], mw * 8 * samp[0]
    rgb = _arr(data.draw, h, w, 3)
    payload = encode_jpeg_progressive(rgb, quality=85, sampling=samp)
    zz_enc = quantized_blocks_color(rgb, 85, samp)[3]
    zz_dec = decode_jpeg_spectrum(payload)
    assert all(np.array_equal(a, b) for a, b in zip(zz_enc, zz_dec))


@settings(max_examples=20, deadline=None)
@given(st.data(), st.integers(1, 20), st.integers(1, 20),
       st.sampled_from([(2, 2), (2, 1)]))
def test_jpeg_progressive_subsampled_pixels_match_baseline(data, h, w, samp):
    """At ARBITRARY dims, progressive and baseline decode to identical
    pixels: the sub-grid covers every visible block; only invisible
    interleave-padding blocks lack AC."""
    from set_sketch_paper_spark.operators.jpeg import encode_jpeg_progressive

    rgb = _arr(data.draw, h, w, 3)
    prog = decode_jpeg(encode_jpeg_progressive(rgb, quality=85, sampling=samp))
    base = decode_jpeg(encode_jpeg(rgb, quality=85, sampling=samp))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_eob_runs_and_corrections():
    """A large flat image with sparse features forces multi-block EOBn runs
    in the first passes and buffered correction bits riding EOB runs in the
    refinement pass — the trickiest wire-format corner (T.81 G.2.3)."""
    from set_sketch_paper_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    img = np.full((128, 120), 90, dtype=np.uint8)
    ys, xs = rng.randint(0, 128, 15), rng.randint(0, 120, 15)
    img[ys, xs] = 255
    payload = encode_jpeg_progressive(img, quality=85)
    assert np.array_equal(quantized_blocks(img, 85)[3],
                          decode_jpeg_spectrum(payload))


def test_jpeg_progressive_via_decode_image():
    """The multimodal sniffing path handles progressive payloads end-to-end
    (the last JPEG NotImplementedError gate is gone)."""
    from set_sketch_paper_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    out = decode_image(encode_jpeg_progressive(rgb, quality=90, sampling=(2, 2)))
    assert out.shape == (17, 23, 3) and out.dtype == np.uint8


@settings(max_examples=25, deadline=None)
@given(st.data(), st.integers(0, 400))
def test_jpeg_progressive_truncation_raises_valueerror(data, frac):
    """Every truncation point of a progressive file raises ValueError (or
    decodes, when the cut lands between complete scans — partial delivery
    is progressive JPEG's designed behavior), never IndexError."""
    from set_sketch_paper_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (18, 18, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(rgb, quality=85, sampling=(2, 2))
    cut = 2 + (frac * (len(payload) - 3)) // 401
    try:
        out = decode_jpeg(payload[:cut])
        assert out.shape == (18, 18, 3)  # partial but well-formed decode
    except ValueError:
        pass  # the malformed-media contract


def test_progressive_jpeg_readable_by_external_decoder():
    """ADVICE r5: self-roundtrip cannot catch complementary encoder/decoder
    deviations from T.81 Annex G — cross-check encode_jpeg_progressive
    against an independent decoder (pillow) when one is available, mirroring
    how the other codecs gate on optional libraries."""
    PIL_Image = pytest.importorskip("PIL.Image", reason="pillow not installed")
    import io

    from set_sketch_paper_spark.operators.jpeg import decode_jpeg, encode_jpeg_progressive

    rng = np.random.RandomState(42)
    # smooth gradient + mild noise: spectrally realistic, high-PSNR regime
    y, x = np.mgrid[0:40, 0:56]
    img = (96 + 60 * np.sin(x / 9.0) + 40 * np.cos(y / 7.0) + rng.randint(-4, 5, (40, 56))).clip(0, 255)
    rgb = np.stack([img, np.roll(img, 3, axis=1), 255 - img], axis=-1).astype(np.uint8)
    payload = encode_jpeg_progressive(rgb, quality=90)
    ours = decode_jpeg(payload).astype(np.int64)
    theirs = np.asarray(PIL_Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.int64)
    assert theirs.shape == ours.shape
    # both decoders read the same spectral content: tiny max divergence
    # (IDCT rounding differences only) and near-identical pixels overall
    assert np.abs(ours - theirs).max() <= 4
    assert np.mean(np.abs(ours - theirs)) < 1.0
