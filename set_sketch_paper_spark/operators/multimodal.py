"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, partition-aware batch processing,
Arrow-batched UDF signatures, fan-out of frame samples) is real and tested,
and so are the uncompressed codecs: pure-numpy PGM (P5), PPM (P6) and
24-bit BMP image decode (``decode_backend='auto'`` sniffs the magic bytes)
and a chunk-walking RIFF PCM WAV audio codec feeding real spectral features
(rfft periodogram).  PNG (8-bit gray/RGB, all five scanline filters; stdlib zlib + numpy)
and JPEG — grayscale AND YCbCr color at 4:4:4 / 4:2:0 / 4:2:2, baseline
sequential AND progressive (SOF2 successive approximation) —
(operators/jpeg.py: Annex-K tables, full entropy codec, interleaved
subsampled MCUs, DRI/RSTn restarts) are REAL
compressed codecs here, no media library.
Remaining codecs (arithmetic-coded/lossless JPEG, MP3/...) defer to
PIL/soundfile when present; this container ships no media libraries, so
``decode_backend='fake'`` remains available as the deterministic
hash-seeded stand-in for them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)

FEATURE_STRUCT = StructType(
    [
        StructField("mean", DoubleType(), False),
        StructField("std", DoubleType(), False),
        StructField("histogram", ArrayType(IntegerType()), False),
    ]
)


def _decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: pixels seeded from the payload hash.
    Same (payload, dims) -> same pixels on every executor/retry."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**31 - 1)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Pure-numpy uncompressed-image codecs (PGM P5 / PPM P6 / 24-bit BMP)
# ---------------------------------------------------------------------------

def _pnm_header(buf: bytes, n_tokens: int) -> tuple[list[bytes], int]:
    """Parse ``n_tokens`` whitespace-separated PNM header tokens (skipping
    ``#`` comments); returns (tokens, raster offset).  Per the PNM spec the
    raster starts after exactly ONE whitespace byte following the last
    header token."""
    i, toks = 0, []
    while len(toks) < n_tokens:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(buf[i:j])
        i = j
    return toks, i + 1


def encode_pgm(px: np.ndarray) -> bytes:
    """Grayscale (h, w) uint8 -> binary PGM (P5)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_ppm(rgb: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 -> binary PPM (P6)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def encode_bmp(rgb: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 -> 24-bit uncompressed (BI_RGB) BMP: BGR pixel
    order, bottom-up rows, rows padded to 4-byte multiples."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    data = raster.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> PNG (8-bit, non-interlaced,
    filter 0 rows; DEFLATE via stdlib zlib — a real compressed container
    with no media library)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # one vectorized raster build: filter-0 byte column prepended per row
    raw = np.hstack(
        [np.zeros((h, 1), np.uint8), a.reshape(h, -1)]
    ).tobytes()
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w) or (h, w, 3) uint8.  Supports 8-bit grayscale and RGB,
    non-interlaced, ALL five scanline filters (None/Sub/Up/Average/Paeth) —
    enough to read foreign PNGs of the supported color types, not just this
    module's own filter-0 output.  Sub is a per-lane cumulative sum; Up is
    vectorized; Average/Paeth recurrences run per-byte (correctness path —
    hot corpora should store filter-0/PNM anyway).  Ancillary chunks are
    skipped; CRCs are not verified (payload integrity is the storage
    layer's job)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError(f"not a PNG (magic {payload[:8]!r})")
    off, ihdr, idat = 8, None, []
    while off + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4:off + 8]
        body = payload[off + 8:off + 8 + ln]
        off += 12 + ln
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color_type not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            "only 8-bit gray/RGB non-interlaced PNG supported "
            f"(depth={depth}, color={color_type}, interlace={interlace})"
        )
    ch = 1 if color_type == 0 else 3
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += 1 + stride
        if ftype == 0:
            rec = row.copy()
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-ch] (mod 256)
            rec = (
                row.reshape(w, ch).astype(np.int64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up (uint8 add wraps mod 256)
            rec = row + prev
        elif ftype == 3:  # Average
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a_ = int(rec[x - ch]) if x >= ch else 0
                b_ = int(prev[x])
                c_ = int(prev[x - ch]) if x >= ch else 0
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, 3)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte-sniffing decode of the library-free containers: PGM (P5)
    -> (h, w) uint8, PPM (P6) / 24-bit BMP -> (h, w, 3) uint8 RGB, PNG
    (8-bit gray/RGB) and JPEG (gray / 4:4:4 / 4:2:0 / 4:2:2 color,
    baseline AND progressive) -> matching shape."""
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:2] in (b"P5", b"P6"):
        (magic, w_b, h_b, maxval_b), off = _pnm_header(payload, 4)
        w, h = int(w_b), int(h_b)
        if int(maxval_b) != 255:
            raise ValueError(f"only maxval=255 PNM supported, got {int(maxval_b)}")
        ch = 1 if magic == b"P5" else 3
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
        return raster.reshape(h, w) if ch == 1 else raster.reshape(h, w, 3)
    if payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
        if bpp != 24 or comp != 0:
            raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
        flip = h > 0  # positive height = bottom-up rows
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        raster = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
        rgb = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        return rgb[::-1] if flip else rgb
    raise ValueError(f"unknown image magic {payload[:2]!r}")


# ---------------------------------------------------------------------------
# Pure-numpy video container: a concatenated-PGM frame stream (each frame is
# a self-delimiting binary P5, so the stream needs no outer index — the
# uncompressed analog of an MJPEG elementary stream)
# ---------------------------------------------------------------------------

def encode_video(frames: np.ndarray) -> bytes:
    """(n_frames, h, w) uint8 grayscale -> concatenated binary PGM stream."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    return b"".join(encode_pgm(fr) for fr in f)


def decode_video(payload: bytes) -> np.ndarray:
    """Concatenated-PGM stream -> (n_frames, h, w) uint8 (all frames must
    share dimensions, as in any sane elementary stream)."""
    frames = []
    pos = 0
    while pos < len(payload):
        chunk = payload[pos:]
        if chunk[:2] != b"P5":
            raise ValueError(f"frame {len(frames)}: bad magic {chunk[:2]!r}")
        (_, w_b, h_b, _), off = _pnm_header(chunk, 4)
        w, h = int(w_b), int(h_b)
        frames.append(
            np.frombuffer(chunk, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)
        )
        pos += off + w * h
    if not frames:
        raise ValueError("empty video stream")
    return np.stack(frames)


def sample_video_frames_decoded(df: DataFrame, every_nth: int = 4) -> DataFrame:
    """Video assets -> one row per SAMPLED frame with genuinely decoded
    pixel stats: decode_video inside mapInPandas, stride every_nth frames
    (the real frame-sampling path; sample_video_frames keeps the id-only
    explode shape for plan tests).  Output columns all scalar."""
    out_schema = (
        "asset_id long, frame_idx int, n_frames int, mean double, std double"
    )

    def go(iterator):
        for pdf in iterator:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = decode_video(bytes(r.payload))
                for idx in range(0, frames.shape[0], every_nth):
                    fr = frames[idx]
                    rows.append(
                        {
                            "asset_id": r.asset_id,
                            "frame_idx": idx,
                            "n_frames": int(frames.shape[0]),
                            "mean": float(fr.mean()),
                            "std": float(fr.std()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(go, out_schema)


# ---------------------------------------------------------------------------
# Pure-numpy WAV (RIFF PCM) codec + audio features
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples (n,) mono or (n, ch) -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = np.ascontiguousarray(s).tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
                      block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (int16 samples (n,) mono / (n, ch), rate).

    Walks the chunk list properly (skipping LIST/INFO/junk chunks, honoring
    the spec's word alignment of odd-sized chunks) instead of assuming the
    44-byte canonical layout, so files from real recorders parse too.
    Supports the PCM formats a training pipeline actually meets uncompressed:
    16-bit signed and 8-bit unsigned."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {payload[:4]!r}")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    fmt = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # odd chunks are padded to even
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM (format 1) supported, got {audio_format}")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2", count=(len(data) // 2 // ch) * ch)
    elif bits == 8:
        u = np.frombuffer(data, dtype=np.uint8, count=(len(data) // ch) * ch)
        s = (u.astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    return (s.reshape(-1, ch) if ch > 1 else s.copy()), rate


# (low, high) Hz edges of the spectral energy bands emitted by
# extract_audio_features — speech-ish octave-style split below Nyquist/16k
AUDIO_BANDS = ((0.0, 300.0), (300.0, 1000.0), (1000.0, 3000.0), (3000.0, 8000.0))


def audio_feature_row(samples: np.ndarray, rate: int) -> dict:
    """(int16 samples, rate) -> scalar feature dict: rms, zero-crossing rate,
    spectral centroid, per-band energy fractions (np.fft.rfft periodogram),
    duration.  Pure numpy; shared by the Spark UDF and the test oracle."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    x = x / 32768.0
    n = x.shape[0]
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / rate) if n else np.zeros(1)
    total = float(spec.sum())
    centroid = float((freqs * spec).sum() / total) if total > 0 else 0.0
    out = {
        "duration_sec": n / float(rate) if rate else 0.0,
        "rms": rms,
        "zcr": zcr,
        "spectral_centroid": centroid,
    }
    for i, (flo, fhi) in enumerate(AUDIO_BANDS):
        band = float(spec[(freqs >= flo) & (freqs < fhi)].sum())
        out[f"band{i}"] = band / total if total > 0 else 0.0
    return out


def _decode_audio_fake(payload: bytes) -> tuple[np.ndarray, int]:
    """Deterministic fake audio decoder (pairs with codec='raw' payloads)."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**31 - 1)
    rng = np.random.RandomState(seed)
    return rng.randint(-2**15, 2**15, size=1600).astype(np.int16), 16000


def extract_audio_features(df: DataFrame, decode_backend: str = "auto") -> DataFrame:
    """Audio assets -> per-asset scalar features via mapInPandas: genuine
    RIFF PCM decode (decode_wav) then rms / zero-crossing rate / spectral
    centroid / band energy fractions — the audio analog of
    extract_image_features, with every output column scalar."""
    if decode_backend == "auto":
        decode = decode_wav
    elif decode_backend == "fake":
        decode = _decode_audio_fake
    else:
        raise ValueError(f"unknown decode_backend {decode_backend!r}")
    band_cols = ", ".join(f"band{i} double" for i in range(len(AUDIO_BANDS)))
    out_schema = (
        "asset_id long, sample_rate int, duration_sec double, rms double, "
        f"zcr double, spectral_centroid double, {band_cols}"
    )

    def feats(iterator):
        for pdf in iterator:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, rate = decode(bytes(r.payload))
                row = {"asset_id": r.asset_id, "sample_rate": rate}
                row.update(audio_feature_row(samples, rate))
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "audio").mapInPandas(feats, out_schema)


def to_gray(arr: np.ndarray) -> np.ndarray:
    """RGB -> integer Rec.601 luma ((299R + 587G + 114B) // 1000 —
    deterministic, no floats); grayscale passes through."""
    if arr.ndim == 2:
        return arr
    a = arr.astype(np.uint32)
    return ((299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000).astype(np.uint8)


def _decode_auto(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decode: the pure-numpy containers first, PIL for compressed
    codecs when importable.  Always returns grayscale (h, w) uint8 (the
    feature/resize kernels are single-channel; color variants would add a
    channel axis end-to-end)."""
    if (
        payload[:2] in (b"P5", b"P6", b"BM", b"\xff\xd8")
        or payload[:8] == _PNG_MAGIC
    ):
        return to_gray(decode_image(payload))
    try:  # pragma: no cover - library absent in this container by design
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    except ImportError as e:
        raise NotImplementedError(
            f"payload magic {payload[:2]!r} is not an uncompressed PGM/PPM/BMP "
            "and PIL is unavailable in this environment for compressed codecs"
        ) from e


def _decoder(decode_backend: str):
    if decode_backend == "fake":
        return _decode_fake
    if decode_backend == "auto":
        return _decode_auto
    raise ValueError(f"unknown decode_backend {decode_backend!r}")


def synthetic_assets(
    spark, n: int, seed: int = 7, partitions: int = 8, codec: str = "raw"
) -> DataFrame:
    """Deterministic binary-asset table for tests/benches.

    ``codec='raw'`` keeps the payload as opaque random bytes (pairs with
    decode_backend='fake'); ``codec='encoded'`` plants REAL encoded media —
    image kinds cycle the PGM / PPM / BMP / PNG / JPEG containers so the
    sniffing decode path is exercised across all five (PNG and baseline
    JPEG are genuinely compressed payloads), audio kinds carry genuine
    RIFF PCM
    WAVs (two deterministic sine tones + noise), and video kinds carry a
    12-frame concatenated-PGM stream (rolling gradient, per-frame brightness
    ramp) so every modality decodes real content (pairs with
    decode_backend='auto')."""

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for asset_id in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 999_983 + asset_id) % (2**31 - 1))
                kind = ["image", "audio", "video"][asset_id % 3]
                w, h = 16 + (asset_id % 4) * 8, 16
                if codec == "raw":
                    payload = rng.bytes(64 + asset_id % 128)
                elif kind == "audio":
                    rate, n_s = 16000, 1600 + (asset_id % 5) * 800
                    t = np.arange(n_s) / rate
                    f1 = 200.0 + (asset_id % 13) * 250.0
                    wave = (
                        0.5 * np.sin(2 * np.pi * f1 * t)
                        + 0.25 * np.sin(2 * np.pi * 2.5 * f1 * t)
                        + 0.05 * rng.standard_normal(n_s)
                    )
                    payload = encode_wav(
                        np.clip(wave * 20000, -32768, 32767).astype(np.int16), rate
                    )
                elif kind == "video":
                    base = rng.randint(0, 200, (h, w), dtype=np.uint8)
                    frames = np.stack(
                        [np.roll(base, i, axis=1) + np.uint8(i * 4) for i in range(12)]
                    )
                    payload = encode_video(frames)
                else:
                    variant = (asset_id // 3) % 5
                    if variant == 0:
                        payload = encode_pgm(rng.randint(0, 256, (h, w), dtype=np.uint8))
                    elif variant == 1:
                        payload = encode_ppm(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
                    elif variant == 2:
                        payload = encode_bmp(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
                    elif variant == 3:
                        payload = encode_png(rng.randint(0, 256, (h, w), dtype=np.uint8))
                    else:
                        from .jpeg import encode_jpeg, encode_jpeg_progressive

                        # cycle gray / 4:4:4 / 4:2:0 / 4:2:2 baseline and
                        # progressive-4:2:0 JPEG payloads
                        jv = (asset_id // 15) % 5
                        if jv == 0:
                            payload = encode_jpeg(
                                rng.randint(0, 256, (h, w), dtype=np.uint8),
                                quality=90,
                            )
                        elif jv == 4:
                            payload = encode_jpeg_progressive(
                                rng.randint(0, 256, (h, w, 3), dtype=np.uint8),
                                quality=90,
                                sampling=(2, 2),
                            )
                        else:
                            samp = [(1, 1), (2, 2), (2, 1)][jv - 1]
                            payload = encode_jpeg(
                                rng.randint(0, 256, (h, w, 3), dtype=np.uint8),
                                quality=90,
                                sampling=samp,
                            )
                rows.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "payload": payload,
                        "width": w,
                        "height": h,
                        "sample_rate": 16000 if kind == "audio" else 0,
                        "n_frames": 12 if kind == "video" else 1,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, ASSET_SCHEMA)


N_HIST_BINS = 16


def extract_image_features(
    df: DataFrame, decode_backend: str = "fake"
) -> DataFrame:
    """payload -> (mean, std, h0..h15 histogram bins) via mapInPandas.

    Batch shape: the UDF receives Arrow record batches; decode + feature
    extraction is per-row numpy (media rows are large, so per-row numpy on a
    decoded array is already vectorized work).  The 16-bin histogram is
    emitted as 16 SCALAR int columns (h0..h15) so every output column is
    hashable/sortable for downstream canonicalization and columnar stats.
    """
    decode = _decoder(decode_backend)

    hist_cols = ", ".join(f"h{i} int" for i in range(N_HIST_BINS))
    out_schema = f"asset_id long, kind string, mean double, std double, {hist_cols}"

    def feats(iterator):
        for pdf in iterator:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.payload), int(r.width), int(r.height))
                hist = np.histogram(px, bins=N_HIST_BINS, range=(0, 256))[0].astype(np.int32)
                row = {
                    "asset_id": r.asset_id,
                    "kind": r.kind,
                    "mean": float(px.mean()),
                    "std": float(px.std()),
                }
                for i in range(N_HIST_BINS):
                    row[f"h{i}"] = int(hist[i])
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(feats, out_schema)


def sample_video_frames(df: DataFrame, every_nth: int = 4) -> DataFrame:
    """Fan out video assets into per-frame rows (frame ids only — decode is
    stubbed): the partition-preserving explode shape a real frame sampler
    would use."""
    frames = df.filter(F.col("kind") == "video").select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))).alias(
            "frame_idx"
        ),
    )
    return frames


def _resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pure numpy integer gather — no image
    library needed).  Pixel-center sampling: src = floor((dst + 0.5) * scale)."""
    h, w = px.shape
    rows = np.minimum(((np.arange(height) + 0.5) * (h / height)).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * (w / width)).astype(np.int64), w - 1)
    return px[rows[:, None], cols[None, :]]


def resize_images(
    df: DataFrame, width: int, height: int, decode_backend: str = "fake"
) -> DataFrame:
    """Decode -> nearest-neighbor resample -> re-encode as a raw grayscale
    buffer, per row inside mapInPandas (narrow; partition-preserving).

    The resample kernel is real numpy (deterministic, library-free); only
    the DECODE of actual image codecs is behind the backend switch
    (_decode_real needs PIL, absent in this container — the 'fake' backend
    produces deterministic pixels with the true shapes).
    Output: asset_id, kind, width, height (new dims), pixels binary.
    """
    decode = _decoder(decode_backend)
    out_schema = "asset_id long, kind string, width int, height int, pixels binary"

    def go(iterator):
        for pdf in iterator:
            rows = []
            for r in pdf.itertuples(index=False):
                px = decode(bytes(r.payload), int(r.width), int(r.height))
                out = _resize_nearest(px, width, height)
                rows.append(
                    {
                        "asset_id": r.asset_id,
                        "kind": r.kind,
                        "width": width,
                        "height": height,
                        "pixels": np.ascontiguousarray(out).tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(go, out_schema)
