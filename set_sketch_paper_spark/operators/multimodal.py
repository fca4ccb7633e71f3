"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, partition-aware batch processing,
Arrow-batched UDF signatures, fan-out of frame samples) is real and tested,
and so is uncompressed-image decode: pure-numpy PGM (P5), PPM (P6) and
24-bit BMP codecs need no libraries (``decode_backend='auto'`` sniffs the
magic bytes).  Compressed codecs (JPEG/PNG/...) defer to PIL when present;
this container ships no image libraries, so ``decode_backend='fake'``
remains available as the deterministic hash-seeded stand-in for them.
"""

from __future__ import annotations

import struct

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


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte-sniffing decode of the library-free containers: PGM (P5)
    -> (h, w) uint8, PPM (P6) / 24-bit BMP -> (h, w, 3) uint8 RGB."""
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
    if payload[:2] in (b"P5", b"P6", b"BM"):
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
    decode_backend='fake'); ``codec='encoded'`` plants REAL encoded images —
    cycling PGM / PPM / BMP by asset_id so the sniffing decode path is
    exercised across all three containers (pairs with
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
                else:
                    variant = asset_id % 3
                    if variant == 0:
                        payload = encode_pgm(rng.randint(0, 256, (h, w), dtype=np.uint8))
                    elif variant == 1:
                        payload = encode_ppm(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
                    else:
                        payload = encode_bmp(rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
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
