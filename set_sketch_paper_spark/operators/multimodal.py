"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, partition-aware batch processing,
Arrow-batched UDF signatures, fan-out of frame samples) is real and tested;
the actual media decode is STUBBED behind an import-try because no
image/audio libraries exist in this container — ``decode_backend='fake'``
substitutes a deterministic hash-seeded decoder with the same shapes, so the
distributed plumbing is exercised end to end.
"""

from __future__ import annotations

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


def _decode_real(payload: bytes, width: int, height: int) -> np.ndarray:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - library absent by design
        raise NotImplementedError(
            "real image decode requires PIL, which is not available in this "
            "environment; use decode_backend='fake'"
        ) from e
    raise NotImplementedError("real decode wiring lands when PIL is available")


def synthetic_assets(spark, n: int, seed: int = 7, partitions: int = 8) -> DataFrame:
    """Deterministic binary-asset table for tests/benches."""

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for asset_id in pdf["id"].tolist():
                rng = np.random.RandomState((seed * 999_983 + asset_id) % (2**31 - 1))
                kind = ["image", "audio", "video"][asset_id % 3]
                payload = rng.bytes(64 + asset_id % 128)
                rows.append(
                    {
                        "asset_id": asset_id,
                        "kind": kind,
                        "payload": payload,
                        "width": 16 + (asset_id % 4) * 8,
                        "height": 16,
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
    decode = _decode_fake if decode_backend == "fake" else _decode_real

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
    decode = _decode_fake if decode_backend == "fake" else _decode_real
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
