"""GeneralizedHyperLogLog register kernels (vectorized numpy).

Semantics follow /root/reference/c++/sketch.hpp:1034-1061: per element draw a
uniform x in [0,1), map it to a geometric level k (base b), pick a register
uniformly, register takes max(state, k); merge is element-wise max.

The reference maps x -> k with a skip-probe + binary search over
baseInversePowers (Mapping::map, sketch.hpp:734-759).  The search returns the
smallest k with x > b^-k, clipped to q+1 when x <= b^-q; we use the
closed-form equivalent k = clip(floor(-log(x)/log(b)) + 1, 0, q+1), which
vectorizes (SURVEY.md §2.7 notes the equivalence).
"""

from __future__ import annotations

import numpy as np

from .hashing import U64, derive_keys, lemire_bounded, splitmix64, u64_to_unit

_IDX_SALT = U64(0x1D0_5A17)
_VAL_SALT = U64(0x9A1_5A17)


def geometric_level(x: np.ndarray, base: float, q: int) -> np.ndarray:
    """Closed-form Mapping::map for x in (0, 1]: smallest k with x > b^-k,
    i.e. the unique k with b^-k < x <= b^-(k-1); q+1 when x <= b^-q."""
    with np.errstate(divide="ignore"):
        k = np.floor(-np.log(x) / np.log(base)) + 1.0
    return np.clip(k, 0.0, float(q + 1))


def ghll_sketch(elements: np.ndarray, m: int, base: float, q: int, seed: int) -> np.ndarray:
    values = np.asarray(elements, dtype=U64)
    regs, _ = ghll_sketches_batch(values, np.array([0, len(values)]), m, base, q, seed)
    return regs[0]


def ghll_sketches_batch(
    values: np.ndarray, offsets: np.ndarray, m: int, base: float, q: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """GHLL registers for a batch of sets in flat (values, offsets) layout.

    Returns (registers (rows, m) uint8/uint16, set_sizes (rows,)).
    Cost is O(total_values + rows*m) — one scatter-max pass, no per-register
    loop (contrast MinHash's O(total*m)).
    """
    rows = len(offsets) - 1
    dtype = np.uint8 if q + 1 <= 255 else np.uint16
    sizes = np.diff(offsets).astype(np.int64)
    regs_flat = np.zeros(rows * m, dtype=np.int64)
    vals = np.asarray(values, dtype=U64)
    if len(vals):
        skey = U64(seed & 0xFFFFFFFFFFFFFFFF)
        h_val = splitmix64(vals ^ _VAL_SALT ^ skey)
        h_idx = splitmix64(vals ^ _IDX_SALT ^ skey)
        u = u64_to_unit(h_val)
        # u == 0 would map to +inf level; the reference's x is (0,1] via
        # >> 11 * 2^-53 which can be 0 — treat as the deepest level q+1.
        k = np.where(u > 0.0, geometric_level(u, base, q), float(q + 1)).astype(np.int64)
        idx = lemire_bounded(h_idx, m)
        row_of_value = np.repeat(np.arange(rows, dtype=np.int64), sizes)
        np.maximum.at(regs_flat, row_of_value * m + idx, k)
    return regs_flat.reshape(rows, m).astype(dtype), sizes


def merge_ghll(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise max merge (sketch.hpp:876-881)."""
    return np.maximum(a, b)


def hll_sketches_batch(
    values: np.ndarray, offsets: np.ndarray, p: int, q: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Classic HyperLogLog registers (sketch.hpp:1063-1083): register index
    = top p bits of the element hash, value = 1 + min(trailing_ones, q),
    element-wise max.  The reference consumes the raw element; we mix the
    seed in first so independent sketches of the same stream exist.

    Estimate with SetSketchEstimator(q, 1/m, base=2, m, card_corr=True)
    (HyperLogLogConfig, sketch.hpp:962-1009).
    """
    rows = len(offsets) - 1
    m = 1 << p
    dtype = np.uint8 if q + 1 <= 255 else np.uint16
    sizes = np.diff(offsets).astype(np.int64)
    regs_flat = np.zeros(rows * m, dtype=np.int64)
    vals = np.asarray(values, dtype=U64)
    if len(vals):
        h = splitmix64(vals ^ splitmix64(np.array([seed & 0xFFFFFFFFFFFFFFFF], dtype=U64))[0])
        idx = (h >> U64(64 - p)).astype(np.int64)
        x = ~h  # trailing ones of h == trailing zeros of ~h
        lb = x & (np.uint64(0) - x)
        with np.errstate(divide="ignore"):
            t_ones = np.where(lb > 0, np.log2(lb.astype(np.float64)), 64.0).astype(np.int64)
        k = 1 + np.minimum(t_ones, q)
        row_of_value = np.repeat(np.arange(rows, dtype=np.int64), sizes)
        np.maximum.at(regs_flat, row_of_value * m + idx, k)
    return regs_flat.reshape(rows, m).astype(dtype), sizes
