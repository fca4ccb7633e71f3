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

from .hashing import U64, splitmix64

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
        # ONE mix per element: level from the top 53 bits, register index
        # from the low 32 (Lemire low-half).  The bit ranges overlap in
        # 11..31, but those bits only perturb the uniform below 2^-22 —
        # i.e. they influence the level only at depths k > ~22/log2(b),
        # reached with probability ~2^-22; the level/index correlation is
        # statistically invisible (MC RMSE tests assert the theory band).
        h = splitmix64(vals ^ _VAL_SALT ^ skey)
        v = (h >> U64(11)).astype(np.float64)
        # k = floor(-log(v * 2^-53)/log(b)) + 1, constants folded into one
        # multiply-add; v == 0 -> log = -inf -> k = +inf -> clipped to q+1
        # (the reference's x == 0 deepest-level case)
        inv_log_base = 1.0 / np.log(base)
        c_add = 53.0 * np.log(2.0) * inv_log_base + 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            k_f = np.log(v)
            np.multiply(k_f, -inv_log_base, out=k_f)
            np.add(k_f, c_add, out=k_f)
            np.floor(k_f, out=k_f)
            np.clip(k_f, 0.0, float(q + 1), out=k_f)
        k = k_f.astype(np.int64)
        # h is dead after v: reuse its buffer for the index computation
        h &= U64(0xFFFFFFFF)
        h *= U64(m)
        h >>= U64(32)
        if rows == 1:
            flat = h
        else:
            row_of_value = np.repeat(np.arange(rows, dtype=U64), sizes)
            row_of_value *= U64(m)
            h += row_of_value
            flat = h
        np.maximum.at(regs_flat, flat, k)
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
        idx = h >> U64(64 - p)
        # trailing ones of h == exponent of the lowest set bit of ~h;
        # frexp's exponent IS log2(lb)+1 for exact powers of two (no log
        # call, no where: lb == 0 -> frexp exponent 0 -> t_ones = -1,
        # impossible here because idx bits guarantee ~h != 0 only when
        # h != all-ones — that single value maps to t_ones = 63 via min(q))
        x = ~h
        lb = (x & (np.uint64(0) - x)).astype(np.float64)
        t_ones = np.frexp(lb)[1] - 1  # int32 exponents
        t_ones = np.where(t_ones < 0, 64, t_ones).astype(np.int64)
        k = 1 + np.minimum(t_ones, q)
        if rows == 1:
            flat = idx
        else:
            row_of_value = np.repeat(np.arange(rows, dtype=U64), sizes)
            row_of_value *= U64(m)
            idx = idx + row_of_value
            flat = idx
        np.maximum.at(regs_flat, flat, k)
    return regs_flat.reshape(rows, m).astype(dtype), sizes
