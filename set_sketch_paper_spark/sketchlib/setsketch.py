"""SetSketch1 register kernels (vectorized numpy).

Distributional spec (paper §: SetSketch): register j of the sketch of set S
holds K_j = map(min_{e in S} X_{e,j}) where X_{e,j} ~ Exp(a) i.i.d. per
(element, register), and map is the geometric discretization
(Mapping, sketch.hpp:722-765) clipped to [0, q+1].

The reference generates the m exponentials of one element in ascending order
via cumulative Exp(1)/(a*(m-i)) increments over a random register permutation
with early-exit / bulk point-limit + retry (sketch.hpp:1169-1222) — an
optimized *sampler* for exactly the i.i.d. Exp(a) law above.  In our
vectorized bulk form we sample X_{e,j} directly from the (element, register)
hash: same distribution, deterministic per (element, config, seed), no
per-element state — which is what makes the kernel safe to re-run on any
partition/retry (SURVEY.md §7.3).  The min over elements is taken on the
raw uniforms (-log1p(-u) is monotone increasing), deferring the log so only
m logs per set are needed.

This kernel also covers **SetSketch2** (sketch.hpp:1311-1372): SS2 is a
cheaper *sequential sampler* for the same target register law, drawing
points from the fixed gammaTimesAInv grid with truncated-exponential
interpolation; the reference itself notes its register values are slightly
correlated at small cardinalities (limitFactor comment, sketch.hpp:1255).
The same SetSketchEstimator serves both (SetSketchConfig2 ctor,
sketch.hpp:1250).  Porting SS2's per-element grid walk would be strictly
worse here: sequential, state-carrying, and non-vectorizable — our direct
i.i.d. sampler realizes the exact distribution both variants target.
"""

from __future__ import annotations

import numpy as np

from .hashing import U64, derive_keys, lemire_bounded, splitmix64, u64_to_unit
from .ghll import geometric_level

_CHUNK_BUDGET = 8_000_000


def setsketch_sketch(
    elements: np.ndarray, m: int, base: float, a: float, q: int, seed: int
) -> np.ndarray:
    values = np.asarray(elements, dtype=U64)
    regs, _ = setsketches_batch(values, np.array([0, len(values)]), m, base, a, q, seed)
    return regs[0]


def setsketches_batch(
    values: np.ndarray, offsets: np.ndarray, m: int, base: float, a: float, q: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """SetSketch1 registers for a batch of sets in flat layout.

    Returns (registers (rows, m) uint8/uint16, set_sizes (rows,)).
    Empty sets keep all registers at 0 (the reference's initial state,
    sketch.hpp:851).

    Sampling uses the order-statistic decomposition of m i.i.d. Exp(a)
    draws: the minimum X_(1) ~ Exp(a*m) lands on a uniform register index,
    and by memorylessness the other m-1 registers get X_(1) + i.i.d. Exp(a).
    The joint law is identical to per-register i.i.d. draws, but the
    element's best possible level is map(X_(1)) — ONE hash — which gives
    the reference's lower-bound skip (RegistersWithLowerBound,
    sketch.hpp:767-841; consumed at sketch.hpp:1182) in vectorized form:
    once a set's registers all exceed a level, almost every further element
    is rejected after a single hash, so a 10^7-element stream costs
    O(n + m log n * m) instead of O(n*m).  Elements are processed in chunks
    with the per-row bound refreshed between chunks; within a chunk the
    bound is the one from the previous chunk (a stale bound only admits
    extra elements — never rejects one that could update, so the result is
    exact for any chunking).
    """
    rows = len(offsets) - 1
    dtype = np.uint8 if q + 1 <= 255 else np.uint16
    sizes = np.diff(offsets).astype(np.int64)
    regs = np.zeros((rows, m), dtype=np.int64)
    vals = np.asarray(values, dtype=U64)
    if len(vals) == 0:
        return regs.astype(dtype), sizes

    keys = derive_keys(seed ^ 0x5E5C, m)
    skey_min = splitmix64(np.array([(seed ^ 0x51E5C) & 0xFFFFFFFFFFFFFFFF], dtype=U64))[0]
    skey_idx = splitmix64(np.array([(seed ^ 0x1D35C) & 0xFFFFFFFFFFFFFFFF], dtype=U64))[0]
    row_of_value = np.repeat(np.arange(rows, dtype=np.int64), sizes)
    r_min = np.zeros(rows, dtype=np.int64)  # per-row register minimum

    n = len(vals)
    chunk = max(1, _CHUNK_BUDGET // max(1, m))
    # scratch reused across chunks: the (survivors, m) stages write into
    # row-sliced views instead of allocating ~chunk*m*8 bytes per chunk
    hbuf = np.empty((min(chunk, n), m), dtype=U64)
    xbuf = np.empty((min(chunk, n), m), dtype=np.float64)
    for c0 in range(0, n, chunk):
        c1 = min(n, c0 + chunk)
        v = vals[c0:c1]
        rws = row_of_value[c0:c1]
        # X_(1) ~ Exp(a*m); skip the element when even its best level
        # cannot exceed the row's current register minimum
        u0 = u64_to_unit(splitmix64(v ^ skey_min))
        x_min = -np.log1p(-u0) / (a * m)
        k_best = np.where(x_min > 0.0, geometric_level(x_min, base, q), float(q + 1)).astype(np.int64)
        live = k_best > r_min[rws]
        if not np.any(live):
            continue
        v = v[live]
        rws = rws[live]
        x_min = x_min[live]
        k_best = k_best[live]
        # full vector for survivors: x_j = x_min + Exp(a), overwritten at the
        # uniformly-chosen argmin register with x_min itself.  Per-register
        # uniforms come from the linear family h_j = A + key_j * B (same
        # two-pass construction as sketchlib/minhash.py — statistical
        # acceptance in test_rng_stats + MC RMSE/golden-CSV parity tests).
        # All (survivors, m) stages run in place; the level map's log runs
        # only on the per-row x-minimum (levels are monotone non-increasing
        # in x, so max-of-levels == level-of-min — bit-identical registers,
        # asserted against the direct form in test_sketchlib), which halves
        # the transcendental work on the dense grid.
        h = hbuf[: len(v)]
        x = xbuf[: len(v)]
        with np.errstate(over="ignore"):
            a_mix = splitmix64(v ^ U64(0x5E5C_A11C_0000_0001))
            b_mix = splitmix64(v ^ U64(0x5E5C_A11C_0000_0002)) | U64(1)
            np.multiply(b_mix[:, None], keys[None, :], out=h)
            h += a_mix[:, None]
        h >>= U64(11)
        np.multiply(h, 2.0**-53, out=x)  # u, the 53-bit u64_to_unit construction
        np.negative(x, out=x)
        np.log1p(x, out=x)     # log1p(-u)
        np.negative(x, out=x)
        x /= a                 # Exp(a) increment
        x += x_min[:, None]
        idx0 = lemire_bounded(splitmix64(v ^ skey_idx), m)
        x[np.arange(len(v)), idx0] = x_min
        # survivors stay row-sorted under boolean masking, so the per-row
        # min over their x-vectors is one reduceat (buffered, ~50x faster
        # than an unbuffered scatter)
        touched, row_starts = np.unique(rws, return_index=True)
        xmin_rows = np.minimum.reduceat(x, row_starts, axis=0)
        k = np.where(
            xmin_rows > 0.0, geometric_level(xmin_rows, base, q), float(q + 1)
        ).astype(np.int64)
        regs[touched] = np.maximum(regs[touched], k)
        r_min[touched] = regs[touched].min(axis=1)
    return regs.astype(dtype), sizes


def merge_setsketch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise max merge (sketch.hpp:817-825)."""
    return np.maximum(a, b)
