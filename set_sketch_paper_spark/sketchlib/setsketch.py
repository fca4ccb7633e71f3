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
"""

from __future__ import annotations

import numpy as np

from .hashing import U64, derive_keys, splitmix64, u64_to_unit
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
    """
    rows = len(offsets) - 1
    dtype = np.uint8 if q + 1 <= 255 else np.uint16
    keys = derive_keys(seed ^ 0x5E5C, m)
    sizes = np.diff(offsets).astype(np.int64)
    regs = np.zeros((rows, m), dtype=dtype)
    vals = np.asarray(values, dtype=U64)
    if len(vals) == 0:
        return regs, sizes
    nonempty = sizes > 0
    starts = offsets[:-1][nonempty]
    reg_chunk = max(1, _CHUNK_BUDGET // max(1, len(vals)))
    for c0 in range(0, m, reg_chunk):
        c1 = min(m, c0 + reg_chunk)
        h = splitmix64(vals[:, None] ^ keys[None, c0:c1])
        # X_e = -log1p(-u_e)/a is increasing in u_e, so
        # min over elements of Exp(a) draws == -log1p(-min u)/a
        umin = np.minimum.reduceat(h, starts, axis=0)
        x = -np.log1p(-u64_to_unit(umin)) / a
        # x == 0 (u == max) maps to level q+1; x > 1 maps to 0
        k = np.where(x > 0.0, geometric_level(x, base, q), float(q + 1)).astype(np.int64)
        regs[nonempty, c0:c1] = k.astype(dtype)
    return regs, sizes


def merge_setsketch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise max merge (sketch.hpp:817-825)."""
    return np.maximum(a, b)
