"""HyperMinHash kernels + estimators (vectorized numpy).

Semantics follow /root/reference/c++/sketch.hpp:1873-1960 (sketch) and
sketch.hpp:1623-1871 (estimators):

- add(d): val = min(1 + trailing_ones(y), 2^bucketsize) from a 64-bit draw,
  register index from ``bucketbits`` uniform bits, ``aug`` = subbucketsize
  uniform bits; register takes max(state, (val << subbucketsize) | aug)
  (sketch.hpp:1945-1958).
- merge: element-wise max.
- cardinality 'original': classic HLL estimator with linear-counting and
  big-range corrections over rHLL = r >> subbucketsize, switching to the
  minhash-augmented harmonic sum above ``limit = 2^(p+10)``
  (sketch.hpp:1650-1674, 1831-1845 via hyperminhash.py reference impl).
- cardinality 'new': SetSketchEstimator(q=2^bucketsize-1, a=1/m, base=2)
  simple estimator over the HLL-state transform (sketch.hpp:1823-1826).
- joint 'new': SetSketchEstimator(effectiveQ, 1/m, effectiveBase) joint ML
  over the GHLL-state transform, effectiveBase = 2^(1/2^subbucketsize)
  (sketch.hpp:1617-1621, 1712-1716, 1845-1849).
"""

from __future__ import annotations

import math

import numpy as np

from .estimators import SetSketchEstimator, joint_from_jaccard
from .hashing import U64, splitmix64

_K_VAL = U64(0x1717_C0DE_BA5E_0001)


def _trailing_ones(y: np.ndarray) -> np.ndarray:
    """Count of trailing 1-bits of each uint64 (64 for all-ones).
    frexp exponent of the lowest set bit of ~y == position+1 (exact for
    powers of two; no transcendental)."""
    x = ~np.asarray(y, dtype=U64)  # trailing ones of y == trailing zeros of x
    lb = (x & (np.uint64(0) - x)).astype(np.float64)  # lowest set bit (0 if x == 0)
    t = np.frexp(lb)[1] - 1
    return np.where(t < 0, 64, t).astype(np.int64)


def hyperminhash_sketches_batch(
    values: np.ndarray,
    offsets: np.ndarray,
    bucketbits: int,
    bucketsize: int,
    subbucketsize: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """HyperMinHash registers for a batch of sets in flat layout.

    Returns (registers (rows, m=2^bucketbits) uint32, set_sizes).  Empty sets
    keep all registers 0 (the reference's initial state).
    """
    assert bucketbits + subbucketsize <= 64 and 1 <= bucketsize <= 6
    rows = len(offsets) - 1
    m = 1 << bucketbits
    sizes = np.diff(offsets).astype(np.int64)
    regs_flat = np.zeros(rows * m, dtype=np.int64)
    vals = np.asarray(values, dtype=U64)
    if len(vals):
        skey = U64(seed & 0xFFFFFFFFFFFFFFFF)
        # ONE mix per element, disjoint bit fields: trailing-ones level from
        # the low bits, register index from the top bucketbits, subbucket
        # augmentation from bits 24..24+subbucketsize.  Fields only collide
        # when trailing_ones >= 24 (probability 2^-24) — statistically
        # invisible at any cardinality the 2^bucketsize level range covers;
        # the MC accuracy + golden-CSV parity tests gate this.
        assert 24 + subbucketsize <= 64 - bucketbits, (bucketbits, subbucketsize)
        h = splitmix64(vals ^ _K_VAL ^ skey)
        val = np.minimum(1 + _trailing_ones(h), 1 << bucketsize)
        idx = (h >> U64(64 - bucketbits)).astype(np.int64)
        aug = ((h >> U64(24)) & U64((1 << subbucketsize) - 1)).astype(np.int64)
        update = (val << subbucketsize) | aug
        row_of_value = np.repeat(np.arange(rows, dtype=np.int64), sizes)
        np.maximum.at(regs_flat, row_of_value * m + idx, update)
    return regs_flat.reshape(rows, m).astype(np.uint32), sizes


def hyperminhash_sketch(
    elements, bucketbits: int, bucketsize: int, subbucketsize: int, seed: int
) -> np.ndarray:
    v = np.asarray(elements, dtype=U64)
    regs, _ = hyperminhash_sketches_batch(
        v, np.array([0, len(v)]), bucketbits, bucketsize, subbucketsize, seed
    )
    return regs[0]


def merge_hyperminhash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise max merge (sketch.hpp:1020-1023 via BaseSketch)."""
    return np.maximum(a, b)


class HyperMinHashEstimator:
    """Vectorized counterpart of the reference HyperMinHashEstimator
    (sketch.hpp:1623-1871)."""

    def __init__(self, bucketbits: int, bucketsize: int, subbucketsize: int):
        self.m = 1 << bucketbits
        self.bucketbits = bucketbits
        self.bucketsize = bucketsize
        self.subbucketsize = subbucketsize
        self.submask = (1 << subbucketsize) - 1
        self.alpha = self._alpha(self.m)
        self.limit = 2.0 ** (bucketbits + 10)
        self.effective_q = ((1 << bucketsize) - 1) * (1 << subbucketsize)
        self.effective_base = 2.0 ** (1.0 / (1 << subbucketsize))
        self.effective_a = 1.0 / self.m
        self.joint_estimator = SetSketchEstimator(
            self.effective_q, self.effective_a, self.effective_base, self.m,
            card_range_correction=True,
        )
        self.cardinality_estimator = SetSketchEstimator(
            (1 << bucketsize) - 1, self.effective_a, 2.0, self.m,
            card_range_correction=True,
        )

    @staticmethod
    def _alpha(m: int) -> float:
        return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def _rhll(self, states: np.ndarray) -> np.ndarray:
        return np.atleast_2d(np.asarray(states, dtype=np.int64)) >> self.subbucketsize

    def _to_ghll_state(self, states: np.ndarray) -> np.ndarray:
        """transformToGeneralizedHyperLogLogState (sketch.hpp:1678-1689)."""
        s = np.atleast_2d(np.asarray(states, dtype=np.int64))
        rhll = s >> self.subbucketsize
        return np.where(
            rhll == 0, 0, np.minimum(s - self.submask, self.effective_q + 1)
        )

    def cardinality_original(self, states: np.ndarray) -> np.ndarray:
        """estimateCardinalityOriginal (sketch.hpp:1831-1845): HLL estimate
        with corrections, or the minhash-augmented sum above the limit."""
        s = np.atleast_2d(np.asarray(states, dtype=np.int64))
        rhll = s >> self.subbucketsize
        # hll_estimator (sketch.hpp:1650-1674)
        harm = np.sum(np.exp2(-rhll.astype(np.float64)), axis=1)
        v_zero = np.sum(rhll == 0, axis=1)
        res = self.alpha * self.m * self.m / harm
        with np.errstate(divide="ignore"):
            lin = self.m * np.log(self.m / np.where(v_zero > 0, v_zero, 1).astype(np.float64))
        res2 = np.where(
            res <= 2.5 * self.m,
            np.where(v_zero != 0, lin, res),
            np.where(
                res <= (2.0**32) / 30.0,
                res,
                -(2.0**32) * np.log1p(-np.minimum(res / 2.0**32, 1.0 - 1e-300)),
            ),
        )
        aug = np.sum(
            (1.0 + (s & self.submask).astype(np.float64) / (1 << self.subbucketsize))
            * np.exp2(-rhll.astype(np.float64)),
            axis=1,
        )
        # reference contract (sketch.hpp:1723-1734): the HLL estimate is used
        # only when (hll_count < limit AND bucketsize > 0) — bucketsize == 0
        # always falls through to the minhash-augmented sum
        if self.bucketsize == 0:
            return self.m * self.m / aug
        return np.where(res2 < self.limit, res2, self.m * self.m / aug)

    def cardinality_new(self, states: np.ndarray) -> np.ndarray:
        """estimateCardinalityNew (sketch.hpp:1823-1826)."""
        return self.cardinality_estimator.cardinality_simple(self._rhll(states))

    def joint_new(self, s1: np.ndarray, s2: np.ndarray):
        """estimateJointNew (sketch.hpp:1837-1849): joint ML over the GHLL
        transform with 'new' cardinalities."""
        c1 = self.cardinality_new(s1)
        c2 = self.cardinality_new(s2)
        return self.joint_estimator.joint_new(
            self._to_ghll_state(s1), self._to_ghll_state(s2), card1=c1, card2=c2
        )

    def joint_incl_excl(self, s1: np.ndarray, s2: np.ndarray):
        """estimateJointInclExcl (sketch.hpp:1851-1854)."""
        return self.cardinality_estimator.joint_incl_excl(
            self._rhll(s1), self._rhll(s2)
        )

    # -- original joint estimator with collision correction -----------------

    def _collision_estimate_hll_divided(self, x_size: np.ndarray, y_size: np.ndarray) -> np.ndarray:
        """collision_estimate_hll_divided (sketch.hpp:1738-1761): expected
        number of register matches between two DISJOINT sets — per HLL level
        i, P(both sketches land level i in a bucket), summed, scaled by the
        subbucket collision probability 2^-subbucketsize.  Vectorized over
        pairs (the level loop is 2^bucketsize <= 64 iterations)."""
        n = np.asarray(x_size, dtype=np.float64)
        m = np.asarray(y_size, dtype=np.float64)
        num_hll_buckets = 2.0**self.bucketsize
        cp = np.zeros_like(n)
        for i_ in range(int(num_hll_buckets)):
            i = i_ + 1
            if i != num_hll_buckets:
                b1 = 1.0 / 2.0**i
                b2 = 1.0 / 2.0 ** (i - 1)
            else:
                b1 = 0.0
                b2 = 1.0 / 2.0 ** (i - 1)
            b1 /= self.m
            b2 /= self.m
            pr_x = (1.0 - b1) ** n - (1.0 - b2) ** n
            pr_y = (1.0 - b1) ** m - (1.0 - b2) ** m
            cp = cp + pr_x * pr_y
        return (cp * self.m) / 2.0**self.subbucketsize

    def _collision_estimate_final(self, x_size: np.ndarray, y_size: np.ndarray) -> np.ndarray:
        """collision_estimate_final (sketch.hpp:1763-1778): closed-form
        large-cardinality approximation above m*32, exact-sum formula below."""
        x = np.asarray(x_size, dtype=np.float64)
        y = np.asarray(y_size, dtype=np.float64)
        n = np.maximum(x, y)
        m = np.minimum(x, y)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(m > 0, n / m, np.inf)
            ratio_factor = 4.0 * ratio / (1.0 + ratio) ** 2
        large = (
            0.169919487159739093975315012348630288992889
            * self.m
            * ratio_factor
            / 2.0**self.subbucketsize
        )
        small = self._collision_estimate_hll_divided(x, y)
        return np.where(n > self.m * 32.0, large, small)

    def joint_original(self, s1: np.ndarray, s2: np.ndarray, card1=None, card2=None):
        """estimateJointOriginalWithKnownSetCardinalities (sketch.hpp:
        1785-1821): jaccard = (matching nonzero registers - expected
        collisions) / union-filled buckets, clamped to >= 0 as in the
        reference's robustness condition.  Cardinalities default to the
        'new' estimator (sketch.hpp:1812-1817)."""
        a1 = np.atleast_2d(np.asarray(s1, dtype=np.int64))
        a2 = np.atleast_2d(np.asarray(s2, dtype=np.int64))
        c1 = self.cardinality_new(a1) if card1 is None else np.asarray(card1, dtype=np.float64)
        c2 = self.cardinality_new(a2) if card2 is None else np.asarray(card2, dtype=np.float64)
        match_num = ((a1 == a2) & (a1 != 0)).sum(axis=1).astype(np.float64)
        union_filled = ((a1 != 0) | (a2 != 0)).sum(axis=1).astype(np.float64)
        collisions = self._collision_estimate_final(c1, c2)
        inter = match_num - collisions
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where((inter > 0) & (union_filled > 0), inter / union_filled, 0.0)
        return joint_from_jaccard(c1, c2, jac)
