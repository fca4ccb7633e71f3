"""Cardinality and joint (two-set) estimators for the sketch family.

Numpy re-implementations of the reference's estimator classes:

- ``SetSketchEstimator``  <- /root/reference/c++/sketch.hpp:148-720
  (simple cardinality with sigma/tau range corrections, ML cardinality via
  root solve, inclusion-exclusion joint, "new" joint ML via bounded Brent,
  equal-register Jaccard lower/upper bounds)
- ``MinHashJointEstimator`` <- sketch.hpp:1374-1544
  (closed-form cardinality, original/new/incl-excl joint estimators)
- ``joint_from_jaccard`` <- JointEstimationResult algebra, sketch.hpp:67-146

Estimate-returning functions are vectorized over batches of register rows;
the scalar ML solves run per row/pair (they are only applied to candidate
pairs that survive the vectorized pre-filters — SURVEY.md §7.3).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from .hashing import U64
from .minhash import minhash_cardinality
from .solvers import brentq, minimize_bounded

# mu() series: arguments above this are dead (e^-50 ~ 2e-22 per term on both
# sides of the difference) — the per-row grid offset in _mu_batch skips them
_MU_CUT = 50.0


def golden_min_batch(f, lo: np.ndarray, hi: np.ndarray, iters: int = 70) -> np.ndarray:
    """Vectorized golden-section minimizer: one independent bounded scalar
    minimization per row, all rows advanced in lockstep (the batched
    replacement for the per-pair boost brent_find_minima loop,
    sketch.hpp:499-519).  ``f`` maps a vector of positions (one per row) to a
    vector of objective values; +inf values (domain boundaries the reference
    maps NaN to) are handled by the comparisons naturally.  70 iterations
    shrink the interval by 0.618^70 ~ 2e-15 of its width — beyond the
    estimators' statistical error, same accuracy class as the scalar path.

    Classic golden-section bookkeeping carries one probe value across
    iterations (the surviving interior probe of the kept interval IS a probe
    of the next interval, since g^2 = 1-g), so each iteration costs ONE
    objective evaluation instead of two (ADVICE r3)."""
    g = 0.6180339887498949
    a = np.asarray(lo, dtype=np.float64).copy()
    b = np.asarray(hi, dtype=np.float64).copy()
    d = g * (b - a)
    x1 = b - d
    x2 = a + d
    f1 = f(x1)
    f2 = f(x2)
    for _ in range(iters):
        keep_left = f1 <= f2
        b = np.where(keep_left, x2, b)
        a = np.where(keep_left, a, x1)
        d = g * (b - a)
        new_x = np.where(keep_left, b - d, a + d)
        fn = f(new_x)
        x1, x2 = np.where(keep_left, new_x, x2), np.where(keep_left, x1, new_x)
        f1, f2 = np.where(keep_left, fn, f2), np.where(keep_left, f1, fn)
    return 0.5 * (a + b)


def x_div_expm1(x):
    """x / (e^x - 1), continuous at 0 (sketch.hpp:52-55)."""
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(invalid="ignore", over="ignore", divide="ignore"):
        out = np.where(x != 0.0, x / np.expm1(x), 1.0)
    return out


def expm1_div_x(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x != 0.0, np.expm1(x) / np.where(x != 0, x, 1.0), 1.0)


def log1p_div_x(x):
    x = np.asarray(x, dtype=np.float64)
    return np.where(x != 0.0, np.log1p(x) / np.where(x != 0, x, 1.0), 1.0)


# ---------------------------------------------------------------------------
# JointEstimationResult algebra (sketch.hpp:67-146), vectorized
# ---------------------------------------------------------------------------

def joint_from_jaccard(card1, card2, jaccard) -> dict[str, np.ndarray]:
    """createFromCardinalitiesAndJaccardSimilarity (sketch.hpp:111-123).

    Trims jaccard into the feasible band [0, min(c1/c2, c2/c1)] then derives
    all joint quantities.  Returns a dict of float64 arrays.
    """
    c1 = np.asarray(card1, dtype=np.float64)
    c2 = np.asarray(card2, dtype=np.float64)
    j = np.asarray(jaccard, dtype=np.float64)
    c1, c2, j = np.atleast_1d(*np.broadcast_arrays(c1, c2, j))
    with np.errstate(divide="ignore", invalid="ignore"):
        upper = np.minimum(c1 / np.where(c2 > 0, c2, np.inf),
                           c2 / np.where(c1 > 0, c1, np.inf))
    upper = np.where((c1 == 0) & (c2 == 0), 0.0, upper)
    t = np.clip(j, 0.0, upper)
    y = 1.0 / (1.0 + t)
    d1 = np.maximum(0.0, c1 - c2 * t) * y
    d2 = np.maximum(0.0, c2 - c1 * t) * y
    inter = (c1 + c2) * t * y
    out = _joint_result(d1, d2, inter)
    # keep the trimmed input jaccard verbatim: re-deriving it as inter/union
    # loses a ulp, which flips est >= threshold exactly at the boundary
    # (e.g. 64/128 equal registers vs threshold 0.5)
    out["jaccard"] = t
    return out


def joint_from_union(card1, card2, card_union) -> dict[str, np.ndarray]:
    """createFromCardinalitiesAndUnion (sketch.hpp:125-130)."""
    c1 = np.asarray(card1, dtype=np.float64)
    c2 = np.asarray(card2, dtype=np.float64)
    u = np.asarray(card_union, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (c1 + c2 - u) / u
    j = np.where(u > 0, j, 0.0)
    return joint_from_jaccard(c1, c2, j)


def _joint_result(d1, d2, inter) -> dict[str, np.ndarray]:
    union = d1 + d2 + inter
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(inter > 0, inter / union, 0.0)
        cos = np.where(inter > 0, inter / np.sqrt((d1 + inter) * (d2 + inter)), 0.0)
        inc1 = np.where(inter > 0, inter / (d1 + inter), 0.0)
        inc2 = np.where(inter > 0, inter / (d2 + inter), 0.0)
        alpha = np.where(d1 > 0, d1 / union, 0.0)
        beta = np.where(d2 > 0, d2 / union, 0.0)
    return {
        "difference1": d1,
        "difference2": d2,
        "intersection": inter,
        "union": union,
        "jaccard": jac,
        "cosine": cos,
        "inclusion1": inc1,
        "inclusion2": inc2,
        "alpha": alpha,
        "beta": beta,
    }


# ---------------------------------------------------------------------------
# SetSketch / GHLL estimator
# ---------------------------------------------------------------------------

class SetSketchEstimator:
    """Vectorized port of the reference SetSketchEstimator semantics
    (sketch.hpp:288-720).  Constructor flags follow the reference configs:
    GHLL/HLL use (card_corr=True, joint_corr=False, fallback=False)
    (sketch.hpp:925); SetSketch1/2 use all-False (sketch.hpp:1111)."""

    def __init__(
        self,
        q: int,
        a: float,
        base: float,
        num_registers: int,
        card_range_correction: bool = False,
        joint_range_correction: bool = False,
        joint_fallback: bool = False,
    ):
        self.q = int(q)
        self.a = float(a)
        self.base = float(base)
        self.m = int(num_registers)
        self.card_range_correction = card_range_correction
        self.joint_range_correction = joint_range_correction
        self.joint_fallback = joint_fallback

        self.log_base = math.log(self.base)
        self.base_inverse = 1.0 / self.base
        # baseInversePowers[k] = b^-k for k in 0..q+1 (sketch.hpp:307-309)
        self.base_inverse_powers = self.base ** (-np.arange(self.q + 2, dtype=np.float64))
        # factor = m / (b * log1p(b-1)/(b-1) * a) (sketch.hpp:294-295)
        self.factor = self.m / (self.base * (math.log1p(self.base - 1.0) / (self.base - 1.0)) * self.a)
        if card_range_correction:
            frac = np.arange(self.m + 1, dtype=np.float64) / self.m
            # sigmaValues[i] = m*sigma(i/m); tauValues[i] = m*b^-q*tau((m-i)/m)
            self.sigma_values = self.m * _sigma_vec(frac, self.base)
            self.tau_values = self.m * self.base_inverse_powers[self.q] * _tau_vec(frac[::-1].copy(), self.base)
        else:
            self.sigma_values = None
            self.tau_values = None

    # -- cardinality ------------------------------------------------------

    def cardinality_simple(self, states: np.ndarray) -> np.ndarray:
        """estimateCardinalitySimple (sketch.hpp:320-338), rows = sketches."""
        st = np.atleast_2d(np.asarray(states)).astype(np.int64)
        bip = self.base_inverse_powers[st]
        if self.card_range_correction:
            is_min = st == 0
            is_max = st > self.q
            sums = np.where(is_min | is_max, 0.0, bip).sum(axis=1)
            n_min = is_min.sum(axis=1)
            n_max = is_max.sum(axis=1)
            sums = sums + self.sigma_values[n_min] + self.tau_values[n_max]
        else:
            sums = bip.sum(axis=1)
        with np.errstate(divide="ignore"):
            return self.factor / sums

    def cardinality_ml(self, states: np.ndarray) -> np.ndarray:
        """estimateCardinalityML (sketch.hpp:341-381), BATCHED: all rows'
        root solves advance in lockstep over the (rows, q+2) register-value
        histogram — bracket doubling then bisection, both vectorized (the
        interval halves 90 times, far past the scalar path's 1e-9 rtol; the
        per-row scalar twin _cardinality_ml_one is kept as the equivalence
        oracle in tests)."""
        st = np.atleast_2d(np.asarray(states)).astype(np.int64)
        rows = st.shape[0]
        L = self.q + 2
        hist = np.bincount(
            (st + np.arange(rows)[:, None] * L).ravel(), minlength=rows * L
        ).reshape(rows, L).astype(np.float64)
        corr = self.card_range_correction
        bip = self.base_inverse_powers
        m, a, bm1 = float(self.m), self.a, self.base - 1.0
        if corr:
            count0 = hist[:, 0]
            z = (hist[:, : self.q + 1] @ bip[: self.q + 1]) * a
            w_reg = hist[:, 1 : self.q + 1]
            bip_reg = bip[1 : self.q + 1]
            w_max = hist[:, self.q + 1]
        else:
            count0 = np.zeros(rows)
            z = (hist @ bip) * a
            w_reg = hist
            bip_reg = bip
            w_max = None

        out = np.empty(rows, dtype=np.float64)
        out.fill(np.nan)
        if corr:
            out[hist[:, 0] == m] = 0.0
            out[hist[:, self.q + 1] == m] = math.inf
        undecided = np.isnan(out)
        out[undecided & (z <= 0.0)] = math.inf
        with np.errstate(divide="ignore", invalid="ignore"):
            upper_all = (m - count0) / z
        out[undecided & (z > 0.0) & (upper_all <= 0.0)] = 0.0
        solve = np.isnan(out)
        if not np.any(solve):
            return out

        wr, zs = w_reg[solve], z[solve]
        wm = w_max[solve] if corr else None

        def f(n: np.ndarray) -> np.ndarray:
            arg = n[:, None] * (a * bm1) * bip_reg[None, :]
            y = np.einsum("ij,ij->i", wr, x_div_expm1(arg))
            if corr:
                y = y + wm * x_div_expm1(n * (a * bip[self.q]))
            return y - n * zs

        upper = upper_all[solve].copy()
        # f(0+) > 0 always; widen the bracket if rounding left f(upper) > 0
        # (same 8-doubling policy as the scalar path)
        stuck = None
        for _ in range(8):
            widen = f(upper) > 0.0
            if not np.any(widen):
                break
            upper = np.where(widen, upper * 2.0, upper)
        else:
            stuck = f(upper) > 0.0
        lo_b = np.zeros_like(upper)
        hi_b = upper.copy()
        for _ in range(90):
            mid = 0.5 * (lo_b + hi_b)
            pos = f(mid) > 0.0
            lo_b = np.where(pos, mid, lo_b)
            hi_b = np.where(pos, hi_b, mid)
        root = 0.5 * (lo_b + hi_b)
        if stuck is not None:
            root = np.where(stuck, upper, root)
        out[solve] = root
        return out

    def _cardinality_ml_one(self, state: np.ndarray) -> float:
        hist = np.bincount(state, minlength=self.q + 2).astype(np.float64)
        vals = np.nonzero(hist)[0]
        freqs = hist[vals]
        corr = self.card_range_correction
        count0 = float(hist[0]) if corr else 0.0
        if corr and count0 == self.m:
            return 0.0
        if corr and hist[self.q + 1] == self.m:
            return math.inf
        in_z = vals <= self.q if corr else np.ones_like(vals, dtype=bool)
        z = float(np.sum(freqs[in_z] * self.base_inverse_powers[vals[in_z]])) * self.a

        # y-term classification (sketch.hpp:367-374)
        if corr:
            y_max_mask = vals == self.q + 1
            y_reg_mask = (vals > 0) & (vals <= self.q)
        else:
            y_max_mask = np.zeros_like(vals, dtype=bool)
            y_reg_mask = np.ones_like(vals, dtype=bool)
        f_max = freqs[y_max_mask]
        f_reg = freqs[y_reg_mask]
        bip_reg = self.base_inverse_powers[vals[y_reg_mask]]
        bip_q = self.base_inverse_powers[self.q]
        a = self.a
        bm1 = self.base - 1.0

        def f(n: float) -> float:
            na = n * a
            y = float(np.sum(f_max * x_div_expm1(na * bip_q)))
            y += float(np.sum(f_reg * x_div_expm1(na * bm1 * bip_reg)))
            return y - n * z

        if z <= 0.0:
            return math.inf
        upper = (self.m - count0) / z
        if upper <= 0.0:
            return 0.0
        # f(0) > 0 always; widen the bracket if rounding left f(upper) > 0
        for _ in range(8):
            if f(upper) <= 0.0:
                break
            upper *= 2.0
        else:
            return upper
        return brentq(f, 0.0, upper, rtol=1e-9)

    # -- register comparison ----------------------------------------------

    def compare_registers(self, s1: np.ndarray, s2: np.ndarray):
        """Counts (#1<2, #1>2, #both==0, #both==q+1, #equal) per row
        (sketch.hpp:644-667)."""
        a1 = np.atleast_2d(np.asarray(s1)).astype(np.int64)
        a2 = np.atleast_2d(np.asarray(s2)).astype(np.int64)
        less = (a1 < a2).sum(axis=1)
        greater = (a1 > a2).sum(axis=1)
        eq = a1 == a2
        both_min = (eq & (a1 == 0)).sum(axis=1)
        both_max = (eq & (a1 == self.q + 1)).sum(axis=1)
        return less, greater, both_min, both_max, eq.sum(axis=1)

    # -- joint estimators --------------------------------------------------

    def joint_incl_excl(self, s1: np.ndarray, s2: np.ndarray, card1=None, card2=None):
        """estimateJointInclExcl[WithKnownSetCardinalities]
        (sketch.hpp:391-410): union = element-wise max."""
        a1 = np.atleast_2d(np.asarray(s1))
        a2 = np.atleast_2d(np.asarray(s2))
        c1 = self.cardinality_simple(a1) if card1 is None else np.asarray(card1, dtype=np.float64)
        c2 = self.cardinality_simple(a2) if card2 is None else np.asarray(card2, dtype=np.float64)
        cu = self.cardinality_simple(np.maximum(a1, a2))
        return joint_from_union(c1, c2, cu)

    def _joint_new_one(self, n_less: int, n_greater: int, c1: float, c2: float) -> float:
        """estimateJointNew likelihood solve (sketch.hpp:484-522) -> jaccard."""
        n_eq = self.m - n_less - n_greater
        if c1 == 0.0 and c2 == 0.0:
            return 0.0
        z = (1.0 - self.base_inverse) / (c1 + c2)
        dmax = c2 / c1 if c1 >= c2 else c1 / c2
        ilb = 1.0 / self.log_base

        def neg_loglik(j: float) -> float:
            # the reference maps NaN (domain-boundary rounding) to +inf so the
            # minimizer can proceed (sketch.hpp:510-513); Python raises where
            # C++ returns NaN/-inf, so catch and map identically
            l1 = l2 = 0.0
            if n_eq > 0 or n_greater > 0:
                arg = (c2 * j - c1) * z
                if arg <= -1.0:
                    return math.inf
                l1 = ilb * math.log1p(arg)
            if n_eq > 0 or n_less > 0:
                arg = (c1 * j - c2) * z
                if arg <= -1.0:
                    return math.inf
                l2 = ilb * math.log1p(arg)
            ret = 0.0
            try:
                if n_eq > 0:
                    ret += n_eq * math.log1p(l1 + l2)
                if n_greater > 0:
                    ret += n_greater * math.log(-l1)
                if n_less > 0:
                    ret += n_less * math.log(-l2)
            except ValueError:  # log of <=0 at domain boundary
                return math.inf
            if math.isnan(ret):
                return math.inf
            return -ret

        if dmax <= 0.0:
            return 0.0
        return minimize_bounded(neg_loglik, 0.0, dmax)

    def mu(self, x: float, y: float) -> float:
        """mu(x, y) = sum_{k>=0} (e^{-x b^-k} - e^{-y b^-k}) = zz(y) - zz(x)
        (sketch.hpp:537-576): the probability mass between two exponential
        tails across the geometric register levels, evaluated from the
        dominant term kMid outward in both directions for fast convergence.
        Used by the range-corrected joint likelihood (mu > 0 iff x < y)."""
        if x == y:
            return 0.0
        swapped = x > y
        if swapped:
            x, y = y, x
        result = 0.0
        if x > 0.0:
            # peak of the summand: k where d/dk e^{-x b^-k} - e^{-y b^-k} = 0
            z = math.log(math.log(x / y) / (x - y)) / self.log_base
            k_mid = int(math.floor(max(0.0, z)))
        else:
            k_mid = 0
        pow_base_mid = self.base_inverse**k_mid
        pow_base = pow_base_mid
        while True:
            old = result
            result -= math.exp(-x * pow_base) * math.expm1((x - y) * pow_base)
            if old == result:
                break
            pow_base *= self.base_inverse
        pow_base = pow_base_mid
        k = k_mid
        while k != 0:
            pow_base *= self.base
            old = result
            result -= math.exp(-x * pow_base) * math.expm1((x - y) * pow_base)
            if old == result:
                break
            k -= 1
        return -result if swapped else result

    @property
    def _mu_grid(self) -> np.ndarray | None:
        """Shared b^-j grid for the batched mu() series (built lazily, once
        per estimator).  J is sized so the truncated tail past the per-row
        k0 offset is < ~1e-12 of the result (for b=2 that is 49 terms; see
        _mu_batch).  None => base too close to 1 for a fixed grid (J would
        exceed 2048) — callers fall back to the scalar mu."""
        grid = getattr(self, "_mu_grid_cache", False)
        if grid is False:
            J = int(math.ceil(math.log(_MU_CUT * 1e13) / self.log_base))
            grid = (
                self.base ** (-np.arange(J, dtype=np.float64)) if J <= 2048 else None
            )
            self._mu_grid_cache = grid
        return grid

    def _mu_batch(self, x: np.ndarray, y: np.ndarray, bufs=None) -> np.ndarray:
        """Vectorized, signed mu(x, y) (sketch.hpp:537-576) over row pairs.

        The scalar mu walks outward from the dominant term with a
        convergence break; a data-dependent loop does not vectorize, so this
        instead evaluates a FIXED k-grid per row: terms with
        lo*b^-k > _MU_CUT are dead on both sides (< e^-50 each) and are
        skipped via a per-row offset k0 = ceil(log_b(lo/_MU_CUT)), and the
        remaining J grid terms bound the truncated tail below ~1e-12 of the
        result (J = ceil(log_b(_MU_CUT * 1e13)), 49 terms for b=2).

        For lo > ~745 (exp underflow at the first term) the scalar/reference
        walk early-breaks to 0 while this sums the true series — such
        arguments cannot arise from the corrected dispatch (registers at the
        0 bound imply small cardinalities), so in-domain the two agree;
        pinned in tests/test_solvers.py.

        ``bufs``: optional pair of preallocated (n, J) float64 scratch
        matrices — in-place exp on reused buffers is ~7x faster than
        allocating per call, and the golden-section loop calls this ~100
        times on identically-shaped batches."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        sign = np.where(x <= y, 1.0, -1.0)
        grid = self._mu_grid
        assert grid is not None
        with np.errstate(divide="ignore", invalid="ignore"):
            k0 = np.ceil(np.log(np.maximum(lo, _MU_CUT) / _MU_CUT) / self.log_base)
        scale = self.base ** (-k0)
        n, J = x.shape[0], grid.shape[0]
        if bufs is None:
            a_buf, b_buf = np.empty((n, J)), np.empty((n, J))
        else:
            a_buf, b_buf = bufs
        np.multiply((lo * scale)[:, None], grid[None, :], out=a_buf)
        np.negative(a_buf, out=a_buf)
        np.exp(a_buf, out=a_buf)
        np.multiply((hi * scale)[:, None], grid[None, :], out=b_buf)
        np.negative(b_buf, out=b_buf)
        np.exp(b_buf, out=b_buf)
        np.subtract(a_buf, b_buf, out=a_buf)
        return sign * a_buf.sum(axis=1)

    def _joint_new_corrected_batch(
        self, n_less, n_greater, n_both_zero, c1, c2
    ) -> np.ndarray:
        """Batched estimateJointNewCorrected (sketch.hpp:578-633): the
        range-corrected joint ML advanced for ALL small-set pairs in lockstep
        via golden_min_batch + the fixed-grid _mu_batch — short-document
        corpora make this the COMMON path, so it must run at numpy
        throughput (VERDICT r3 #2).  The scalar twin
        _joint_new_corrected_one stays as the equivalence oracle in tests
        and as the fallback when base is too close to 1 for a fixed mu grid."""
        nl = np.asarray(n_less, dtype=np.float64)
        ng = np.asarray(n_greater, dtype=np.float64)
        nbz = np.asarray(n_both_zero, dtype=np.float64)
        c1 = np.asarray(c1, dtype=np.float64)
        c2 = np.asarray(c2, dtype=np.float64)
        if self._mu_grid is None:  # pragma: no cover - b very close to 1
            return np.array(
                [
                    self._joint_new_corrected_one(
                        int(nl[i]), int(ng[i]), int(nbz[i]), float(c1[i]), float(c2[i])
                    )
                    for i in range(nl.shape[0])
                ]
            )
        out = np.zeros(nl.shape[0], dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            dmax = np.where(c1 >= c2, c2 / np.where(c1 > 0, c1, np.inf),
                            c1 / np.where(c2 > 0, c2, np.inf))
        solve = dmax > 0.0
        if not np.any(solve):
            return out
        nl_s, ng_s, nbz_s = nl[solve], ng[solve], nbz[solve]
        c1_s, c2_s = c1[solve], c2[solve]
        neq_s = self.m - nl_s - ng_s - nbz_s
        a, base = self.a, self.base
        J = self._mu_grid.shape[0]
        nrows = int(nl_s.shape[0])
        bufs = (np.empty((nrows, J)), np.empty((nrows, J)))

        def neg_loglik(j: np.ndarray) -> np.ndarray:
            # same NaN -> +inf mapping as the scalar twin (the reference's
            # lambda, sketch.hpp:620-624); log of <=0 NaNs silently in numpy
            opj = 1.0 + j
            c = a * (c1_s + c2_s) / opj
            xg = a * (np.maximum(0.0, c1_s - c2_s * j) / (base * opj) + c2_s)
            xl = a * (np.maximum(0.0, c2_s - c1_s * j) / (base * opj) + c1_s)
            p_greater = self._mu_batch(xg, c, bufs)
            p_less = self._mu_batch(xl, c, bufs)
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                ret = -c * nbz_s
                ret = ret + np.where(nl_s > 0, nl_s * np.log(p_less), 0.0)
                ret = ret + np.where(ng_s > 0, ng_s * np.log(p_greater), 0.0)
                ret = ret + np.where(
                    neq_s > 0,
                    neq_s * np.log1p(-p_greater - p_less - np.exp(-c)),
                    0.0,
                )
            return np.where(np.isnan(ret), np.inf, -ret)

        # 48 iterations shrink the bracket to 0.618^48 ~ 1e-10 of dmax <= 1 —
        # past the estimator's statistical error; the mu objective is the
        # expensive one (two (n, J) exp passes per eval), so don't overshoot
        out[solve] = golden_min_batch(
            neg_loglik, np.zeros(nrows), dmax[solve], iters=48
        )
        return out

    def _joint_new_corrected_one(
        self, n_less: int, n_greater: int, n_both_zero: int, c1: float, c2: float
    ) -> float:
        """estimateJointNewCorrected (sketch.hpp:578-633): the range-corrected
        joint ML used when registers sit at the 0 lower bound (small sets
        relative to m — short documents).  Models the both-zero registers'
        Poisson mass explicitly via mu() instead of treating 0 as a regular
        geometric level."""
        if c1 == 0.0 and c2 == 0.0:
            return 0.0
        dmax = c2 / c1 if c1 >= c2 else c1 / c2
        n_eq_nbz = self.m - n_less - n_greater - n_both_zero
        a, base = self.a, self.base

        def neg_loglik(j: float) -> float:
            c = a * (c1 + c2) / (1.0 + j)
            p_greater = (
                self.mu(a * (max(0.0, c1 - c2 * j) / (base * (1.0 + j)) + c2), c)
                if (n_greater > 0 or n_eq_nbz > 0)
                else 0.0
            )
            p_less = (
                self.mu(a * (max(0.0, c2 - c1 * j) / (base * (1.0 + j)) + c1), c)
                if (n_less > 0 or n_eq_nbz > 0)
                else 0.0
            )
            ret = -c * n_both_zero
            # C++ log(<=0)/log1p(<=-1) yield NaN/-inf and the lambda maps NaN
            # to +inf (sketch.hpp:620-624); Python raises — map identically
            try:
                if n_less > 0:
                    ret += n_less * math.log(p_less)
                if n_greater > 0:
                    ret += n_greater * math.log(p_greater)
                if n_eq_nbz > 0:
                    ret += n_eq_nbz * math.log1p(-p_greater - p_less - math.exp(-c))
            except ValueError:
                return math.inf
            if math.isnan(ret):
                return math.inf
            return -ret

        if dmax <= 0.0:
            return 0.0
        return minimize_bounded(neg_loglik, 0.0, dmax)

    def _joint_new_batch(self, n_less, n_greater, c1, c2) -> np.ndarray:
        """Batched estimateJointNew (sketch.hpp:484-522): the per-pair
        bounded likelihood minimization run for ALL pairs in lockstep via
        golden_min_batch — numpy throughput instead of one Python Brent per
        pair (the scalar twin _joint_new_one stays as the equivalence
        oracle in tests)."""
        nl = np.asarray(n_less, dtype=np.float64)
        ng = np.asarray(n_greater, dtype=np.float64)
        c1 = np.asarray(c1, dtype=np.float64)
        c2 = np.asarray(c2, dtype=np.float64)
        neq = self.m - nl - ng
        out = np.zeros(nl.shape[0], dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            dmax = np.where(c1 >= c2, c2 / np.where(c1 > 0, c1, np.inf),
                            c1 / np.where(c2 > 0, c2, np.inf))
        solve = dmax > 0.0
        if not np.any(solve):
            return out
        nl_s, ng_s, neq_s = nl[solve], ng[solve], neq[solve]
        c1_s, c2_s = c1[solve], c2[solve]
        z = (1.0 - self.base_inverse) / (c1_s + c2_s)
        ilb = 1.0 / self.log_base
        need1 = (neq_s > 0) | (ng_s > 0)
        need2 = (neq_s > 0) | (nl_s > 0)

        def neg_loglik(j: np.ndarray) -> np.ndarray:
            # the reference maps NaN (domain-boundary rounding) to +inf so
            # the minimizer can proceed (sketch.hpp:510-513); numpy produces
            # the NaNs silently — propagate them and map at the end.  args at
            # or below -1 are out of domain exactly like the scalar path.
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                arg1 = (c2_s * j - c1_s) * z
                arg2 = (c1_s * j - c2_s) * z
                l1 = np.where(arg1 <= -1.0, np.nan, ilb * np.log1p(arg1))
                l2 = np.where(arg2 <= -1.0, np.nan, ilb * np.log1p(arg2))
                l1 = np.where(need1, l1, 0.0)
                l2 = np.where(need2, l2, 0.0)
                ret = np.where(neq_s > 0, neq_s * np.log1p(l1 + l2), 0.0)
                ret = ret + np.where(ng_s > 0, ng_s * np.log(-l1), 0.0)
                ret = ret + np.where(nl_s > 0, nl_s * np.log(-l2), 0.0)
            return np.where(np.isnan(ret), np.inf, -ret)

        out[solve] = golden_min_batch(neg_loglik, np.zeros(nl_s.shape[0]), dmax[solve])
        return out

    def joint_new(self, s1: np.ndarray, s2: np.ndarray, card1=None, card2=None):
        """estimateJointNewWithKnownSetCardinalities (sketch.hpp:642-678).

        Extreme-register dispatch mirrors the reference exactly: registers at
        both bounds -> (a) range-corrected ML via mu() when only the LOWER
        bound is hit and joint_range_correction is on (sketch.hpp:670-671),
        else (b) inclusion-exclusion when joint_fallback is on, else (c) the
        plain ML solve — batched across all plain rows."""
        a1 = np.atleast_2d(np.asarray(s1))
        a2 = np.atleast_2d(np.asarray(s2))
        c1 = self.cardinality_simple(a1) if card1 is None else np.atleast_1d(np.asarray(card1, dtype=np.float64))
        c2 = self.cardinality_simple(a2) if card2 is None else np.atleast_1d(np.asarray(card2, dtype=np.float64))
        less, greater, both_min, both_max, _ = self.compare_registers(a1, a2)
        rows = a1.shape[0]
        extreme = (both_min > 0) | (both_max > 0)
        corrected = extreme & (both_max == 0) if self.joint_range_correction else np.zeros(rows, dtype=bool)
        fallback = extreme & ~corrected if self.joint_fallback else np.zeros(rows, dtype=bool)
        plain = ~corrected & ~fallback

        jac = np.zeros(rows, dtype=np.float64)
        if np.any(plain):
            jac[plain] = self._joint_new_batch(
                less[plain], greater[plain], c1[plain], c2[plain]
            )
        if np.any(corrected):
            idx = np.nonzero(corrected)[0]
            jac[idx] = self._joint_new_corrected_batch(
                less[idx], greater[idx], both_min[idx], c1[idx], c2[idx]
            )
        result = joint_from_jaccard(c1, c2, jac)
        if np.any(fallback):
            idx = np.nonzero(fallback)[0]
            fb = self.joint_incl_excl(a1[idx], a2[idx], c1[idx], c2[idx])
            for k in result:
                result[k][idx] = fb[k]
        return result

    def joint_new_prefiltered(
        self, s1: np.ndarray, s2: np.ndarray, threshold: float,
        card1=None, card2=None,
    ):
        """SURVEY §7.3's composed decision path: the vectorized closed-form
        equal-register bounds (sketch.hpp:701-719) decide every pair whose
        [lower, upper] interval does NOT straddle ``threshold``; the ML solve
        (joint_new) runs only on the straddling band.

        Returns (result, passed, solved): ``passed`` is the authoritative
        >= threshold decision (lower >= t accepts, upper < t rejects,
        band rows decided by their ML estimate); ``solved`` marks the band.
        Non-band rows report the inclusion-exclusion closed form in
        ``result`` (sketch.hpp:391-410) — fully vectorized, no solver."""
        a1 = np.atleast_2d(np.asarray(s1))
        a2 = np.atleast_2d(np.asarray(s2))
        c1 = self.cardinality_simple(a1) if card1 is None else np.atleast_1d(np.asarray(card1, dtype=np.float64))
        c2 = self.cardinality_simple(a2) if card2 is None else np.atleast_1d(np.asarray(card2, dtype=np.float64))
        lower, upper = self.jaccard_bounds_equal_registers(a1, a2)
        band = (lower < threshold) & (upper >= threshold)
        result = self.joint_incl_excl(a1, a2, c1, c2)
        if np.any(band):
            idx = np.nonzero(band)[0]
            ml = self.joint_new(a1[idx], a2[idx], c1[idx], c2[idx])
            for k in result:
                result[k][idx] = ml[k]
        passed = (lower >= threshold) | (band & (result["jaccard"] >= threshold))
        result["jaccard_lower"] = lower
        result["jaccard_upper"] = upper
        return result, passed, band

    def jaccard_bounds_equal_registers(self, s1: np.ndarray, s2: np.ndarray):
        """estimateJaccardSimilarityUsingEqualRegisters (sketch.hpp:701-719):
        closed-form lower/upper Jaccard bounds from the equal-register
        fraction — the vectorized LSH pre-filter."""
        a1 = np.atleast_2d(np.asarray(s1))
        a2 = np.atleast_2d(np.asarray(s2))
        g = (a1 == a2).sum(axis=1) / float(self.m)
        h = (g + 1.0) * 0.5
        lb_term = log1p_div_x(self.base - 1.0)
        lower = np.maximum(0.0, 2.0 * (expm1_div_x(self.log_base * h) * lb_term * h) - 1.0)
        upper = expm1_div_x(self.log_base * g) * lb_term * g
        return lower, upper


def _sigma_vec(x: np.ndarray, base: float) -> np.ndarray:
    """sigma series (sketch.hpp:246-266), vectorized over x in [0,1].
    Endpoints are handled directly (x=0 -> 0, x=1 -> inf); the series loop
    runs only on interior points and is a straight vectorization of the
    reference's convergence loop."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    out[x == 0.0] = 0.0
    out[x == 1.0] = np.inf
    interior = (x > 0.0) & (x < 1.0)
    xi = x[interior]
    sums = np.zeros_like(xi)
    xbk = xi.copy()
    bkm1 = 1.0
    with np.errstate(over="ignore", invalid="ignore"):
        for _ in range(200_000):
            old = sums.copy()
            xbk = xbk**base
            sums = sums + xbk * bkm1
            bkm1 *= base
            if np.all(sums == old):
                break
    out[interior] = xi + (base - 1.0) * sums
    return out


def _tau_vec(x: np.ndarray, base: float) -> np.ndarray:
    """tau series (sketch.hpp:268-284), vectorized over x in [0,1]."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    out[(x == 0.0) | (x == 1.0)] = 0.0
    interior = (x > 0.0) & (x < 1.0)
    xi = x[interior]
    base_inverse = 1.0 / base
    sums = np.zeros_like(xi)
    xbmk = xi.copy()
    bmk = base_inverse
    for _ in range(200_000):
        old = sums.copy()
        sums = sums + (xbmk - 1.0) * bmk
        if np.all(sums == old):
            break
        xbmk = xbmk**base_inverse
        bmk *= base_inverse
    out[interior] = (1.0 - xi) + (base - 1.0) * sums
    return out


@lru_cache(maxsize=16)
def get_setsketch_estimator(
    q: int, a: float, base: float, m: int,
    card_corr: bool, joint_corr: bool, fallback: bool,
) -> SetSketchEstimator:
    """Process-level estimator cache: sigma/tau tables are built once per
    executor per config (the reference precomputes them in the config ctor,
    sketch.hpp:307-316)."""
    return SetSketchEstimator(q, a, base, m, card_corr, joint_corr, fallback)


# ---------------------------------------------------------------------------
# MinHash joint estimators (sketch.hpp:1374-1544)
# ---------------------------------------------------------------------------

class MinHashJointEstimator:
    def __init__(self, num_registers: int):
        self.m = int(num_registers)

    def cardinality(self, states: np.ndarray) -> np.ndarray:
        """Harmonic cardinality estimator — DENSE signatures only.  A
        densified OPH register is the min of ~n/m elements (one hash bin),
        not of all n, so this estimate would be off by ~m under OPH; the
        Spark pipeline passes the exact n_shingles counts instead."""
        return minhash_cardinality(states)

    def joint_original(self, s1: np.ndarray, s2: np.ndarray, card1=None, card2=None):
        """estimateJointOriginal (sketch.hpp:1452-1461): jaccard = fraction
        of equal registers.  Fully vectorized — the pipeline's default
        verification estimator."""
        a1 = np.atleast_2d(np.asarray(s1, dtype=U64))
        a2 = np.atleast_2d(np.asarray(s2, dtype=U64))
        c1 = self.cardinality(a1) if card1 is None else np.asarray(card1, dtype=np.float64)
        c2 = self.cardinality(a2) if card2 is None else np.asarray(card2, dtype=np.float64)
        jac = (a1 == a2).sum(axis=1) / float(self.m)
        return joint_from_jaccard(c1, c2, jac)

    def jaccard_equal_registers(self, s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
        a1 = np.atleast_2d(np.asarray(s1, dtype=U64))
        a2 = np.atleast_2d(np.asarray(s2, dtype=U64))
        return (a1 == a2).sum(axis=1) / float(self.m)

    def joint_new(self, s1: np.ndarray, s2: np.ndarray, card1=None, card2=None):
        """estimateJointNewWithKnownSetCardinalities (sketch.hpp:1475-1503):
        closed-form ML — vectorized."""
        a1 = np.atleast_2d(np.asarray(s1, dtype=U64))
        a2 = np.atleast_2d(np.asarray(s2, dtype=U64))
        c1 = self.cardinality(a1) if card1 is None else np.asarray(card1, dtype=np.float64)
        c2 = self.cardinality(a2) if card2 is None else np.asarray(card2, dtype=np.float64)
        dp = (a1 < a2).sum(axis=1).astype(np.float64)
        dm = (a1 > a2).sum(axis=1).astype(np.float64)
        d0 = self.m - dp - dm
        na2 = c1 * c1
        nb2 = c2 * c2
        xa = na2 * (d0 + dm)
        xb = nb2 * (d0 + dp)
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = (xa + xb - np.sqrt((xa - xb) ** 2 + 4.0 * dp * dm * na2 * nb2)) / (
                2.0 * self.m * c1 * c2
            )
        jac = np.clip(np.where(np.isfinite(jac), jac, 0.0), 0.0, 1.0)
        return joint_from_jaccard(c1, c2, jac)

    def joint_incl_excl(self, s1: np.ndarray, s2: np.ndarray, card1=None, card2=None):
        """estimateJointInclExcl (sketch.hpp:1414-1427): union state =
        element-wise min."""
        a1 = np.atleast_2d(np.asarray(s1, dtype=U64))
        a2 = np.atleast_2d(np.asarray(s2, dtype=U64))
        c1 = self.cardinality(a1) if card1 is None else np.asarray(card1, dtype=np.float64)
        c2 = self.cardinality(a2) if card2 is None else np.asarray(card2, dtype=np.float64)
        cu = self.cardinality(np.minimum(a1, a2))
        return joint_from_union(c1, c2, cu)
