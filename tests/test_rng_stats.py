"""Statistical acceptance tests for our hashing/RNG kernels.

Mirrors the reference's RNG test protocol (c++/random_test.cpp:112-133,
python/random_test.py:31-116): KS test on uniform/exponential transforms,
chi-squared on bounded integers, acceptance at significance 0.01.  scipy is
unavailable, so the KS p-value uses the asymptotic Kolmogorov distribution
and the chi-squared test compares against hard-coded 99% critical values.
"""

import math

import numpy as np

from set_sketch_paper_spark.sketchlib.hashing import (
    derive_keys,
    exponential_from_u64,
    lemire_bounded,
    splitmix64,
    u64_to_unit,
)

N = 100_000


def ks_pvalue(sample: np.ndarray, cdf) -> float:
    x = np.sort(sample)
    n = len(x)
    c = cdf(x)
    d_plus = np.max(np.arange(1, n + 1) / n - c)
    d_minus = np.max(c - np.arange(0, n) / n)
    d = max(d_plus, d_minus)
    lam = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d
    # asymptotic Kolmogorov survival function
    s = 0.0
    for k in range(1, 101):
        s += (-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
    return max(0.0, min(1.0, 2.0 * s))


CHI2_99 = {15: 30.578, 63: 92.010, 255: 310.457}


def test_uniform_unit_ks():
    h = splitmix64(np.arange(N, dtype=np.uint64))
    u = u64_to_unit(h)
    p = ks_pvalue(u, lambda x: np.clip(x, 0, 1))
    assert p > 0.01, p


def test_exponential_ks():
    h = splitmix64(np.arange(N, dtype=np.uint64) + np.uint64(7_777_777))
    e = exponential_from_u64(h)
    p = ks_pvalue(e, lambda x: -np.expm1(-x))
    assert p > 0.01, p


def test_lemire_bounded_chi2():
    for bound in (16, 64, 256):
        h = splitmix64(np.arange(N, dtype=np.uint64) * np.uint64(3) + np.uint64(bound))
        idx = lemire_bounded(h, bound)
        counts = np.bincount(idx, minlength=bound)
        expected = N / bound
        chi2 = float(np.sum((counts - expected) ** 2 / expected))
        assert chi2 < CHI2_99[bound - 1], (bound, chi2)


def test_bit_balance():
    """Each of the 64 output bits should be ~balanced (binomial test via
    normal approximation at 0.01 significance, Bonferroni-ish margin)."""
    h = splitmix64(np.arange(N, dtype=np.uint64) + np.uint64(123))
    for bit in range(64):
        ones = int(np.count_nonzero((h >> np.uint64(bit)) & np.uint64(1)))
        z = abs(ones - N / 2) / math.sqrt(N / 4)
        assert z < 4.5, (bit, z)


def test_derive_keys_distinct():
    k = derive_keys(42, 4096)
    assert len(np.unique(k)) == 4096
    k2 = derive_keys(43, 4096)
    assert not np.array_equal(k, k2)


def test_linear_register_hash_family_uniform_and_independent():
    """The dense-MinHash register family h_j(e) = A(e) + key_j * B(e):
    per-register KS uniformity and near-zero cross-register correlation —
    the statistical contract the linear construction must keep for
    min-value statistics (SURVEY.md 5.2)."""
    rng = np.random.RandomState(42)
    n = 50_000
    vals = rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    A = splitmix64(vals ^ np.uint64(0x71C9_5EED_A11C_E001))
    B = splitmix64(vals ^ np.uint64(0x2545_F491_4F6C_DD1D)) | np.uint64(1)
    keys = derive_keys(123, 4)
    with np.errstate(over="ignore"):
        h = A[:, None] + B[:, None] * keys[None, :]
    u = (h >> np.uint64(11)).astype(np.float64) * 2.0**-53
    for j in range(4):
        p = ks_pvalue(u[:, j], lambda x: np.clip(x, 0, 1))
        assert p > 0.01, (j, p)
    # cross-register Pearson correlation on uniforms ~ N(0, 1/sqrt(n))
    for j in range(1, 4):
        rho = float(np.corrcoef(u[:, 0], u[:, j])[0, 1])
        assert abs(rho) < 4.5 / math.sqrt(n), (j, rho)
