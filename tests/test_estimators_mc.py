"""Monte-Carlo estimator accuracy vs the paper's closed-form error theory.

Mirrors the reference protocols at reduced scale (SURVEY.md §5.3, FIXTURES
F2/F3):
- cardinality relative RMSE tracks sqrt(((b+1)/(b-1)·ln b - 1)/m)
  (python/cardinality_error_charts.py:81-82)
- MinHash Jaccard RMSE tracks sqrt(J(1-J)/m)
  (python/collision_probability.py:68-69)
- GHLL joint estimators land within a tolerance band of the reference's
  checked-in CSV points (BASELINE.md).
"""

import math

import numpy as np
import pytest

from set_sketch_paper_spark.sketchlib import (
    ghll_sketch,
    minhash_signature,
    setsketch_sketch,
)
from set_sketch_paper_spark.sketchlib.estimators import (
    MinHashJointEstimator,
    SetSketchEstimator,
    joint_from_jaccard,
    joint_from_union,
)

from conftest import random_u64


def theory_rel_rmse(base: float, m: int) -> float:
    return math.sqrt(((base + 1.0) / (base - 1.0) * math.log(base) - 1.0) / m)


def make_pair(rng, d1, d2, inter):
    """Disjoint-stream construction with exact ground truth
    (joint_estimation_test.cpp:104-199)."""
    shared = random_u64(rng, inter)
    a = np.concatenate([shared, random_u64(rng, d1)])
    b = np.concatenate([shared, random_u64(rng, d2)])
    return a, b


@pytest.mark.parametrize("m,base,q,card", [(256, 2.0, 62, 10_000), (1024, 2.0, 62, 3_000)])
def test_ghll_cardinality_rmse_tracks_theory(rng, m, base, q, card):
    n_examples = 150
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    regs = []
    for i in range(n_examples):
        regs.append(ghll_sketch(random_u64(rng, card), m, base, q, seed=1000 + i))
    ests = est.cardinality_simple(np.vstack(regs))
    rel = (ests - card) / card
    emp_rmse = float(np.sqrt(np.mean(rel**2)))
    th = theory_rel_rmse(base, m)
    assert 0.7 * th < emp_rmse < 1.35 * th, (emp_rmse, th)
    assert abs(np.mean(rel)) < 3.0 * th / math.sqrt(n_examples) + 0.01  # low bias


def test_ghll_ml_cardinality_at_least_as_good(rng):
    m, base, q, card = 256, 2.0, 62, 10_000
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    regs = np.vstack([ghll_sketch(random_u64(rng, card), m, base, q, seed=i) for i in range(80)])
    simple = est.cardinality_simple(regs)
    ml = est.cardinality_ml(regs)
    rmse_s = np.sqrt(np.mean((simple / card - 1) ** 2))
    rmse_ml = np.sqrt(np.mean((ml / card - 1) ** 2))
    assert rmse_ml < 1.25 * rmse_s  # ML is at least comparable


def test_setsketch_cardinality_rmse(rng):
    m, base, a, q, card = 256, 2.0, 20.0, 62, 5_000
    est = SetSketchEstimator(q, a, base, m, False, False, False)
    regs = np.vstack(
        [setsketch_sketch(random_u64(rng, card), m, base, a, q, seed=i) for i in range(150)]
    )
    ests = est.cardinality_simple(regs)
    rel = ests / card - 1.0
    emp = float(np.sqrt(np.mean(rel**2)))
    th = theory_rel_rmse(base, m)
    assert 0.7 * th < emp < 1.35 * th, (emp, th)


def test_small_range_correction_small_sets(rng):
    """GHLL with sigma correction stays accurate for tiny sets (sketch.hpp:324-338)."""
    m, base, q = 256, 2.0, 62
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    for card in (1, 5, 50):
        regs = np.vstack([ghll_sketch(random_u64(rng, card), m, base, q, seed=i) for i in range(100)])
        mean_est = float(np.mean(est.cardinality_simple(regs)))
        assert abs(mean_est - card) / card < 0.15, (card, mean_est)


def test_minhash_jaccard_rmse_tracks_theory(rng):
    m, j = 256, 0.5
    inter, d = 1000, 500  # |A∩B|=1000, |A\B|=|B\A|=500 -> J=0.5
    est = MinHashJointEstimator(m)
    jacc = []
    for i in range(200):
        a, b = make_pair(rng, d, d, inter)
        sa = minhash_signature(a, m, seed=77)
        sb = minhash_signature(b, m, seed=77)
        jacc.append(est.jaccard_equal_registers(sa, sb)[0])
    emp = float(np.sqrt(np.mean((np.asarray(jacc) - j) ** 2)))
    th = math.sqrt(j * (1 - j) / m)
    assert 0.7 * th < emp < 1.35 * th, (emp, th)


def test_minhash_joint_new_and_inclexcl(rng):
    m = 1024
    est = MinHashJointEstimator(m)
    a, b = make_pair(rng, 2000, 2000, 4000)  # J = 0.5
    sa = minhash_signature(a, m, seed=5)
    sb = minhash_signature(b, m, seed=5)
    for method in (est.joint_original, est.joint_new, est.joint_incl_excl):
        r = method(sa, sb)
        assert abs(r["jaccard"][0] - 0.5) < 0.12, method
        assert abs(r["intersection"][0] - 4000) / 4000 < 0.25
        assert abs(r["union"][0] - 8000) / 8000 < 0.15


def test_ghll_joint_new_reference_point(rng):
    """GHLL m=4096 b=2 at J=0.5, equal differences.

    The reference CSV point (union=1e6) gives RMSE(newJaccard)=9.32e-3 at
    m=4096 (BASELINE.md).  The error is cardinality-independent once n >> m
    (no empty registers), so we test at union=2e5 for CI speed with a wide
    statistical band (40 examples)."""
    m, base, q = 4096, 2.0, 62
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    n_ex = 40
    errs_new, errs_ie = [], []
    for i in range(n_ex):
        a, b = make_pair(rng, 50_000, 50_000, 100_000)
        sa = ghll_sketch(a, m, base, q, seed=900 + i)
        sb = ghll_sketch(b, m, base, q, seed=900 + i)
        errs_new.append(est.joint_new(sa, sb)["jaccard"][0] - 0.5)
        errs_ie.append(est.joint_incl_excl(sa, sb)["jaccard"][0] - 0.5)
    rmse_new = float(np.sqrt(np.mean(np.square(errs_new))))
    rmse_ie = float(np.sqrt(np.mean(np.square(errs_ie))))
    # reference: 9.32e-3 (new ML), 1.275e-2 (incl-excl)
    assert rmse_new < 9.32e-3 * 1.6, rmse_new
    assert rmse_ie < 1.275e-2 * 1.6, rmse_ie
    assert rmse_new < rmse_ie * 1.25  # ML at least as good as incl-excl


def test_jaccard_bounds_bracket_truth(rng):
    m, base, q = 1024, 2.0, 62
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    for j_true, (d, inter) in {0.5: (1000, 2000), 0.8: (250, 2000)}.items():
        lo_all, up_all = [], []
        for i in range(30):
            a, b = make_pair(rng, d, d, inter)
            sa = ghll_sketch(a, m, base, q, seed=i)
            sb = ghll_sketch(b, m, base, q, seed=i)
            lo, up = est.jaccard_bounds_equal_registers(sa, sb)
            lo_all.append(lo[0])
            up_all.append(up[0])
        assert np.mean(lo_all) < j_true + 0.05
        assert np.mean(up_all) > j_true - 0.05


def test_joint_result_algebra():
    r = joint_from_jaccard(100.0, 100.0, 0.5)
    assert np.isclose(r["intersection"][0], 200.0 * 0.5 / 1.5)
    assert np.isclose(r["union"][0], 200.0 / 1.5)
    assert np.isclose(r["jaccard"][0], 0.5)
    # trimming: jaccard above feasibility upper bound min(c1/c2, c2/c1)
    r2 = joint_from_jaccard(100.0, 200.0, 0.9)
    assert np.isclose(r2["jaccard"][0], 0.5)  # trimmed to 100/200
    # union formula
    r3 = joint_from_union(100.0, 100.0, 150.0)
    assert np.isclose(r3["intersection"][0], 50.0)
    assert np.isclose(r3["jaccard"][0], 50.0 / 150.0)
    # empty
    r4 = joint_from_jaccard(0.0, 0.0, 0.3)
    assert r4["jaccard"][0] == 0.0 and r4["union"][0] == 0.0


# ---------------------------------------------------------------------------
# mu() range-corrected joint estimator (sketch.hpp:537-633)
# ---------------------------------------------------------------------------

def _zz_slow(x: float, base: float) -> float:
    """sum_{k>=0} 1 - e^{-x*b^-k} — the commented-out zz() series the
    reference documents as the mu() identity (sketch.hpp:524-535)."""
    s, p = 0.0, 1.0
    while True:
        old = s
        s -= math.expm1(-x * p)
        if s == old:
            return s
        p /= base


def test_mu_equals_zz_difference():
    est = SetSketchEstimator(62, 1.0 / 256, 2.0, 256, True, True, False)
    for x, y in [(0.0, 1.0), (0.5, 2.0), (3.0, 0.25), (10.0, 10.5), (1e-4, 5.0)]:
        want = _zz_slow(y, 2.0) - _zz_slow(x, 2.0)
        assert abs(est.mu(x, y) - want) < 1e-12 * max(1.0, abs(want)), (x, y)
    assert est.mu(1.0, 1.0) == 0.0
    assert est.mu(2.0, 1.0) == -est.mu(1.0, 2.0)


def test_joint_corrected_small_sets_beats_uncorrected(rng):
    """Small sets (union << m): many registers sit at the 0 lower bound and
    the UNcorrected ML is heavily biased upward — the reference's own golden
    CSV shows mean jaccard 0.857 for true 0.5 at union=1000, m=4096 — while
    the mu()-corrected estimator recovers the truth."""
    m, base, q = 1024, 2.0, 62
    est_plain = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    est_corr = SetSketchEstimator(q, 1.0 / m, base, m, True, True, False)
    n_ex, d, inter = 60, 75, 150  # union = 300 << m -> ~70% registers zero
    j_plain, j_corr = [], []
    for i in range(n_ex):
        a, b = make_pair(rng, d, d, inter)
        sa = ghll_sketch(a, m, base, q, seed=4200 + i)
        sb = ghll_sketch(b, m, base, q, seed=4200 + i)
        c1, c2 = float(len(a)), float(len(b))
        j_plain.append(est_plain.joint_new(sa, sb, [c1], [c2])["jaccard"][0])
        j_corr.append(est_corr.joint_new(sa, sb, [c1], [c2])["jaccard"][0])
    bias_plain = abs(float(np.mean(j_plain)) - 0.5)
    bias_corr = abs(float(np.mean(j_corr)) - 0.5)
    assert bias_plain > 0.15, bias_plain  # the uncorrected failure mode is real
    assert bias_corr < 0.06, bias_corr    # correction recovers the truth
    rmse_corr = float(np.sqrt(np.mean((np.asarray(j_corr) - 0.5) ** 2)))
    assert rmse_corr < 0.12, rmse_corr


def test_joint_uncorrected_matches_reference_golden_bias(rng):
    """Parity with the reference's checked-in golden CSV: GHLL m=4096 q=62
    b=2, (d1,d2,inter)=(250,250,500), KNOWN cardinalities, NO range
    correction -> newKnownCardMeanJaccard = 0.8567 (joint_test CSV row 1).
    Reproducing the reference's BIAS is the strongest uncorrected-path
    parity check available from the published artifacts."""
    m, base, q = 4096, 2.0, 62
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    n_ex = 50
    vals = []
    for i in range(n_ex):
        a, b = make_pair(rng, 250, 250, 500)
        sa = ghll_sketch(a, m, base, q, seed=7100 + i)
        sb = ghll_sketch(b, m, base, q, seed=7100 + i)
        vals.append(est.joint_new(sa, sb, [750.0], [750.0])["jaccard"][0])
    mean = float(np.mean(vals))
    # golden: mean 0.85675, mse 0.12728 -> sd ~ 0.128/sqrt(...)  band: 5 SE
    sd = math.sqrt(0.12727564311638401 - (0.85674848379263036 - 0.5) ** 2)
    assert abs(mean - 0.85674848379263036) < 5.0 * sd / math.sqrt(n_ex) + 0.02, mean


def test_setsketch2_golden_cardinality_parity(rng):
    """SS2 parity via the shared SS1-kernel register law (setsketch.py:19-27
    subsumption argument): our estimator's MC mean at the reference's SS2
    golden CSV grid points (m=256, b=2, a=20, q=62, simple estimator,
    data/cardinality_test(name=SetSketch2;...).csv) within 5 standard
    errors + a small kernel-difference slack."""
    m, base, a_param, q = 256, 2.0, 20.0, 62
    est = SetSketchEstimator(q, a_param, base, m, False, False, False)
    golden = {  # true_card: (simple mean, simple mse) from the CSV
        900: (9.03540857561723101e02, 2.57169836935543663e03),
        9036: (9.07768711175614408e03, 3.45876992752598599e05),
    }
    n_ex = 150
    for card, (g_mean, g_mse) in golden.items():
        regs = np.vstack(
            [setsketch_sketch(random_u64(rng, card), m, base, a_param, q, seed=8800 + i)
             for i in range(n_ex)]
        )
        mean = float(np.mean(est.cardinality_simple(regs)))
        sd = math.sqrt(max(g_mse - (g_mean - card) ** 2, 1e-9))
        tol = 5.0 * sd / math.sqrt(n_ex) + 0.005 * card
        assert abs(mean - g_mean) < tol, (card, mean, g_mean, tol)


def test_hyperminhash_joint_original_collision_corrected(rng):
    """HMH estimateJointOriginal (sketch.hpp:1785-1821): jaccard from
    matching registers minus the expected-collision estimate.  Checks the
    collision estimate is engaged (raw match fraction overshoots on
    disjoint sets; corrected estimate is near 0) and accuracy at J=0.5."""
    from set_sketch_paper_spark.sketchlib.hyperminhash import (
        HyperMinHashEstimator,
        hyperminhash_sketch,
    )

    bb, bs, sbs = 8, 6, 10
    est = HyperMinHashEstimator(bb, bs, sbs)
    # disjoint pair: true J = 0
    j0, j05 = [], []
    for i in range(60):
        a, b = make_pair(rng, 3000, 3000, 0)
        sa = hyperminhash_sketch(a, bb, bs, sbs, seed=31 + i)
        sb = hyperminhash_sketch(b, bb, bs, sbs, seed=31 + i)
        j0.append(est.joint_original(sa, sb)["jaccard"][0])
        a, b = make_pair(rng, 1500, 1500, 3000)
        sa = hyperminhash_sketch(a, bb, bs, sbs, seed=77 + i)
        sb = hyperminhash_sketch(b, bb, bs, sbs, seed=77 + i)
        j05.append(est.joint_original(sa, sb)["jaccard"][0])
    assert abs(float(np.mean(j0))) < 0.02, np.mean(j0)
    assert abs(float(np.mean(j05)) - 0.5) < 0.06, np.mean(j05)


def test_hmh_joint_original_golden_csv_parity(rng):
    """Parity with the reference's HyperMinHash golden CSV (joint_test,
    m=4096 bucketBits=12 bucketSize=6 subBucketSize=10): at
    (d1,d2,inter)=(250,250,500) with known cardinalities the
    collision-corrected original estimator has mean jaccard 0.500033,
    mse 3.19e-5.  Our MC mean must land within 5 standard errors."""
    from set_sketch_paper_spark.sketchlib.hyperminhash import (
        HyperMinHashEstimator,
        hyperminhash_sketch,
    )

    bb, bs, sbs = 12, 6, 10
    est = HyperMinHashEstimator(bb, bs, sbs)
    n_ex = 40
    vals = []
    for i in range(n_ex):
        a, b = make_pair(rng, 250, 250, 500)
        sa = hyperminhash_sketch(a, bb, bs, sbs, seed=5200 + i)
        sb = hyperminhash_sketch(b, bb, bs, sbs, seed=5200 + i)
        vals.append(
            est.joint_original(sa, sb, card1=[750.0], card2=[750.0])["jaccard"][0]
        )
    mean = float(np.mean(vals))
    g_mean, g_mse = 0.50003337701556905, 3.190445110887083e-05
    sd = math.sqrt(g_mse)
    assert abs(mean - g_mean) < 5.0 * sd / math.sqrt(n_ex) + 0.003, mean


def test_ghll_golden_cardinality_parity(rng):
    """Parity with the reference's GHLL golden CSV (m=256, q=62, b=2,
    card_range_correction on): simple-estimator MC mean at grid points
    900 and 9036 within 5 standard errors + small kernel slack."""
    m, base, q = 256, 2.0, 62
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    golden = {
        900: (9.03564984052229534e02, 2.57497656015920984e03),
        9036: (9.07460441207162876e03, 3.39069586828672967e05),
    }
    n_ex = 150
    for card, (g_mean, g_mse) in golden.items():
        regs = np.vstack(
            [ghll_sketch(random_u64(rng, card), m, base, q, seed=9700 + i)
             for i in range(n_ex)]
        )
        mean = float(np.mean(est.cardinality_simple(regs)))
        sd = math.sqrt(max(g_mse - (g_mean - card) ** 2, 1e-9))
        tol = 5.0 * sd / math.sqrt(n_ex) + 0.005 * card
        assert abs(mean - g_mean) < tol, (card, mean, g_mean, tol)
