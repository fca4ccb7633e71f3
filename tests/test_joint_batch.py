"""Batched ML solvers vs their scalar twins, and the SURVEY §7.3 composed
bounds-prefilter -> ML-refine decision path.

The scalar per-row implementations (_joint_new_one, _cardinality_ml_one) are
kept in the codebase precisely to serve as the equivalence oracles here: the
vectorized lockstep solvers must agree with them to far below the estimators'
statistical error."""

import numpy as np
import pytest

from set_sketch_paper_spark.sketchlib.estimators import (
    SetSketchEstimator,
    golden_min_batch,
)
from set_sketch_paper_spark.sketchlib.ghll import ghll_sketch, ghll_sketches_batch
from set_sketch_paper_spark.sketchlib.hashing import U64, splitmix64

from conftest import random_u64


@pytest.fixture
def rng():
    return np.random.RandomState(0xBA7C4)


def make_pair(rng, d1, d2, inter):
    shared = random_u64(rng, inter)
    a = np.concatenate([shared, random_u64(rng, d1)])
    b = np.concatenate([shared, random_u64(rng, d2)])
    return a, b


def test_golden_min_batch_quadratics():
    mins = np.array([0.1, 0.5, 0.93])

    def f(x):
        return (x - mins) ** 2

    got = golden_min_batch(f, np.zeros(3), np.ones(3))
    assert np.allclose(got, mins, atol=1e-9)


def test_joint_new_batch_matches_scalar(rng):
    est = SetSketchEstimator(62, 1.0 / 256, 2.0, 256, True, False, False)
    n = 400
    nl = rng.randint(0, 120, n)
    ng = rng.randint(0, 120, n)
    c1 = rng.uniform(10, 5000, n)
    c2 = rng.uniform(10, 5000, n)
    batch = est._joint_new_batch(nl, ng, c1, c2)
    scalar = np.array(
        [est._joint_new_one(int(nl[i]), int(ng[i]), c1[i], c2[i]) for i in range(n)]
    )
    assert np.max(np.abs(batch - scalar)) < 1e-6


def test_cardinality_ml_batch_matches_scalar(rng):
    est = SetSketchEstimator(62, 1.0 / 256, 2.0, 256, True, False, False)
    rows, per = 200, 700
    vals = splitmix64(np.arange(rows * per, dtype=U64))
    regs, _ = ghll_sketches_batch(
        vals, np.arange(rows + 1) * per, 256, 2.0, 62, 42
    )
    batch = est.cardinality_ml(regs)
    scalar = np.array(
        [est._cardinality_ml_one(regs[i].astype(np.int64)) for i in range(rows)]
    )
    assert np.max(np.abs(batch - scalar) / scalar) < 1e-8


def test_cardinality_ml_batch_edge_rows():
    """Empty and saturated sketches hit the closed-form branches."""
    est = SetSketchEstimator(62, 1.0 / 64, 2.0, 64, True, False, False)
    empty = np.zeros((1, 64), dtype=np.int64)
    full = np.full((1, 64), 63, dtype=np.int64)
    mixed = np.vstack([empty, full])
    got = est.cardinality_ml(mixed)
    assert got[0] == 0.0 and np.isinf(got[1])


def _corpus_pairs(rng, m, base, q, n_pairs=300):
    """Seeded MC pair set with jaccards spread across [0, 1]."""
    s1, s2 = [], []
    for i in range(n_pairs):
        inter = int(rng.randint(0, 800))
        d = int(rng.randint(1, 800))
        a, b = make_pair(rng, d, d, inter)
        s1.append(ghll_sketch(a, m, base, q, seed=9000 + i))
        s2.append(ghll_sketch(b, m, base, q, seed=9000 + i))
    return np.vstack(s1), np.vstack(s2)


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7])
def test_prefilter_decisions_identical_to_solve_everything(rng, threshold):
    """joint_new_prefiltered's passed must equal the solve-everything
    decision (ML est >= t) on every pair of a seeded 300-pair corpus — and
    the band (rows actually solved) must be a strict subset."""
    m, base, q = 256, 2.0, 62
    est = SetSketchEstimator(q, 1.0 / m, base, m, True, False, False)
    s1, s2 = _corpus_pairs(rng, m, base, q)
    full = est.joint_new(s1, s2)["jaccard"] >= threshold
    result, passed, solved = est.joint_new_prefiltered(s1, s2, threshold)
    assert np.array_equal(passed, full)
    frac_solved = solved.mean()
    assert frac_solved < 0.6, f"prefilter solved {frac_solved:.0%} — no saving"
    # bounds returned must bracket: lower <= upper always
    assert np.all(result["jaccard_lower"] <= result["jaccard_upper"] + 1e-12)


def test_prefilter_udf_roundtrip(spark, rng):
    """The threshold-mode pandas UDF emits the same decisions as the
    estimator called directly."""
    import pandas as pd
    from pyspark.sql import functions as F

    from set_sketch_paper_spark.config import GHLLConfig
    from set_sketch_paper_spark.functions.udfs import make_register_pair_estimator_udf

    cfg = GHLLConfig(num_registers=256, base=2.0, q=62)
    est = SetSketchEstimator(62, 1.0 / 256, 2.0, 256, True, True, False)
    s1, s2 = _corpus_pairs(rng, 256, 2.0, 62, n_pairs=60)
    pdf = pd.DataFrame(
        {
            "i": range(60),
            "r1": [r.astype(np.uint8).tobytes() for r in s1],
            "r2": [r.astype(np.uint8).tobytes() for r in s2],
        }
    )
    udf = make_register_pair_estimator_udf(cfg, method="new", threshold=0.5)
    got = (
        spark.createDataFrame(pdf)
        .select("i", udf(F.col("r1"), F.col("r2")).alias("e"))
        .select("i", "e.passed", "e.solved", "e.est_jaccard")
        .orderBy("i")
        .collect()
    )
    _, passed, solved = est.joint_new_prefiltered(s1, s2, 0.5)
    assert [r["passed"] for r in got] == passed.tolist()
    assert [r["solved"] for r in got] == solved.tolist()


def test_mu_batch_matches_scalar_in_domain(rng):
    """Fixed-grid vectorized mu vs the reference-faithful scalar walk.

    In-domain arguments only (lo <= ~600): above exp-underflow (~745) the
    scalar/reference early-breaks to 0 at its k=0 start while the batch sums
    the true series; the corrected dispatch (registers at the 0 bound =>
    small cardinalities) cannot produce such arguments."""
    est = SetSketchEstimator(62, 1.0 / 4096, 2.0, 4096, True, True, False)
    xs = 10.0 ** rng.uniform(-6, 2.5, 3000)
    ys = 10.0 ** rng.uniform(-6, 2.5, 3000)
    xs[:5] = 0.0
    ys[5:10] = 0.0
    xs[10] = ys[10] = 1.5  # x == y -> exactly 0
    batch = est._mu_batch(xs, ys)
    scalar = np.array([est.mu(float(x), float(y)) for x, y in zip(xs, ys)])
    rel = np.abs(batch - scalar) / np.maximum(np.abs(scalar), 1e-300)
    assert batch[10] == 0.0
    assert rel.max() < 1e-7


def test_joint_corrected_batch_matches_scalar(rng):
    """Batched range-corrected joint ML (golden_min_batch + _mu_batch) vs
    the scalar Brent twin — the VERDICT r3 #2 equivalence gate."""
    est = SetSketchEstimator(62, 1.0 / 4096, 2.0, 4096, True, True, False)
    n = 500
    m = est.m
    nl = rng.randint(0, 40, n)
    ng = rng.randint(0, 40, n)
    nbz = rng.randint(1, m - 80, n)
    c1 = rng.uniform(1, 500, n).astype(float)
    c2 = rng.uniform(1, 500, n).astype(float)
    # degenerate rows
    c1[0] = c2[0] = 0.0
    batch = est._joint_new_corrected_batch(nl, ng, nbz, c1, c2)
    scalar = np.array(
        [
            est._joint_new_corrected_one(
                int(nl[i]), int(ng[i]), int(nbz[i]), float(c1[i]), float(c2[i])
            )
            for i in range(n)
        ]
    )
    assert batch[0] == scalar[0] == 0.0
    assert np.max(np.abs(batch - scalar)) < 1e-6


def test_joint_new_dispatches_corrected_batch(rng):
    """joint_new with joint_range_correction routes lower-bound pairs through
    the batch path and still agrees with per-row scalar dispatch."""
    est = SetSketchEstimator(62, 1.0 / 256, 2.0, 256, True, True, False)
    n = 60
    # small sets relative to m=256 -> many registers at 0
    s1 = np.zeros((n, est.m), dtype=np.int64)
    s2 = np.zeros((n, est.m), dtype=np.int64)
    for i in range(n):
        a, b = make_pair(rng, 20 + i, 25, 15)
        s1[i] = ghll_sketch(a, est.m, 2.0, est.q, 0x1234)
        s2[i] = ghll_sketch(b, est.m, 2.0, est.q, 0x1234)
    got = est.joint_new(s1, s2)
    less, greater, both_min, both_max, _ = est.compare_registers(s1, s2)
    assert (both_min > 0).all()  # the corrected path really ran
    c1 = est.cardinality_simple(s1)
    c2 = est.cardinality_simple(s2)
    scalar = np.array(
        [
            est._joint_new_corrected_one(
                int(less[i]), int(greater[i]), int(both_min[i]),
                float(c1[i]), float(c2[i]),
            )
            for i in range(n)
        ]
    )
    assert np.max(np.abs(got["jaccard"] - scalar)) < 1e-6
