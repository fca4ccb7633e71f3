"""Distributed Monte-Carlo harnesses reproduce the paper's error theory.

The Spark jobs restate the reference's OpenMP benchmark drivers
(cardinality_test.cpp, joint_estimation_test.cpp); the assertions mirror
the chart overlays: GHLL relative RMSE tracks sqrt(((b+1)/(b-1)ln b - 1)/m)
(python/cardinality_error_charts.py:81-82) and MinHash Jaccard RMSE tracks
sqrt(J(1-J)/m) (python/collision_probability.py:68-69).
"""

from __future__ import annotations

import math

from set_sketch_paper_spark.operators.mc_bench import cardinality_error_mc, joint_error_mc


def test_cardinality_mc_tracks_theory(spark):
    m, base = 256, 2.0
    theory = math.sqrt(((base + 1) / (base - 1) * math.log(base) - 1) / m)
    rows = cardinality_error_mc(
        spark, cardinalities=(1000, 10_000), num_examples=150, m=m, base=base
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert abs(r["rel_bias"]) < 3 * theory / math.sqrt(r["n_examples"]) + 0.01, r
        assert r["rel_rmse"] < 1.5 * theory, (r["cardinality"], r["rel_rmse"], theory)
        assert r["rel_rmse"] > 0.4 * theory, r


def test_cardinality_mc_partitioning_invariant(spark):
    a = cardinality_error_mc(spark, cardinalities=(1000,), num_examples=40).collect()
    b = cardinality_error_mc(spark, cardinalities=(1000,), num_examples=40).collect()
    assert a == b


def test_joint_mc_tracks_theory(spark):
    m = 256
    rows = joint_error_mc(
        spark, tuples=((600, 300, 300),), num_examples=150, m=m
    ).collect()
    (r,) = rows
    j = r["true_jaccard"]
    theory = math.sqrt(j * (1 - j) / m)
    assert abs(r["mean_est"] - j) < 0.02, r
    assert 0.4 * theory < r["rmse"] < 1.6 * theory, (r["rmse"], theory)
