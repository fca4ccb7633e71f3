"""Tests for the scalar solvers standing in for boost/scipy (SURVEY.md §4)."""

import math

import pytest

from set_sketch_paper_spark.sketchlib.solvers import brentq, minimize_bounded


def test_brentq_simple_roots():
    assert abs(brentq(lambda x: x * x - 2.0, 0.0, 2.0) - math.sqrt(2)) < 1e-9
    assert abs(brentq(math.cos, 1.0, 2.0) - math.pi / 2) < 1e-9
    assert abs(brentq(lambda x: math.expm1(x) - 1.0, 0.0, 1.0) - math.log(2)) < 1e-9


def test_brentq_endpoint_roots():
    assert brentq(lambda x: x, 0.0, 1.0) == 0.0
    assert brentq(lambda x: x - 1.0, 0.0, 1.0) == 1.0


def test_brentq_rejects_bad_bracket():
    with pytest.raises(ValueError):
        brentq(lambda x: x * x + 1.0, -1.0, 1.0)


def test_minimize_bounded():
    assert abs(minimize_bounded(lambda x: (x - 0.3) ** 2, 0.0, 1.0) - 0.3) < 1e-6
    assert abs(minimize_bounded(lambda x: math.cos(x), 0.0, 6.0) - math.pi) < 1e-6
    # minimum at boundary
    assert minimize_bounded(lambda x: x, 0.0, 1.0) < 1e-5
    assert minimize_bounded(lambda x: -x, 0.0, 1.0) > 1.0 - 1e-5
    # objective with an infinite plateau near the boundary (joint ML shape)
    def f(x):
        if x < 0.05:
            return float("inf")
        return (x - 0.4) ** 2
    assert abs(minimize_bounded(f, 0.0, 1.0) - 0.4) < 1e-6
