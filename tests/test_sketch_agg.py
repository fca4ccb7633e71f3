"""Salted two-stage sketch aggregation: accuracy vs exact distinct counts,
salt-bucket invariance, and agreement with Spark's built-in HLL++ sanity
check (SURVEY.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from set_sketch_paper_spark.config import GHLLConfig, MinHashConfig, SetSketchConfig
from set_sketch_paper_spark.operators.sketch_agg import sketch_distinct


@pytest.fixture(scope="module")
def events(spark):
    # 3 groups with known distinct user counts 500 / 2000 / 50; group by id
    # RANGE so the modulus never aliases with the group predicate
    rows = spark.range(100_000).select(
        F.when(F.col("id") < 50_000, "a")
        .when(F.col("id") < 90_000, "b")
        .otherwise("c")
        .alias("event_type"),
        F.when(F.col("id") < 50_000, F.col("id") % 500)
        .when(F.col("id") < 90_000, F.col("id") % 2000)
        .otherwise(F.col("id") % 50)
        .alias("user"),
    )
    return rows.withColumn("user_hash", F.xxhash64("user", "event_type"))


EXACT = {"a": 500, "b": 2000, "c": 50}


@pytest.mark.parametrize("cfg,tol", [
    (GHLLConfig(num_registers=1024, q=62), 0.10),
    (MinHashConfig(num_registers=512, algo="dense"), 0.15),
    (SetSketchConfig(num_registers=1024, base=2.0, a=20.0, q=62), 0.10),
])
def test_sketch_distinct_accuracy(events, cfg, tol):
    got = {
        r["event_type"]: r["est_distinct"]
        for r in sketch_distinct(events, ["event_type"], "user_hash", cfg).collect()
    }
    for k, exact in EXACT.items():
        rel = abs(got[k] - exact) / exact
        assert rel < tol, (k, got[k], exact)


def test_sketch_distinct_salt_invariant(events):
    """Element-wise merge is associative/commutative, so the estimate must
    be identical for any salting (partial aggregation shape)."""
    cfg = GHLLConfig(num_registers=1024, q=62)
    a = {r["event_type"]: r["est_distinct"]
         for r in sketch_distinct(events, ["event_type"], "user_hash", cfg, salt_buckets=2).collect()}
    b = {r["event_type"]: r["est_distinct"]
         for r in sketch_distinct(events, ["event_type"], "user_hash", cfg, salt_buckets=64).collect()}
    assert a == b
