"""Deterministic hash-sampling operators: layout-invariant membership,
rate accuracy, disjoint exhaustive splits, narrow plans."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from set_sketch_paper_spark.operators.sampling import (
    _hex_threshold,
    hash_sample,
    hash_split,
    split_edges,
    stratified_hash_sample,
)


def _ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_hex_threshold_edges():
    assert _hex_threshold(0.0) == "0" * 32
    assert _hex_threshold(0.25) == "4" + "0" * 31
    assert _hex_threshold(1.0) == "f" * 32
    with pytest.raises(ValueError):
        _hex_threshold(1.5)


def test_hash_sample_rate_and_determinism(spark):
    n = 20_000
    df = spark.range(n)
    got = _ids(hash_sample(df, 0.3, ["id"], salt="t1"))
    # binomial 5-sigma band around the target rate
    sd = math.sqrt(0.3 * 0.7 / n)
    assert abs(len(got) / n - 0.3) < 5 * sd
    # identical membership at a completely different layout
    re = _ids(hash_sample(df.repartition(17, "id"), 0.3, ["id"], salt="t1"))
    assert got == re
    # and on a second run
    assert got == _ids(hash_sample(spark.range(n), 0.3, ["id"], salt="t1"))


def test_hash_sample_salt_independence(spark):
    n = 20_000
    df = spark.range(n)
    a = set(_ids(hash_sample(df, 0.3, ["id"], salt="a")))
    b = set(_ids(hash_sample(df, 0.3, ["id"], salt="b")))
    assert a != b
    # independent draws: |a & b| ~ Binomial(n, 0.09)
    inter_rate = len(a & b) / n
    assert abs(inter_rate - 0.09) < 5 * math.sqrt(0.09 * 0.91 / n)


def test_hash_sample_nested_rates(spark):
    """Same salt, lower rate => strict subset (threshold monotonicity) —
    the property that makes samples refinable without resampling."""
    df = spark.range(10_000)
    big = set(_ids(hash_sample(df, 0.5, ["id"], salt="n")))
    small = set(_ids(hash_sample(df, 0.1, ["id"], salt="n")))
    assert small < big


def test_hash_sample_rate_one_passthrough(spark):
    df = spark.range(100)
    assert hash_sample(df, 1.0, ["id"]).count() == 100


def test_stratified_rates(spark):
    n = 30_000
    df = spark.range(n).withColumn(
        "grp", F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b").otherwise("c")
    )
    out = stratified_hash_sample(
        df, "grp", {"a": 0.5, "b": 0.1}, default_rate=1.0, key_cols=["id"], salt="s"
    )
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    per = n / 3
    for grp, rate in (("a", 0.5), ("b", 0.1), ("c", 1.0)):
        sd = math.sqrt(max(rate * (1 - rate), 1e-12) / per)
        assert abs(counts.get(grp, 0) / per - rate) < 5 * sd + 1e-9, (grp, counts)


def test_hash_split_disjoint_exhaustive(spark):
    n = 30_000
    df = spark.range(n)
    out = hash_split(df, (0.8, 0.1, 0.1), ["id"], salt="sp")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # exhaustive, one split per row
    for idx, frac in enumerate((0.8, 0.1, 0.1)):
        sd = math.sqrt(frac * (1 - frac) / n)
        assert abs(counts[idx] / n - frac) < 5 * sd, (idx, counts)
    # assignment is layout-invariant
    a = sorted((r["id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["id"], r["split"])
        for r in hash_split(df.repartition(13), (0.8, 0.1, 0.1), ["id"], salt="sp").collect()
    )
    assert a == b
    with pytest.raises(ValueError):
        split_edges((0.5, 0.2))  # doesn't sum to 1


def test_sampling_plans_are_narrow(spark):
    """One filter/projection, no shuffle: the predicate must stay
    partition-local at any scale."""
    df = spark.range(1000)
    for q in (
        hash_sample(df, 0.5, ["id"]),
        stratified_hash_sample(df.withColumn("g", F.lit("x")), "g", {"x": 0.5}, key_cols=["id"]),
        hash_split(df, (0.9, 0.1), ["id"]),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
