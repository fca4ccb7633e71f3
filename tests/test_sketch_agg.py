"""Partition-bounded two-stage sketch aggregation: accuracy vs exact distinct
counts, partitioning invariance (the algebraic-merge contract), bounded
per-task memory under hot keys (flush path), and agreement with Spark's
built-in HLL++ sanity check (SURVEY.md §4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from set_sketch_paper_spark.config import GHLLConfig, MinHashConfig, SetSketchConfig
from set_sketch_paper_spark.operators.sketch_agg import (
    make_partition_partial_mapper,
    sketch_distinct,
)
from set_sketch_paper_spark.sketchlib.ghll import ghll_sketches_batch
from set_sketch_paper_spark.sketchlib.hashing import u64_from_i64


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


def test_sketch_distinct_partitioning_invariant(events):
    """Element-wise merge is associative/commutative, so the merged sketch —
    and therefore the estimate — must be bit-identical for ANY partitioning
    of the input (1 task vs 16 tasks vs the intermediate merge tier)."""
    cfg = GHLLConfig(num_registers=1024, q=62)

    def run(df, **kw):
        return {
            r["event_type"]: (r["est_distinct"], bytes(r["sketch"]))
            for r in sketch_distinct(df, ["event_type"], "user_hash", cfg, **kw).collect()
        }

    a = run(events.repartition(1))
    b = run(events.repartition(16, "user_hash"))
    c = run(events.repartition(16, "user_hash"), merge_fanin=4)
    assert a == b == c


def test_partial_mapper_hot_key_bounded(spark):
    """A single hot key streamed through many small Arrow batches must (a)
    never hold more than flush_keys sketches in flight, (b) produce partials
    whose merge is bit-equal to sketching all elements in one shot.  This is
    the 100x-scale contract: per-task memory is bounded by batch size +
    flush_keys * m regardless of key skew."""
    cfg = GHLLConfig(num_registers=256, q=62)
    n, batch = 40_000, 1_000
    vals = np.arange(n, dtype=np.int64) * 2_654_435_761  # spread i64 hashes

    def batches():
        for i in range(0, n, batch):
            yield pd.DataFrame({"k": "hot", "h": vals[i : i + batch]})

    mapper = make_partition_partial_mapper(cfg, ["k"], "h", flush_keys=1)
    emitted = list(mapper(batches()))
    # flush_keys=1 with a single key never triggers an early flush (1 !> 1),
    # so one partial per mapper; re-run with two interleaved keys to force
    # the flush path
    assert len(emitted) == 1

    def batches2():
        for i in range(0, n, batch):
            yield pd.DataFrame(
                {"k": ["hot", "cold"] * (batch // 2), "h": vals[i : i + batch]}
            )

    emitted2 = list(
        make_partition_partial_mapper(cfg, ["k"], "h", flush_keys=1)(batches2())
    )
    assert len(emitted2) == n // batch  # flushed once per batch
    # merged partials == single-shot sketch, bit-exact
    merged = {}
    for frame in emitted + emitted2:
        for r in frame.itertuples(index=False):
            st = np.frombuffer(r.sketch, dtype=np.uint8)
            merged[r.k] = np.maximum(merged.get(r.k, st), st)
    one_shot, _ = ghll_sketches_batch(
        u64_from_i64(vals), np.array([0, n]), cfg.num_registers, cfg.base, cfg.q, cfg.seed
    )
    # 'hot' saw every element across both runs; 'cold' saw the odd positions
    assert bytes(merged["hot"]) == one_shot[0].astype(np.uint8).tobytes()


def test_sketch_distinct_vs_builtin_hll(events):
    """Independent sanity check against Spark's built-in HLL++."""
    cfg = GHLLConfig(num_registers=1024, q=62)
    ours = {
        r["event_type"]: r["est_distinct"]
        for r in sketch_distinct(events, ["event_type"], "user_hash", cfg).collect()
    }
    builtin = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_hash", 0.02).alias("n"))
        .collect()
    }
    for k in EXACT:
        assert abs(ours[k] - builtin[k]) / builtin[k] < 0.15
