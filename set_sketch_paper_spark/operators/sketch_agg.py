"""Distinct-count sketching as an algebraic Spark aggregate.

The whole point of the sketch family is that merge is commutative/idempotent
element-wise min/max (sketch.hpp:1020-1023) — exactly Spark's partial+final
AggregateFunction contract (SURVEY.md §1.4).  Since PySpark cannot register a
custom JVM UDAF, we express the same two-level shape explicitly:

  stage 1 (partial): groupBy(keys + salt) -> sketch of each salted subgroup
                     via an Arrow-batched grouped-map kernel
  stage 2 (final):   groupBy(keys) -> element-wise min/max merge

The salt bounds the per-group input any single task must hold (a hot group at
100 TB otherwise lands on one executor), and the merge input per group is
exactly ``salt_buckets`` fixed-size register arrays — constant memory.

Estimates come from the register UDFs (functions/udfs.py).  Spark's built-in
approx_count_distinct (HLL++, b=2 only, no register access) is used in tests
as an independent sanity check, not as the implementation (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import GHLLConfig, MinHashConfig, SetSketchConfig
from ..functions.udfs import (
    make_merge_minhash_sigs_udf,
    make_merge_registers_udf,
    make_minhash_cardinality_udf,
    make_register_cardinality_udf,
)
from ..sketchlib.ghll import ghll_sketches_batch
from ..sketchlib.hashing import u64_from_i64, u64_to_i64
from ..sketchlib.minhash import minhash_batch
from ..sketchlib.setsketch import setsketches_batch


def _grouped_sketch_applier(cfg, keys: list[str], element_col: str):
    is_minhash = isinstance(cfg, MinHashConfig)
    if is_minhash and cfg.algo != "dense":
        # densified OPH bins carry values COPIED from other bins, so
        # min-merging two partials' densified signatures != the signature of
        # the union — only dense MinHash satisfies the algebraic-aggregate
        # merge contract (element-wise min, sketch.hpp:1599-1603)
        raise ValueError(
            "sketch_distinct requires MinHashConfig(algo='dense'): densified "
            "OPH signatures are not element-wise-min mergeable"
        )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        elements = u64_from_i64(pdf[element_col].to_numpy(dtype=np.int64))
        offsets = np.array([0, len(elements)])
        if is_minhash:
            sigs, _ = minhash_batch(elements, offsets, cfg.num_registers, cfg.seed, cfg.algo)
            state = [u64_to_i64(sigs[0]).tolist()]
        elif isinstance(cfg, SetSketchConfig):
            regs, _ = setsketches_batch(
                elements, offsets, cfg.num_registers, cfg.base, cfg.a, cfg.q, cfg.seed
            )
            state = [regs[0].tobytes()]
        else:
            regs, _ = ghll_sketches_batch(
                elements, offsets, cfg.num_registers, cfg.base, cfg.q, cfg.seed
            )
            state = [regs[0].tobytes()]
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["sketch"] = state
        return pd.DataFrame(out)

    return apply


def sketch_distinct(
    df: DataFrame,
    keys: list[str],
    element_col: str,
    cfg,
    salt_buckets: int = 32,
    use_ml: bool = False,
) -> DataFrame:
    """Estimated distinct count of ``element_col`` (a 64-bit hash column)
    per key group: (keys..., est_distinct double, sketch).

    cfg: MinHashConfig (dense only), GHLLConfig, or SetSketchConfig —
    register sketches share the element-wise-max merge; dense MinHash
    merges element-wise min.
    """
    is_minhash = isinstance(cfg, MinHashConfig)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(element_col)), F.lit(salt_buckets)))
    state_type = "array<long>" if is_minhash else "binary"
    partial_schema = ", ".join(
        [f"`{k}` {t}" for k, t in zip(keys + ["_salt"], _key_types(df, keys) + ["bigint"])]
        + [f"sketch {state_type}"]
    )
    partial = salted.groupBy(*keys, "_salt").applyInPandas(
        _grouped_sketch_applier(cfg, keys + ["_salt"], element_col),
        schema=partial_schema,
    )
    merge_udf = make_merge_minhash_sigs_udf() if is_minhash else make_merge_registers_udf(cfg)
    merged = partial.groupBy(*keys).agg(
        merge_udf(F.collect_list("sketch")).alias("sketch")
    )
    card_udf = (
        make_minhash_cardinality_udf()
        if is_minhash
        else make_register_cardinality_udf(cfg, use_ml=use_ml)
    )
    return merged.withColumn("est_distinct", card_udf(F.col("sketch")))


def _key_types(df: DataFrame, keys: list[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[k] for k in keys]
