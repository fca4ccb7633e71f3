"""Deterministic hash-based sampling / splitting for corpus curation.

At 100 TB, `df.sample()` is the wrong tool: it is rate-only (no stable
membership), draws from a per-task RNG seeded by partition id, and so
changes membership under AQE re-planning, partition coalescing, or a
re-run over a differently-bucketed copy of the table.  Training-data
curation needs the opposite contract — membership that is a pure function
of the ROW, so a sample is reproducible across clusters, layouts, and
engine versions, and disjoint splits stay disjoint forever.

The membership predicate here is a lexicographic threshold on
``md5(concat_ws(US, salt, key...))``: the md5 hex string of the salted key
is uniform over [0, 16^32), and comparing hex strings is identical to
comparing the underlying 128-bit integers.  md5-on-strings is chosen over
xxhash64 deliberately: every SQL engine (DuckDB, Trino, BigQuery, ...)
computes the identical digest, so the exact same sample can be
reproduced — and oracle-checked — outside Spark.  (The reference repo has
no sampling; this is part of the training-pipeline surface beyond it.)

All operators are narrow (a single filter/projection, no shuffle, no RNG
state), and the predicate composes with partition pruning upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ASCII unit separator: cannot appear in decimal-rendered keys, so joined
# key tuples cannot collide across column boundaries
_US = "\x1f"


def _hex_threshold(rate: float) -> str:
    """rate in [0, 1] -> 32-digit lowercase hex string t with
    P[md5 < t] == rate (up to float resolution of rate)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 2**128), 2**128 - 1), "032x")


def sample_key(key_cols, salt: str = "") -> Column:
    """The md5 membership key: lowercase hex of the salted, US-joined,
    string-cast key columns.  Equivalent SQL (Spark AND DuckDB):
    ``md5(concat_ws(chr(31), '<salt>', CAST(k AS VARCHAR), ...))``."""
    parts = [F.lit(salt)] + [F.col(c).cast("string") for c in key_cols]
    return F.md5(F.concat_ws(_US, *parts))


def hash_sample(
    df: DataFrame, rate: float, key_cols, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows keyed by ``key_cols``.

    Same (key, salt) -> same decision on every run, engine, and layout;
    different salts draw independent samples.  Narrow: one filter, no
    shuffle, no RNG."""
    if rate >= 1.0:
        return df
    return df.filter(sample_key(key_cols, salt) < F.lit(_hex_threshold(rate)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_cols=None,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    downsample en hard, keep low-resource languages whole) as ONE narrow
    filter — the per-stratum threshold is a literal CASE expression, so no
    join, no broadcast, no shuffle."""
    key_cols = list(key_cols) if key_cols is not None else [strata_col]
    thr = F.lit(_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(sample_key(key_cols, salt) < thr)


def split_edges(fractions) -> list[str]:
    """Cumulative hex thresholds between consecutive splits — shared by
    hash_split and any SQL oracle so float accumulation (0.8 + 0.1 !=
    0.9 exactly) can never diverge between engines."""
    fracs = list(fractions)
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"fractions must be >= 0 and sum to 1, got {fracs}")
    edges = []
    acc = 0.0
    for f in fracs[:-1]:
        acc += f
        edges.append(_hex_threshold(acc))
    return edges


def hash_split(
    df: DataFrame,
    fractions,
    key_cols,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign every row to one of ``len(fractions)`` DISJOINT, EXHAUSTIVE
    splits (train/val/test) by consecutive hash bands; adds integer column
    ``out``.  Row membership is permanent: re-running on any cluster or
    engine reproduces the identical assignment, so no test row can ever
    leak into a future training run."""
    edges = split_edges(fractions)
    key = sample_key(key_cols, salt)
    expr = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        expr = F.when(key < F.lit(edges[i]), F.lit(i)).otherwise(expr)
    return df.withColumn(out, expr)
