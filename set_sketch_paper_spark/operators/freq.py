"""Corpus token-frequency operators: exact top-k vocabulary and a
Misra-Gries / mergeable-summaries frequent-items sketch.

The exact path (``vocab_topk``) is the oracle twin: one map-side-combined
shuffle on the token and a TakeOrdered — correct at any scale but the
shuffle carries the whole token universe.  The sketch path
(``token_topk_mg``) is the 100 TB shape: each partition maintains a
BOUNDED Misra-Gries summary (``capacity`` counters, the mergeable-
summaries formulation of Agarwal et al. 2012: merging two summaries sums
counters and subtracts the (capacity+1)-th largest), so the shuffle
carries at most ``capacity + 1`` rows per task regardless of vocabulary
size, and the deterministic error bound — total decrement D <=
n_tokens / (capacity + 1) — travels with the result as
[count_min, count_max] brackets.

Reference parity: set-sketch-paper's aggregation surface is distinct-count
sketches (sketch.hpp add/merge/estimate); frequent-items is the
complementary bounded-state aggregate the same partial+final contract
supports (operators/sketch_agg.py is the register-sketch analog).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _tokens_col(text_col: str):
    """Whitespace tokens, NULL-safe, empties dropped — the same convention
    as textstats' token counts and the DuckDB oracle's string_split."""
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != F.lit(""),
    )


def vocab_topk(
    df: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """EXACT corpus top-k tokens: (token, n) ordered by (n DESC, token ASC)
    — a total order, so the k-boundary is deterministic and the DuckDB
    oracle hash-matches.  Plan: explode (narrow) -> partial+final count
    aggregate (ONE shuffle on the token) -> TakeOrderedAndProject (no
    global sort; per-partition top-k then k-way driver merge)."""
    toks = df.select(F.explode(_tokens_col(text_col)).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )


def make_mg_partial_mapper(capacity: int, text_col: str):
    """mapInPandas function: one bounded Misra-Gries summary per partition.

    Per Arrow batch: exact pandas value_counts (a zero-error summary) is
    merged into the running summary; when the summary exceeds ``capacity``
    counters, the (capacity+1)-th largest count is subtracted from every
    counter and non-positive counters are dropped (the mergeable-summaries
    combine).  The partition's total subtracted mass rides out as ONE
    marker row (token NULL, cnt = decrement) so the final aggregate can
    reconstruct the global error bound without any side channel.

    Module-level (not a closure detail) so tests can drive it with
    synthetic batch iterators, mirroring sketch_agg's partial mapper.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        state = pd.Series(dtype="int64")
        decr = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            toks = pdf[text_col].fillna("").str.split(" ").explode()
            counts = toks[toks != ""].value_counts().astype("int64")
            state = counts if state.empty else state.add(counts, fill_value=0).astype("int64")
            if len(state) > capacity:
                # subtract the (capacity+1)-th largest counter from all,
                # drop the non-positive: the mergeable-summaries combine
                sub = int(np.partition(state.to_numpy(), -capacity - 1)[-capacity - 1])
                decr += sub
                state = state[state > sub] - sub
        out = pd.DataFrame(
            {
                "token": list(state.index) + [None],
                "cnt": list(state.to_numpy()) + [decr],
            }
        )
        yield out

    return mapper


def token_topk_mg(
    df: DataFrame,
    k: int = 50,
    capacity: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Approximate top-k tokens with deterministic error brackets:
    (token, count_min, count_max) ordered by (count_min DESC, token ASC).

    count_min <= true count <= count_max for every reported token, and any
    token whose true count exceeds the global decrement D (<= n_tokens /
    (capacity+1)) is guaranteed present in the candidate set — the classic
    Misra-Gries heavy-hitters guarantee, preserved under the partition
    merge because summary errors add (Agarwal et al. 2012).

    Plan: bounded mapInPandas partials (<= capacity+1 rows per task) ->
    ONE shuffle summing per-token counters -> the 1-row global-decrement
    aggregate joins back via broadcast (the single-row-crossJoin pattern
    of similarity.py's IVF centroids) -> TakeOrderedAndProject.

    With ``capacity`` >= the per-partition distinct-token count the sketch
    is EXACT (D == 0) and equals vocab_topk bit-for-bit — the cross-gate
    in tests/test_cross_consistency.py.
    """
    partial = df.select(text_col).mapInPandas(
        make_mg_partial_mapper(capacity, text_col), "token string, cnt long"
    )
    agg = partial.groupBy("token").agg(F.sum("cnt").alias("cnt"))
    d_row = agg.filter(F.col("token").isNull()).select(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("d")
    )
    return (
        agg.filter(F.col("token").isNotNull())
        .crossJoin(F.broadcast(d_row))
        .select(
            "token",
            F.col("cnt").alias("count_min"),
            (F.col("cnt") + F.col("d")).alias("count_max"),
        )
        .orderBy(F.desc("count_min"), "token")
        .limit(k)
    )
