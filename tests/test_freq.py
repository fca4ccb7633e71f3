"""Misra-Gries frequent-items: mapper-level guarantees vs exact counts
(pure pandas, synthetic batch iterators — mirrors sketch_agg's partial
tests), plus the Spark cross-gates in test_cross_consistency.py."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from set_sketch_paper_spark.operators.freq import make_mg_partial_mapper


def _run_mapper(texts, capacity, batch_size=3):
    mapper = make_mg_partial_mapper(capacity, "text")
    batches = (
        pd.DataFrame({"text": texts[i : i + batch_size]})
        for i in range(0, len(texts), batch_size)
    )
    out = pd.concat(list(mapper(batches)), ignore_index=True)
    decr = int(out[out["token"].isna()]["cnt"].sum())
    state = dict(
        zip(out[out["token"].notna()]["token"], out[out["token"].notna()]["cnt"])
    )
    return state, decr


def _exact(texts):
    c = Counter()
    for t in texts:
        c.update(tok for tok in (t or "").split(" ") if tok)
    return c


TEXTS = [
    "a a a b b c",
    "a d e f g h",
    "b b a c c i",
    "j k l m n o p q",
    "a b a b a b",
    None,
    "",
    "  a   b  ",  # empties from repeated spaces are dropped
]


def test_exact_when_capacity_large():
    state, decr = _run_mapper(TEXTS, capacity=1000)
    assert decr == 0
    assert state == dict(_exact(TEXTS))


def test_bounds_and_heavy_hitters_small_capacity():
    exact = _exact(TEXTS)
    n_tokens = sum(exact.values())
    for capacity in (2, 4, 8):
        state, decr = _run_mapper(TEXTS, capacity)
        # classic MG bound: total decrement <= n / (capacity + 1)
        assert decr <= n_tokens // (capacity + 1), (capacity, decr)
        for tok, cnt in state.items():
            # count_min <= true <= count_min + D
            assert cnt <= exact[tok] <= cnt + decr, (capacity, tok)
        for tok, true_n in exact.items():
            # any token with true count > D must survive in the summary
            if true_n > decr:
                assert tok in state, (capacity, tok, true_n, decr)


def test_state_stays_bounded_and_marker_always_emitted():
    texts = [f"t{i} t{i} common" for i in range(200)]
    state, decr = _run_mapper(texts, capacity=5, batch_size=7)
    assert len(state) <= 5
    assert "common" in state  # 200 occurrences dominate every decrement
    # empty partition still emits exactly the marker row
    out = pd.concat(list(make_mg_partial_mapper(5, "text")(iter([]))), ignore_index=True)
    assert len(out) == 1 and out["token"].isna().all() and out["cnt"].iloc[0] == 0
