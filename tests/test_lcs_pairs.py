"""lcs_substring_pairs: planted shared substrings vs a brute-force python
LCS twin, plus boundary/cap behavior.  The DuckDB oracle parity for the
production parameters lives in test_queries_oracle.py; this file pins the
SEMANTICS (exact char-level LCS length, span counting) on adversarial
planted corpora the synthetic table cannot guarantee."""

from __future__ import annotations

import pytest

from set_sketch_paper_spark.operators.dedup import lcs_substring_pairs


def _brute_lcs(a: str, b: str) -> int:
    """O(len(a)*len(b)) longest common substring length."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def _mkdf(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _run(spark, docs, **kw):
    out = lcs_substring_pairs(_mkdf(spark, docs), **kw).collect()
    return {(r.id1, r.id2): (r.max_shared_len, r.n_spans) for r in out}


def test_matches_brute_force_lcs(spark):
    import random

    rng = random.Random(7)
    alph = "abcd "
    base = "".join(rng.choice(alph) for _ in range(200))
    docs = []
    for _ in range(12):
        t = "".join(rng.choice(alph) for _ in range(rng.randint(40, 220)))
        if rng.random() < 0.7:  # plant a shared span from base
            s = rng.randint(0, 140)
            ln = rng.randint(20, 60)
            cut = rng.randint(0, len(t))
            t = t[:cut] + base[s : s + ln] + t[cut:]
        docs.append(t)
    got = _run(spark, docs, L=16, min_len=20)
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            want = _brute_lcs(docs[i], docs[j])
            if want >= 20:
                assert (i, j) in got, (i, j, want)
                assert got[(i, j)][0] == want, (i, j, want, got[(i, j)])
            else:
                assert (i, j) not in got, (i, j, want, got.get((i, j)))


def test_span_count_and_boundaries(spark):
    # NB: surroundings share no character with each other at the span
    # boundaries, else the true shared substring silently extends past the
    # planted span (e.g. a space on both sides adds 2 to the LCS)
    shared1 = "the quick brown fox jumps over it"  # 33 chars
    shared2 = "pack my box with five dozen jugs"  # 32 chars
    docs = [
        "AAAA" + shared1 + "BBBB" + shared2 + "CCCC",
        "DDDDDDD" + shared1 + "EEEE" + shared2 + "FF",
        "no overlap here at allzzzzzzzzzzzzzzzzzzzzzz",
    ]
    got = _run(spark, docs, L=16, min_len=32)
    assert set(got) == {(0, 1)}
    # two disjoint planted spans, longest 33
    assert got[(0, 1)] == (33, 2)
    # raising min_len past the longest span drops the pair entirely
    assert _run(spark, docs, L=16, min_len=34) == {}
    # exactly-at-threshold span is kept
    docs31 = ["gg " + shared2 + " hh", "kk " + shared2 + " mm"]
    assert _run(spark, docs31, L=16, min_len=32)[(0, 1)][0] >= 32


def test_identical_docs_and_short_docs(spark):
    t = "abcdefghijklmnopqrstuvwxyz0123456789 repeated tail section"
    got = _run(spark, [t, t, "tiny"], L=16, min_len=32)
    assert got[(0, 1)] == (len(t), 1)
    assert (0, 2) not in got and (1, 2) not in got  # "tiny" < L emits no grams


def test_gram_cap_drops_boilerplate(spark):
    # one 16-char boilerplate string in every doc; cap below corpus freq
    bp = "SHARED-BOILERPLT"
    docs = [f"doc{i:02d} {bp} tail{i:02d}" for i in range(8)]
    got = _run(spark, docs, L=16, min_len=16, gram_cap=4)
    assert got == {}  # the only shared gram bucket exceeds the cap
    got2 = _run(spark, docs, L=16, min_len=16, gram_cap=100)
    assert len(got2) == 8 * 7 // 2  # uncapped: all pairs share bp


def test_min_len_below_L_raises(spark):
    with pytest.raises(ValueError):
        _run(spark, ["abc"], L=16, min_len=10)
