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


def _reference_capped_pairs(docs, L, min_len, gram_cap):
    """Pure-python twin of the capped diagonal-island semantics: grams whose
    corpus-wide occurrence count exceeds gram_cap are dropped, every
    surviving gram match is a diagonal entry, maximal consecutive-pos runs
    per (pair, diagonal) are spans; per pair: (max run + L - 1, count of
    runs >= min_len - L + 1), filtered to max >= min_len."""
    from collections import Counter, defaultdict

    min_run = min_len - L + 1
    grams = {
        i: [t[p : p + L] for p in range(len(t) - L + 1)] if len(t) >= L else []
        for i, t in enumerate(docs)
    }
    freq = Counter(g for gs in grams.values() for g in gs)
    out = {}
    ids = sorted(grams)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            i1, i2 = ids[x], ids[y]
            diags = defaultdict(list)
            for p1, g1 in enumerate(grams[i1]):
                if freq[g1] > gram_cap:
                    continue
                for p2, g2 in enumerate(grams[i2]):
                    if g1 == g2:
                        diags[p1 - p2].append(p1)
            best, spans = 0, 0
            for ps in diags.values():
                run = 1
                ps = sorted(ps)
                for a, b in zip(ps, ps[1:] + [None]):
                    if b == a + 1:
                        run += 1
                    else:
                        best = max(best, run)
                        if run >= min_run:
                            spans += 1
                        run = 1
            if best and best + L - 1 >= min_len:
                out[(i1, i2)] = (best + L - 1, spans)
    return out


def test_hot_gram_inside_long_span_splits_runs(spark):
    """The r6 two-pass rewrite must keep the capped semantics when a HOT
    gram sits INSIDE a longer shared span: the hot positions are excluded,
    splitting the diagonal run exactly as the one-pass bucket-expand did.
    Eight docs share a 48-char boilerplate block (its interior 16-grams
    exceed gram_cap=4); two of them additionally share unique flanks around
    it, so their shared span is flank+block+flank with a hot hole in the
    middle."""
    block = "B" * 48  # all interior 16-grams identical and hot (f >= 8)
    flank1 = "left-unique-flank-0123456789abcdef"   # 34 chars, only docs 0/1
    flank2 = "right-unique-flank-0123456789abcde"   # 34 chars, only docs 0/1
    shared = flank1 + block + flank2
    docs = [f"pre0 {shared} post0", f"pre1 {shared} post1"] + [
        f"doc{i:02d} {block} tail{i:02d}" for i in range(2, 8)
    ]
    expected = _reference_capped_pairs(docs, L=16, min_len=32, gram_cap=4)
    got = _run(spark, docs, L=16, min_len=32, gram_cap=4)
    assert (0, 1) in expected  # the planted pair must survive via its flanks
    assert got == expected
