"""Suffix-array / LCP kernels vs brute force (hypothesis), and the
doc_internal_repeats operator vs a per-row python twin."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from set_sketch_paper_spark.sketchlib.suffix import (
    lcp_array,
    longest_repeat,
    repeat_stats,
    suffix_array,
)

# low-alphabet strings force repeats; include empty and single-char
texts = st.text(alphabet="abc", min_size=0, max_size=120)


def _brute_sa(b: bytes) -> list[int]:
    return sorted(range(len(b)), key=lambda i: b[i:])


def _common_prefix(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


@settings(max_examples=300, deadline=None)
@given(texts)
def test_suffix_array_matches_brute_force(t):
    b = t.encode()
    got = suffix_array(np.frombuffer(b, dtype=np.uint8)).tolist()
    assert got == _brute_sa(b)


@settings(max_examples=300, deadline=None)
@given(texts)
def test_lcp_matches_brute_force(t):
    b = t.encode()
    s = np.frombuffer(b, dtype=np.uint8)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    for i in range(1, len(b)):
        want = _common_prefix(b[sa[i - 1]:], b[sa[i]:])
        assert lcp[i] == want, (t, i)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_longest_repeat_matches_brute_force(t):
    b = t.encode()
    n = len(b)
    want = 0
    for i in range(n):
        for j in range(i + 1, n):
            want = max(want, _common_prefix(b[i:], b[j:]))
    assert longest_repeat(b) == want, t


@settings(max_examples=200, deadline=None)
@given(texts, st.integers(1, 8))
def test_repeat_stats_matches_brute_force(t, min_len):
    b = t.encode()
    n = len(b)
    best = 0
    part = set()
    for i in range(n):
        mx = 0
        for j in range(n):
            if j != i:
                mx = max(mx, _common_prefix(b[i:], b[j:]))
        best = max(best, mx)
        if mx >= min_len:
            part.add(i)
    got_best, got_n = repeat_stats(b, min_len)
    assert got_best == best, t
    assert got_n == len(part), (t, min_len, got_n, len(part))


def test_known_banana():
    assert suffix_array(np.frombuffer(b"banana", dtype=np.uint8)).tolist() == [
        5, 3, 1, 0, 4, 2,
    ]
    assert longest_repeat(b"banana") == 3  # "ana" (overlapping)
    assert longest_repeat(b"") == 0
    assert longest_repeat(b"x") == 0
    assert longest_repeat(b"aaaa") == 3
