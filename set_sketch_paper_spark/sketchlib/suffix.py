"""Suffix-array + LCP kernels (pure numpy + one O(n) loop).

The north-star pipeline includes "a suffix-array substring pass for
exact-substring dups" (SURVEY §7.2 step 5: per-partition numpy suffix
array over concatenated docs).  These are the public textbook algorithms:

- ``suffix_array``: Manber-Myers prefix doubling, O(n log n) rounds of
  ``np.lexsort`` — fully vectorized, no Python loop over characters.
- ``lcp_array``: Kasai et al. '01 linear-time LCP from the SA and its
  inverse.  The h-decrement argument bounds total work at 2n, so the
  Python loop is O(n) with tiny constants (used per-document inside an
  Arrow batch; documents are KB-to-MB scale, not the corpus).

Cross-document substring dedup does NOT build a corpus-global SA (a
global SA needs the whole text on one machine or ~log(maxlen) full-corpus
shuffle rounds); the distributed equivalent is the L-gram diagonal-island
pass in operators/dedup.py::lcs_substring_pairs, which carries the same
one-index-entry-per-character cost as an SA but shuffles it once, keyed
by gram hash.  The kernels here serve the per-document / per-partition
passes (longest internal repeat, repeated-span statistics).
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8/int array: sa[i] = start of the i-th
    smallest suffix.  Manber-Myers prefix doubling over np.lexsort.

    >>> suffix_array(np.frombuffer(b"banana", dtype=np.uint8)).tolist()
    [5, 3, 1, 0, 4, 2]
    """
    s = np.asarray(s)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    k = 1
    order = np.argsort(rank, kind="stable")
    while k < n:
        # sort by (rank[i], rank[i+k]); absent second key (suffix shorter
        # than k) sorts first, encoded as -1
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        bump = np.empty(n, dtype=np.int64)
        bump[0] = 0
        bump[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(bump)
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct: done
            break
        k *= 2
    return order.astype(np.int64)


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i]
    (lcp[0] = 0).  O(n) total via the h-decrement argument."""
    s = np.asarray(s)
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    inv = np.empty(n, dtype=np.int64)
    inv[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = inv[i]
        if r == 0:
            h = 0
            continue
        j = sa[r - 1]
        while i + h < n and j + h < n and s[i + h] == s[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def longest_repeat(text: bytes) -> int:
    """Length of the longest substring occurring >= 2 times (possibly
    overlapping) — max of the LCP array."""
    s = np.frombuffer(text, dtype=np.uint8)
    if len(s) < 2:
        return 0
    return int(lcp_array(s, suffix_array(s)).max())


def repeat_stats(text: bytes, min_len: int) -> tuple[int, int]:
    """(longest_repeat_len, n_repeat_suffixes): the longest internal repeat
    and the number of suffix positions whose longest match elsewhere in the
    document is >= min_len (a suffix participates when it shares >= min_len
    with an SA NEIGHBOR — adjacent suffixes maximize common prefixes, so
    this is exact, not a heuristic).  Both are exact SA+LCP facts; the
    brute-force O(n^2) twin in tests/test_suffix.py pins them."""
    s = np.frombuffer(text, dtype=np.uint8)
    n = len(s)
    if n < 2:
        return 0, 0
    lcp = lcp_array(s, suffix_array(s))
    best = int(lcp.max())
    hit = lcp >= min_len
    # suffix sa[i] participates if it matches its predecessor or successor
    part = np.zeros(n, dtype=bool)
    part[1:] |= hit[1:]   # sa[i] matches sa[i-1]
    part[:-1] |= hit[1:]  # sa[i-1] matches sa[i]
    return best, int(part.sum())
