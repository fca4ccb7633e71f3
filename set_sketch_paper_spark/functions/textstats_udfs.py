"""Arrow-batched UDFs for text analysis that genuinely needs Python
(simhash, winnowing fingerprints).  Everything expressible with built-in
column functions lives in operators/textstats.py instead — UDFs are the slow
path and are kept off it wherever possible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import ShingleConfig
from ..sketchlib.hashing import u64_to_i64
from ..sketchlib.shingle import shingle_sets_batch


def make_simhash_udf(sh: ShingleConfig):
    """text -> 64-bit SimHash over token k-shingles (Charikar 2002).

    Per batch: flat (values, offsets) shingle layout, then a vectorized
    bit-vote: for each of 64 bits, sum +/-1 votes per document with
    np.add.reduceat.
    """

    @F.pandas_udf(LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        values, offsets = shingle_sets_batch(
            texts.tolist(), sh.k, sh.token_pattern, sh.lowercase, sh.seed
        )
        rows = len(offsets) - 1
        out = np.zeros(rows, dtype=np.uint64)
        if len(values):
            sizes = np.diff(offsets)
            nonempty = sizes > 0
            starts = offsets[:-1][nonempty]
            # votes: (n_values, 64) bit-plane as uint8 via unpackbits
            # (little-endian: column j == bit j) summed per document with a
            # typed reduceat — an int64 bit matrix here cost 8x the memory
            # and dominated the simhash stage
            bits = np.unpackbits(
                np.ascontiguousarray(values).view(np.uint8), bitorder="little"
            ).reshape(-1, 64)
            ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int32)
            majority = ones * 2 > sizes[nonempty, None]
            packed = np.zeros(majority.shape[0], dtype=np.uint64)
            for b in range(64):
                packed |= majority[:, b].astype(np.uint64) << np.uint64(b)
            out[nonempty] = packed
        return pd.Series(u64_to_i64(out))

    return _udf


def make_winnow_fingerprint_udf(sh: ShingleConfig, window: int = 8):
    """text -> array<long> winnowing fingerprints (Schleimer et al. 2003,
    MOSS): the minimum shingle hash of every sliding window of ``window``
    consecutive k-gram hashes, deduplicated.  Local document fingerprint for
    exact-substring detection: two documents sharing a long verbatim block
    share its window minima regardless of surrounding text."""

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view

        from ..sketchlib.hashing import splitmix64
        from ..sketchlib.shingle import _TOKEN_SALT, positional_kgram_hashes

        s_flat, g_off = positional_kgram_hashes(
            texts.tolist(), sh.k, sh.token_pattern, sh.lowercase, sh.seed
        )
        rows = len(g_off) - 1
        out: list = [None] * rows
        g_sizes = np.diff(g_off)
        # flat sliding-window minima; per row we slice only the windows that
        # lie fully inside that row's gram span
        if len(s_flat) >= window:
            wins = sliding_window_view(s_flat, window).min(axis=1)
        for i in range(rows):
            lo, hi = int(g_off[i]), int(g_off[i + 1])
            if hi == lo:
                out[i] = []
            elif hi - lo <= window:
                out[i] = list(u64_to_i64(np.array([s_flat[lo:hi].min()], dtype=np.uint64)))
            else:
                mins = wins[lo : hi - window + 1]
                out[i] = list(u64_to_i64(np.unique(mins)))
        return pd.Series(out)

    return _udf

def make_lcs_pair_stats_udf(L: int, min_run: int):
    """(gs1, gs2, hot) -> struct(max_shared_len, n_spans): the exact
    diagonal-island scan for ONE candidate pair, vectorized in numpy.

    gs1/gs2 are the per-document xxhash64 char-L-gram arrays (index i =
    1-based position i+1); ``hot`` is the corpus-wide over-cap gram list
    (identical on every row — a broadcast single-row crossJoin).  Semantics
    are bit-identical to the one-shuffle bucket-expand form this replaced:
    hot grams are excluded from matching, every remaining (pos1, pos2) hash
    match contributes a diagonal entry, and maximal runs of consecutive
    pos1 on one diagonal are the shared spans (max run + L - 1 = exact
    longest common substring length; runs >= min_run are counted).
    """

    @F.pandas_udf("max_shared_len bigint, n_spans bigint")
    def _udf(gs1: pd.Series, gs2: pd.Series, hot: pd.Series) -> pd.DataFrame:
        best = np.zeros(len(gs1), dtype=np.int64)
        spans = np.zeros(len(gs1), dtype=np.int64)
        hotset: np.ndarray | None = None
        for i in range(len(gs1)):
            a = np.asarray(gs1.iloc[i], dtype=np.int64)
            b = np.asarray(gs2.iloc[i], dtype=np.int64)
            if hotset is None:
                hv = hot.iloc[i]
                hotset = (
                    np.sort(np.asarray(hv, dtype=np.int64))
                    if hv is not None and len(hv)
                    else np.empty(0, dtype=np.int64)
                )
            if len(hotset):
                pa = np.flatnonzero(~np.isin(a, hotset))
                pb = np.flatnonzero(~np.isin(b, hotset))
                a, b = a[pa], b[pb]
            else:
                pa = pb = None
            if not len(a) or not len(b):
                continue
            order_b = np.argsort(b, kind="stable")
            sb = b[order_b]
            lo = np.searchsorted(sb, a, side="left")
            hi = np.searchsorted(sb, a, side="right")
            cnt = hi - lo
            total = int(cnt.sum())
            if not total:
                continue
            idx1 = np.repeat(np.arange(len(a)), cnt)
            csum = np.concatenate(([0], np.cumsum(cnt)))
            within = np.arange(total) - np.repeat(csum[:-1], cnt)
            idx2 = order_b[np.repeat(lo, cnt) + within]
            p1 = (pa[idx1] if pa is not None else idx1) + 1
            p2 = (pb[idx2] if pb is not None else idx2) + 1
            diag = p1 - p2
            ordk = np.lexsort((p1, diag))
            d, q = diag[ordk], p1[ordk]
            brk = np.flatnonzero((d[1:] != d[:-1]) | (q[1:] != q[:-1] + 1))
            bounds = np.concatenate(([0], brk + 1, [len(q)]))
            runlens = np.diff(bounds)
            best[i] = int(runlens.max()) + L - 1
            spans[i] = int((runlens >= min_run).sum())
        return pd.DataFrame({"max_shared_len": best, "n_spans": spans})

    return _udf


def make_internal_repeats_udf(min_len: int):
    """text -> struct(longest_repeat_len, n_repeat_positions): exact per-doc
    internal-repeat facts from the suffix-array + Kasai-LCP kernels
    (sketchlib/suffix.py, hypothesis-gated vs O(n^2) brute force).

    longest_repeat_len = max LCP (longest substring occurring >= 2 times,
    overlaps allowed); n_repeat_positions = suffix positions whose longest
    match elsewhere in the doc is >= min_len.  Operates on UTF-8 BYTES (the
    SA is byte-level) — exact for any encoding, and byte counts are what a
    repeated-boilerplate filter thresholds on anyway.

    Per-row Python inside an Arrow batch: SA construction is O(n log n)
    np.lexsort rounds per document and documents are KB-scale — the same
    per-asset-cost argument as the multimodal codecs (multimodal.py)."""
    from ..sketchlib.suffix import repeat_stats

    @F.pandas_udf("longest_repeat_len bigint, n_repeat_positions bigint")
    def _udf(texts: pd.Series) -> pd.DataFrame:
        longest = np.zeros(len(texts), dtype=np.int64)
        npos = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t:
                longest[i], npos[i] = repeat_stats(t.encode("utf-8"), min_len)
        return pd.DataFrame(
            {"longest_repeat_len": longest, "n_repeat_positions": npos}
        )

    return _udf


def make_repetition_stats_udf():
    """text -> struct(n_tokens, dup_token_q, top_token_q, dup_bigram_q,
    top_bigram_q): the Gopher-style repetition signals of
    textstats.with_repetition_stats in ONE Arrow pass.

    The pure-expression form computed top-token/top-bigram coverage with
    NESTED interpreted higher-order lambdas whose inner ``toks`` reference
    re-evaluates split(text) per distinct token (interpreted eval has no
    common-subexpression elimination), i.e. O(distinct x n_tokens x |text|)
    per row — measured ~900 s single-task for 50k ~300-char docs at
    sf1.0 scale when the columns are actually materialized (the bench's
    count() column-prunes them, which hid the cost).  One Counter pass per
    row is O(n_tokens) and bit-identical:

    - token split mirrors Spark split(coalesce(text,''), ' ') (Java limit
      -1 semantics == Python str.split(' ') for the literal-space pattern:
      trailing empty strings kept, '' -> ['']),
    - _q6 quantization evaluates the identical IEEE double division then
      floor over exact ints (all magnitudes far below 2^53).
    """
    import math
    from collections import Counter

    def _q6(num: int, den: int) -> int:
        return math.floor((2_000_000 * num + den) / (2 * den))

    @F.pandas_udf(
        "n_tokens int, dup_token_q bigint, top_token_q bigint, "
        "dup_bigram_q bigint, top_bigram_q bigint"
    )
    def _udf(texts: pd.Series) -> pd.DataFrame:
        m = len(texts)
        out = {
            "n_tokens": np.zeros(m, dtype=np.int32),
            "dup_token_q": np.zeros(m, dtype=np.int64),
            "top_token_q": np.zeros(m, dtype=np.int64),
            "dup_bigram_q": np.zeros(m, dtype=np.int64),
            "top_bigram_q": np.zeros(m, dtype=np.int64),
        }
        for i, t in enumerate(texts):
            toks = ("" if t is None else t).split(" ")
            n = len(toks)
            c = Counter(toks)
            bigs = Counter(zip(toks, toks[1:]))
            nb = n - 1 if n >= 2 else 0
            nb_safe = max(nb, 1)
            out["n_tokens"][i] = n
            out["dup_token_q"][i] = _q6(n - len(c), n)
            out["top_token_q"][i] = _q6(max(c.values()), n)
            out["dup_bigram_q"][i] = _q6(nb - len(bigs), nb_safe)
            out["top_bigram_q"][i] = _q6(max(bigs.values()) if bigs else 0, nb_safe)
        return pd.DataFrame(out)

    return _udf
