"""Tokenization and hashed k-shingling.

The reference consumes pre-hashed uint64 elements (sketch.hpp:1040, 1585);
this module is our pipeline's element producer: content string -> set of
64-bit shingle hashes.  All heavy lifting is numpy; only the regex token
split is per-string Python (it runs inside Arrow-batched UDFs).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

from .hashing import U64, splitmix64, _MIX1  # noqa: F401

_TOKEN_SALT = U64(0x7E57_70C3_D00D_F00D)


@lru_cache(maxsize=32)
def _compiled(pattern: str):
    return re.compile(pattern)


def tokenize(text: str, pattern: str = r"\S+", lowercase: bool = False) -> list[str]:
    if lowercase:
        text = text.lower()
    if pattern == r"\S+":
        # str.split() == findall(r"\S+") and is ~5x faster (hot path)
        return text.split()
    return _compiled(pattern).findall(text)


def token_hashes(tokens: list[str], seed: int = 0) -> np.ndarray:
    """uint64 hash per token.

    Python-level hash() is salted per process, so we hash token bytes with a
    deterministic FNV-style fold, vectorized over the batch by interning
    repeated tokens first (source text has heavy token repetition).
    """
    if not tokens:
        return np.empty(0, dtype=U64)
    # intern: hash each distinct token once
    uniq: dict[str, int] = {}
    codes = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        c = uniq.get(t)
        if c is None:
            c = len(uniq)
            uniq[t] = c
        codes[i] = c
    distinct_hashes = np.fromiter(
        (_fnv1a(t) for t in uniq.keys()), dtype=U64, count=len(uniq)
    )
    salt = U64((seed * int(_MIX1)) & 0xFFFFFFFFFFFFFFFF)
    distinct_hashes = splitmix64(distinct_hashes ^ salt)
    return distinct_hashes[codes]


def _fnv1a(token: str) -> int:
    h = 0xCBF29CE484222325
    for b in token.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def shingle_hashes(tok_hashes: np.ndarray, k: int) -> np.ndarray:
    """Distinct uint64 hashes of the k-grams of a token-hash sequence.

    Rolling combine: S = mix(mix(...mix(T_i)·⊕T_{i+1}...)⊕T_{i+k-1}),
    vectorized as k shifted passes (k is small).  Texts shorter than k yield
    a single shingle over all their tokens, so no document maps to the empty
    set (the reference's estimators assume non-degenerate input sets).
    """
    n = len(tok_hashes)
    if n == 0:
        return np.empty(0, dtype=U64)
    if n < k:
        k = n
    s = tok_hashes[: n - k + 1].copy()
    for j in range(1, k):
        s = splitmix64(s ^ _TOKEN_SALT) ^ tok_hashes[j : n - k + 1 + j]
    return np.unique(splitmix64(s))


def _shingle_sets_batch_ref(
    texts, k: int, pattern: str = r"\S+", lowercase: bool = False, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row reference implementation (kept as the equivalence oracle for
    the vectorized batch kernel below; see tests/test_sketchlib.py)."""
    parts: list[np.ndarray] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for i, text in enumerate(texts):
        th = token_hashes(tokenize(text or "", pattern, lowercase), seed)
        sh = shingle_hashes(th, k)
        parts.append(sh)
        offsets[i + 1] = offsets[i] + len(sh)
    values = np.concatenate(parts) if parts else np.empty(0, dtype=U64)
    return values, offsets


def positional_kgram_hashes(
    texts, k: int, pattern: str = r"\S+", lowercase: bool = False, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """POSITIONAL (non-deduplicated, document-order) k-gram hashes for a
    batch, flat (values, offsets) layout.  Same hash construction as
    ``shingle_sets_batch`` minus the per-row dedup/sort; rows shorter than k
    yield one gram over all their tokens; empty rows yield none.  Feeds
    winnowing (window minima need document order)."""
    th_flat, tok_off, lens = _token_hashes_flat(texts, pattern, lowercase, seed)
    n_docs = len(lens)
    g_sizes = np.where(lens > 0, np.maximum(lens - k + 1, 1), 0)
    g_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(g_sizes, out=g_off[1:])
    out = np.empty(int(g_off[-1]), dtype=U64)
    total = len(th_flat)
    if total == 0:
        return out, g_off

    if total >= k:
        nwin = total - k + 1
        s = th_flat[:nwin].copy()
        for j in range(1, k):
            s = splitmix64(s ^ _TOKEN_SALT)
            s ^= th_flat[j : nwin + j]
        s = splitmix64(s)
        long_rows = np.flatnonzero(lens >= k)
        for i in long_rows:  # slice copies only; no per-gram work
            out[g_off[i] : g_off[i + 1]] = s[tok_off[i] : tok_off[i] + g_sizes[i]]

    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        max_len = int(lens[short].max())
        sv = th_flat[tok_off[short]].copy()
        for j in range(1, max_len):
            live = lens[short] > j
            idx = tok_off[short[live]] + j
            sv[live] = splitmix64(sv[live] ^ _TOKEN_SALT) ^ th_flat[idx]
        out[g_off[short]] = splitmix64(sv)
    return out, g_off


def _token_hashes_flat(texts, pattern, lowercase, seed):
    """Tokenize + hash a batch: flat token-hash array, token offsets, lens."""
    import pandas as pd
    from itertools import chain

    n_docs = len(texts)
    tok_lists = [tokenize(t or "", pattern, lowercase) for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n_docs)
    total = int(lens.sum())
    tok_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=tok_off[1:])
    if total == 0:
        return np.empty(0, dtype=U64), tok_off, lens
    flat_tokens = np.empty(total, dtype=object)
    flat_tokens[:] = list(chain.from_iterable(tok_lists))
    codes, uniques = pd.factorize(flat_tokens)
    distinct = np.fromiter((_fnv1a(t) for t in uniques), dtype=U64, count=len(uniques))
    salt = U64((seed * int(_MIX1)) & 0xFFFFFFFFFFFFFFFF)
    th_flat = splitmix64(distinct ^ salt)[codes]
    return th_flat, tok_off, lens


def shingle_sets_batch(
    texts, k: int, pattern: str = r"\S+", lowercase: bool = False, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle a batch of texts (bit-identical to ``_shingle_sets_batch_ref``).

    Returns (values, offsets): ``values`` is the concatenation of each text's
    distinct (sorted) shingle hashes; ``offsets[i]:offsets[i+1]`` slices text
    i.  The flat layout feeds np.minimum.reduceat-style batched sketch
    kernels without per-row object overhead.

    Hot-path design (this runs inside every signature UDF batch): the only
    per-token Python is the regex findall; token interning is ONE
    pandas.factorize over the whole batch (C speed), the byte-level FNV hash
    runs once per *distinct token per batch* (not per occurrence), and the
    k-gram rolling combine + per-row dedup are flat numpy passes with
    row-boundary masking — no per-document Python loop.
    """
    n_docs = len(texts)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    if n_docs == 0:
        return np.empty(0, dtype=U64), offsets
    th_flat, tok_off, lens = _token_hashes_flat(texts, pattern, lowercase, seed)
    total = len(th_flat)
    if total == 0:
        return np.empty(0, dtype=U64), offsets
    row_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

    row_parts: list[np.ndarray] = []  # (row_id, value) pair sources
    val_parts: list[np.ndarray] = []

    # full-width windows: position p valid iff tokens p..p+k-1 share a row
    if total >= k:
        nwin = total - k + 1
        s = th_flat[:nwin].copy()
        for j in range(1, k):
            s = splitmix64(s ^ _TOKEN_SALT)
            s ^= th_flat[j : nwin + j]
        s = splitmix64(s)
        valid = row_of_tok[:nwin] == row_of_tok[k - 1 :]
        # only rows with len >= k use windows (len<k rows get the fold below)
        row_parts.append(row_of_tok[:nwin][valid])
        val_parts.append(s[valid])

    # short rows (0 < len < k): one shingle folding all tokens, same math as
    # shingle_hashes with k'=len
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        max_len = int(lens[short].max())
        sv = th_flat[tok_off[short]].copy()
        for j in range(1, max_len):
            live = lens[short] > j
            idx = tok_off[short[live]] + j
            sv[live] = splitmix64(sv[live] ^ _TOKEN_SALT) ^ th_flat[idx]
        row_parts.append(short)
        val_parts.append(splitmix64(sv))

    rows_all = np.concatenate(row_parts) if row_parts else np.empty(0, np.int64)
    vals_all = np.concatenate(val_parts) if val_parts else np.empty(0, U64)
    if len(vals_all) == 0:
        return np.empty(0, dtype=U64), offsets
    order = np.lexsort((vals_all, rows_all))
    rv = rows_all[order]
    vv = vals_all[order]
    keep = np.ones(len(vv), dtype=bool)
    keep[1:] = (rv[1:] != rv[:-1]) | (vv[1:] != vv[:-1])
    rv = rv[keep]
    values = vv[keep]
    counts = np.bincount(rv, minlength=n_docs)
    np.cumsum(counts, out=offsets[1:])
    return values, offsets
