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


def shingle_sets_batch(
    texts, k: int, pattern: str = r"\S+", lowercase: bool = False, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle a batch of texts.

    Returns (values, offsets): ``values`` is the concatenation of each text's
    distinct shingle hashes; ``offsets[i]:offsets[i+1]`` slices text i.  The
    flat layout feeds np.minimum.reduceat-style batched sketch kernels
    without per-row object overhead.
    """
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
