"""MinHash kernels (vectorized numpy).

Semantics follow /root/reference/c++/sketch.hpp:1579-1612: m 64-bit
registers initialized to UINT64_MAX, per element each register takes
min(state, h_j(element)); merge is element-wise min.  The reference draws
h_j from a per-element wyrand stream; we use the linear per-register family
h_j(e) = A(e) + key_j * B(e) mod 2^64 with A, B independent splitmix64
mixes of the element and fixed per-register keys (the "fast similarity
sketching" construction, Dahlgaard/Knudsen/Thorup FOCS'17 style): O(1) full
mixes per element plus ONE multiply-add per (element, register), ~7x faster
than a per-register splitmix64 at m=4096 because the inner loop is two
memory passes instead of nine.  Register-level statistics (equal-register
Jaccard RMSE, harmonic cardinality RMSE, joint ML) are asserted against
closed-form theory in tests/test_estimators_mc.py; pipeline and oracle share
this exact function, so assignments stay bit-identical (SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np

from .hashing import U64, derive_keys, splitmix64

_LOG2_64 = np.log(2.0) * 64.0

# cap the scratch matrix at ~64 MB regardless of batch shape
_CHUNK_BUDGET = 8_000_000


def minhash_signature(elements: np.ndarray, m: int, seed: int) -> np.ndarray:
    """Signature of one element set -> uint64 array of shape (m,)."""
    values = np.asarray(elements, dtype=U64)
    sig, _ = minhash_signatures_batch(values, np.array([0, len(values)]), m, seed)
    return sig[0]


_SALT_A = U64(0x71C9_5EED_A11C_E001)
_SALT_B = U64(0x2545_F491_4F6C_DD1D)


def minhash_signatures_batch(
    values: np.ndarray, offsets: np.ndarray, m: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Signatures for a batch of sets in flat (values, offsets) layout.

    Returns (signatures uint64 (rows, m), set_sizes int64 (rows,)).
    Empty sets keep all registers at UINT64_MAX (same as the reference's
    untouched state).

    Hot loop: per register-chunk, ONE broadcast multiply + add into a
    preallocated scratch (h_j = A + key_j * B, B forced odd so e -> h_j(e)
    is bijective per register), then a segmented min (reduceat).  The chunk
    budget keeps the scratch ~64 MB so the two passes stream, not thrash.
    """
    rows = len(offsets) - 1
    keys = derive_keys(seed, m)
    sigs = np.full((rows, m), np.iinfo(np.uint64).max, dtype=U64)
    sizes = np.diff(offsets).astype(np.int64)
    if len(values) == 0:
        return sigs, sizes
    nonempty = sizes > 0
    starts = offsets[:-1][nonempty]
    # reduceat needs strictly valid segment starts; handle empties via mask
    n = len(values)
    reg_chunk = max(1, _CHUNK_BUDGET // n)
    vals = np.asarray(values, dtype=U64)
    skey = U64(seed & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        a_mix = splitmix64(vals ^ _SALT_A ^ skey)[:, None]
        b_mix = (splitmix64(vals ^ _SALT_B ^ skey) | U64(1))[:, None]
        buf = np.empty((n, reg_chunk), dtype=U64)
        for c0 in range(0, m, reg_chunk):
            c1 = min(m, c0 + reg_chunk)
            bb = buf[:, : c1 - c0]
            np.multiply(b_mix, keys[None, c0:c1], out=bb)
            np.add(bb, a_mix, out=bb)
            sigs[nonempty, c0:c1] = np.minimum.reduceat(bb, starts, axis=0)
    return sigs, sizes


def minhash_signatures_batch_oph(
    values: np.ndarray, offsets: np.ndarray, m: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """One-permutation MinHash with rotation densification.

    Classic dense MinHash (above) costs O(n*m) hashes per set — the
    reference's own benchmark shows it ~1000x slower per element than the
    one-hash-per-element sketches (MinHash 4.14us/elem vs GHLL 3.93ns/elem,
    BASELINE.md).  OPH (Li, Owen, Zhang NIPS'12) hashes each element ONCE
    into one of m bins and keeps the per-bin minimum; empty bins borrow the
    nearest non-empty bin to the left (circular rotation densification,
    Shrivastava & Li ICML'14 — unbiased for Jaccard via register equality).
    O(n + m) per set: this is the 100TB-scale signature path (`algo='oph'`).

    Same register-equality Jaccard estimator and LSH banding apply; both the
    Spark pipeline and the single-node oracle call this same function, so
    assignments stay bit-identical across parallelism levels.
    """
    rows = len(offsets) - 1
    UMAX = np.iinfo(np.uint64).max
    sigs = np.full((rows, m), UMAX, dtype=U64)
    sizes = np.diff(offsets).astype(np.int64)
    n = len(values)
    if n:
        vals = np.asarray(values, dtype=U64)
        skey = splitmix64(np.array([seed & 0xFFFFFFFFFFFFFFFF], dtype=U64))[0]
        h = splitmix64(vals ^ skey)
        bins = ((h >> U64(32)) * U64(m)) >> U64(32)  # Lemire map to [0, m)
        regval = splitmix64(h)
        row_of = np.repeat(np.arange(rows, dtype=np.int64), sizes)
        flat = row_of * m + bins.astype(np.int64)
        np.minimum.at(sigs.reshape(-1), flat, regval)

    # rotation densification: empty bin j takes the nearest non-empty bin to
    # its left (circular); fully-empty rows stay at UMAX (empty-set state)
    nonempty = sigs != UMAX
    any_filled = nonempty.any(axis=1)
    if any_filled.any():
        idx = np.where(nonempty, np.arange(m, dtype=np.int64)[None, :], np.int64(-1))
        ffl = np.maximum.accumulate(idx, axis=1)  # max non-empty index <= j
        ff = np.where(ffl >= 0, ffl, ffl[:, -1:])  # wrap: global last non-empty
        take = np.maximum(ff, 0)
        dense = np.take_along_axis(sigs, take, axis=1)
        sigs = np.where((ff >= 0) & any_filled[:, None], dense, sigs)
    return sigs, sizes


def minhash_batch(
    values: np.ndarray, offsets: np.ndarray, m: int, seed: int, algo: str = "dense"
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatch on MinHashConfig.algo: 'dense' (paper-parity) or 'oph'."""
    if algo == "oph":
        return minhash_signatures_batch_oph(values, offsets, m, seed)
    if algo == "dense":
        return minhash_signatures_batch(values, offsets, m, seed)
    raise ValueError(f"unknown minhash algo {algo!r} (expected 'dense' or 'oph')")


def merge_minhash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise min merge (sketch.hpp:1599-1603)."""
    return np.minimum(np.asarray(a, dtype=U64), np.asarray(b, dtype=U64))


def minhash_cardinality(states: np.ndarray) -> np.ndarray:
    """MinHash cardinality estimator (sketch.hpp:1383-1389):
    m / sum_j (64*ln2 - ln(~r_j)).  Vectorized over rows.
    """
    st = np.atleast_2d(np.asarray(states, dtype=U64))
    m = st.shape[1]
    inv = (~st).astype(np.float64)
    with np.errstate(divide="ignore"):
        terms = _LOG2_64 - np.log(inv)
    s = np.sum(terms, axis=1)
    with np.errstate(divide="ignore"):
        out = m / s
    return np.where(np.isinf(s), 0.0, out)


def bbit_signature(sig: np.ndarray, bits: int = 8) -> np.ndarray:
    """b-bit MinHash compaction: keep the low ``bits`` of each register.

    Standard b-bit minwise hashing (Li & König); used to shrink LSH band
    material.  Returns uint8/uint16 array.
    """
    mask = U64((1 << bits) - 1)
    compact = np.asarray(sig, dtype=U64) & mask
    return compact.astype(np.uint8 if bits <= 8 else np.uint16)


def band_hashes(
    sigs: np.ndarray, num_bands: int, rows_per_band: int, seed: int
) -> np.ndarray:
    """LSH band hashes: fold each band's registers into one 64-bit key.

    sigs: (rows, m) with m == num_bands * rows_per_band.
    Returns uint64 (rows, num_bands); band identity is carried by position.

    Register-to-band assignment is STRIDED (band b folds registers
    b, b+num_bands, b+2*num_bands, ...), not consecutive.  For dense MinHash
    the layouts are statistically identical (independent registers), but for
    OPH signatures rotation densification copies one value across a run of
    consecutive empty bins — consecutive banding then turns one shared
    minimum between two small sets into a full spurious band collision
    (measured 100x candidate inflation on short documents).
    """
    s = np.atleast_2d(np.asarray(sigs, dtype=U64))
    rows, m = s.shape
    assert m == num_bands * rows_per_band, (m, num_bands, rows_per_band)
    salts = derive_keys(seed ^ 0xBA9D5, num_bands)
    folded = np.broadcast_to(salts, (rows, num_bands)).copy()
    cube = s.reshape(rows, rows_per_band, num_bands)
    for r in range(rows_per_band):
        folded = splitmix64(folded ^ cube[:, r, :])
    return folded
