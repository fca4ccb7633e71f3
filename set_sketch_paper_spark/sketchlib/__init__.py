"""Pure numpy sketch kernels and estimators — no Spark imports.

This layer is the deterministic contract shared by the Spark pipeline and the
single-node oracle: every kernel is a pure function of
(element hashes, config, seed), so the distributed pipeline and the oracle
produce bit-identical sketches (SURVEY.md §7.3).
"""

from .hashing import splitmix64, u64_from_i64, u64_to_i64, u64_to_unit
from .shingle import shingle_hashes, token_hashes, tokenize
from .minhash import (
    bbit_signature,
    merge_minhash,
    minhash_cardinality,
    minhash_signature,
    minhash_batch,
    minhash_signatures_batch,
    minhash_signatures_batch_oph,
)
from .ghll import ghll_sketch, ghll_sketches_batch, hll_sketches_batch, merge_ghll
from .setsketch import merge_setsketch, setsketch_sketch, setsketches_batch
from .hyperminhash import (
    HyperMinHashEstimator,
    hyperminhash_sketch,
    hyperminhash_sketches_batch,
    merge_hyperminhash,
)
from .estimators import MinHashJointEstimator, SetSketchEstimator, joint_from_jaccard

__all__ = [
    "splitmix64",
    "u64_from_i64",
    "u64_to_i64",
    "u64_to_unit",
    "tokenize",
    "token_hashes",
    "shingle_hashes",
    "minhash_signature",
    "minhash_batch",
    "minhash_signatures_batch",
    "minhash_signatures_batch_oph",
    "bbit_signature",
    "merge_minhash",
    "minhash_cardinality",
    "ghll_sketch",
    "ghll_sketches_batch",
    "merge_ghll",
    "hll_sketches_batch",
    "setsketch_sketch",
    "setsketches_batch",
    "merge_setsketch",
    "hyperminhash_sketch",
    "hyperminhash_sketches_batch",
    "merge_hyperminhash",
    "HyperMinHashEstimator",
    "SetSketchEstimator",
    "MinHashJointEstimator",
    "joint_from_jaccard",
]
