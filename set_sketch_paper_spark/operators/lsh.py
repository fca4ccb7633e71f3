"""LSH banding and candidate-pair generation.

Scale design (SURVEY.md §4, north rule):
- band explosion is a narrow op (posexplode of the per-row band array);
- bucket grouping is ONE shuffle (groupBy the position-salted band_hash with
  collect_list), after which pair expansion is narrow;
- the band-size cap bounds the quadratic expansion of boilerplate
  mega-buckets (hot-band skew): a bucket of size s yields s(s-1)/2 pairs, so
  an uncapped 1M-member license-header bucket would emit 5e11 pairs.
  Oversized buckets are dropped and REPORTED via the skipped-buckets output
  (standard LSH practice; callers can route them to the exact-substring /
  boilerplate path instead);
- canonical pair dedup (least/greatest + dropDuplicates) shuffles on the
  pair key — unavoidable and key-balanced;
- AQE skew-join handling stays on for the verification join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import LSHConfig


def explode_bands(df: DataFrame, id_col: str = "file_id", bands_col: str = "bands") -> DataFrame:
    """(id, bands array) -> (band_hash, id), narrow.

    The bucket key is band_hash ALONE: band_hashes() seeds each band
    position with its own salt (sketchlib/minhash.py::band_hashes), so the
    64-bit value already encodes the band identity — carrying band_idx
    through the shuffle would add key bytes for nothing.  A cross-band
    64-bit collision merges two buckets (~|rows|^2/2^64 probability) and
    only costs a spurious candidate pair that verification rejects; the
    numpy oracle buckets by the same value, so assignments stay bit-equal.

    explode_outer, NOT explode: the plain generator injects an implicit
    `size(bands) > 0 AND isnotnull(bands)` Filter that references the UDF
    output before the projection, which defeats Python-UDF dedup and makes
    Spark evaluate the signature UDF TWICE per row (seen in the formatted
    plan as two ArrowEvalPython nodes).  Signatures always emit a full band
    array, so the outer variant only adds a null-filter after the explode.
    """
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.col(bands_col)).alias("band_hash"),
    ).filter(F.col("band_hash").isNotNull())


_PAIR_EXPR = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> "
    "struct(least(x, y) as id1, greatest(x, y) as id2))))"
)


def _expand_buckets(buckets: DataFrame) -> DataFrame:
    """(.., ids array) -> (id1 < id2) rows: the s(s-1)/2 i<j pairs per bucket
    in ONE codegen'd expression — a double explode would instead materialize
    s rows each carrying the full ids array (s^2 array copies per bucket,
    measured 4x slower)."""
    return (
        buckets.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.id1", "p.id2")
        .filter(F.col("id1") != F.col("id2"))
    )


def candidate_pairs(
    df: DataFrame,
    lsh: LSHConfig,
    id_col: str = "file_id",
    bands_col: str = "bands",
    with_skipped: bool = False,
    hot_mode: str = "drop",
):
    """All distinct id pairs sharing >= 1 LSH bucket, bucket size capped.

    Hot buckets (size > band_cap — boilerplate bands) are handled per
    ``hot_mode``:
    - 'drop' (default): excluded and reported via ``with_skipped`` — the
      deterministic-recall mode the numpy oracle mirrors;
    - 'salt': SPLIT into ceil(size/cap) hash-salted sub-buckets and paired
      within each sub-bucket (the north-star "salt hot shingle bands to
      defuse skew" mode): cost stays O(size * cap) instead of O(size^2),
      trading uniform ~cap/size within-band recall on boilerplate bands —
      true near-dups still collide in their other, non-hot bands.

    Returns pairs DataFrame (id1 < id2), and optionally the skipped/salted
    oversized-bucket summary (band_hash, bucket_size).
    """
    exploded = explode_bands(df, id_col, bands_col)
    buckets = exploded.groupBy("band_hash").agg(
        F.collect_list("_id").alias("ids")
    )
    sized = buckets.withColumn("bucket_size", F.size("ids"))
    ok = sized.filter((F.col("bucket_size") >= 2) & (F.col("bucket_size") <= lsh.band_cap))
    pairs = _expand_buckets(ok)
    hot = sized.filter(F.col("bucket_size") > lsh.band_cap)
    if hot_mode == "salt":
        # re-shuffle ONLY the hot-band membership rows (rare by definition)
        # with a deterministic per-id salt; sub-buckets are ~cap-sized w.h.p.
        n_sub = F.ceil(F.col("bucket_size") / F.lit(lsh.band_cap)).cast("long")
        hot_rows = hot.select(
            "band_hash", n_sub.alias("_nsub"), F.explode("ids").alias("_id")
        )
        salted = hot_rows.withColumn("_salt", F.pmod(F.xxhash64("_id"), F.col("_nsub")))
        hot_buckets = (
            salted.groupBy("band_hash", "_salt")
            .agg(F.collect_list("_id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        pairs = pairs.union(_expand_buckets(hot_buckets))
    elif hot_mode != "drop":
        raise ValueError(f"unknown hot_mode {hot_mode!r} (expected 'drop' or 'salt')")
    pairs = pairs.dropDuplicates(["id1", "id2"])
    if with_skipped:
        skipped = hot.select("band_hash", "bucket_size")
        return pairs, skipped
    return pairs


def verified_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    estimator_udf,
    threshold: float,
    id_col: str = "file_id",
    sig_col: str = "sig",
    n_col: str = "n_shingles",
) -> DataFrame:
    """Join candidate pairs back to signatures and keep pairs whose estimated
    Jaccard >= threshold.

    The exact shingle count (``n_col``, carried in the signature struct since
    tokenization) rides along so the joint estimator runs with KNOWN set
    cardinalities (sketch.hpp:1452) — mandatory under OPH, where the dense
    harmonic cardinality estimator does not apply.

    The two joins shuffle on the id — at cluster scale both sides are
    pre-partitioned by id, so this is the co-located join of the design.  The
    signature table is projected to (id, sig, n) before joining (column
    pruning: never carry content or bands here).
    """
    sig = signatures.select(
        F.col(id_col).alias("_sid"), F.col(sig_col).alias("_sig"), F.col(n_col).alias("_n")
    )
    joined = (
        pairs.join(
            sig.withColumnRenamed("_sid", "id1").withColumnRenamed("_sig", "sig1")
            .withColumnRenamed("_n", "n1"),
            "id1",
        )
        .join(
            sig.withColumnRenamed("_sid", "id2").withColumnRenamed("_sig", "sig2")
            .withColumnRenamed("_n", "n2"),
            "id2",
        )
    )
    est = joined.withColumn(
        "est", estimator_udf(F.col("sig1"), F.col("sig2"), F.col("n1"), F.col("n2"))
    )
    return (
        est.select(
            "id1",
            "id2",
            F.col("est.est_jaccard").alias("est_jaccard"),
            F.col("est.est_intersection").alias("est_intersection"),
            F.col("est.est_union").alias("est_union"),
            F.col("est.est_cosine").alias("est_cosine"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
