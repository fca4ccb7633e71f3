"""LSH banding and candidate-pair generation.

Scale design (SURVEY.md §4, north rule):
- band explosion is a narrow op (posexplode of the per-row band array);
- bucket grouping is ONE shuffle (groupBy band_idx+band_hash with
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
    """(id, bands array) -> (band_idx, band_hash, id), narrow.

    posexplode_outer, NOT posexplode: the plain generator injects an implicit
    `size(bands) > 0 AND isnotnull(bands)` Filter that references the UDF
    output before the projection, which defeats Python-UDF dedup and makes
    Spark evaluate the signature UDF TWICE per row (seen in the formatted
    plan as two ArrowEvalPython nodes).  Signatures always emit a full band
    array, so the outer variant only adds a null-filter after the explode.
    """
    return df.select(
        F.col(id_col).alias("_id"),
        F.posexplode_outer(F.col(bands_col)).alias("band_idx", "band_hash"),
    ).filter(F.col("band_hash").isNotNull())


def candidate_pairs(
    df: DataFrame,
    lsh: LSHConfig,
    id_col: str = "file_id",
    bands_col: str = "bands",
    with_skipped: bool = False,
):
    """All distinct id pairs sharing >= 1 LSH bucket, bucket size capped.

    Returns pairs DataFrame (id1 < id2), and optionally the skipped
    oversized-bucket summary (band_idx, band_hash, bucket_size).
    """
    exploded = explode_bands(df, id_col, bands_col)
    buckets = exploded.groupBy("band_idx", "band_hash").agg(
        F.collect_list("_id").alias("ids")
    )
    sized = buckets.withColumn("bucket_size", F.size("ids"))
    ok = sized.filter((F.col("bucket_size") >= 2) & (F.col("bucket_size") <= lsh.band_cap))
    # generate the s(s-1)/2 i<j pairs per bucket in ONE codegen'd expression:
    # a double explode would instead materialize s rows each carrying the
    # full ids array (s^2 array copies per bucket — measured 4x slower)
    pair_expr = F.explode(
        F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids)), y -> "
            "struct(least(x, y) as id1, greatest(x, y) as id2))))"
        )
    ).alias("p")
    pairs = (
        ok.select(pair_expr)
        .select("p.id1", "p.id2")
        .filter(F.col("id1") != F.col("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    if with_skipped:
        skipped = sized.filter(F.col("bucket_size") > lsh.band_cap).select(
            "band_idx", "band_hash", "bucket_size"
        )
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
