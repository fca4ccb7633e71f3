"""Deduplication operators: exact, MinHash-LSH near-dup, SimHash,
n-gram Jaccard, embedding near-dup.

Exact dedup is the short-circuit in front of the sketch pipeline: at corpus
scale a large fraction of files are byte-identical (FIXTURES.md plants 15%),
and sketching them is pure waste — group by sha256 first, push only the
representatives through LSH, and re-attach members afterwards
(SURVEY.md §7.1 step 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType

from ..config import PipelineConfig
from ..functions.udfs import make_minhash_pair_estimator_udf
from ..operators import lsh as lsh_ops
from ..operators.signatures import with_content_sha, with_minhash_signature


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Groups of byte-identical content: (content_sha, dup_count, keep_id).

    One hash-aggregate shuffle on the sha; Catalyst prunes everything but
    (id, content) from the scan.
    """
    hashed = with_content_sha(df, content_col).select(id_col, "content_sha")
    return hashed.groupBy("content_sha").agg(
        F.count(F.lit(1)).alias("dup_count"),
        F.min(id_col).alias("keep_id"),
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """Representative rows only (min id per identical content)."""
    hashed = with_content_sha(df, content_col)
    w = Window.partitionBy("content_sha")
    return (
        hashed.withColumn("_keep", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_keep")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    pcfg: PipelineConfig,
    id_col: str = "doc_id",
    content_col: str = "content",
    estimator: str = "original",
) -> DataFrame:
    """content table -> (id1, id2, est_jaccard, ...) near-duplicate pairs.

    shingle/sketch (narrow) -> LSH bucket groupBy (1 shuffle) -> pair dedup
    (1 shuffle) -> verification join (2 shuffles, id-partitioned).
    """
    signed = with_minhash_signature(df.select(id_col, content_col), pcfg, content_col)
    signed = signed.select(id_col, "sig", "bands", "n_shingles")
    pairs = lsh_ops.candidate_pairs(signed, pcfg.lsh, id_col=id_col)
    est_udf = make_minhash_pair_estimator_udf(pcfg.minhash, estimator)
    return lsh_ops.verified_pairs(
        pairs, signed, est_udf, pcfg.jaccard_threshold, id_col=id_col
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 1,
) -> DataFrame:
    """EXACT k-gram Jaccard pairs, computed relationally (no sketches).

    Token k-grams are built JVM-side with transform/slice over the split
    array; the pair intersection count comes from an explode + self-join +
    count — the exact-oracle twin of the MinHash path, used for recall
    accounting and small-corpus dedup.  Returns pairs with
    inter_count/union_count (exact ints) and jaccard_q = round(1e6*J).
    Threshold is the rational threshold_num/threshold_den (ints avoid float
    comparison drift vs SQL oracles).
    """
    toks = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("t")
    )
    grams = toks.select(
        "_id",
        F.array_distinct(
            F.when(
                F.size("t") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - k),
                    lambda i: F.concat_ws("", F.slice("t", i + 1, k)),
                ),
            ).otherwise(F.array(F.concat_ws("", F.col("t"))))
        ).alias("grams"),
    )
    sizes = grams.select("_id", F.size("grams").alias("n_grams"))
    # join on the 64-bit gram hash, not the gram string: halves-to-quarters
    # the shuffle bytes of the self-join.  xxhash64 collisions across a
    # corpus' distinct grams are ~|grams|^2/2^64 — negligible; the exact
    # SQL oracle joins on strings and agreement is asserted at sf0.01.
    exploded = grams.select(
        "_id", F.explode("grams").alias("_g")
    ).select("_id", F.xxhash64("_g").alias("g"))
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"), "g")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter_count"))
        .filter(F.col("inter_count") >= min_shared)
    )
    out = (
        inter.join(sizes.withColumnRenamed("_id", "id1").withColumnRenamed("n_grams", "n1"), "id1")
        .join(sizes.withColumnRenamed("_id", "id2").withColumnRenamed("n_grams", "n2"), "id2")
        .withColumn("union_count", F.col("n1") + F.col("n2") - F.col("inter_count"))
        .filter(
            F.col("inter_count") * threshold_den >= F.col("union_count") * threshold_num
        )
        .select(
            "id1",
            "id2",
            "inter_count",
            "union_count",
            # floor((2e6*i + u)/(2u)) == round-half-up(1e6*i/u) over exact
            # ints; identical IEEE expression in the SQL oracle
            F.floor(
                (F.lit(2_000_000) * F.col("inter_count") + F.col("union_count"))
                / (F.lit(2) * F.col("union_count"))
            )
            .cast(LongType())
            .alias("jaccard_q"),
        )
    )
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    pcfg: PipelineConfig,
    hamming_threshold: int = 3,
    n_blocks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup: 64-bit simhash per doc, pigeonhole block join.

    A pair within hamming distance <= n_blocks-1 shares at least one of the
    n_blocks 16-bit blocks exactly (pigeonhole), so block equality is the
    LSH key; the exact hamming check runs JVM-side via bit_count(xor).
    """
    from ..functions.textstats_udfs import make_simhash_udf

    sim = df.select(
        F.col(id_col).alias("_id"),
        make_simhash_udf(pcfg.shingle)(F.col(text_col)).alias("simhash"),
    )
    block_width = 64 // n_blocks
    blocks = sim.select(
        "_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * block_width).bitwiseAND(
                        F.lit((1 << block_width) - 1)
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("block_idx", "block_val"),
    )
    pairs = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["block_idx", "block_val"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a.simhash").alias("sh1"),
            F.col("b.simhash").alias("sh2"),
        )
        .dropDuplicates(["id1", "id2"])
        .withColumn("hamming", F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))))
        .filter(F.col("hamming") <= hamming_threshold)
        .select("id1", "id2", "hamming")
    )
    return pairs
