"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-duplicate pipeline on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators) as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for every query whose
semantics are SQL-expressible.  Sketch-based estimators (MinHash/GHLL/
SetSketch signatures, LSH candidates, hyperplane ANN, winnowing) are
intentionally oracle-free: their outputs are pseudo-random register state,
checked instead by the statistical/property tests in tests/ (rows-only
driver check).

Column-name discipline: every computed column is aliased identically in the
Spark query and the oracle SQL.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

from set_sketch_paper_spark.config import (
    GHLLConfig,
    LSHConfig,
    MinHashConfig,
    PipelineConfig,
    SetSketchConfig,
    ShingleConfig,
)
from set_sketch_paper_spark.operators.sampling import (
    _hex_threshold as _sampling_thr,
    split_edges as _split_edges,
)

# documents in the testdata are short (10-100 whitespace tokens): k=3
# shingles + 128-register signatures, 32x4 banding for high recall at J>=0.5.
# algo='oph' is the O(n+m) scale path (dense classic MinHash is the
# paper-parity path, exercised by tests/ and the estimator benches).
DOC_PCFG = PipelineConfig(
    shingle=ShingleConfig(k=3),
    minhash=MinHashConfig(num_registers=128, algo="oph"),
    lsh=LSHConfig(num_bands=32, rows_per_band=4, band_cap=500),
    jaccard_threshold=0.5,
)

LANG_MARKER_SQL = {
    "en": "['the','and','of','to','a','in','is','that']",
    "de": "['der','die','das','und','ist','von','ein','nicht']",
    "es": "['el','la','de','que','y','en','un','es']",
    "fr": "['le','la','et','les','des','un','une','est']",
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: near-duplicate cluster assignments for every document
    in the sf0.001 corpus (MinHash -> LSH -> verify -> connected components,
    with the exact-dup sha256 short-circuit)."""
    from set_sketch_paper_spark.plans.pipeline import NearDupPipeline

    docs = _docs(spark, "/root/testdata/sf0.001")
    pipe = NearDupPipeline(DOC_PCFG)
    result = pipe.run(
        docs.withColumnRenamed("text", "content"),
        id_cols=("doc_id",),
        content_col="content",
    )
    return result.clusters


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_exact_dup_groups(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.groupBy(F.md5("text").alias("fingerprint_md5")).agg(
        F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("keep_id")
    )


def _q_exact_dedup_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")


def _q_token_stats(spark, sf_dir):
    from set_sketch_paper_spark.operators.textstats import with_token_stats

    d = with_token_stats(_docs(spark, sf_dir), "text")
    return d.select(
        "doc_id",
        F.col("n_tokens").cast(LongType()).alias("n_tokens"),
        F.col("n_chars").cast(LongType()).alias("n_chars"),
        "avg_token_len_q", "punct_ratio_q", "digit_ratio_q",
    )


def _q_doc_quality(spark, sf_dir):
    from set_sketch_paper_spark.operators.textstats import with_quality_score

    return with_quality_score(_docs(spark, sf_dir), "text").select("doc_id", "quality_q")


def _q_lang_id(spark, sf_dir):
    from set_sketch_paper_spark.operators.textstats import with_lang_id

    return with_lang_id(_docs(spark, sf_dir), "text").select("doc_id", "pred_lang")


def _q_doc_repetition(spark, sf_dir):
    from set_sketch_paper_spark.operators.textstats import with_repetition_stats

    return with_repetition_stats(_docs(spark, sf_dir), "text").select(
        "doc_id",
        F.col("n_tokens").cast(LongType()).alias("n_tokens"),
        "dup_token_q", "top_token_q", "dup_bigram_q", "top_bigram_q",
    )


def _q_vocab_topk(spark, sf_dir):
    """Exact corpus top-50 tokens (n DESC, token ASC — total order, so the
    k-boundary is deterministic and oracle-hashable)."""
    from set_sketch_paper_spark.operators.freq import vocab_topk

    return vocab_topk(_docs(spark, sf_dir), k=50, text_col="text")


def _q_token_topk_mg(spark, sf_dir):
    """Misra-Gries frequent-items sketch top-50 with deterministic
    [count_min, count_max] error brackets.  Rows-only (pseudo-bounded
    sketch state); exactness at large capacity and the bracket/heavy-hitter
    guarantees are cross-gated vs the oracle-green vocab_topk twin in
    tests/test_cross_consistency.py."""
    from set_sketch_paper_spark.operators.freq import token_topk_mg

    return token_topk_mg(_docs(spark, sf_dir), k=50, capacity=4096, text_col="text")


def _q_doc_internal_repeats(spark, sf_dir):
    """Per-doc longest repeated substring + repeat-position count via the
    SA+LCP kernels (sketchlib/suffix.py).  Rows-only: a suffix array is not
    SQL-expressible at feasible cost; semantics pinned vs O(n^2) brute force
    in tests/test_suffix.py and vs a per-row python twin in
    tests/test_textstats.py."""
    from set_sketch_paper_spark.operators.textstats import with_internal_repeats

    return with_internal_repeats(_docs(spark, sf_dir), "text", min_len=20).select(
        "doc_id", "longest_repeat_len", "n_repeat_positions"
    )


def _q_doc_chunks(spark, sf_dir):
    from set_sketch_paper_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=24, overlap=8
    )


def _q_packed_sequences(spark, sf_dir):
    """Chunk the corpus, then pack chunks into 64-token training sequences
    in 8 deterministic doc-hash buckets (GPT-style concat-and-cut)."""
    from set_sketch_paper_spark.operators.chunking import chunk_documents, pack_chunks

    chunks = chunk_documents(_docs(spark, sf_dir), chunk_tokens=24, overlap=8)
    return pack_chunks(chunks, seq_tokens=64, n_buckets=8)


def _q_pii_redaction(spark, sf_dir):
    from set_sketch_paper_spark.operators.textstats import with_pii_redacted

    return with_pii_redacted(_docs(spark, sf_dir), "text").select(
        "doc_id", "n_email", "n_ipv4", "n_id_number", "redacted"
    )


def _q_decontaminate_docs(spark, sf_dir):
    """n-gram-overlap decontamination with a probe set GUARANTEED to overlap
    the corpus at any SF (ADVICE r4): the eval probes are the 24-token
    prefixes of every 25th doc — simulating an eval suite partially leaked
    into the training corpus — so the broadcast semi-join and per-doc hit
    counting always exercise the positive path (each probe-source doc flags
    itself, plus its exact/near duplicates)."""
    from set_sketch_paper_spark.operators.chunking import flag_contaminated

    docs = _docs(spark, sf_dir)
    probes = docs.filter(F.col("doc_id") % 25 == 0).select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 24), " ").alias("text"),
    )
    return flag_contaminated(docs, probes, k=5, text_col="text")


def _q_subtoken_count(spark, sf_dir):
    from set_sketch_paper_spark.operators.textstats import token_count_bpe_ish

    return token_count_bpe_ish(_docs(spark, sf_dir), "text").select(
        "doc_id", F.col("n_subtokens").cast(LongType()).alias("n_subtokens")
    )


def _q_doc_fingerprints(spark, sf_dir):
    from set_sketch_paper_spark.operators.textstats import with_fingerprint

    return with_fingerprint(_docs(spark, sf_dir), "text").select("doc_id", "fingerprint_md5")


def _q_ngram_jaccard_pairs(spark, sf_dir):
    from set_sketch_paper_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), k=3, threshold_num=1, threshold_den=2,
        id_col="doc_id", text_col="text",
    )


def _q_substring_block_pairs(spark, sf_dir):
    from set_sketch_paper_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), k=16, threshold_num=0, threshold_den=1,
        id_col="doc_id", text_col="text", min_shared=3,
    ).select("id1", "id2", "inter_count")


def _q_lcs_substring_pairs(spark, sf_dir):
    """Exact longest-common-substring pairs via char-16-gram diagonal
    islands (the distributed SA-LCP analog; sketchlib/suffix.py)."""
    from set_sketch_paper_spark.operators.dedup import lcs_substring_pairs

    return lcs_substring_pairs(
        _docs(spark, sf_dir), L=16, min_len=32, id_col="doc_id", text_col="text"
    )


def _q_dup_clusters_exact(spark, sf_dir):
    from set_sketch_paper_spark.operators.clustering import connected_components
    from set_sketch_paper_spark.operators.dedup import ngram_jaccard_pairs

    edges = ngram_jaccard_pairs(
        _docs(spark, sf_dir), k=3, threshold_num=1, threshold_den=2,
        id_col="doc_id", text_col="text",
    )
    return connected_components(edges).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )


def _q_canonical_docs(spark, sf_dir):
    """Canonical-representative selection — the training-data op that
    follows clustering: per near-dup cluster keep the highest-quality doc
    (ties broken by min doc_id); docs with no near-dup keep themselves.
    Composes ngram_jaccard_pairs -> connected_components -> quality score
    -> per-cluster window top-1, all oracle-checkable."""
    from pyspark.sql import Window

    from set_sketch_paper_spark.operators.clustering import connected_components
    from set_sketch_paper_spark.operators.dedup import ngram_jaccard_pairs
    from set_sketch_paper_spark.operators.textstats import with_quality_score

    docs = _docs(spark, sf_dir)
    edges = ngram_jaccard_pairs(
        docs, k=3, threshold_num=1, threshold_den=2, id_col="doc_id", text_col="text"
    )
    clusters = connected_components(edges).select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    q = with_quality_score(docs, "text").select("doc_id", "quality_q")
    assigned = q.join(clusters, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("doc_id"))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality_q"), F.asc("doc_id"))
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cluster_id", F.col("doc_id").alias("keep_id"), "quality_q")
    )


def _q_ann_topk(spark, sf_dir):
    from set_sketch_paper_spark.operators.similarity import cosine_topk_bruteforce

    emb = _tbl(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(
        emb, k=10, queries=emb.filter(F.col("vec_id") < 32)
    )


def _q_label_centroids(spark, sf_dir):
    from set_sketch_paper_spark.operators.similarity import label_centroids_quantized

    return label_centroids_quantized(_tbl(spark, sf_dir, "embeddings"))


def _q_embedding_near_dup_pairs(spark, sf_dir):
    from set_sketch_paper_spark.operators.similarity import cosine_near_dup_pairs

    return cosine_near_dup_pairs(_tbl(spark, sf_dir, "embeddings"), threshold_q=400_000)


def _q_embedding_near_dup_pairs_ann(spark, sf_dir):
    """Production-scale embedding near-dup: hyperplane-LSH candidates +
    the identical quantized scoring expression as the exact twin.  Rows-only
    (LSH bucketing isn't SQL-expressible); pair recall >= 0.95 vs the exact
    path is asserted in tests/test_similarity.py.

    The testdata threshold (cos 0.4 ~ 66 deg) is a deliberately hard LSH
    regime: per-table collision prob (1 - theta/pi)^n_bits is only 0.16 at
    n_bits=4, hence 24 tables (measured recall 0.98-1.0 at sf0.001/0.01).
    At production thresholds (cos >= 0.9) the same recall needs ~4 tables;
    n_bits scales with corpus density to keep buckets under bucket_cap."""
    from set_sketch_paper_spark.operators.similarity import cosine_near_dup_pairs_ann

    return cosine_near_dup_pairs_ann(
        _tbl(spark, sf_dir, "embeddings"), threshold_q=400_000,
        n_bits=4, n_tables=24,
    )


def _q_embedding_near_dup_clusters(spark, sf_dir):
    from set_sketch_paper_spark.operators.clustering import connected_components
    from set_sketch_paper_spark.operators.similarity import cosine_near_dup_pairs

    edges = cosine_near_dup_pairs(_tbl(spark, sf_dir, "embeddings"), threshold_q=400_000)
    return connected_components(edges).select(
        F.col("id").alias("vec_id"), "cluster_id"
    )


def _q_embedding_near_dup_clusters_ann(spark, sf_dir):
    """Production embedding near-dup CLUSTERS: ANN-bucketed pairs ->
    pointer-jumping connected components.  Rows-only (LSH candidates); the
    exact twin embedding_near_dup_clusters is the recursive-CTE-oracled
    counterpart."""
    from set_sketch_paper_spark.operators.clustering import connected_components
    from set_sketch_paper_spark.operators.similarity import cosine_near_dup_pairs_ann

    edges = cosine_near_dup_pairs_ann(
        _tbl(spark, sf_dir, "embeddings"), threshold_q=400_000,
        n_bits=4, n_tables=24,
    )
    return connected_components(edges).select(
        F.col("id").alias("vec_id"), "cluster_id"
    )


def _q_events_histogram(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.floor("value").cast(LongType()).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def _q_distinct_users_exact(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


def _q_moments_by_returnflag(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    q100 = F.round(F.col("l_quantity") * 100).cast(LongType())
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q100).alias("sum_qty_q"),
        F.sum(q100 * q100).alias("sum_qty_sq_q"),
        F.min(q100).alias("min_qty_q"),
        F.max(q100).alias("max_qty_q"),
    )


def _q_top_customers_by_spend(spark, sf_dir):
    orders = _tbl(spark, sf_dir, "orders")
    cust = _tbl(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast(LongType())
    spend = (
        orders.withColumn("cents", cents)
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("total_cents"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_cents")
    )
    # orderBy().limit(10) gives Catalyst a TakeOrderedAndProject plan (per-
    # partition top-10 + driver merge); a global row_number() window instead
    # sorts EVERY customer in one partition — the single-partition WindowExec
    # that flooded round 1's bench log with WARNs and dies at 100x.  Rank is
    # re-derived over just the 10 surviving rows as 1 + count of rows
    # strictly ahead (broadcast 10x10 join) — no unpartitioned window at all.
    top = spend.orderBy(F.desc("total_cents"), F.asc("c_custkey")).limit(10)
    ahead = top.select(
        F.col("total_cents").alias("_tc"), F.col("c_custkey").alias("_ck")
    )
    return (
        top.join(
            F.broadcast(ahead),
            (F.col("_tc") > F.col("total_cents"))
            | ((F.col("_tc") == F.col("total_cents")) & (F.col("_ck") < F.col("c_custkey"))),
            "left",
        )
        .groupBy("c_custkey", "c_name", "total_cents")
        .agg((F.count("_ck") + 1).cast(LongType()).alias("rank"))
        .select("c_custkey", "c_name", "total_cents", "rank")
    )


def _q_user_event_seq(spark, sf_dir):
    from pyspark.sql import Window

    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "user_id", "event_id", F.row_number().over(w).cast(LongType()).alias("seq")
    )


def _q_region_customer_counts(spark, sf_dir):
    region = _tbl(spark, sf_dir, "region")
    nation = _tbl(spark, sf_dir, "nation")
    cust = _tbl(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def _q_orders_by_month(spark, sf_dir):
    orders = _tbl(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast(LongType())
    return orders.groupBy(ym.alias("ym")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast(LongType())).alias("total_cents"),
    )


def _q_part_brand_stats(spark, sf_dir):
    part = _tbl(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast(LongType())
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("p_size").alias("sum_size"),
        F.max(cents).alias("max_retail_cents"),
    )


# -- sketch/rows-only queries (non-SQL-expressible pseudo-random state) -----

def _q_minhash_signatures(spark, sf_dir):
    from set_sketch_paper_spark.operators.signatures import with_minhash_signature

    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    return with_minhash_signature(docs, DOC_PCFG).select("doc_id", "n_shingles", "sig")


def _q_minhash_near_dup_pairs(spark, sf_dir):
    from set_sketch_paper_spark.operators.dedup import minhash_near_dup_pairs

    docs = _docs(spark, sf_dir)
    return minhash_near_dup_pairs(docs, DOC_PCFG, id_col="doc_id", content_col="text")


def _q_incremental_exact_dedup(spark, sf_dir):
    """New-batch-vs-snapshot exact dedup: even doc_ids play the prior
    snapshot, odd doc_ids the incoming batch.  Output = surviving new
    representatives (content unseen in the snapshot, min-id within batch)."""
    from set_sketch_paper_spark.operators.dedup import exact_dedup_against_snapshot

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return exact_dedup_against_snapshot(new, old, id_col="doc_id", content_col="text")


def _q_incremental_near_dup(spark, sf_dir):
    """New-batch-vs-snapshot near-dup pairs (same parity split): every pair
    involves at least one odd (new) id — never snapshot-vs-snapshot."""
    from set_sketch_paper_spark.operators.dedup import near_dup_against_snapshot

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return near_dup_against_snapshot(
        new, old, DOC_PCFG, id_col="doc_id", content_col="text"
    )


def _q_lsh_candidates(spark, sf_dir):
    from set_sketch_paper_spark.operators import lsh as lsh_ops
    from set_sketch_paper_spark.operators.signatures import with_minhash_signature

    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    signed = with_minhash_signature(docs, DOC_PCFG).select("doc_id", "sig", "bands")
    return lsh_ops.candidate_pairs(signed, DOC_PCFG.lsh, id_col="doc_id")


def _q_dup_clusters_minhash(spark, sf_dir):
    from set_sketch_paper_spark.plans.pipeline import NearDupPipeline

    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    result = NearDupPipeline(DOC_PCFG).run(docs, id_cols=("doc_id",))
    return result.clusters


def _q_ghll_distinct_users(spark, sf_dir):
    from set_sketch_paper_spark.operators.sketch_agg import sketch_distinct

    ev = _tbl(spark, sf_dir, "events").withColumn(
        "user_hash", F.xxhash64("user_id")
    )
    out = sketch_distinct(
        ev, ["event_type"], "user_hash", GHLLConfig(num_registers=1024, q=62)
    )
    return out.select("event_type", F.round("est_distinct").cast(LongType()).alias("est_users"))


def _q_setsketch_distinct_users(spark, sf_dir):
    """SetSketch1 as the distributed distinct-count aggregate
    (partition-bounded partial + element-wise-max merge + simple
    estimator).  Rows-only."""
    from set_sketch_paper_spark.operators.sketch_agg import sketch_distinct

    ev = _tbl(spark, sf_dir, "events").withColumn("user_hash", F.xxhash64("user_id"))
    out = sketch_distinct(
        ev, ["event_type"], "user_hash",
        SetSketchConfig(num_registers=1024, base=2.0, a=20.0, q=62),
    )
    return out.select("event_type", F.round("est_distinct").cast(LongType()).alias("est_users"))


def _q_setsketch_doc_cardinality(spark, sf_dir):
    from set_sketch_paper_spark.operators.signatures import with_register_sketch
    from set_sketch_paper_spark.functions.udfs import make_register_cardinality_udf

    cfg = SetSketchConfig(num_registers=256, base=2.0, a=20.0, q=62)
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    sk = with_register_sketch(docs, cfg, DOC_PCFG, out="registers")
    card = make_register_cardinality_udf(cfg)
    return sk.select("doc_id", F.round(card("registers")).cast(LongType()).alias("est_shingles"))


def _q_simhash_pairs(spark, sf_dir):
    from set_sketch_paper_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _docs(spark, sf_dir), DOC_PCFG, hamming_threshold=3, text_col="text"
    )


def _q_winnow_substring_pairs(spark, sf_dir):
    from set_sketch_paper_spark.operators.dedup import winnow_substring_pairs

    return winnow_substring_pairs(
        _docs(spark, sf_dir), ShingleConfig(k=8), window=4, min_shared=3
    )


def _q_ann_lsh_topk(spark, sf_dir):
    from set_sketch_paper_spark.operators.similarity import hyperplane_ann_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    return hyperplane_ann_topk(emb, k=5, n_bits=6, n_tables=6)


def _q_ann_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) ANN top-k — the cell-partitioned scale path next
    to hyperplane LSH; rows-only (recall + exhaustive-probe equivalence
    gated in tests/test_similarity.py and test_cross_consistency.py)."""
    from set_sketch_paper_spark.operators.similarity import ivf_ann_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb, k=5, n_cells=16, n_probe=8, queries=emb.filter(F.col("vec_id") < 32)
    )


def _q_minhash_est_cardinality(spark, sf_dir):
    """MinHash cardinality estimator (sketch.hpp:1383-1389) per document,
    rows-only (estimate, no exact SQL twin)."""
    from set_sketch_paper_spark.functions.udfs import make_minhash_cardinality_udf
    from set_sketch_paper_spark.operators.signatures import with_minhash_signature
    from set_sketch_paper_spark.config import MinHashConfig, PipelineConfig

    pcfg = PipelineConfig(
        shingle=DOC_PCFG.shingle,
        minhash=MinHashConfig(num_registers=128, algo="dense"),
        lsh=DOC_PCFG.lsh,
    )
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    signed = with_minhash_signature(docs, pcfg)
    card = make_minhash_cardinality_udf()
    return signed.select(
        "doc_id",
        "n_shingles",
        F.round(card("sig")).cast(LongType()).alias("est_shingles"),
    )


def _q_ghll_joint_pairs(spark, sf_dir):
    """The paper's joint ML estimator (sketch.hpp:484-522) end-to-end:
    LSH candidates -> GHLL register sketches -> vectorized 'new' joint
    estimates per pair.  Rows-only (pseudo-random register state)."""
    from set_sketch_paper_spark.functions.udfs import make_register_pair_estimator_udf
    from set_sketch_paper_spark.operators import lsh as lsh_ops
    from set_sketch_paper_spark.operators.signatures import (
        with_minhash_signature,
        with_register_sketch,
    )

    cfg = GHLLConfig(num_registers=256, base=2.0, q=62)
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    signed = with_minhash_signature(docs, DOC_PCFG).select("doc_id", "content", "bands")
    cands = lsh_ops.candidate_pairs(signed, DOC_PCFG.lsh, id_col="doc_id")
    regs = with_register_sketch(docs, cfg, DOC_PCFG, out="registers").select(
        F.col("doc_id").alias("_rid"), "registers"
    )
    est_udf = make_register_pair_estimator_udf(cfg, method="new")
    joined = (
        cands.join(regs.withColumnRenamed("_rid", "id1").withColumnRenamed("registers", "r1"), "id1")
        .join(regs.withColumnRenamed("_rid", "id2").withColumnRenamed("registers", "r2"), "id2")
    )
    return joined.select(
        "id1", "id2", est_udf(F.col("r1"), F.col("r2")).alias("est")
    ).select(
        "id1",
        "id2",
        F.col("est.est_jaccard").alias("est_jaccard"),
        F.col("est.est_intersection").alias("est_intersection"),
        F.col("est.est_union").alias("est_union"),
    )


def _q_ghll_jaccard_bounds(spark, sf_dir):
    """Closed-form Jaccard lower/upper bounds from the equal-register
    fraction (sketch.hpp:701-719) over LSH candidate pairs — the paper's
    collision-based bound estimators end-to-end.  Rows-only."""
    from set_sketch_paper_spark.functions.udfs import make_register_bounds_udf
    from set_sketch_paper_spark.operators import lsh as lsh_ops
    from set_sketch_paper_spark.operators.signatures import (
        with_minhash_signature,
        with_register_sketch,
    )

    cfg = GHLLConfig(num_registers=256, base=2.0, q=62)
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    signed = with_minhash_signature(docs, DOC_PCFG).select("doc_id", "content", "bands")
    cands = lsh_ops.candidate_pairs(signed, DOC_PCFG.lsh, id_col="doc_id")
    regs = with_register_sketch(docs, cfg, DOC_PCFG, out="registers").select(
        F.col("doc_id").alias("_rid"), "registers"
    )
    bounds = make_register_bounds_udf(cfg)
    joined = (
        cands.join(regs.withColumnRenamed("_rid", "id1").withColumnRenamed("registers", "r1"), "id1")
        .join(regs.withColumnRenamed("_rid", "id2").withColumnRenamed("registers", "r2"), "id2")
    )
    return joined.select(
        "id1", "id2", bounds(F.col("r1"), F.col("r2")).alias("b")
    ).select(
        "id1", "id2",
        F.col("b.jaccard_lower").alias("jaccard_lower"),
        F.col("b.jaccard_upper").alias("jaccard_upper"),
    )


def _q_ghll_joint_refine(spark, sf_dir):
    """SURVEY §7.3's composed decision path end-to-end: LSH candidates ->
    GHLL sketches -> vectorized equal-register bounds decide conclusive
    pairs, ML solve ONLY on the straddling band (sketch.hpp:701-719 then
    484-522).  ``passed`` is the >= threshold decision; ``solved`` marks the
    pairs that actually paid for a solver call.  Rows-only."""
    from set_sketch_paper_spark.functions.udfs import make_register_pair_estimator_udf
    from set_sketch_paper_spark.operators import lsh as lsh_ops
    from set_sketch_paper_spark.operators.signatures import (
        with_minhash_signature,
        with_register_sketch,
    )

    cfg = GHLLConfig(num_registers=256, base=2.0, q=62)
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    signed = with_minhash_signature(docs, DOC_PCFG).select("doc_id", "content", "bands")
    cands = lsh_ops.candidate_pairs(signed, DOC_PCFG.lsh, id_col="doc_id")
    regs = with_register_sketch(docs, cfg, DOC_PCFG, out="registers").select(
        F.col("doc_id").alias("_rid"), "registers"
    )
    est_udf = make_register_pair_estimator_udf(cfg, method="new", threshold=0.5)
    joined = (
        cands.join(regs.withColumnRenamed("_rid", "id1").withColumnRenamed("registers", "r1"), "id1")
        .join(regs.withColumnRenamed("_rid", "id2").withColumnRenamed("registers", "r2"), "id2")
    )
    return joined.select(
        "id1", "id2", est_udf(F.col("r1"), F.col("r2")).alias("e")
    ).select(
        "id1",
        "id2",
        F.col("e.est_jaccard").alias("est_jaccard"),
        F.col("e.jaccard_lower").alias("jaccard_lower"),
        F.col("e.jaccard_upper").alias("jaccard_upper"),
        F.col("e.passed").alias("passed"),
        F.col("e.solved").alias("solved"),
    )


def _q_hmh_doc_cardinality(spark, sf_dir):
    """HyperMinHash shingle-set cardinality per document (sketch.hpp:
    1873-1960 sketch, 1823-1845 'new' estimator), rows-only."""
    from set_sketch_paper_spark.config import HyperMinHashConfig
    from set_sketch_paper_spark.functions.udfs import (
        make_hyperminhash_cardinality_udf,
        make_hyperminhash_sketch_udf,
    )

    cfg = HyperMinHashConfig(bucketbits=8, bucketsize=6, subbucketsize=10)
    docs = _docs(spark, sf_dir)
    sk_udf = make_hyperminhash_sketch_udf(cfg, DOC_PCFG.shingle)
    card = make_hyperminhash_cardinality_udf(cfg)
    sk = docs.select("doc_id", sk_udf(F.col("text")).alias("registers"))
    return sk.select(
        "doc_id", F.round(card("registers")).cast(LongType()).alias("est_shingles")
    )


def _q_kmv_error_mc(spark, sf_dir):
    """Distributed Monte-Carlo KMV bottom-k bias/RMSE harness (same protocol
    as cardinality_error_mc; rows-only — the unbiasedness + RSE theory and
    the exact-below-k regime are asserted in tests/test_mc_bench.py)."""
    from set_sketch_paper_spark.operators.mc_bench import kmv_error_mc

    return kmv_error_mc(spark, cardinalities=(100, 1000, 10_000),
                        num_examples=100, k=256)


def _q_cardinality_error_mc(spark, sf_dir):
    """Distributed Monte-Carlo GHLL cardinality bias/RMSE harness
    (cardinality_test.cpp restated; rows-only — accuracy is asserted
    against closed-form theory in tests/test_mc_bench.py)."""
    from set_sketch_paper_spark.operators.mc_bench import (
        GHLL_CSV_CARDINALITIES,
        cardinality_error_mc,
    )

    df = cardinality_error_mc(
        spark, cardinalities=GHLL_CSV_CARDINALITIES, num_examples=100
    )
    return df.select(
        "cardinality", "n_examples",
        F.round(F.col("rel_rmse") * 1_000_000).cast(LongType()).alias("rel_rmse_q"),
    )


def _q_joint_error_mc(spark, sf_dir):
    """Distributed Monte-Carlo MinHash Jaccard RMSE harness
    (joint_estimation_test.cpp restated; rows-only)."""
    from set_sketch_paper_spark.operators.mc_bench import (
        MINHASH_CSV_TUPLES,
        joint_error_mc,
    )

    df = joint_error_mc(spark, tuples=MINHASH_CSV_TUPLES, num_examples=100, m=4096)
    return df.select(
        "inter", "d1", "d2", "n_examples",
        F.round(F.col("rmse") * 1_000_000).cast(LongType()).alias("rmse_q"),
    )


def _q_training_pipeline_clusters(spark, sf_dir):
    """The full training-data dedup flow as ONE composite query: quality
    filter -> exact-dup short-circuit -> MinHash-OPH LSH near-dup ->
    connected components.  Rows-only (sketch state inside); each stage is
    individually oracle- or statistically-gated elsewhere."""
    from set_sketch_paper_spark.operators.textstats import with_quality_score
    from set_sketch_paper_spark.plans.pipeline import NearDupPipeline

    docs = with_quality_score(_docs(spark, sf_dir), "text")
    kept = docs.filter(F.col("quality_q") >= 600_000).withColumnRenamed("text", "content")
    result = NearDupPipeline(DOC_PCFG).run(kept, id_cols=("doc_id",))
    return result.clusters


def _q_user_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): the standard event-log
    operator a training-data pipeline needs for behavioral corpora.  Fully
    relational (two windows + hash agg), oracle-exact."""
    from pyspark.sql import Window

    # epoch seconds via date arithmetic: TIMESTAMP_NTZ has no direct long
    # cast and unix_timestamp() would apply the session timezone — this
    # expression is timezone-independent and matches DuckDB's epoch() on
    # naive timestamps (both truncate sub-second parts).  Ordering on the
    # truncated seconds + event_id in BOTH engines keeps ties identical.
    ts_s_expr = (
        F.unix_date(F.to_date("ts")) * 86400
        + F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    ).cast(LongType())
    ev = _tbl(spark, sf_dir, "events").withColumn("ts_s", ts_s_expr)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_s"), F.asc("event_id"))
    gap = F.col("ts_s") - F.lag("ts_s").over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("session_id", F.sum(new_sess).over(w).cast(LongType()))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_s").alias("start_epoch"),
        F.max("ts_s").alias("end_epoch"),
    )


def _q_quality_filtered_dedup(spark, sf_dir):
    """Composite training-data pipeline stage: quality filter -> exact dedup
    (keep min doc_id per surviving identical text).  Oracle-exact."""
    from set_sketch_paper_spark.operators.textstats import with_quality_score

    scored = with_quality_score(_docs(spark, sf_dir), "text")
    kept = scored.filter(F.col("quality_q") >= 600_000)
    return kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min("quality_q").alias("quality_q")
    ).select("doc_id", "quality_q")


def _q_training_corpus_build(spark, sf_dir):
    """End-to-end training-corpus build, fully oracle-backed: quality
    filter -> exact dedup -> eval-set decontamination -> token-window
    chunking -> fixed-token sequence packing.  Every stage is the
    production operator; the DuckDB oracle chains the same CTEs, so the
    whole pipeline's output hash-matches exactly."""
    from set_sketch_paper_spark.operators.chunking import (
        chunk_documents, flag_contaminated, pack_chunks,
    )
    from set_sketch_paper_spark.operators.textstats import with_quality_score

    docs = _docs(spark, sf_dir)
    # eval probes = 24-token prefixes of every 25th doc (leaked-eval
    # simulation; guarantees the decontamination stage actually removes
    # rows at every SF — ADVICE r4)
    probes = docs.filter(F.col("doc_id") % 25 == 0).select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 24), " ").alias("text"),
    )
    kept = with_quality_score(docs, "text").filter(F.col("quality_q") >= 600_000)
    # checkpointed: consumed twice (decontamination gram stream + the
    # anti-join), which otherwise plans and runs the whole quality-filter +
    # dedup subtree in both branches (cold 8.0s -> 4.1s at sf1.0 scale for
    # ~0.25s of warm materialization)
    deduped = (
        kept.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    flagged = flag_contaminated(deduped, probes, k=5).select("doc_id")
    clean = deduped.join(flagged, "doc_id", "left_anti")
    chunks = chunk_documents(clean, chunk_tokens=24, overlap=8)
    return pack_chunks(chunks, seq_tokens=64, n_buckets=8)


def _q_supplier_nation_acctbal(spark, sf_dir):
    sup = _tbl(spark, sf_dir, "supplier")
    nation = _tbl(spark, sf_dir, "nation")
    cents = F.round(F.col("s_acctbal") * 100).cast(LongType())
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"), F.sum(cents).alias("acctbal_cents"))
    )


def _q_bbit_signatures(spark, sf_dir):
    """b-bit MinHash compaction (Li & Koenig): low 8 bits of each dense
    register as a binary column — the band-material shrink for bandwidth-
    bound LSH at scale.  Rows-only (register state)."""
    from set_sketch_paper_spark.functions.udfs import make_bbit_compaction_udf
    from set_sketch_paper_spark.operators.signatures import with_minhash_signature

    pcfg = PipelineConfig(
        shingle=DOC_PCFG.shingle,
        minhash=MinHashConfig(num_registers=128, algo="dense"),
        lsh=DOC_PCFG.lsh,
    )
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    signed = with_minhash_signature(docs, pcfg)
    bbit = make_bbit_compaction_udf(bits=8)
    return signed.select("doc_id", bbit(F.col("sig")).alias("bbit_sig"))


def _q_hmh_joint_pairs(spark, sf_dir):
    """HyperMinHash ORIGINAL joint estimator with collision correction
    (sketch.hpp:1785-1821) over LSH candidate pairs.  Rows-only."""
    from set_sketch_paper_spark.config import HyperMinHashConfig
    from set_sketch_paper_spark.functions.udfs import (
        make_hyperminhash_pair_estimator_udf,
        make_hyperminhash_sketch_udf,
    )
    from set_sketch_paper_spark.operators import lsh as lsh_ops
    from set_sketch_paper_spark.operators.signatures import with_minhash_signature

    cfg = HyperMinHashConfig(bucketbits=8, bucketsize=6, subbucketsize=10)
    docs = _docs(spark, sf_dir).withColumnRenamed("text", "content")
    signed = with_minhash_signature(docs, DOC_PCFG).select("doc_id", "content", "bands")
    cands = lsh_ops.candidate_pairs(signed, DOC_PCFG.lsh, id_col="doc_id")
    sk_udf = make_hyperminhash_sketch_udf(cfg, DOC_PCFG.shingle)
    regs = docs.select(F.col("doc_id").alias("_rid"), sk_udf(F.col("content")).alias("registers"))
    est_udf = make_hyperminhash_pair_estimator_udf(cfg, method="original")
    joined = (
        cands.join(regs.withColumnRenamed("_rid", "id1").withColumnRenamed("registers", "r1"), "id1")
        .join(regs.withColumnRenamed("_rid", "id2").withColumnRenamed("registers", "r2"), "id2")
    )
    return joined.select(
        "id1", "id2", est_udf(F.col("r1"), F.col("r2")).alias("est")
    ).select(
        "id1", "id2",
        F.col("est.est_jaccard").alias("est_jaccard"),
        F.col("est.est_intersection").alias("est_intersection"),
    )


def _q_multimodal_features(spark, sf_dir):
    from set_sketch_paper_spark.operators.multimodal import (
        extract_image_features,
        synthetic_assets,
    )

    assets = synthetic_assets(spark, 200, seed=7, codec="encoded")
    return extract_image_features(
        assets.filter(F.col("kind") != "audio"), decode_backend="auto"
    )


def _q_audio_features(spark, sf_dir):
    """Genuine RIFF PCM WAV payloads -> pure-numpy chunk-walking decode ->
    rms / zero-crossing rate / spectral centroid / band energies
    (np.fft.rfft).  Rows-only (DuckDB cannot decode WAV); the feature math
    is cross-checked against a local numpy oracle in tests/test_multimodal.py."""
    from set_sketch_paper_spark.operators.multimodal import (
        extract_audio_features,
        synthetic_assets,
    )

    assets = synthetic_assets(spark, 200, seed=7, codec="encoded")
    return extract_audio_features(assets, decode_backend="auto")


def _q_docs_hash_sample(spark, sf_dir):
    """Deterministic 25% corpus sample keyed on doc_id (md5-threshold
    membership — reproducible across engines/layouts, unlike df.sample).
    Oracle-exact: DuckDB computes the identical md5 predicate."""
    from set_sketch_paper_spark.operators.sampling import hash_sample

    docs = _docs(spark, sf_dir)
    return hash_sample(docs, 0.25, ["doc_id"], salt="s42").select("doc_id")


def _q_docs_stratified_sample(spark, sf_dir):
    """Per-language deterministic rebalancing (downsample en to 20%, de to
    60%, keep the rest whole) as one narrow CASE-threshold filter."""
    from set_sketch_paper_spark.operators.sampling import stratified_hash_sample

    docs = _docs(spark, sf_dir)
    return stratified_hash_sample(
        docs, "lang", {"en": 0.2, "de": 0.6}, default_rate=1.0,
        key_cols=["doc_id"], salt="s7",
    ).select("doc_id", "lang")


def _q_docs_split_counts(spark, sf_dir):
    """80/10/10 train/val/test assignment by disjoint md5 hash bands keyed
    on doc_id (split membership is permanent and engine-reproducible — no
    test-set leakage across re-runs), aggregated to per-split doc counts."""
    from set_sketch_paper_spark.operators.sampling import hash_split

    docs = _docs(spark, sf_dir)
    return (
        hash_split(docs, (0.8, 0.1, 0.1), ["doc_id"], salt="sp1")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_video_frame_stats(spark, sf_dir):
    """Genuine concatenated-PGM video streams -> per-sampled-frame decoded
    pixel stats (stride 4).  Rows-only; Spark-vs-numpy parity pinned in
    tests/test_multimodal.py."""
    from set_sketch_paper_spark.operators.multimodal import (
        sample_video_frames_decoded,
        synthetic_assets,
    )

    assets = synthetic_assets(spark, 200, seed=7, codec="encoded")
    return sample_video_frames_decoded(assets, every_nth=4)


def _q_multimodal_resize(spark, sf_dir):
    """Genuinely-encoded PGM/PPM/BMP payloads -> pure-numpy decode ->
    nearest-neighbor resample -> raw-buffer re-encode.  Rows-only."""
    from set_sketch_paper_spark.operators.multimodal import (
        resize_images,
        synthetic_assets,
    )

    return resize_images(
        synthetic_assets(spark, 200, seed=7, codec="encoded").filter(
            F.col("kind") != "audio"
        ),
        8, 8, decode_backend="auto",
    )


_KMV_DOC_K = 32
_KMV_USERS_K = 256


def _doc_gram_sketches(spark, sf_dir, k: int):
    """Per-doc KMV over SPACE-joined token 3-grams (map-only, zero shuffle).
    Space-joined grams (not the hashed sep='' variant the exact-jaccard path
    shuffles on) so DuckDB md5s the byte-identical gram strings."""
    from set_sketch_paper_spark.operators.dedup import token_kgram_array
    from set_sketch_paper_spark.operators.kmv import kmv_from_array

    docs = _docs(spark, sf_dir)
    grams = docs.select(
        "doc_id",
        token_kgram_array(F.split(F.col("text"), " "), 3, sep=" ").alias("grams"),
    )
    return grams.select(
        "doc_id",
        F.size("grams").cast(LongType()).alias("n_grams"),
        kmv_from_array(F.col("grams"), k).alias("ks"),
    )


def _q_kmv_doc_cardinality(spark, sf_dir):
    """Per-document distinct-3-gram KMV estimate next to the exact count.
    The first sketch query with full value-hash oracle coverage: the md5
    bottom-k state is a pure function of the gram set, so DuckDB recomputes
    sketch, k-th order statistic, and quantized estimate bit-identically
    (operators/kmv.py module doc; reference cardinality surface:
    sketch.hpp estimators / performance_test)."""
    from set_sketch_paper_spark.operators.kmv import with_kmv_estimate

    sk = _doc_gram_sketches(spark, sf_dir, _KMV_DOC_K)
    return with_kmv_estimate(sk, _KMV_DOC_K).drop("ks")


def _q_kmv_jaccard_pairs(spark, sf_dir):
    """Bottom-k-union Jaccard estimates (Beyer et al. 2007 §5) on the exact
    >=0.5 n-gram pair set, exact jaccard_q alongside — estimator-vs-truth in
    one oracle-checked result.  Sketches are map-side; the only shuffles are
    the two id equi-joins attaching them to the pair set."""
    from set_sketch_paper_spark.operators.dedup import ngram_jaccard_pairs
    from set_sketch_paper_spark.operators.kmv import kmv_jaccard_cols

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, k=3, threshold_num=1, threshold_den=2,
        id_col="doc_id", text_col="text",
    ).select("id1", "id2", "jaccard_q")
    sk = _doc_gram_sketches(spark, sf_dir, _KMV_DOC_K).select("doc_id", "ks")
    j = (
        pairs.join(
            sk.withColumnRenamed("doc_id", "id1").withColumnRenamed("ks", "ks1"),
            "id1",
        ).join(
            sk.withColumnRenamed("doc_id", "id2").withColumnRenamed("ks", "ks2"),
            "id2",
        )
    )
    m, u, jq = kmv_jaccard_cols(F.col("ks1"), F.col("ks2"), _KMV_DOC_K)
    return j.select(
        "id1", "id2", "jaccard_q",
        m.alias("matches"), u.alias("union_k"), jq.alias("jacc_est_q"),
    )


def _q_kmv_setops_pairs(spark, sf_dir):
    """Theta-style set algebra from KMV sketches on the exact >=0.5 n-gram
    pair set: estimated |A∪B| / |A∩B| / |A\\B| next to the exact
    inter/union counts — the §2.6 intersection/difference algebra with a
    state the SQL oracle recomputes (operators/kmv.py::kmv_setops_cols)."""
    from set_sketch_paper_spark.operators.dedup import ngram_jaccard_pairs
    from set_sketch_paper_spark.operators.kmv import kmv_setops_cols

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, k=3, threshold_num=1, threshold_den=2,
        id_col="doc_id", text_col="text",
    ).select("id1", "id2", "inter_count", "union_count")
    sk = _doc_gram_sketches(spark, sf_dir, _KMV_DOC_K).select("doc_id", "ks")
    j = (
        pairs.join(
            sk.withColumnRenamed("doc_id", "id1").withColumnRenamed("ks", "ks1"),
            "id1",
        ).join(
            sk.withColumnRenamed("doc_id", "id2").withColumnRenamed("ks", "ks2"),
            "id2",
        )
    )
    uq, iq, aq = kmv_setops_cols(F.col("ks1"), F.col("ks2"), _KMV_DOC_K)
    return j.select(
        "id1", "id2", "inter_count", "union_count",
        uq.alias("union_est_q"), iq.alias("inter_est_q"), aq.alias("anotb_est_q"),
    )


def _q_calibrated_quality_filter(spark, sf_dir):
    """Data-driven quality filtering: keep docs at or above their language's
    p25 quality score.  The per-stratum threshold table is tiny (one row per
    lang) and broadcast — the corpus-side plan is scan -> broadcast-join ->
    filter, no corpus shuffle beyond the histogram that computed the
    thresholds.  This is the production form of a quality gate (a fixed
    global constant under- or over-filters low-resource languages)."""
    from set_sketch_paper_spark.operators.textstats import (
        score_quantiles,
        with_quality_score,
    )

    docs = _docs(spark, sf_dir)
    scored = with_quality_score(docs, "text").select("doc_id", "lang", "quality_q")
    thr = score_quantiles(
        scored, "quality_q", "lang", probs=((25, 1, 4),)
    ).select("lang", "p25_q")
    return (
        scored.join(F.broadcast(thr), "lang")
        .filter(F.col("quality_q") >= F.col("p25_q"))
        .select("doc_id", "lang", "quality_q", "p25_q")
    )


def _q_corpus_health_by_source(spark, sf_dir):
    """Per-source corpus-health rollup — the dashboard query a curation team
    runs before ingesting a crawl: doc count, exact unique-text count (on
    md5, so text bytes never shuffle), exact quality/token sums, and a KMV
    estimate of the source's distinct 3-gram vocabulary.  ONE scan ([text,
    source] pruned); Catalyst plans the exact countDistinct alongside the
    other aggregates as the standard two-phase shape (partial on
    (source, md5) -> regroup on source — 2 exchanges; swapping the exact
    count for a second KMV state would make it single-exchange where
    exactness is negotiable).  The vocabulary estimate exercises the KMV
    merge algebra at a second level — per-doc bottom-k sketches merge to
    the per-source sketch exactly (bottom-k(∪ bottom-k(S_i)) ==
    bottom-k(∪ S_i)), and the DuckDB twin recomputes it from raw grams
    instead, so the oracle also PROVES the two-level merge."""
    from set_sketch_paper_spark.operators.dedup import token_kgram_array
    from set_sketch_paper_spark.operators.kmv import (
        kmv_from_array,
        kmv_merge_col,
        with_kmv_estimate,
    )
    from set_sketch_paper_spark.operators.textstats import with_quality_score

    docs = _docs(spark, sf_dir)
    scored = with_quality_score(docs, "text").withColumn(
        "ks",
        kmv_from_array(
            token_kgram_array(F.split(F.col("text"), " "), 3, sep=" "),
            _KMV_DOC_K,
        ),
    )
    agg = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
        F.sum("quality_q").alias("sum_quality_q"),
        F.sum("n_tokens").cast(LongType()).alias("sum_tokens"),
        kmv_merge_col(F.collect_list("ks"), _KMV_DOC_K).alias("ks"),
    )
    return with_kmv_estimate(agg, _KMV_DOC_K).drop("ks")


def _q_quality_quantiles(spark, sf_dir):
    """Per-language exact discrete quantiles of the quality score — the
    calibration step before applying a quality filter at corpus scale.
    Histogram-then-window shape: the window runs over the collapsed
    (lang, score) histogram, never over raw rows (textstats.score_quantiles);
    percentile_disc restated in pure integer math for oracle parity."""
    from set_sketch_paper_spark.operators.textstats import (
        score_quantiles,
        with_quality_score,
    )

    docs = _docs(spark, sf_dir)
    scored = with_quality_score(docs, "text").select("lang", "quality_q")
    return score_quantiles(scored, "quality_q", "lang")


def _q_kmv_distinct_users(spark, sf_dir):
    """Per-event-type distinct-user KMV through the partition-bounded
    partial+final aggregate (kmv_distinct: elements never shuffle, only
    <=k-element partials do) — same two-level shape as sketch_agg, but with
    an oracle-checkable md5 state instead of rows-only register state."""
    from set_sketch_paper_spark.operators.kmv import kmv_distinct, with_kmv_estimate

    ev = _tbl(spark, sf_dir, "events")
    sk = kmv_distinct(ev, "event_type", "user_id", k=_KMV_USERS_K)
    return with_kmv_estimate(sk, _KMV_USERS_K).drop("ks")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordering contract (VERDICT r4 #1): the driver records correctness for
    only the FIRST 50 dict entries, so all 45 oracle-backed queries come
    first, then 5 rows-only queries ROTATED each round (VERDICT r5 #4) so
    every rows-only query regains a driver rows-record on a ~5-round
    cadence.  Entries past position 50 are rows-only queries whose accuracy
    is pinned in tests/ (MC error grids, multimodal codecs, recall-gated
    ANN, cross-gated sketch twins)."""
    return {
        # --- oracle-backed (45): driver checks rows+schema+value-hash ---
        "exact_dup_groups": _q_exact_dup_groups,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "token_stats": _q_token_stats,
        "doc_repetition": _q_doc_repetition,
        "doc_chunks": _q_doc_chunks,
        "packed_sequences": _q_packed_sequences,
        "pii_redaction": _q_pii_redaction,
        "decontaminate_docs": _q_decontaminate_docs,
        "doc_quality": _q_doc_quality,
        "lang_id": _q_lang_id,
        "subtoken_count": _q_subtoken_count,
        "doc_fingerprints": _q_doc_fingerprints,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "substring_block_pairs": _q_substring_block_pairs,
        "lcs_substring_pairs": _q_lcs_substring_pairs,
        "dup_clusters_exact": _q_dup_clusters_exact,
        "canonical_docs": _q_canonical_docs,
        "ann_topk": _q_ann_topk,
        "label_centroids": _q_label_centroids,
        "embedding_near_dup_pairs": _q_embedding_near_dup_pairs,
        "embedding_near_dup_clusters": _q_embedding_near_dup_clusters,
        "events_histogram": _q_events_histogram,
        "distinct_users_exact": _q_distinct_users_exact,
        "moments_by_returnflag": _q_moments_by_returnflag,
        "top_customers_by_spend": _q_top_customers_by_spend,
        "user_event_seq": _q_user_event_seq,
        "region_customer_counts": _q_region_customer_counts,
        "orders_by_month": _q_orders_by_month,
        "part_brand_stats": _q_part_brand_stats,
        "user_sessions": _q_user_sessions,
        "quality_filtered_dedup": _q_quality_filtered_dedup,
        "training_corpus_build": _q_training_corpus_build,
        "supplier_nation_acctbal": _q_supplier_nation_acctbal,
        "incremental_exact_dedup": _q_incremental_exact_dedup,
        "docs_hash_sample": _q_docs_hash_sample,
        "docs_stratified_sample": _q_docs_stratified_sample,
        "docs_split_counts": _q_docs_split_counts,
        "vocab_topk": _q_vocab_topk,
        "kmv_doc_cardinality": _q_kmv_doc_cardinality,
        "kmv_jaccard_pairs": _q_kmv_jaccard_pairs,
        "kmv_distinct_users": _q_kmv_distinct_users,
        "kmv_setops_pairs": _q_kmv_setops_pairs,
        "quality_quantiles": _q_quality_quantiles,
        "calibrated_quality_filter": _q_calibrated_quality_filter,
        "corpus_health_by_source": _q_corpus_health_by_source,
        # --- rows-only, inside the 50-window (5): rotated each round
        # (VERDICT r5 #4) so every rows-only query regains a driver
        # rows-record on a ~5-round cadence.  r6 slots: the five whose last
        # driver record was r3/r4; the r5 occupants (minhash_signatures,
        # minhash_near_dup_pairs, incremental_near_dup, lsh_candidates,
        # dup_clusters_minhash) move just past the window, their accuracy
        # still cross-gated to oracle-green twins in tests/ ---
        "ghll_distinct_users": _q_ghll_distinct_users,
        "setsketch_doc_cardinality": _q_setsketch_doc_cardinality,
        "hmh_doc_cardinality": _q_hmh_doc_cardinality,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "token_topk_mg": _q_token_topk_mg,
        # --- rows-only, past the 50-window: pytest-pinned accuracy ---
        # (minhash signatures bit-equal-gated vs the numpy oracle,
        # candidates coverage-gated, clusters agreement-gated, simhash
        # unit-gated vs its naive twin, winnow shares its
        # substring_block_pairs, the ANN queries are recall-gated vs their
        # oracle-green exact twins — all pinned in tests/; oracle-backed
        # entries take the leading window slots)
        "minhash_signatures": _q_minhash_signatures,
        "minhash_near_dup_pairs": _q_minhash_near_dup_pairs,
        "incremental_near_dup": _q_incremental_near_dup,
        "lsh_candidates": _q_lsh_candidates,
        "dup_clusters_minhash": _q_dup_clusters_minhash,
        "simhash_pairs": _q_simhash_pairs,
        "winnow_substring_pairs": _q_winnow_substring_pairs,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "embedding_near_dup_pairs_ann": _q_embedding_near_dup_pairs_ann,
        "embedding_near_dup_clusters_ann": _q_embedding_near_dup_clusters_ann,
        "setsketch_distinct_users": _q_setsketch_distinct_users,
        "minhash_est_cardinality": _q_minhash_est_cardinality,
        "ghll_joint_pairs": _q_ghll_joint_pairs,
        "ghll_jaccard_bounds": _q_ghll_jaccard_bounds,
        "ghll_joint_refine": _q_ghll_joint_refine,
        "cardinality_error_mc": _q_cardinality_error_mc,
        "kmv_error_mc": _q_kmv_error_mc,
        "joint_error_mc": _q_joint_error_mc,
        "multimodal_features": _q_multimodal_features,
        "multimodal_resize": _q_multimodal_resize,
        "audio_features": _q_audio_features,
        "video_frame_stats": _q_video_frame_stats,
        "doc_internal_repeats": _q_doc_internal_repeats,
        "bbit_signatures": _q_bbit_signatures,
        "hmh_joint_pairs": _q_hmh_joint_pairs,
        "training_pipeline_clusters": _q_training_pipeline_clusters,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect, ANSI where possible)
# ---------------------------------------------------------------------------

_TOKEN_STATS_CTE = """
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
  FROM documents
), s AS (
  SELECT doc_id, n_tokens, n_chars,
         CAST(floor((2000000 * (n_chars - (n_tokens - 1)) + n_tokens) / (2 * n_tokens)) AS BIGINT) AS avg_token_len_q,
         CAST(floor((2000000 * n_punct + n_chars) / (2 * n_chars)) AS BIGINT) AS punct_ratio_q,
         CAST(floor((2000000 * n_digit + n_chars) / (2 * n_chars)) AS BIGINT) AS digit_ratio_q
  FROM t
)
"""

# Shared chunk/pack/gram SQL fragments — doc_chunks, packed_sequences,
# decontaminate_docs and training_corpus_build chain the SAME strings, so a
# parameter change cannot desynchronize the end-to-end oracle from its
# per-stage twins.  Parameters are fixed: chunk 24 tokens / overlap 8
# (stride 16), pack 64 tokens / 8 buckets, gram k=5.

# requires {src}(doc_id, toks); emits u(doc_id, toks, n, s)
_CHUNK_U_CTE = """
 u AS (
   SELECT doc_id, toks, len(toks) AS n,
          CAST(unnest(list_filter(range(0, len(toks), 16),
               s -> s = 0 OR s < len(toks) - 8)) AS BIGINT) AS s
   FROM {src}
 )"""

_CHUNK_ROWS_SELECT = """
 SELECT doc_id, CAST(s // 16 AS BIGINT) AS chunk_idx,
        array_to_string(toks[s+1 : s+24], ' ') AS chunk_text,
        CAST(least(n - s, 24) AS BIGINT) AS n_chunk_tokens
 FROM u"""

_PACK_CTES = """
 c AS (
   SELECT doc_id, CAST(s // 16 AS BIGINT) AS chunk_idx,
          CAST(least(n - s, 24) AS BIGINT) AS n_chunk_tokens
   FROM u
 ), p AS (
   SELECT CAST(doc_id % 8 AS BIGINT) AS bucket, doc_id, chunk_idx,
          n_chunk_tokens,
          CAST(coalesce(sum(n_chunk_tokens) OVER (
            PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS offset_tokens
   FROM c
 )"""

_PACK_SELECT = """
 SELECT bucket, CAST(offset_tokens // 64 AS BIGINT) AS seq_idx,
        doc_id, chunk_idx, n_chunk_tokens, offset_tokens
 FROM p"""


def _gram_select(src: str) -> str:
    """Distinct 5-gram stream (doc_id, gram) over src(doc_id, text) —
    mirrors chunking._gram_stream (sep=' ')."""
    return f"""
   SELECT doc_id,
          unnest(list_distinct(CASE WHEN len(toks) >= 5 THEN
            list_transform(range(1, len(toks) - 3),
                           i -> array_to_string(toks[i : i+4], ' '))
          ELSE [array_to_string(toks, ' ')] END)) AS gram
   FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {src})"""


# quality_q over named integer ratio columns; mirrors
# textstats.with_quality_score (shared by doc_quality + training_corpus_build)
_QUALITY_Q_SQL = """CAST(floor((
    (CASE WHEN n_tokens >= 20 THEN 1000000 ELSE n_tokens * 50000 END)
    + greatest(0, 1000000 - {punct} * 4)
    + greatest(0, 1000000 - {digit} * 4)
  ) / 3) AS BIGINT)"""

_PUNCT_Q_SQL = "CAST(floor((2000000 * n_punct + n_chars) / (2 * n_chars)) AS BIGINT)"
_DIGIT_Q_SQL = "CAST(floor((2000000 * n_digit + n_chars) / (2 * n_chars)) AS BIGINT)"

_NGRAM_CTE = """
WITH toks AS (
  SELECT doc_id AS _id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT _id,
         list_distinct(
           CASE WHEN len(t) >= {k}
                THEN list_transform(generate_series(1, len(t) - {km1}),
                                    i -> {concat_expr})
                ELSE [array_to_string(t, ' ')]
           END
         ) AS grams
  FROM toks
), sizes AS (
  SELECT _id, len(grams) AS n_grams FROM grams
), exploded AS (
  SELECT _id, unnest(grams) AS g FROM grams
), inter AS (
  SELECT a._id AS id1, b._id AS id2, COUNT(*) AS inter_count
  FROM exploded a JOIN exploded b USING (g)
  WHERE a._id < b._id
  GROUP BY a._id, b._id
  HAVING COUNT(*) >= {min_shared}
)
"""


def _ngram_cte(k: int, min_shared: int = 1) -> str:
    concat = " || ' ' || ".join([f"t[i+{j}]" for j in range(k)])
    return _NGRAM_CTE.format(k=k, km1=k - 1, concat_expr=concat, min_shared=min_shared)


def _kmv_doc_cardinality_sql() -> str:
    """KMV doc-cardinality twin: DuckDB recomputes the md5 bottom-k state
    itself (operators/kmv.py fragments), not just the final numbers.  The
    gram CTE is the SAME space-joined _ngram_cte the exact-jaccard oracles
    use, so gram strings are byte-identical inputs to md5 in both engines."""
    from set_sketch_paper_spark.operators.kmv import (
        kmv_estimate_sql,
        kmv_from_array_sql,
    )

    return (
        _ngram_cte(3)
        + f""", sk AS (
  SELECT _id AS doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
         {kmv_from_array_sql('grams', _KMV_DOC_K)} AS ks
  FROM grams
)
SELECT doc_id, n_grams, {kmv_estimate_sql(_KMV_DOC_K)} FROM sk"""
    )


def _kmv_jaccard_pairs_sql() -> str:
    """Bottom-k-union Jaccard twin over the exact >=0.5 n-gram pair set."""
    from set_sketch_paper_spark.operators.kmv import (
        kmv_from_array_sql,
        kmv_jaccard_sql,
    )

    pairs_body = _NGRAM_PAIRS_BODY.format(num=1, den=2)
    return (
        _ngram_cte(3)
        + f""", p AS ({pairs_body})
, sk AS (
  SELECT _id, {kmv_from_array_sql('grams', _KMV_DOC_K)} AS ks FROM grams
)
SELECT p.id1, p.id2, p.jaccard_q,
       {kmv_jaccard_sql('s1.ks', 's2.ks', _KMV_DOC_K)}
FROM p
JOIN sk s1 ON s1._id = p.id1
JOIN sk s2 ON s2._id = p.id2"""
    )


def _kmv_setops_pairs_sql() -> str:
    """Theta-style union/intersection/difference estimate twins over the
    exact >=0.5 n-gram pair set (fragments from operators/kmv.py)."""
    from set_sketch_paper_spark.operators.kmv import (
        kmv_from_array_sql,
        kmv_setops_sql,
    )

    pairs_body = _NGRAM_PAIRS_BODY.format(num=1, den=2)
    return (
        _ngram_cte(3)
        + f""", p AS ({pairs_body})
, sk AS (
  SELECT _id, {kmv_from_array_sql('grams', _KMV_DOC_K)} AS ks FROM grams
)
SELECT p.id1, p.id2, p.inter_count, p.union_count,
       {kmv_setops_sql('s1.ks', 's2.ks', _KMV_DOC_K)}
FROM p
JOIN sk s1 ON s1._id = p.id1
JOIN sk s2 ON s2._id = p.id2"""
    )


def _corpus_health_sql() -> str:
    """Per-source rollup twin.  The vocabulary estimate is computed from RAW
    grams (explode -> distinct hash -> bottom-k per source) while the Spark
    side merges per-doc truncated sketches — equality proves the two-level
    KMV merge algebra, not just the arithmetic."""
    from set_sketch_paper_spark.operators.kmv import (
        kmv_estimate_sql,
        kmv_hash_sql,
    )

    quality = _QUALITY_Q_SQL.format(punct="punct_ratio_q", digit="digit_ratio_q")
    ts_body = _TOKEN_STATS_CTE.strip()
    assert ts_body.startswith("WITH ")
    ts_body = ts_body[len("WITH "):]
    return (
        _ngram_cte(3)
        + ", "
        + ts_body
        + f""", ex AS (
  SELECT _id, unnest(grams) AS g FROM grams
), hsrc AS (
  SELECT DISTINCT d.source, {kmv_hash_sql('g')} AS h
  FROM ex JOIN documents d ON d.doc_id = ex._id
), b AS (
  SELECT source, list_slice(list_sort(list(h)), 1, {_KMV_DOC_K}) AS ks
  FROM hsrc GROUP BY source
), st AS (
  SELECT d.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT md5(d.text)) AS BIGINT) AS n_unique_texts,
         CAST(SUM({quality}) AS BIGINT) AS sum_quality_q,
         CAST(SUM(s.n_tokens) AS BIGINT) AS sum_tokens
  FROM s JOIN documents d USING (doc_id)
  GROUP BY d.source
)
SELECT st.source, st.n_docs, st.n_unique_texts, st.sum_quality_q,
       st.sum_tokens, {kmv_estimate_sql(_KMV_DOC_K, 'b.ks')}
FROM st JOIN b ON b.source = st.source"""
    )


def _quality_cum_cte() -> str:
    """Shared CTE chain: per-doc quality -> (lang, score) histogram ->
    running-sum window.  Ends with cum(lang, quality_q, cum, n); both the
    quantile report and the calibrated filter build on it, so a scoring
    change cannot desynchronize them."""
    quality = _QUALITY_Q_SQL.format(punct="punct_ratio_q", digit="digit_ratio_q")
    return (
        _TOKEN_STATS_CTE
        + f""", q AS (
  SELECT d.doc_id, d.lang, {quality} AS quality_q
  FROM s JOIN documents d USING (doc_id)
), hist AS (
  SELECT lang, quality_q, COUNT(*) AS c FROM q GROUP BY lang, quality_q
), cum AS (
  SELECT lang, quality_q,
         SUM(c) OVER (PARTITION BY lang ORDER BY quality_q) AS cum,
         SUM(c) OVER (PARTITION BY lang) AS n
  FROM hist
)"""
    )


def _quality_quantiles_sql() -> str:
    """Histogram + running-sum window + conditional min — percentile_disc in
    pure integer math, probs shared with textstats.score_quantiles."""
    from set_sketch_paper_spark.operators.textstats import QUANTILE_PROBS

    qcols = ",\n       ".join(
        f"CAST(MIN(CASE WHEN cum * {den} >= {num} * n THEN quality_q END)"
        f" AS BIGINT) AS p{label}_q"
        for label, num, den in QUANTILE_PROBS
    )
    return (
        _quality_cum_cte()
        + f"""
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
       {qcols}
FROM cum GROUP BY lang"""
    )


def _calibrated_quality_filter_sql() -> str:
    """Per-lang p25 threshold (same cum CTE) joined back as a filter."""
    return (
        _quality_cum_cte()
        + """
, thr AS (
  SELECT lang,
         CAST(MIN(CASE WHEN cum * 4 >= n THEN quality_q END) AS BIGINT)
           AS p25_q
  FROM cum GROUP BY lang
)
SELECT q.doc_id, q.lang, q.quality_q, thr.p25_q
FROM q JOIN thr USING (lang)
WHERE q.quality_q >= thr.p25_q"""
    )


def _kmv_distinct_users_sql() -> str:
    """Per-event-type distinct-user KMV twin (naive global bottom-k — the
    layout-invariant result the partition-bounded Spark path must equal)."""
    from set_sketch_paper_spark.operators.kmv import (
        kmv_estimate_sql,
        kmv_hash_sql,
    )

    return f"""
WITH h AS (
  SELECT DISTINCT event_type, {kmv_hash_sql('user_id')} AS h FROM events
  WHERE user_id IS NOT NULL
), b AS (
  SELECT event_type, list_slice(list_sort(list(h)), 1, {_KMV_USERS_K}) AS ks
  FROM h GROUP BY event_type
)
SELECT event_type, {kmv_estimate_sql(_KMV_USERS_K)} FROM b"""


_NGRAM_PAIRS_BODY = """
SELECT id1, id2, inter_count,
       n1 + n2 - inter_count AS union_count,
       CAST(floor((2000000 * inter_count + (n1 + n2 - inter_count))
                  / (2 * (n1 + n2 - inter_count))) AS BIGINT) AS jaccard_q
FROM inter
JOIN (SELECT _id AS id1, n_grams AS n1 FROM sizes) s1 USING (id1)
JOIN (SELECT _id AS id2, n_grams AS n2 FROM sizes) s2 USING (id2)
WHERE inter_count * {den} >= (n1 + n2 - inter_count) * {num}
"""


def _lang_id_sql() -> str:
    """Mirrors textstats.with_lang_id: CJK character-ratio override for zh
    (Han-script chars >= 1/CJK_RATIO_DEN of all chars; literal char-class
    range identical under Java regex and RE2), else marker argmax with
    first-in-list tie-breaking."""
    from set_sketch_paper_spark.operators.textstats import CJK_PATTERN, CJK_RATIO_DEN

    scores = ",\n         ".join(
        f"len(list_intersect(list_distinct(string_split(coalesce(text, ''), ' ')), {markers})) AS s_{lang}"
        for lang, markers in LANG_MARKER_SQL.items()
    )
    return f"""
WITH sc AS (
  SELECT doc_id,
         {scores},
         length(coalesce(text, ''))
           - length(regexp_replace(coalesce(text, ''), '{CJK_PATTERN}', '', 'g')) AS n_cjk,
         length(coalesce(text, '')) AS n_chars
  FROM documents
)
SELECT doc_id,
       CASE WHEN n_cjk * {CJK_RATIO_DEN} >= greatest(n_chars, 1) THEN 'zh'
            WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
            WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM sc
"""


_EMB_PAIRS_CTE = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         CAST(round(1000000
           * CAST(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) AS BIGINT)
           / sqrt(CAST(CAST(list_sum(list_transform(a.v, x -> x * x)) AS BIGINT)
                       * CAST(list_sum(list_transform(b.v, x -> x * x)) AS BIGINT) AS DOUBLE))) AS BIGINT) AS cos_q
  FROM q a JOIN q b ON a.vec_id < b.vec_id
)
"""


def _canonical_docs_sql() -> str:
    """Clusters (recursive-CTE CC over the >=0.5 n-gram edges, singletons
    self-clustered) joined to the doc_quality score, per-cluster top-1 by
    (quality DESC, doc_id ASC) — the SQL twin of _q_canonical_docs."""
    cc_ctes = """
, pairs AS (
  SELECT id1, id2
  FROM inter
  JOIN (SELECT _id AS id1, n_grams AS n1 FROM sizes) s1 USING (id1)
  JOIN (SELECT _id AS id2, n_grams AS n2 FROM sizes) s2 USING (id2)
  WHERE inter_count * 2 >= (n1 + n2 - inter_count) * 1
), sym AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION
  SELECT id2 AS a, id1 AS b FROM pairs
), nodes AS (
  SELECT DISTINCT a AS n FROM sym
), reach AS (
  SELECT n, n AS l FROM nodes
  UNION
  SELECT e.b AS n, r.l AS l FROM reach r JOIN sym e ON e.a = r.n
), cc AS (
  SELECT n AS doc_id, MIN(l) AS cluster_id FROM reach GROUP BY n
)"""
    quality_ctes = _TOKEN_STATS_CTE.strip()[len("WITH"):]  # ' t AS (...), s AS (...)'
    return (
        _ngram_cte(3).replace("WITH toks", "WITH RECURSIVE toks", 1)
        + cc_ctes
        + ","
        + quality_ctes
        + """
, qual AS (
  SELECT doc_id,
         CAST(floor((
           (CASE WHEN n_tokens >= 20 THEN 1000000 ELSE n_tokens * 50000 END)
           + greatest(0, 1000000 - punct_ratio_q * 4)
           + greatest(0, 1000000 - digit_ratio_q * 4)
         ) / 3) AS BIGINT) AS quality_q
  FROM s
), assigned AS (
  SELECT q.doc_id, COALESCE(cc.cluster_id, q.doc_id) AS cluster_id, q.quality_q
  FROM qual q LEFT JOIN cc ON cc.doc_id = q.doc_id
), ranked AS (
  SELECT cluster_id, doc_id, quality_q,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY quality_q DESC, doc_id ASC) AS rk
  FROM assigned
)
SELECT cluster_id, doc_id AS keep_id, quality_q FROM ranked WHERE rk = 1
"""
    )


def oracle_sql() -> dict[str, str]:
    ngram3 = _ngram_cte(3) + _NGRAM_PAIRS_BODY.format(num=1, den=2)
    return {
        "exact_dup_groups": """
            SELECT md5(text) AS fingerprint_md5, COUNT(*) AS dup_count,
                   MIN(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        """,
        "exact_dedup_docs": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "token_stats": _TOKEN_STATS_CTE + "SELECT * FROM s",
        # new-batch (odd ids) vs snapshot (even ids) exact dedup; mirrors
        # dedup.exact_dedup_against_snapshot (Spark sha2(...,256) == DuckDB
        # sha256, both lowercase hex)
        "incremental_exact_dedup": r"""
        WITH old AS (
          SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 2 = 0
        ), new_rep AS (
          SELECT sha256(text) AS content_sha, min(doc_id) AS doc_id
          FROM documents WHERE doc_id % 2 = 1 GROUP BY sha256(text)
        )
        SELECT doc_id, content_sha FROM new_rep r
        WHERE NOT EXISTS (SELECT 1 FROM old o WHERE o.h = r.content_sha)
        """,
        # token-window chunking; mirrors chunking.chunk_documents
        # (chunk_tokens=24, overlap=8, stride=16; chunk_idx = start // stride
        # since the start filter only drops trailing starts)
        "doc_chunks": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks"
            " FROM documents),"
            + _CHUNK_U_CTE.format(src="t") + _CHUNK_ROWS_SELECT
        ),
        # full corpus build: quality >= 0.6 -> exact dedup -> 5-gram
        # decontamination vs leaked-eval probes (24-token prefixes of every
        # 25th doc, so the stage removes rows at every SF — ADVICE r4) ->
        # chunk(24,8) -> pack(64, 8 buckets); chains the doc_quality /
        # decontaminate_docs / doc_chunks / packed_sequences oracle CTEs
        "training_corpus_build": (
            r"""
        WITH base AS (
          SELECT doc_id, text FROM documents
        ), st AS (
          SELECT doc_id, text,
                 len(string_split(text, ' ')) AS n_tokens,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
                 length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
          FROM base
        ), q AS (
          SELECT doc_id, text, """
            + _QUALITY_Q_SQL.format(punct=_PUNCT_Q_SQL, digit=_DIGIT_Q_SQL)
            + """ AS quality_q
          FROM st
        ), kept AS (
          SELECT text, min(doc_id) AS doc_id FROM q
          WHERE quality_q >= 600000 GROUP BY text
        ), probes AS (
          SELECT doc_id, array_to_string((string_split(text, ' '))[1:24], ' ') AS text
          FROM documents WHERE doc_id % 25 = 0
        ), dg AS ("""
            + _gram_select("kept")
            + """
        ), pgall AS ("""
            + _gram_select("probes")
            + """
        ), pg AS (
          SELECT DISTINCT gram FROM pgall
        ), flagged AS (
          SELECT DISTINCT dg.doc_id FROM dg JOIN pg USING (gram)
        ), clean AS (
          SELECT k.doc_id, k.text FROM kept k
          WHERE k.doc_id NOT IN (SELECT doc_id FROM flagged)
        ), ct AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM clean
        ),"""
            + _CHUNK_U_CTE.format(src="ct") + ","
            + _PACK_CTES + _PACK_SELECT
        ),
        # chunk -> 64-token sequence packing in 8 doc-hash buckets; mirrors
        # chunking.pack_chunks over chunk_documents(24, 8)
        "packed_sequences": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks"
            " FROM documents),"
            + _CHUNK_U_CTE.format(src="t") + ","
            + _PACK_CTES + _PACK_SELECT
        ),
        # PII scrub; mirrors textstats.with_pii_redacted (patterns chosen to
        # match identically under Java regex and RE2; counts on original
        # text, replacements sequential)
        "pii_redaction": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                 '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(coalesce(text, ''),
                 '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_id_number,
               regexp_replace(regexp_replace(regexp_replace(coalesce(text, ''),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
                 '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<ID>', 'g') AS redacted
        FROM documents
        """,
        # 5-gram eval-set decontamination; mirrors chunking.flag_contaminated.
        # Probes = 24-token prefixes of every 25th doc, so overlap (and the
        # positive join path) is guaranteed at every SF (ADVICE r4).
        "decontaminate_docs": (
            """
        WITH probes AS (
          SELECT doc_id, array_to_string((string_split(text, ' '))[1:24], ' ') AS text
          FROM documents WHERE doc_id % 25 = 0
        ), g AS ("""
            + _gram_select("documents")
            + """
        ), pgall AS ("""
            + _gram_select("probes")
            + """
        ), pg AS (
          SELECT DISTINCT gram FROM pgall
        )
        SELECT g.doc_id, CAST(count(*) AS BIGINT) AS hit_grams
        FROM g JOIN pg USING (gram)
        GROUP BY g.doc_id
        """
        ),
        # Gopher-style repetition signals; mirrors textstats.with_repetition_stats
        # (same _q6 quantization; list_max([])->NULL coalesced to 0 in both engines)
        "doc_repetition": r"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), b AS (
          SELECT doc_id, toks,
                 len(toks) AS n,
                 len(list_distinct(toks)) AS nd,
                 list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i+1]) AS bigrams
          FROM t
        ), m AS (
          SELECT doc_id, n, nd,
                 len(bigrams) AS nb,
                 len(list_distinct(bigrams)) AS nbd,
                 coalesce(list_max(list_transform(list_distinct(toks),
                     tk -> len(list_filter(toks, x -> x = tk)))), 0) AS top_tok,
                 coalesce(list_max(list_transform(list_distinct(bigrams),
                     bg -> len(list_filter(bigrams, x -> x = bg)))), 0) AS top_big
          FROM b
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(floor((2000000 * (n - nd) + n) / (2 * n)) AS BIGINT) AS dup_token_q,
               CAST(floor((2000000 * top_tok + n) / (2 * n)) AS BIGINT) AS top_token_q,
               CAST(floor((2000000 * (nb - nbd) + greatest(nb, 1)) / (2 * greatest(nb, 1))) AS BIGINT) AS dup_bigram_q,
               CAST(floor((2000000 * top_big + greatest(nb, 1)) / (2 * greatest(nb, 1))) AS BIGINT) AS top_bigram_q
        FROM m
        """,
        "doc_quality": (
            _TOKEN_STATS_CTE
            + " SELECT doc_id, "
            + _QUALITY_Q_SQL.format(punct="punct_ratio_q", digit="digit_ratio_q")
            + " AS quality_q FROM s "
        ),
        "lang_id": _lang_id_sql(),
        "subtoken_count": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_subtokens
            FROM documents
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS fingerprint_md5 FROM documents
        """,
        # total order (n DESC, token ASC) makes the top-50 boundary
        # deterministic; both engines compare strings as binary UTF-8
        "vocab_topk": """
            WITH toks AS (
              SELECT unnest(string_split(coalesce(text, ''), ' ')) AS token
              FROM documents
            )
            SELECT token, COUNT(*) AS n
            FROM toks WHERE token <> ''
            GROUP BY token
            ORDER BY n DESC, token
            LIMIT 50
        """,
        "ngram_jaccard_pairs": ngram3,
        "substring_block_pairs": _ngram_cte(16, min_shared=3)
        + "SELECT id1, id2, inter_count FROM inter",
        # char-16-gram diagonal islands == exact LCS length; the Spark side
        # joins on xxhash64(gram) (collision can only seed a 1-island,
        # invisible at min_run 17) — string join here, identical result
        "lcs_substring_pairs": """
            WITH pos AS (
              SELECT doc_id AS id, text,
                     unnest(range(1, greatest(length(text) - 14, 1))) AS pos
              FROM documents
            ), g AS (
              SELECT id, pos, substr(text, CAST(pos AS INTEGER), 16) AS gram FROM pos
            ), p AS (
              SELECT a.id AS id1, b.id AS id2, a.pos AS pos1, a.pos - b.pos AS diag
              FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
            ), isl AS (
              SELECT id1, id2, diag, pos1,
                     pos1 - ROW_NUMBER() OVER (
                       PARTITION BY id1, id2, diag ORDER BY pos1) AS grp
              FROM p
            ), runs AS (
              SELECT id1, id2, diag, grp, COUNT(*) AS run
              FROM isl GROUP BY id1, id2, diag, grp
            )
            SELECT id1, id2, MAX(run) + 15 AS max_shared_len,
                   COUNT(*) FILTER (WHERE run >= 17) AS n_spans
            FROM runs GROUP BY id1, id2
            HAVING MAX(run) + 15 >= 32
        """,
        "dup_clusters_exact": (_ngram_cte(3) + _edges_and_cc_sql()).replace("WITH toks", "WITH RECURSIVE toks", 1),
        "canonical_docs": _canonical_docs_sql(),
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
              FROM embeddings WHERE vec_id < 32
            ), c AS (
              SELECT vec_id AS neighbor_id,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS cv
              FROM embeddings
            ), s AS (
              SELECT query_id, neighbor_id,
                     CAST(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i])) AS BIGINT) AS dot,
                     CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS qn,
                     CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS cn
              FROM q, c WHERE query_id <> neighbor_id
            ), r AS (
              SELECT query_id, neighbor_id,
                     CAST(round(1000000 * dot / sqrt(CAST(qn * cn AS DOUBLE))) AS BIGINT) AS cos_q
              FROM s
            ), ranked AS (
              SELECT query_id, neighbor_id, cos_q,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos_q DESC, neighbor_id ASC) AS rank
              FROM r
            )
            SELECT query_id, neighbor_id, rank, cos_q FROM ranked WHERE rank <= 10
        """,
        "label_centroids": """
            SELECT label, i - 1 AS pos,
                   CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS BIGINT) AS sum_q,
                   COUNT(*) AS n
            FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
            GROUP BY label, i
        """,
        "embedding_near_dup_pairs": _EMB_PAIRS_CTE + """
SELECT id1, id2, cos_q FROM scored WHERE cos_q >= 400000
        """,
        "embedding_near_dup_clusters": (
            "WITH RECURSIVE " + _EMB_PAIRS_CTE.lstrip()[len("WITH "):] + """
, pairs AS (
  SELECT id1, id2 FROM scored WHERE cos_q >= 400000
), sym AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION
  SELECT id2 AS a, id1 AS b FROM pairs
), nodes AS (
  SELECT DISTINCT a AS n FROM sym
), reach AS (
  SELECT n, n AS l FROM nodes
  UNION
  SELECT e.b AS n, r.l AS l FROM reach r JOIN sym e ON e.a = r.n
)
SELECT n AS vec_id, MIN(l) AS cluster_id FROM reach GROUP BY n
"""
        ),
        "events_histogram": """
            SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket, COUNT(*) AS cnt
            FROM events GROUP BY event_type, CAST(floor(value) AS BIGINT)
        """,
        "distinct_users_exact": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "moments_by_returnflag": """
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_q,
                   CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_sq_q,
                   MIN(CAST(round(l_quantity * 100) AS BIGINT)) AS min_qty_q,
                   MAX(CAST(round(l_quantity * 100) AS BIGINT)) AS max_qty_q
            FROM lineitem GROUP BY l_returnflag
        """,
        "top_customers_by_spend": """
            WITH spend AS (
              SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
              FROM orders GROUP BY o_custkey
            ), j AS (
              SELECT c_custkey, c_name, total_cents
              FROM spend JOIN customer ON o_custkey = c_custkey
            ), ranked AS (
              SELECT c_custkey, c_name, total_cents,
                     row_number() OVER (ORDER BY total_cents DESC, c_custkey ASC) AS rank
              FROM j
            )
            SELECT c_custkey, c_name, total_cents, rank FROM ranked WHERE rank <= 10
        """,
        "user_event_seq": """
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS seq
            FROM events
        """,
        "region_customer_counts": """
            SELECT r_name, COUNT(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "orders_by_month": """
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 100 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders
            GROUP BY 1
        """,
        "part_brand_stats": """
            SELECT p_brand, COUNT(*) AS n_parts, CAST(SUM(p_size) AS BIGINT) AS sum_size,
                   MAX(CAST(round(p_retailprice * 100) AS BIGINT)) AS max_retail_cents
            FROM part GROUP BY p_brand
        """,
        "user_sessions": """
            WITH base AS (
              -- floor before the cast: DuckDB CAST(double AS BIGINT) ROUNDS,
              -- Spark's second() truncates
              SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
            ), g AS (
              SELECT user_id, event_id, ts_s,
                     ts_s - lag(ts_s) OVER (
                       PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC) AS gap
              FROM base
            ), s AS (
              SELECT user_id, event_id, ts_s,
                     CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY ts_s ASC, event_id ASC) AS BIGINT)
                       AS session_id
              FROM g
            )
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MIN(ts_s) AS start_epoch, MAX(ts_s) AS end_epoch
            FROM s GROUP BY user_id, session_id
        """,
        "quality_filtered_dedup": _TOKEN_STATS_CTE + """
            , q AS (
              SELECT s.doc_id,
                     CAST(floor((
                       (CASE WHEN n_tokens >= 20 THEN 1000000 ELSE n_tokens * 50000 END)
                       + greatest(0, 1000000 - punct_ratio_q * 4)
                       + greatest(0, 1000000 - digit_ratio_q * 4)
                     ) / 3) AS BIGINT) AS quality_q,
                     d.text
              FROM s JOIN documents d ON s.doc_id = d.doc_id
            )
            SELECT MIN(doc_id) AS doc_id, MIN(quality_q) AS quality_q
            FROM q WHERE quality_q >= 600000 GROUP BY text
        """,
        "supplier_nation_acctbal": """
            SELECT n_name, COUNT(*) AS n_suppliers,
                   CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        # deterministic md5-threshold sampling: DuckDB computes the IDENTICAL
        # membership predicate (md5 + hex string comparison are engine-
        # portable by construction; thresholds generated by the same helper)
        "docs_hash_sample": f"""
            SELECT doc_id FROM documents
            WHERE md5(concat_ws(chr(31), 's42', CAST(doc_id AS VARCHAR)))
                  < '{_sampling_thr(0.25)}'
        """,
        "docs_stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE md5(concat_ws(chr(31), 's7', CAST(doc_id AS VARCHAR))) <
                  CASE lang WHEN 'en' THEN '{_sampling_thr(0.2)}'
                            WHEN 'de' THEN '{_sampling_thr(0.6)}'
                            ELSE '{_sampling_thr(1.0)}' END
        """,
        "docs_split_counts": f"""
            SELECT CASE
                     WHEN md5(concat_ws(chr(31), 'sp1', CAST(doc_id AS VARCHAR)))
                          < '{_split_edges((0.8, 0.1, 0.1))[0]}' THEN 0
                     WHEN md5(concat_ws(chr(31), 'sp1', CAST(doc_id AS VARCHAR)))
                          < '{_split_edges((0.8, 0.1, 0.1))[1]}' THEN 1
                     ELSE 2
                   END AS split,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "kmv_doc_cardinality": _kmv_doc_cardinality_sql(),
        "kmv_jaccard_pairs": _kmv_jaccard_pairs_sql(),
        "kmv_distinct_users": _kmv_distinct_users_sql(),
        "kmv_setops_pairs": _kmv_setops_pairs_sql(),
        "quality_quantiles": _quality_quantiles_sql(),
        "calibrated_quality_filter": _calibrated_quality_filter_sql(),
        "corpus_health_by_source": _corpus_health_sql(),
    }


def _edges_and_cc_sql() -> str:
    """Connected components via recursive CTE (min-label reachability) over
    the >=0.5 exact-Jaccard n-gram edges."""
    return """
, pairs AS (
  SELECT id1, id2
  FROM inter
  JOIN (SELECT _id AS id1, n_grams AS n1 FROM sizes) s1 USING (id1)
  JOIN (SELECT _id AS id2, n_grams AS n2 FROM sizes) s2 USING (id2)
  WHERE inter_count * 2 >= (n1 + n2 - inter_count) * 1
), sym AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION
  SELECT id2 AS a, id1 AS b FROM pairs
), nodes AS (
  SELECT DISTINCT a AS n FROM sym
), reach AS (
  SELECT n, n AS l FROM nodes
  UNION
  SELECT e.b AS n, r.l AS l FROM reach r JOIN sym e ON e.a = r.n
)
SELECT n AS doc_id, MIN(l) AS cluster_id FROM reach GROUP BY n
"""
