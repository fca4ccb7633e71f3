"""Document chunking and eval-set decontamination — the two remaining
standard LLM-corpus preparation steps alongside dedup/quality/sampling.

Both are pure built-in column expressions (whole-stage codegen, zero
Python) with exact integer/string outputs, so each query hash-matches a
DuckDB oracle.

Chunking: fixed-size token windows with overlap — the shape every training
tokenizer consumes.  Per-row work is bounded by the document length; the
explode multiplies rows by ~n_tokens/stride but each output row is narrow,
and no shuffle is introduced (chunking is map-side; downstream writers
repartition on their own keys).

Decontamination: flag corpus documents sharing any k-gram with an eval/
benchmark probe set (the standard n-gram-overlap decontamination rule,
e.g. GPT-3 appendix C / PaLM §7).  The probe gram set is tiny relative to
the corpus (eval suites are ~10^5-10^6 grams), so the membership check is
a BROADCAST semi-join against the corpus gram stream — the corpus is
scanned once, never shuffled; only per-doc hit counts aggregate (map-side
combinable, id-keyed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive chunks.

    Starts run 0, stride, 2*stride, ... (stride = chunk_tokens - overlap);
    a tail start is emitted only when it contributes unseen tokens
    (s == 0 or s < n - overlap), so every token appears in >= 1 chunk and
    no chunk is a suffix of the previous one.  Output: (id, chunk_idx,
    chunk_text, n_chunk_tokens), deterministic.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    # NULL text contributes no chunks (matching SQL string_split(NULL) ->
    # unnest of NULL = no rows); without this, size(NULL) = -1 leaks a
    # (chunk_idx=0, n_chunk_tokens=-1) row that corrupts packing offsets
    df = df.filter(F.col(text_col).isNotNull())
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s < n - overlap),
    )
    chunked = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "_s"),
        toks.alias("_t"),
    )
    return chunked.select(
        id_col,
        F.col("chunk_idx").cast(LongType()).alias("chunk_idx"),
        F.concat_ws(" ", F.slice("_t", F.col("_s") + 1, chunk_tokens)).alias("chunk_text"),
        F.least(F.size("_t") - F.col("_s"), F.lit(chunk_tokens))
        .cast(LongType())
        .alias("n_chunk_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    seq_tokens: int = 64,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Assign chunks to fixed-token training sequences (GPT-style
    concat-and-cut packing), deterministically and in parallel.

    A single global greedy pack is inherently sequential, so docs hash into
    ``n_buckets`` independent streams (bucket = id % n_buckets) and each
    bucket packs its chunks in (id, chunk_idx) order by running token
    offset: a chunk starts at ``offset_tokens`` = cumulative tokens before
    it in its bucket and belongs to sequence floor(offset / seq_tokens)
    (sequences are cut mid-chunk exactly like document-concat pretraining
    pipelines cut mid-document).  ONE window shuffle keyed on the bucket;
    sequences never cross buckets, so executors pack buckets independently
    — size n_buckets to the cluster's parallelism (the assignment is a
    pure function of (ids, token counts, n_buckets), reproducible across
    layouts and engines).

    Output: (bucket, seq_idx, id, chunk_idx, n_chunk_tokens,
    offset_tokens) — offset_tokens is the chunk's start offset within its
    bucket stream, all exact integers (oracle-expressible as a standard
    SQL window sum).
    """
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col, idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    return (
        chunks.withColumn("bucket", (F.col(id_col) % n_buckets).cast(LongType()))
        .withColumn("offset_tokens", pre.cast(LongType()))
        .select(
            "bucket",
            F.floor(F.col("offset_tokens") / seq_tokens).cast(LongType()).alias("seq_idx"),
            id_col,
            idx_col,
            tok_col,
            "offset_tokens",
        )
    )


def _gram_stream(df: DataFrame, k: int, id_col: str, text_col: str) -> DataFrame:
    """(_id, gram) distinct token k-grams per doc via the shared
    dedup.token_kgram_array builder, with sep=' ' — decontamination grams
    are textual join keys, so they must be collision-free (''-joined grams
    would merge e.g. ['ab','c'] and ['a','bc']), unlike ngram_jaccard's
    hashed sep='' shuffle keys.  NULL text contributes no grams."""
    from .dedup import token_kgram_array

    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("t")
    )
    return toks.select(
        "_id", F.explode(token_kgram_array(F.col("t"), k, sep=" ")).alias("gram")
    )


def flag_contaminated(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str | None = None,
) -> DataFrame:
    """Documents sharing >= 1 token ``k``-gram with the probe (eval) set:
    (id, hit_grams = distinct shared grams).  Corpus docs that ARE probes
    should be excluded by the caller (the id spaces need not even match).

    The probe side collapses to DISTINCT grams and broadcasts; the corpus
    gram stream is map-side generated and semi-joined without a shuffle —
    only the per-doc hit count aggregates.  At 100 TB the corpus side is
    the whole training set and the probe side stays eval-suite-sized, so
    the broadcast never inverts.
    """
    probe_text = probe_text_col or text_col
    probe_grams = (
        _gram_stream(probes, k, id_col, probe_text).select("gram").distinct()
    )
    corpus_grams = _gram_stream(corpus, k, id_col, text_col)
    hits = corpus_grams.join(F.broadcast(probe_grams), "gram")
    return (
        hits.groupBy(F.col("_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("hit_grams"))
    )
