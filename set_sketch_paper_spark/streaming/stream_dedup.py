"""Structured Streaming dedup operators.

The reference has no streaming runtime (SURVEY.md §2.9); these operators
exist because the sketch merges are commutative/idempotent (sketch.hpp:
1020-1023) and therefore stream-safe: signatures are a stateless map,
exact dedup is dropDuplicatesWithinWatermark, and the full LSH pipeline runs
per micro-batch via foreachBatch against a persistent signature store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..operators.signatures import with_content_sha, with_minhash_signature


def stream_exact_dedup(
    stream: DataFrame,
    content_col: str = "content",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop byte-identical content within the watermark window.

    State is bounded by the watermark (late duplicates beyond it pass
    through — the batch pipeline catches them on the next full run)."""
    hashed = with_content_sha(stream, content_col)
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )


def stream_signatures(stream: DataFrame, pcfg: PipelineConfig, content_col: str = "content") -> DataFrame:
    """Stateless per-row signature map — identical UDF to the batch path, so
    streamed signatures are bit-compatible with batch checkpoints."""
    return with_minhash_signature(stream, pcfg, content_col)


def foreach_batch_near_dup(pcfg: PipelineConfig, signature_store_path: str,
                           id_col: str = "doc_id", content_col: str = "content"):
    """foreachBatch hook: sketch the micro-batch, append to the signature
    store, and emit LSH candidates of new rows vs the store.

    Usage::

        q = (stream.writeStream.foreachBatch(
                foreach_batch_near_dup(pcfg, "/tmp/sigstore"))
             .start())
    """

    def handle(batch_df: DataFrame, batch_id: int):
        from ..operators import lsh as lsh_ops

        spark = batch_df.sparkSession
        signed = with_minhash_signature(batch_df, pcfg, content_col).select(id_col, "sig", "bands")
        signed.write.mode("append").parquet(signature_store_path)
        store = spark.read.parquet(signature_store_path)
        pairs = lsh_ops.candidate_pairs(store, pcfg.lsh, id_col=id_col)
        # downstream sinks would verify + cluster; here we materialize counts
        pairs.count()

    return handle
