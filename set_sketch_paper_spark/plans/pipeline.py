"""End-to-end near-duplicate detection + clustering pipeline.

Stage graph (all DataFrame ops; SURVEY.md §7.1 step 3-4):

  input(repo,path,commit,lang,content)
    -> identity: file_id = xxhash64(repo,path,commit), content_sha = sha2
    -> exact dedup short-circuit: group by content_sha, keep min-id
       representative (the 100TB win: byte-identical copies never reach the
       sketch stage)
    -> signatures: MinHash sig + LSH band hashes (narrow, one content pass)
    -> LSH candidate pairs (bucket groupBy, band cap for hot-band skew)
    -> verification join + vectorized joint estimate, threshold
    -> edges = near-dup pairs ∪ exact-dup (member -> representative) edges
    -> connected components -> cluster assignment for every input file

Checkpointing / resume: each stage optionally persists to
``<checkpoint_dir>/<stage>`` as parquet with a manifest JSON carrying the
config hash, row count, timing and lineage; a resumed run with the same
config hash reads the parquet instead of recomputing (north rule:
"resumable from checkpoint with per-partition lineage + metrics").  A config
change invalidates downstream checkpoints (mirrors the reference's merge
precondition assert(config == other.config), sketch.hpp:1021).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import PipelineConfig
from ..functions.udfs import make_minhash_pair_estimator_udf
from ..operators import lsh as lsh_ops
from ..operators.clustering import connected_components
from ..operators.signatures import with_content_sha, with_file_id, with_minhash_signature


@dataclass
class StageMetrics:
    name: str
    rows: int
    seconds: float
    resumed: bool
    num_partitions: int


@dataclass
class PipelineResult:
    clusters: DataFrame
    pairs: DataFrame
    metrics: list[StageMetrics] = field(default_factory=list)
    # ids of localCheckpoint block-RDDs held by the in-memory (no
    # checkpoint-dir) stage mode; empty when stages persist to parquet
    _ckpt_rdd_ids: set = field(default_factory=set)
    _spark: SparkSession | None = None

    def release_cache(self) -> int:
        """Unpersist the stage localCheckpoint blocks backing this result.

        Call ONLY after ``clusters``/``pairs`` have been fully consumed —
        the blocks are the severed lineage's sole data source, so the
        frames are unusable afterwards.  Long-lived drivers running many
        pipeline batches in one session need this between batches or dead
        stage blocks accumulate for the session's lifetime.  Returns the
        number of RDDs freed."""
        if not self._spark or not self._ckpt_rdd_ids:
            return 0
        jmap = self._spark.sparkContext._jsc.getPersistentRDDs()
        n = 0
        for k in jmap.keySet().toArray():
            if int(k) in self._ckpt_rdd_ids:
                jmap.get(k).unpersist(False)
                n += 1
        self._ckpt_rdd_ids.clear()
        return n


class NearDupPipeline:
    def __init__(self, pcfg: PipelineConfig, run_id: str = "run0"):
        self.pcfg = pcfg
        self.run_id = run_id
        self.metrics: list[StageMetrics] = []
        self._ckpt_rdd_ids: set[int] = set()

    # -- checkpoint helpers -------------------------------------------------

    def _stage_dir(self, stage: str) -> str | None:
        if not self.pcfg.checkpoint_dir:
            return None
        return os.path.join(self.pcfg.checkpoint_dir, stage)

    def _manifest_path(self, stage_dir: str) -> str:
        return os.path.join(stage_dir, "_MANIFEST.json")

    def _try_resume(self, spark: SparkSession, stage: str) -> DataFrame | None:
        d = self._stage_dir(stage)
        if not d or not os.path.exists(self._manifest_path(d)):
            return None
        with open(self._manifest_path(d)) as f:
            manifest = json.load(f)
        if manifest.get("config_hash") != self.pcfg.config_hash():
            return None  # config changed -> checkpoint invalid
        return spark.read.parquet(d)

    def _checkpoint(self, df: DataFrame, stage: str, t0: float) -> DataFrame:
        """Persist stage output + manifest; returns the materialized frame.

        Lineage columns (_stage, _config_hash, _run_id) ride along in the
        parquet so any downstream consumer can trace provenance; the manifest
        records per-partition row counts (lineage + metrics requirement).
        """
        d = self._stage_dir(stage)
        if not d:
            jsc = df.sparkSession.sparkContext._jsc
            before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
            out = df.localCheckpoint(eager=True)
            self._ckpt_rdd_ids |= {
                int(k) for k in jsc.getPersistentRDDs().keySet().toArray()
            } - before
            # rows=-1: a separate count() is one extra job per stage, and at
            # small scale the pipeline is job-overhead-bound; persisted
            # checkpoints below still record exact per-partition rows
            self.metrics.append(
                StageMetrics(stage, -1, time.time() - t0, False,
                             out.rdd.getNumPartitions())
            )
            return out
        annotated = (
            df.withColumn("_stage", F.lit(stage))
            .withColumn("_config_hash", F.lit(self.pcfg.config_hash()))
            .withColumn("_run_id", F.lit(self.run_id))
        )
        annotated.write.mode("overwrite").parquet(d)
        spark = df.sparkSession
        out = spark.read.parquet(d)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        rows = int(sum(r["count"] for r in per_part))
        manifest = {
            "stage": stage,
            "run_id": self.run_id,
            "config_hash": self.pcfg.config_hash(),
            "rows": rows,
            "partitions": {str(r["pid"]): r["count"] for r in per_part},
            "seconds": time.time() - t0,
        }
        with open(self._manifest_path(d), "w") as f:
            json.dump(manifest, f, indent=1)
        self.metrics.append(
            StageMetrics(stage, rows, time.time() - t0, False, len(per_part))
        )
        return out.drop("_stage", "_config_hash", "_run_id")

    def _stage_bucketed_table(
        self, spark: SparkSession, name: str, build, bucket_col: str, n_buckets: int
    ) -> DataFrame:
        """Checkpoint a stage as a parquet table bucketed+sorted by
        ``bucket_col``: downstream equi-joins on that column scan the table
        in place (no Exchange on this side).  Resume semantics match the
        path-based checkpoint (config hash in the manifest)."""
        table = f"ssp_{name}_{self.pcfg.config_hash()[:12]}"
        d = self._stage_dir(name)
        t0 = time.time()
        if d and os.path.exists(self._manifest_path(d)):
            with open(self._manifest_path(d)) as f:
                manifest = json.load(f)
            if (
                manifest.get("config_hash") == self.pcfg.config_hash()
                and spark.catalog.tableExists(table)
            ):
                out = spark.table(table)
                self.metrics.append(
                    StageMetrics(name, -1, 0.0, True, out.rdd.getNumPartitions())
                )
                return out
        df = build()
        # a fresh session has an empty catalog, but the managed-table
        # LOCATION from a previous session may survive on disk — drop both
        # or saveAsTable fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table)
        if os.path.exists(loc):
            import shutil

            shutil.rmtree(loc, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(table)
        )
        out = spark.table(table)
        rows = out.count()
        if d:
            os.makedirs(d, exist_ok=True)
            with open(self._manifest_path(d), "w") as f:
                json.dump(
                    {
                        "stage": name,
                        "run_id": self.run_id,
                        "config_hash": self.pcfg.config_hash(),
                        "rows": rows,
                        "table": table,
                        "buckets": n_buckets,
                        "seconds": time.time() - t0,
                    },
                    f,
                    indent=1,
                )
        self.metrics.append(
            StageMetrics(name, rows, time.time() - t0, False, out.rdd.getNumPartitions())
        )
        return out

    def _stage(self, spark: SparkSession, name: str, build, materialize: bool = True) -> DataFrame:
        resumed = self._try_resume(spark, name)
        if resumed is not None:
            self.metrics.append(StageMetrics(name, -1, 0.0, True, resumed.rdd.getNumPartitions()))
            return resumed.drop("_stage", "_config_hash", "_run_id")
        if not materialize and not self._stage_dir(name):
            # in-memory mode only: a stage consumed exactly once downstream
            # needs no checkpoint barrier — materializing it is one extra
            # job + plan (codegen) per run for data the next stage's build
            # re-reads immediately.  With a checkpoint_dir the stage still
            # persists to parquet (the resume/lineage contract is
            # unchanged); its cost is then timed inside the consuming
            # stage's metrics entry.
            t0 = time.time()
            out = build()
            self.metrics.append(StageMetrics(name, -1, time.time() - t0, False, -1))
            return out
        t0 = time.time()
        jsc = spark.sparkContext._jsc
        before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
        out = self._checkpoint(build(), name, t0)
        # anything build() left persistent (e.g. the CC loop's final-round
        # and pinned edge blocks) is dead once the stage itself is
        # checkpointed — reclaim it now, keeping only the stage's own blocks
        jmap = jsc.getPersistentRDDs()
        for k in jmap.keySet().toArray():
            if int(k) not in before and int(k) not in self._ckpt_rdd_ids:
                jmap.get(k).unpersist(False)
        return out

    # -- pipeline -----------------------------------------------------------

    def run(
        self,
        df: DataFrame,
        id_cols=("repo", "path", "commit"),
        content_col: str = "content",
        verify_sha_against: str | None = None,
    ) -> PipelineResult:
        spark = df.sparkSession
        self.metrics = []
        self._ckpt_rdd_ids = set()

        base = with_content_sha(with_file_id(df, id_cols), content_col)
        if verify_sha_against:
            bad = base.filter(F.col("content_sha") != F.col(verify_sha_against)).count()
            if bad:
                raise ValueError(f"content sha mismatch on {bad} rows")

        # exact-dup short circuit: representative per content_sha
        ids = self._stage(
            spark,
            "identity",
            lambda: base.select("file_id", "content_sha"),
        )
        reps = ids.groupBy("content_sha").agg(F.min("file_id").alias("rep_id"))
        exact_edges = (
            ids.join(reps, "content_sha")
            .filter(F.col("file_id") != F.col("rep_id"))
            .select(F.col("rep_id").alias("id1"), F.col("file_id").alias("id2"))
        )

        rep_rows = (
            base.join(reps.withColumnRenamed("rep_id", "file_id"), ["content_sha", "file_id"])
            .select("file_id", content_col)
        )
        sig_build = lambda: with_minhash_signature(rep_rows, self.pcfg, content_col).select(
            "file_id", "sig", "bands", "n_shingles"
        )
        if self.pcfg.sig_buckets > 0:
            signatures = self._stage_bucketed_table(
                spark, "signatures", sig_build, "file_id", self.pcfg.sig_buckets
            )
        else:
            signatures = self._stage(spark, "signatures", sig_build)

        candidates = self._stage(
            spark,
            "candidates",
            lambda: lsh_ops.candidate_pairs(signatures, self.pcfg.lsh, id_col="file_id"),
            # consumed exactly once (verified_pairs' join input); see _stage
            materialize=False,
        )

        est_udf = make_minhash_pair_estimator_udf(self.pcfg.minhash, "original")
        verified = self._stage(
            spark,
            "verified_pairs",
            lambda: lsh_ops.verified_pairs(
                candidates, signatures, est_udf, self.pcfg.jaccard_threshold, id_col="file_id"
            ),
        )

        edges = verified.select("id1", "id2").union(exact_edges.select("id1", "id2"))
        # with a checkpoint dir, the CC loop uses RELIABLE rdd checkpoints
        # (localCheckpoint blocks don't survive executor loss on a cluster)
        reliable_cc = bool(self.pcfg.checkpoint_dir)
        if reliable_cc:
            spark.sparkContext.setCheckpointDir(
                os.path.join(self.pcfg.checkpoint_dir, "_cc_rdd_ckpt")
            )
        components = self._stage(
            spark, "clusters", lambda: connected_components(edges, reliable=reliable_cc)
        )

        # every file gets an assignment; singletons cluster with themselves
        assignment = (
            ids.select("file_id")
            .join(components.withColumnRenamed("id", "file_id"), "file_id", "left")
            .select(
                "file_id",
                F.coalesce("cluster_id", "file_id").alias("cluster_id"),
            )
        )
        return PipelineResult(
            clusters=assignment,
            pairs=verified,
            metrics=self.metrics,
            _ckpt_rdd_ids=self._ckpt_rdd_ids,
            _spark=spark,
        )
