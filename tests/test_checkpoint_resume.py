"""Checkpoint / resume semantics of the pipeline (north rule: "resumable
from checkpoint with per-partition lineage + metrics")."""

from __future__ import annotations

import json
import os

import pytest

from set_sketch_paper_spark.config import (
    LSHConfig,
    MinHashConfig,
    PipelineConfig,
    ShingleConfig,
)
from set_sketch_paper_spark.plans.pipeline import NearDupPipeline
from set_sketch_paper_spark.sources.synthetic import files_table

N_ROWS = 500


def _pcfg(tmp: str, threshold: float = 0.5) -> PipelineConfig:
    return PipelineConfig(
        shingle=ShingleConfig(k=3),
        minhash=MinHashConfig(num_registers=128, algo="oph"),
        lsh=LSHConfig(num_bands=32, rows_per_band=4, band_cap=500),
        jaccard_threshold=threshold,
        checkpoint_dir=tmp,
    )


def test_checkpoint_then_resume(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    files = files_table(spark, N_ROWS, seed=42)

    pipe1 = NearDupPipeline(_pcfg(ckpt))
    r1 = pipe1.run(files, id_cols=("repo", "path", "commit"))
    clusters1 = sorted((r["file_id"], r["cluster_id"]) for r in r1.clusters.collect())
    assert all(not m.resumed for m in pipe1.metrics)

    # manifests: per-stage lineage with config hash + per-partition rows
    stages = [m.name for m in pipe1.metrics]
    for stage in stages:
        man_path = os.path.join(ckpt, stage, "_MANIFEST.json")
        assert os.path.exists(man_path), stage
        man = json.loads(open(man_path).read())
        assert man["config_hash"] == pipe1.pcfg.config_hash()
        assert man["rows"] == sum(man["partitions"].values())
        assert man["seconds"] >= 0

    # second run with the same config resumes every stage and reproduces the
    # exact cluster assignment
    pipe2 = NearDupPipeline(_pcfg(ckpt))
    r2 = pipe2.run(files, id_cols=("repo", "path", "commit"))
    clusters2 = sorted((r["file_id"], r["cluster_id"]) for r in r2.clusters.collect())
    assert clusters1 == clusters2
    assert all(m.resumed for m in pipe2.metrics), [
        (m.name, m.resumed) for m in pipe2.metrics
    ]


def test_config_change_invalidates_checkpoint(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    files = files_table(spark, N_ROWS, seed=42)
    NearDupPipeline(_pcfg(ckpt, threshold=0.5)).run(files, id_cols=("repo", "path", "commit"))

    # different threshold -> different config hash -> checkpoints must NOT be
    # reused (mirrors the reference's merge precondition, sketch.hpp:1021)
    pipe = NearDupPipeline(_pcfg(ckpt, threshold=0.9))
    pipe.run(files, id_cols=("repo", "path", "commit"))
    assert all(not m.resumed for m in pipe.metrics)
