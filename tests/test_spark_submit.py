"""Deployment-path test (north rule: "run via spark-submit --py-files").

Builds the --py-files archive with scripts/package_pyfiles.py, then runs
scripts/submit_job.py through a REAL ``spark-submit`` from a scratch
directory (repo checkout not importable: cwd and the script both live in
tmp_path, PYTHONPATH scrubbed), so the package must resolve from the
shipped zip exactly as it would on a cluster.  local[4] stands in for the
executors, as everywhere in this sandbox.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from package_pyfiles import build  # noqa: E402


def _spark_submit() -> str:
    import pyspark

    # the pyspark-bundled launcher matches the installed runtime version
    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_pyfiles_zip_is_deterministic(tmp_path):
    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    sha = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()
    assert sha(a) == sha(b)


def test_spark_submit_pyfiles_runs_pipeline(tmp_path):
    zip_path = build(str(tmp_path / "set_sketch_paper_spark.zip"))
    job = tmp_path / "submit_job.py"
    shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), job)
    out_json = tmp_path / "result.json"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    cmd = [
        _spark_submit(),
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        str(job),
        "--synthetic", "300",
        "--out", str(out_json),
    ]
    proc = subprocess.run(
        cmd, cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    report = json.loads(out_json.read_text())
    assert report["n_files"] == 300
    # the planted corpus guarantees exact + near duplicates at any size
    assert report["n_dup_files"] > 0 and report["n_verified_pairs"] > 0
    assert report["n_clusters"] < report["n_files"]
    assert report["master"] == "local[4]"
    assert [s["name"] for s in report["stages"]] == [
        "identity", "signatures", "candidates", "verified_pairs", "clusters",
    ]
    # stdout carries the same single JSON line (cluster-log contract)
    stdout_reports = [
        json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")
    ]
    assert any(r == report for r in stdout_reports)


def test_submit_job_rejects_bad_band_tiling(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import submit_job

    with pytest.raises(SystemExit):
        submit_job.main(["--synthetic", "10", "--registers", "128", "--bands", "33"])
