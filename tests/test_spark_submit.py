"""North-rule launch parity: the job runs via `spark-submit --py-files`
(BASELINE.json north_rule), not only through an in-process SparkSession.

Builds dist/hsearch_spark.zip, launches jobs/dedup_job.py in a separate
JVM through the real spark-submit, and checks the one-line JSON report
and the clusters parquet it writes. Slow (~1 min: cold JVM) but it is
the only test that exercises the actual deployment path — --py-files
distribution, module imports inside executors from the zip, CLI arg
parsing, and the resume flag surface.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys

import pytest


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import os

    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("no spark-submit on PATH")


def test_dedup_job_via_spark_submit(tmp_path):
    repo = __file__.rsplit("/tests/", 1)[0]
    subprocess.run(
        [sys.executable, f"{repo}/tools/build_pyfiles.py"], check=True
    )
    out_dir = tmp_path / "out"
    work_dir = tmp_path / "work"
    cmd = [
        _spark_submit(),
        "--master",
        "local[4]",
        "--conf",
        "spark.ui.enabled=false",
        "--conf",
        "spark.sql.shuffle.partitions=8",
        "--py-files",
        f"{repo}/dist/hsearch_spark.zip",
        f"{repo}/jobs/dedup_job.py",
        "--input",
        "synthetic:300",
        "--work-dir",
        str(work_dir),
        "--output",
        str(out_dir),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    report_lines = [
        l for l in proc.stdout.splitlines() if l.startswith("{")
    ]
    assert report_lines, proc.stdout
    report = json.loads(report_lines[-1])
    assert report["n_docs"] == 300
    assert 0 < report["n_clusters"] <= 300
    assert not report["resumed_stages"]
    # dup families exist in the fixture → strictly fewer clusters than docs
    assert report["n_clusters"] < 300
    assert (out_dir / "_SUCCESS").exists()

    # resume surface: re-run same work-dir → all stages resumed, same output
    proc2 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600
    )
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    report2 = json.loads(
        [l for l in proc2.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report2["n_clusters"] == report["n_clusters"]
    assert "clusters" in report2["resumed_stages"]
