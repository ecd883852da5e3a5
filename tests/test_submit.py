"""Packaging smoke: the spark-submit entry point runs the full DAG from
a zipped --py-files payload and resumes from the snapshot manifest."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    zip_path = str(tmp_path / "anno_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "anno_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))

    out_dir = str(tmp_path / "lake")
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable}
    # use the pyspark-bundled spark-submit
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    cmd = [
        submit,
        "--master", "local[8]",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--pages", "synth:200",
        "--output", out_dir,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["rows"]["triples"] > 0
    assert summary["computed_stages"]

    # resume: second run computes nothing
    proc2 = subprocess.run(cmd + ["--resume"], capture_output=True, text=True, env=env, timeout=600)
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    summary2 = json.loads([l for l in proc2.stdout.splitlines() if l.startswith("{")][-1])
    assert summary2["computed_stages"] == []
    assert set(summary2["resumed_stages"]) == set(summary["computed_stages"])
