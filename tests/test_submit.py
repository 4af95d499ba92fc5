"""The north rule's deployment contract, literally: `spark-submit
--py-files <package zip>` onto a multi-executor (local-cluster) master,
with the package imported ONLY from the shipped zip (cwd and PYTHONPATH
point away from the repo). One subprocess smoke: full resumable pipeline
over a small synthetic corpus, counters JSON on stdout, index on disk."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _package_zip(dest: str) -> str:
    zpath = os.path.join(dest, "rdf_indexes_spark.zip")
    pkg = os.path.join(REPO, "rdf_indexes_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files(spark, tmp_path):
    from rdf_indexes_spark.synth import generate

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(generate(400, seed=3).transcripts).write.parquet(corpus)

    zpath = _package_zip(str(tmp_path))
    out = str(tmp_path / "idx")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the only package source
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,1536]",
            "--conf", "spark.executor.memory=1200m",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "scripts", "submit_pipeline.py"),
            corpus, out, "8",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: imports must resolve via --py-files
        env=env,
        timeout=420,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    rep = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert rep["num_triples"] > 0
    assert os.path.isdir(os.path.join(out, "perms", "perms5"))
    shutil.rmtree(out, ignore_errors=True)
