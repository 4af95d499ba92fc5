from __future__ import annotations

import shutil
import tempfile

import pytest

from rdf_indexes_spark.session import get_spark
from rdf_indexes_spark.synth import generate


@pytest.fixture(scope="session")
def spark():
    # cores=8: tiny test stages are wave-latency-bound — 8 threads run an
    # 8-partition shuffle in one wave instead of two (measured ~15% off the
    # in-session suite time on the 32-core host; data sizes are unchanged)
    s = get_spark(cores=8, shuffle_partitions=8, app_name="tests", driver_memory="4g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate(600, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, corpus):
    return spark.createDataFrame(corpus.transcripts)


@pytest.fixture(scope="session")
def workdir():
    d = tempfile.mkdtemp(prefix="rdfspark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def cli_tx_index(tmp_path_factory):
    """ONE CLI transcripts build (subprocess, RELATIVE --out pinning the
    cwd-resolution regression) shared by every module that needs a
    CLI-built index layout (test_catalog registration, test_cli's
    dependent chains) — each ~20s subprocess pipeline run beyond the
    first was pure duplication. Mutating consumers copy the index.
    Returns (dir, index path, build report)."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_indexes_spark.synth import generate

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = tmp_path_factory.mktemp("cli_tx")
    src = str(d / "transcripts.parquet")
    # pyarrow writer, NOT an in-process SparkSession: get_spark().stop()
    # here would kill the suite's shared session-scoped SparkContext
    table = pa.Table.from_pandas(
        generate(300, seed=3).transcripts, preserve_index=False
    )
    pq.write_table(table, src, coerce_timestamps="us", allow_truncated_timestamps=True)
    r = subprocess.run(
        [sys.executable, "-m", "rdf_indexes_spark", "--cores", "4", "build",
         "--input", src, "--format", "transcripts", "--out", "idx_tx"],
        capture_output=True, text=True, cwd=str(d),
        env={**os.environ, "PYTHONPATH": repo, "SPARK_GRAFT_DRIVER_MEM": "4g"},
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["num_triples"] > 0
    return d, str(d / "idx_tx"), rep
