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
