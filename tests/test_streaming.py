"""Structured-Streaming extraction: batch/stream parity (the extractor is
stateless, so the streamed mention log must equal the batch one) and the
watermarked monitoring rollup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rdf_indexes_spark.operators.extract import extract_mentions
from rdf_indexes_spark.sources.transcripts import write_transcripts
from rdf_indexes_spark.streaming.extract_stream import (
    mention_rate,
    stream_mentions,
    stream_transcripts,
)


def test_stream_batch_parity(spark, transcripts, workdir):
    src = os.path.join(workdir, "stream_src")
    write_transcripts(transcripts, src)
    stream = stream_mentions(stream_transcripts(spark, src, max_files=4))
    q = (
        stream.writeStream.format("memory")
        .queryName("mentions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("mentions_stream")
    batch = extract_mentions(transcripts)
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_mention_rate_rollup(spark, transcripts):
    rates = (
        mention_rate(transcripts, window="1 minute", watermark="5 minutes")
        .select("role", "turns")
        .groupBy("role")
        .agg(F.sum("turns").alias("turns"))
    )
    got = {r["role"]: r["turns"] for r in rates.collect()}
    exp = {
        r["role"]: r["cnt"]
        for r in transcripts.groupBy("role").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == exp
