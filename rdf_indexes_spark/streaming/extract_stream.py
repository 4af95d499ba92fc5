"""Structured-Streaming variant of mention extraction.

The reference is strictly batch (no streaming anywhere in
/root/reference); this is the incremental-ingest path a production
transcript feed needs: readStream over the transcript table's directory
→ the SAME mapInPandas extractor (stateless, so batch/stream parity is
exact) → append sink. Watermarked per-minute mention counts demonstrate
late-data handling for monitoring rollups.

Dictionary encoding and permutation maintenance stay batch jobs over the
streamed-in mention log (the reference's ids are global frequency ranks —
a streaming operator cannot assign them without reprocessing; the lambda
split is deliberate and documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import _extract_batches, MENTION_SCHEMA
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_mentions(transcripts: DataFrame) -> DataFrame:
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        _extract_batches, schema=MENTION_SCHEMA
    )


def mention_rate(transcripts: DataFrame, window: str = "1 minute", watermark: str = "5 minutes") -> DataFrame:
    """Watermarked windowed mention-bearing-turn counts (monitoring rollup)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("turns"))
    )
