"""Transcript source seam (SURVEY.md A1 analogue).

Production target is an Iceberg table of transcripts (BASELINE.json
input_hint); this sandbox has no Iceberg jars, so Parquet paths stand in.
The seam keeps both code paths: ``table:<name>`` reads a catalog table,
anything else is a Parquet path. Column pruning / predicate pushdown are
Catalyst's job either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    if source.startswith("table:"):
        return spark.read.table(source[len("table:"):])
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(source)


def write_transcripts(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)
