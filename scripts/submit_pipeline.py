"""spark-submit entrypoint for the KG construction pipeline — the north
rule's deployment contract: ``spark-submit --py-files rdf_indexes_spark.zip
scripts/submit_pipeline.py CORPUS OUT`` on a multi-executor cluster.

The session comes from spark-submit's own master/conf (no get_spark:
cluster managers own memory/core sizing there); the package is imported
from the shipped --py-files zip, so this script must not assume a repo
checkout on the driver or executors. Prints the run's counters as one
JSON line for workflow scripting.

Usage: submit_pipeline.py CORPUS_PARQUET OUT_DIR [NUM_PARTITIONS]
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    corpus, out = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else None

    spark = SparkSession.builder.appName("kg_submit").getOrCreate()
    # imported AFTER the session exists: on spark-submit the zip from
    # --py-files is on sys.path for the driver and shipped to executors
    from rdf_indexes_spark.pipeline import run_pipeline
    from rdf_indexes_spark.sources.transcripts import TRANSCRIPT_SCHEMA

    transcripts = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(corpus)
    art = run_pipeline(spark, transcripts, out, num_partitions=n, input_id=corpus)
    print(json.dumps({"num_triples": art.triples.count(), "counters": art.counters}))
    spark.stop()


if __name__ == "__main__":
    main()
