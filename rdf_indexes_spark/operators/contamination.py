"""Benchmark decontamination: n-gram overlap between a training corpus
and a held-out benchmark/eval set.

The standard training-data hygiene step (GPT-3 appendix C / PaLM /
Llama style): a training document is *contaminated* when it shares at
least one token n-gram with any benchmark document. We report, per
corpus document, how many of its distinct n-grams appear anywhere in
the benchmark and how many distinct benchmark documents it collides
with, so callers can either drop whole documents or route them to a
span-removal pass (operators/dedup.duplicate_spans does the span-level
variant).

Scale shape (100 TB corpus, benchmark ≪ corpus):
 - n-gram generation is a pure JVM expression (split → sequence →
   transform/slice/array_join) — whole-stage codegen, no Python;
 - each side is reduced to (id, gram-key) pairs BEFORE the join, so
   document text never rides a shuffle;
 - gram keys are xxhash64 longs by default (`hashed_keys=True`): an
   8-gram string is ~50-60 bytes, its hash is 8 — the join exchange
   shrinks ~7×. Collision risk 2^-64 per pair, fine for filtering
   (set hashed_keys=False for byte-exact auditing);
 - the benchmark side is tiny in practice, so it is broadcast — the
   corpus side never shuffles at all in the default configuration.

The reference has no decontamination analogue; this extends the
training-data-pipeline surface beside dedup.py (same tokenizer:
whitespace split of lower(trim(text))).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_set(text_col: str, n: int):
    """Array of the DISTINCT space-joined token n-grams of ``text_col``.

    Documents with fewer than n tokens contribute no n-grams. Pure
    column expression (codegen); 1-based F.slice with a lambda index.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    hashed_keys: bool = True,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, n_hit_ngrams, n_bench_docs, contaminated) per corpus doc.

    n_hit_ngrams — distinct n-grams of the document that occur anywhere
    in the benchmark; n_bench_docs — distinct benchmark documents it
    shares at least one n-gram with; contaminated — 1 if n_hit_ngrams>0.
    Every corpus document appears exactly once (zeros when clean).
    """
    gram = F.explode(ngram_set(text_col, n)).alias("gram")
    key = (F.xxhash64("gram") if hashed_keys else F.col("gram")).alias("g")

    cg = (
        corpus.select(F.col(id_col).alias("doc_id"), gram)
        .select("doc_id", key)
    )
    bg = (
        benchmark.select(F.col(bench_id_col).alias("bench_id"), gram)
        .select("bench_id", key)
        .dropDuplicates(["g", "bench_id"])
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)

    hits = (
        cg.join(bg, "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_hit_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit_ngrams", F.lit(0)).cast("long").alias("n_hit_ngrams"),
            F.coalesce("n_bench_docs", F.lit(0)).cast("long").alias("n_bench_docs"),
            F.when(F.coalesce("n_hit_ngrams", F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("contaminated"),
        )
    )
