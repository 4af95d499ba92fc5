"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. Dot
  products via F.zip_with + F.aggregate (JVM-side, codegen); queries are
  broadcast so the scan streams once over the corpus with no shuffle
  before the per-query top-k aggregation.
- lsh_topk: the scale path — random-hyperplane LSH buckets shrink the
  candidate set; exact cosine re-rank inside buckets. Recall is tunable
  via (planes, tables).

At 100 TB the corpus side stays partitioned; only the k·|Q| candidate
rows shuffle. The brute-force path's cross product is |Q|·N rows but
never materializes — it pipelines scan→dot→window-filter inside one
stage.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) exact top-k per query.

    Self-matches (same id) are excluded. Ties broken by neighbor id for
    determinism across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_col(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b), a < b, cosine >= threshold.

    With ``candidates`` (a, b) — e.g. from LSH bucketing — the exact
    cosine verify runs only on the pruned pair set (the 100 TB path).
    Without, an all-pairs self-join (test scale / oracle parity). Output
    carries no floats, so the driver's value-hash compare is engine-stable
    (the threshold test itself is safe: pairs land ~never within double
    rounding error of the cut)."""
    v = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a = v.select(F.col("_id").alias("a"), F.col("v").alias("va"))
    b = v.select(F.col("_id").alias("b"), F.col("v").alias("vb"))
    if candidates is not None:
        pairs = candidates.select("a", "b").join(a, "a").join(b, "b")
    else:
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    return (
        pairs.withColumn("cosine", cosine_col(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("a", "b")
    )


def embedding_near_dup_lsh(
    corpus: DataFrame,
    threshold: float = 0.9,
    planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: LSH-bucketed candidate pairs, exact cosine verify.

    Per table, docs sharing a sign-pattern bucket form candidates via a
    within-bucket self-join on (bucket) — shuffle keys are small ints.
    High-cosine pairs collide in >=1 of `tables` tables w.h.p."""
    dim = len(corpus.select(vec_col).first()[0])
    v = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cand = None
    for t in range(tables):
        hp = _hyperplanes(dim, planes, t)
        bucketed = v.withColumn("bucket", lsh_bucket_col(F.col("v"), hp))
        lft = bucketed.select("bucket", F.col("_id").alias("a"))
        rgt = bucketed.select("bucket", F.col("_id").alias("b"))
        pairs = lft.join(rgt, "bucket").filter(F.col("a") < F.col("b")).select("a", "b")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()
    return embedding_near_dup(corpus, threshold, id_col, vec_col, candidates=cand)


def _hyperplanes(dim: int, planes: int, table: int, seed: int = 11) -> list[list[float]]:
    rng = np.random.default_rng(seed + 1000 * table)
    return rng.standard_normal((planes, dim)).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id from random hyperplanes (JVM expressions)."""
    bucket = F.lit(0)
    for i, h in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in h]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    planes: int = 8,
    tables: int = 4,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of per-table bucket matches, exact cosine
    re-rank. Each LSH table is one equi-join on (table, bucket) — shuffle
    keys are small ints; bucket skew is bounded by 2^planes spread.

    multiprobe=1 additionally probes, on the (small, broadcast) query side
    only, every bucket at Hamming distance 1 from the query's bucket —
    (planes+1)× more probe rows but the same single scan of the corpus,
    so recall rises steeply at negligible cost at scale."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    cand = None
    for t in range(tables):
        hp = _hyperplanes(dim, planes, t)
        ct = c.withColumn("bucket", lsh_bucket_col(F.col("cv"), hp))
        qt = q.withColumn("bucket", lsh_bucket_col(F.col("qv"), hp))
        if multiprobe >= 1:
            probes = F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(planes)],
            )
            qt = (
                qt.withColumn("bucket_probe", F.explode(probes))
                .drop("bucket")
                .withColumnRenamed("bucket_probe", "bucket")
            )
        pairs = ct.join(F.broadcast(qt), "bucket").select("query_id", "neighbor_id", "qv", "cv")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select("query_id", "neighbor_id", cosine_col(F.col("qv"), F.col("cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )
