"""Graph analytics over the constructed KG: PageRank entity salience.

The KG pipeline materializes an entity graph (canonicalized subject →
object edges); ranking entities by PageRank is the standard salience
signal for downstream corpus weighting (which entities' documents to
up-sample) and for entity-linking priors. The reference indexes have no
analogue — this extends the pipeline surface the same way dedup/ANN do.

Scale design (billions of edges):
 - power iteration entirely as DataFrame joins/aggregations — no
   driver-side state beyond the node count and the loop counter;
 - per-edge weight 1/out_degree is folded into the edge frame ONCE and
   persisted, so each iteration is one join (keyed on src) + one
   aggregation (keyed on dst). The dst-side aggregation is a SUM —
   map-side partial aggregation absorbs hub in-degree skew, no salting
   needed (unlike collect-style groupBys);
 - dangling mass (nodes with no out-edges) is carried as a one-row
   frame cross-joined via broadcast — no per-iteration driver action;
 - lineage is cut with localCheckpoint every `checkpoint_every`
   iterations (iterative plans otherwise grow exponentially in
   optimizer time and executor stack depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank) over the directed graph of ``edges``.

    Fixed-iteration power method with uniform teleport and dangling-mass
    redistribution: ranks sum to 1 after every iteration. Duplicate
    edges are collapsed first (the KG's dedup'd triple set already is).
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).dropDuplicates(["src", "dst"])

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    w_edges = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .persist()
    )
    dangling = nodes.join(
        e.select("src").distinct(), nodes["node"] == F.col("src"), "left_anti"
    ).persist()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for i in range(iterations):
        contribs = (
            w_edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("c"))
            .withColumnRenamed("dst", "node")
        )
        dmass = dangling.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)

    out = ranks.localCheckpoint(eager=True)
    for df in (nodes, w_edges, dangling):
        df.unpersist()
    return out
