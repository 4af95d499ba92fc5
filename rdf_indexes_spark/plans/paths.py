"""Property paths: transitive closure over one predicate's edges
(SPARQL 1.1 ``p+``).

The reference has no multi-hop surface at all — its queries stop at one
triple pattern (/root/reference/src/queries.cpp:95-186) and a user
chases paths by re-probing the index per hop from the driver. Here the
closure is a first-class distributed operator.

Algorithm: LINEAR SEMI-NAIVE iteration (the classic Datalog TC plan):
each round composes only the DELTA (pairs discovered last round) with
the STATIC EDGE set, Δ' = (Δ∘E) − R, converging in diameter-many
rounds. Two earlier designs failed at scale and are deliberately NOT
used:

 - naive doubling (R' = R ∪ R∘R): near the fixpoint the self-join
   recomputes ~|V|·|R| known pairs per round to add nothing — measured
   as a driver OOM on a 1M-pair closure;
 - semi-naive DOUBLING (Δ' = (R∘Δ ∪ Δ∘R) − R): log-diameter rounds,
   but each round still joins the OUTPUT-SCALE relation R (tens of
   millions of pairs) against a delta of similar size over the few
   "continuable" mid-point keys — billions of skewed intermediate rows;
   measured 70+ GB of shuffle blocks and an executor OOM on an 85k-edge
   graph whose closure is ~20M pairs.

Linear semi-naive bounds every round's intermediates by
|Δ| × avg-out-degree — proportional to the NEW pairs actually being
derived — and keeps the join's build side the INPUT-scale edge set,
which is broadcast when small (≤ ``broadcast_threshold`` rows): the
composition then runs shuffle-free; only the dedup/anti-join exchange
remains, and it is new-pairs-sized. The trade is diameter-many rounds
instead of log-diameter — the right trade for KG link graphs and
reachability queries, whose diameters are small while their closures
are dense. Each delta is cut with ``localCheckpoint`` (iterative
lineage would otherwise grow per round); the accumulated relation R is
a flat union of the checkpointed deltas, never re-materialized. The
loop exits when Δ is empty — cycles terminate because the pair set is
bounded.

The three independent id spaces (scripts/extract_vocabs.py:29-31) make
hop COMPOSITION subtle: an edge ends at an object-space id, but the
next hop starts at a subject-space id. ``bridge`` carries the o-id →
s-id mapping for identical terms (one term join of the two vocabularies,
vocab-scale); composition happens in subject space and the final hop
keeps its object-space endpoint, so results stay decodable as (s-role
start, o-role end). With ``bridge=None`` the two columns are assumed to
share one id domain (the integer-engine view, e.g. the bench tables).

Scale: diameter × (one composition join — broadcast and shuffle-free
for any realistically-sized edge set — + one delta-sized distinct +
anti-join). Worst case (dense reachability) the ANSWER is quadratic in
vertices; the work stays proportional to the answer, never to
answer × degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .router import select


def path_edges(tables: dict[str, DataFrame], p: int) -> DataFrame:
    """One predicate's edge set: a routed ?P? scan projected to (s, o)."""
    return select(tables, p=p).select("s", "o").dropDuplicates()


def closure_pairs(
    edges: DataFrame,
    bridge: DataFrame | None = None,
    max_rounds: int = 64,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """All (s, o) pairs connected by 1+ hops of ``edges``.

    bridge: optional (o_id, s_id) frame mapping each object-space id to
    the subject-space id of the SAME term; None = single id domain.
    max_rounds bounds path length at max_rounds + 1 hops (default: far
    beyond any real diameter; convergence normally stops much earlier).
    Edge sets at or under ``broadcast_threshold`` rows are broadcast so
    the per-round composition join is shuffle-free."""
    edges = edges.select(F.col("s").alias("a"), F.col("o").alias("b")).dropDuplicates()
    if bridge is not None:
        br = bridge.select(F.col("o_id").alias("_bo"), F.col("s_id").alias("_bs"))
        # continuable edges, re-expressed in subject space
        comp = (
            edges.join(br, edges["b"] == br["_bo"], "inner")
            .select("a", F.col("_bs").alias("b"))
            .dropDuplicates()
        )
    else:
        comp = edges

    # linear semi-naive: R' = R ∪ Δ', Δ' = (Δ∘E) − R. The static edge
    # side is checkpointed once and (when small) broadcast — the hot
    # composition join then never shuffles; only Δ-scale exchanges remain.
    comp = comp.localCheckpoint()
    comp_src = comp.select(F.col("a").alias("_m"), "b")
    if comp.count() <= broadcast_threshold:
        comp_src = F.broadcast(comp_src)
    r = comp  # flat union of checkpointed deltas — never re-materialized
    delta = comp
    for _ in range(max_rounds):
        grow = (
            delta.select("a", F.col("b").alias("_m"))
            .join(comp_src, "_m")
            .select("a", "b")
            .dropDuplicates()
        )
        new_delta = grow.join(r, ["a", "b"], "left_anti").localCheckpoint()
        if new_delta.isEmpty():
            break
        r = r.unionByName(new_delta)
        delta = new_delta

    if bridge is None:
        return r.select(F.col("a").alias("s"), F.col("b").alias("o"))
    # final hop keeps its object-space endpoint: 1-hop edges, plus any
    # composition-space path followed by one raw edge
    multi = (
        r.select("a", F.col("b").alias("_m"))
        .join(edges.select(F.col("a").alias("_m"), "b"), "_m")
        .select("a", "b")
    )
    out = edges.unionByName(multi).dropDuplicates()
    return out.select(F.col("a").alias("s"), F.col("b").alias("o"))


def transitive_closure(
    tables: dict[str, DataFrame],
    p: int,
    bridge: DataFrame | None = None,
    max_rounds: int = 64,
) -> DataFrame:
    """``p+`` pairs over an index: (s, o) reachable via 1+ edges labeled
    ``p``. See ``closure_pairs`` for the bridge/space contract."""
    return closure_pairs(path_edges(tables, p), bridge=bridge, max_rounds=max_rounds)
