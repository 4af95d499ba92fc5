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


# ------------------------------------------------- path-expression algebra
#
# SPARQL 1.1 property paths beyond bare ``p+``: inverse (^), sequence
# (/), alternation (|), and the +/*/? modifiers, over arbitrary nesting.
# The reference engine has no path surface at all (its driver answers
# single patterns, /root/reference/src/queries.cpp:95-186) — this is the
# multi-hop layer a KG user otherwise re-implements with driver loops.
#
# Id spaces: subjects and objects carry INDEPENDENT dense ids
# (scripts/extract_vocabs.py:29-31), but path composition and inversion
# need ONE node domain. Every relation here is therefore evaluated over
# a UNIFIED node id ("uid"): a term that has a subject id keeps it; a
# term that exists only as an object gets its object id displaced by
# UID_OFFSET (subject ids are dense ranks < 2^31 by the store's packing
# invariant, so the ranges cannot collide). The o->uid map is one
# vocab-scale dimension join per atomic step (AQE picks broadcast vs
# shuffle); subjects need no join at all (uid == s-id by construction).
#
# Multiset semantics follow the SPARQL 1.1 spec: ^ / | preserve bags
# (a pair reachable through both branches of an alternation is two
# solutions); the arbitrary-length operators + * ? are duplicate-free.
# Zero-length paths (* and ?) match every term of the graph, computed
# as the distinct uid set of the full triple table — only paid when a
# query actually uses * or ?.

UID_OFFSET = 1 << 32


def unified_maps(vocabs: dict[str, DataFrame]) -> tuple[DataFrame, DataFrame]:
    """(omap, decode) for the unified node space.

    omap: (o_id, uid) — every object id's unified id (the term's s-id
    when the term is also a subject, else o_id + UID_OFFSET).
    decode: (uid, term) — bijective, s-vocab ids first."""
    s = vocabs["s"].select(F.col("id").alias("s_id"), "term")
    o = vocabs["o"].select(F.col("id").alias("o_id"), "term")
    omap = o.join(s, "term", "left").select(
        "o_id", F.coalesce("s_id", F.col("o_id") + F.lit(UID_OFFSET)).alias("uid")
    )
    only_o = o.join(s, "term", "left_anti").select(
        (F.col("o_id") + F.lit(UID_OFFSET)).alias("uid"), "term"
    )
    decode = s.select(F.col("s_id").alias("uid"), "term").unionByName(only_o)
    return omap, decode


def _empty_rel(spark) -> DataFrame:
    return spark.range(0).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    )


def atom_rel(
    tables: dict[str, DataFrame], p_id: int | None, omap: DataFrame | None
) -> DataFrame:
    """One predicate's edges as a unified-space relation (a, b).

    p_id None (the predicate term is absent from the p-vocabulary) is an
    EMPTY relation — not an error: under alternation or * the rest of
    the path may still produce solutions (contrast the whole-query drop
    for absent constants in required patterns, plans/sparql.py)."""
    spark = next(iter(tables.values())).sparkSession
    if p_id is None:
        return _empty_rel(spark)
    e = select(tables, p=p_id).select("s", "o")
    if omap is None:
        return e.select(F.col("s").alias("a"), F.col("o").alias("b"))
    return e.join(omap, e["o"] == omap["o_id"]).select(
        F.col("s").alias("a"), F.col("uid").alias("b")
    )


def nps_rel(
    tables: dict[str, DataFrame],
    excluded_ids: list[int],
    omap: DataFrame | None,
) -> DataFrame:
    """Negated property set ``!(p1|...|pn)``: every edge whose predicate
    is NOT in the set (SPARQL 1.1 §9.1, forward direction). Atoms absent
    from the p-vocabulary exclude nothing (no triple carries them). One
    full scan with the NOT-IN predicate pushed to the reader; bag
    semantics — each matching triple is one solution, like atom_rel."""
    t = next(iter(tables.values())).select("s", "p", "o")
    if excluded_ids:
        t = t.filter(~F.col("p").isin(excluded_ids))
    if omap is None:
        return t.select(F.col("s").alias("a"), F.col("o").alias("b"))
    return t.join(omap, t["o"] == omap["o_id"]).select(
        F.col("s").alias("a"), F.col("uid").alias("b")
    )


def graph_nodes(tables: dict[str, DataFrame], omap: DataFrame | None) -> DataFrame:
    """All graph terms as unified ids — the zero-length-path domain
    (SPARQL 1.1: a zero-length path matches every term IN the graph).
    One distinct over the corpus per * / ? query; cut so repeated
    consumers (star = closure ∪ identity) do not rescan."""
    t = next(iter(tables.values())).select("s", "p", "o")
    subs = t.select(F.col("s").alias("uid"))
    if omap is None:
        objs = t.select(F.col("o").alias("uid"))
    else:
        objs = t.join(omap, t["o"] == omap["o_id"]).select("uid")
    return subs.unionByName(objs).dropDuplicates().localCheckpoint(eager=False)


def eval_path(
    node: tuple,
    tables: dict[str, DataFrame],
    pmap: dict[str, int | None],
    omap: DataFrame | None,
    max_rounds: int = 64,
) -> DataFrame:
    """Evaluate a parsed path AST to a unified-space pair relation (a, b).

    ``node`` is nested tuples: ('atom', text) | ('nps', (text, ...)) |
    ('inv', n) | ('seq', (n1, n2, ...)) | ('alt', (n1, ...)) |
    ('plus'|'star'|'opt', n).
    ``pmap`` maps atom text -> predicate id (None = absent from vocab).
    ``omap`` None means a single shared id domain (integer-engine view).

    Scale shape: atoms are routed pushed-down scans + one vocab-dim map
    join; seq is an equi-join per step (shuffle on the mid uid, skew
    handled upstream by the store's hub salting on read); alt is a bag
    union (no shuffle); + is the linear semi-naive closure (see
    closure_pairs); * / ? add the one-off graph-terms distinct."""
    op = node[0]
    if op == "atom":
        return atom_rel(tables, pmap.get(node[1]), omap)
    if op == "nps":
        excluded = [pmap[a] for a in node[1] if pmap.get(a) is not None]
        return nps_rel(tables, excluded, omap)
    if op == "inv":
        r = eval_path(node[1], tables, pmap, omap, max_rounds)
        return r.select(F.col("b").alias("a"), F.col("a").alias("b"))
    if op == "seq":
        acc = eval_path(node[1][0], tables, pmap, omap, max_rounds)
        for sub in node[1][1:]:
            nxt = eval_path(sub, tables, pmap, omap, max_rounds).select(
                F.col("a").alias("_m"), F.col("b").alias("_b")
            )
            acc = acc.join(nxt, acc["b"] == nxt["_m"]).select(
                "a", F.col("_b").alias("b")
            )
        return acc
    if op == "alt":
        branches = [eval_path(sub, tables, pmap, omap, max_rounds) for sub in node[1]]
        acc = branches[0]
        for b in branches[1:]:
            acc = acc.unionByName(b)  # bag: SPARQL multiset alternation
        return acc
    if op == "plus":
        inner = eval_path(node[1], tables, pmap, omap, max_rounds)
        return closure_pairs(
            inner.select(F.col("a").alias("s"), F.col("b").alias("o")),
            max_rounds=max_rounds,
        ).select(F.col("s").alias("a"), F.col("o").alias("b"))
    if op in ("star", "opt"):
        ident = graph_nodes(tables, omap).select(
            F.col("uid").alias("a"), F.col("uid").alias("b")
        )
        if op == "star":
            inner = eval_path(("plus", node[1]), tables, pmap, omap, max_rounds)
        else:
            inner = eval_path(node[1], tables, pmap, omap, max_rounds)
        return inner.unionByName(ident).dropDuplicates()
    raise ValueError(f"unknown path op {op!r}")
