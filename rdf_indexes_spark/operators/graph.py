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


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, triangles) — per-node triangle counts over the UNDIRECTED
    simple graph of ``edges`` (direction, duplicates, and self-loops are
    dropped first). Sum of the column = 3 × the global triangle count.

    Scale design (billions of edges): the classic degree-ordered
    orientation (Cohen 2009 MapReduce triangle enumeration). Each
    undirected edge is oriented from the lower-(degree, id) endpoint to
    the higher; every out-neighborhood then has size O(sqrt(m)), so the
    wedge (2-path) frame — the only quadratic-ish intermediate — is
    bounded by sum(out_deg^2) = O(m^1.5) TOTAL and, crucially, a
    degree-10^7 hub contributes only its sqrt(m)-bounded out-wedges, not
    deg^2: orientation IS the skew handling, no salting needed. Three
    hash joins on node keys; no broadcast, no driver state.
    """
    e = _simple_edges(edges, src_col, dst_col)
    return _triangle_corners(e, _degrees(e))


def _simple_edges(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Canonical (u < v) simple undirected edge frame: direction,
    duplicates, and self-loops dropped."""
    u, v = F.col(src_col).cast("long"), F.col(dst_col).cast("long")
    return (
        edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    """(n, d) — simple-graph degree per node."""
    return (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )


def _triangle_corners(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Per-node triangle counts over a canonical edge frame + its degrees."""
    # orientation key (degree, id): total order, ties broken by id
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    keyed = e.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=False)
    # wedges at the minimum-order corner: (a; b, c) with order(b) < order(c);
    # the closing edge b—c is itself oriented b→c (b is the middle corner),
    # so one equi-join on (b, c) finds each triangle exactly once
    o1 = oriented.select(
        F.col("a"), F.col("b"), F.col("db").alias("kb")
    )
    o2 = oriented.select(
        F.col("a"), F.col("b").alias("c"), F.col("db").alias("kc")
    )
    wedges = o1.join(o2, "a").filter(
        (F.col("kb") < F.col("kc"))
        | ((F.col("kb") == F.col("kc")) & (F.col("b") < F.col("c")))
    )
    tri = wedges.join(
        oriented.select(F.col("a").alias("b"), F.col("b").alias("c")),
        ["b", "c"],
    ).select("a", "b", "c")
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def clustering_profile(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, degree, triangles, wedges) — the local-clustering signal
    per node over the simple undirected graph, as EXACT integers:
    ``wedges`` = d(d-1)/2 (closable pairs), ``triangles`` = closed ones
    (0 where triangle-free). Local clustering coefficient is
    triangles/wedges — left to the consumer so every emitted column
    stays engine-portable integral (no float drift vs a SQL oracle).

    Cost shape: the triangle pipeline (see ``triangle_count``) plus one
    node-keyed left join of its output onto the degree frame — no new
    scale surface. ``shiftright(d*(d-1), 1)`` keeps the even product
    exact where a double division would lose precision past 2^53.
    """
    e = _simple_edges(edges, src_col, dst_col).localCheckpoint(eager=False)
    deg = _degrees(e).localCheckpoint(eager=False)
    tri = _triangle_corners(e, deg)
    d = F.col("d")
    return (
        deg.join(tri, deg["n"] == tri["node"], "left")
        .select(
            F.col("n").alias("node"),
            d.cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            F.shiftright(d * (d - F.lit(1)), 1).cast("long").alias("wedges"),
        )
    )


def cooccurrence_counts(
    items: DataFrame,
    group_col: str = "group_id",
    item_col: str = "item",
    max_group_size: int | None = None,
) -> DataFrame:
    """(a, b, n_ab, n_a, n_b, n_groups) — exact-integer co-occurrence
    signals for PMI-style entity relatedness: for every unordered item
    pair, the number of groups containing both, each item's group count,
    and the total group count. PMI(a,b) = log(n_ab·n_groups / (n_a·n_b))
    is left to the consumer so every emitted column stays integral
    (engine-portable, no log drift vs a SQL oracle). Presence counting:
    duplicates within a group collapse first.

    Scale design: the only quadratic surface is the per-group pair
    expansion (one equi-join of the deduped (group, item) frame with
    itself on group). ``max_group_size`` drops groups above the cap
    BEFORE pairing — the same quadratic-blowup guard as LSH's
    max_bucket: one mega-group of 10^6 items would otherwise emit 10^12
    pairs. Marginals and the group total still count ALL groups (the
    cap changes candidate pairs, not the statistics' denominator).
    n_groups rides as a broadcast one-row frame — no driver action.
    """
    g = (
        items.select(F.col(group_col).alias("g"), F.col(item_col).alias("i"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    paired = g
    if max_group_size is not None:
        sizes = g.groupBy("g").agg(F.count("*").alias("_gsz"))
        paired = (
            g.join(sizes.filter(F.col("_gsz") <= max_group_size), "g")
            .drop("_gsz")
        )
    l, r = paired.alias("l"), paired.alias("r")
    n_ab = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.i") < F.col("r.i")))
        .select(F.col("l.i").alias("a"), F.col("r.i").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
    )
    ni = g.groupBy("i").agg(F.count("*").alias("n"))
    ng = g.agg(F.countDistinct("g").alias("n_groups"))
    return (
        n_ab.join(ni.select(F.col("i").alias("a"), F.col("n").alias("n_a")), "a")
        .join(ni.select(F.col("i").alias("b"), F.col("n").alias("n_b")), "b")
        .crossJoin(F.broadcast(ng))
        .select("a", "b", "n_ab", "n_a", "n_b", "n_groups")
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """(node,) — the k-core of the simple undirected graph: the maximal
    subgraph where every node has degree ≥ k within the subgraph,
    computed by synchronous peeling (repeatedly delete all nodes of
    current degree < k). The classic KG-pruning signal: entities outside
    a small core are long-tail leaves.

    Scale design: each round is one degree aggregate + two semi-joins on
    node keys over a strictly shrinking edge frame — no driver-side
    state beyond the loop counter and a per-round emptiness probe on the
    REMOVED set (count of a frame that is usually tiny and soon empty).
    Peeling rounds are bounded by the degeneracy ordering's depth; for
    real graphs that is tens of rounds, and ``max_rounds`` caps
    pathological chains (correct result requires convergence — asserted
    by the final round finding nothing to remove; a cap hit raises).
    Lineage is cut every round (iterative plans otherwise stack
    exponentially in the optimizer).
    """
    e = _simple_edges(edges, src_col, dst_col).localCheckpoint(eager=False)
    for _ in range(max_rounds):
        deg = _degrees(e)
        low = deg.filter(F.col("d") < k).localCheckpoint(eager=True)
        if low.isEmpty():
            return deg.select(F.col("n").alias("node"))
        e = (
            e.join(low.select(F.col("n").alias("u")), "u", "left_anti")
            .join(low.select(F.col("n").alias("v")), "v", "left_anti")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k_core did not converge within {max_rounds} rounds")


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """(node, community) — community detection by synchronous label
    propagation (Raghavan et al. 2007) over the simple undirected
    graph, with every tie broken DETERMINISTICALLY so the result is a
    pure function of the edge set (the published algorithm's random
    tie-breaks and visit order make runs non-reproducible — useless as
    a pipeline stage):

      - every node votes with its neighbors' labels AND its own
        (self-inclusion also damps the classic bipartite 2-cycle);
      - a node adopts the SMALLEST label among those of maximal
        frequency (min-of-struct over (-count, label));
      - all nodes update simultaneously; the loop stops when no label
        changed. A ``max_rounds`` hit raises — a silently truncated
        propagation is NOT a fixpoint and must not be mistaken for one.

    Scale shape per round: one join of the directed-both-ways edge list
    against the label frame (keyed on the neighbor — hub labels fan out
    via the join, no broadcast of node-scale state), one (node, label)
    hash aggregate with map-side partials absorbing hub in-degree, one
    per-node min reduce, and a changed-count probe. Labels frame is
    node-scale; lineage cut every round.
    """
    e = _simple_edges(edges, src_col, dst_col)
    both = (
        e.select(F.col("u").alias("n"), F.col("v").alias("nbr"))
        .unionAll(e.select(F.col("v").alias("n"), F.col("u").alias("nbr")))
        .localCheckpoint(eager=False)
    )
    labels = (
        both.select("n").distinct().select("n", F.col("n").alias("lbl"))
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        votes = both.join(
            labels.select(F.col("n").alias("nbr"), "lbl"), "nbr"
        ).select("n", "lbl").unionAll(labels)
        counted = votes.groupBy("n", "lbl").agg(F.count(F.lit(1)).alias("c"))
        new = (
            counted.groupBy("n")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("lbl"))).alias("m"))
            .select("n", F.col("m.lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        converged = (
            new.join(labels.withColumnRenamed("lbl", "old"), "n")
            .filter(F.col("lbl") != F.col("old"))
            .isEmpty()
        )
        labels = new
        if converged:
            return labels.select("n", F.col("lbl").alias("community"))
    raise RuntimeError(
        f"label_propagation did not converge within {max_rounds} rounds"
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """(node, dist): minimum hop count from ANY seed, bounded at
    ``max_hops`` — the n-hop-neighborhood primitive KG pipelines use
    for subgraph extraction around query entities (the reference
    answers single-pattern lookups, /root/reference/src/queries.cpp;
    multi-hop expansion is its natural composition).

    seeds: a one-column (node) frame; seeds report dist 0 even when
    isolated. Exact frontier BFS, not Dijkstra — edges are unweighted.

    Scale shape per hop: one join of the CURRENT FRONTIER (not the
    visited set) against the edge list keyed on src, one dedup, one
    anti-join against visited. Visited accumulates as a flat union of
    per-hop checkpointed deltas, so no plan grows with hop count; the
    loop exits early when a frontier empties. Hub fan-out lands in the
    dedup aggregate's map-side partials. All exchanges are node- or
    frontier-scale; nothing is ever collected to the driver.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not directed:
        e = e.unionAll(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
    e = e.dropDuplicates().localCheckpoint(eager=False)

    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .dropDuplicates()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(h).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def degree_histogram(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """(degree, n_nodes): the degree distribution — out-degree over the
    deduped directed edge set, or total degree of the simple undirected
    graph with ``directed=False``. The zipf-head census that sizes hub
    salting and broadcast thresholds (the reference reports the same
    shape as its range-length distribution,
    /root/reference/include/stats.hpp:63-114).

    Plan: two hash aggregates — node-keyed degree count (map-side
    partials absorb hubs), then degree-keyed histogram over a
    node-scale frame. No joins, no windows.
    """
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if directed:
        e = e.dropDuplicates()
        nodes = e.select("u")
    else:
        e = _simple_edges(edges, src_col, dst_col)
        nodes = e.select("u").unionAll(e.select(F.col("v").alias("u")))
    return (
        nodes.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def link_prediction(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_center_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Common-neighbor link-prediction scores (Liben-Nowell & Kleinberg
    2003) over the simple undirected graph: one row per NON-adjacent
    unordered pair (x, y) sharing >= ``min_common`` neighbors, with

      cn          exact common-neighbor count |N(x) ∩ N(y)|
      deg_x/deg_y exact degrees
      n_union     exact |N(x) ∪ N(y)| = deg_x + deg_y - cn
      aa          Adamic-Adar  Σ_z 1/ln(deg(z))   (z = common neighbor)
      ra          resource-allocation Σ_z 1/deg(z)
      jaccard     cn / n_union

    The KG-completion candidate generator: scored pairs are the edges a
    curator (or a TransE ranker fed by kg_negative_samples) reviews.
    Every count/degree column is an exact integer so a SQL oracle can
    replay them bit-for-bit; aa/ra/jaccard are float conveniences
    DERIVED from those integers (sum order makes them engine-specific —
    oracles should compare the integer columns).

    Scale design: the only quadratic surface is the wedge expansion —
    Σ_z deg(z)² pairs, one self-equi-join of the adjacency list keyed on
    the center. ``max_center_degree`` drops centers above the cap BEFORE
    pairing (the same guard as cooccurrence_counts' max_group_size, and
    principled here: a hub center contributes only 1/ln(deg) ≈ 0 weight
    per pair while emitting deg² of them). Degrees still count ALL
    edges — the cap prunes candidates, never the statistics. The
    existing-edge exclusion is a left-anti equi-join on the canonical
    (u < v) pair; everything shuffles integers only.
    """
    e = _simple_edges(edges, src_col, dst_col).localCheckpoint(eager=False)
    deg = _degrees(e)  # (n, d)
    # adjacency list (node, c): each undirected edge both ways
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("c")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("c"))
    )
    centers = deg.select(F.col("n").alias("c"), F.col("d").alias("deg_c"))
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg_c") <= max_center_degree)
    wedge_src = adj.join(centers, "c")
    l, r = wedge_src.alias("l"), wedge_src.alias("r")
    scores = (
        l.join(r, (F.col("l.c") == F.col("r.c")) & (F.col("l.node") < F.col("r.node")))
        .select(
            F.col("l.node").alias("x"),
            F.col("r.node").alias("y"),
            F.col("l.deg_c").alias("deg_c"),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(F.lit(1.0) / F.log(F.col("deg_c"))).alias("aa"),
            F.sum(F.lit(1.0) / F.col("deg_c")).alias("ra"),
        )
        .filter(F.col("cn") >= min_common)
    )
    # non-adjacent pairs only: (x, y) is already canonical (x < y), so one
    # anti-join against the canonical edge frame suffices
    cand = scores.join(
        e, (scores["x"] == e["u"]) & (scores["y"] == e["v"]), "left_anti"
    )
    return (
        cand.join(deg.select(F.col("n").alias("x"), F.col("d").alias("deg_x")), "x")
        .join(deg.select(F.col("n").alias("y"), F.col("d").alias("deg_y")), "y")
        .select(
            "x",
            "y",
            "cn",
            "deg_x",
            "deg_y",
            (F.col("deg_x") + F.col("deg_y") - F.col("cn")).alias("n_union"),
            "aa",
            "ra",
            (
                F.col("cn").cast("double")
                / (F.col("deg_x") + F.col("deg_y") - F.col("cn"))
            ).alias("jaccard"),
        )
    )


def random_walks(
    edges: DataFrame,
    num_walks: int = 4,
    walk_length: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    a: int | None = None,
    b: int | None = None,
    checkpoint_every: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """(walk_id, step, node) — a DETERMINISTIC random-walk corpus over
    the directed graph: ``num_walks`` walks of up to ``walk_length``
    steps from every node with out-edges (the DeepWalk/node2vec training
    corpus for KG embeddings). A walk ends early at a dead end.

    Unlike rand()-driven walks, every step is a pure function of
    (walk_id, step) through the repo's engine-portable affine-hash
    contract (operators/sampling._variate's family over the 31-bit
    Mersenne prime): step t from node u moves to u's neighbor with index
    ``H(H(walk_id), t) mod out_deg(u)`` in dst-ascending order. The
    corpus is therefore reproducible across runs, cluster sizes, and
    input layouts, and a SQL oracle replays it value-for-value with a
    recursive CTE — the same portability contract every sampler here
    honors.

    Scale design: adjacency neighbor indices come from
    functions.ranking.grouped_rank (range exchange + per-partition rank
    + distributed offsets — a 10^7-degree hub contributes rows, never a
    single 10^7-row sort task); the per-step move is ONE equi-join of
    the walker frame (|V|·num_walks rows, integers only) against the
    adjacency on (node, index) plus one against the degree frame; hub
    in-degree concentrates walkers on hot rows, which a hash equi-join
    absorbs map-side. Lineage is cut every ``checkpoint_every`` steps.
    """
    from .sampling import _A, _B
    from ..functions.ranking import grouped_rank
    from .dedup import _P

    a = _A if a is None else a
    b = _B if b is None else b
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("s"),
            F.col(dst_col).cast("long").alias("d"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = grouped_rank(
        e, "s", [F.col("d")], id_col="idx", num_partitions=num_partitions
    ).select(
        F.col("s").alias("a_node"), F.col("d").alias("a_next"), F.col("idx")
    )
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("s").alias("d_node"), "deg"
    )

    def _h(key):  # affine over the Mersenne prime, non-negative longs
        return F.pmod(F.lit(a) * F.pmod(key, F.lit(_P)) + F.lit(b), F.lit(_P))

    state = (
        deg.select(F.col("d_node").alias("s"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("w"),
            F.col("s").alias("node"),
        )
        .select(
            (F.col("node") * num_walks + F.col("w")).alias("walk_id"),
            F.col("node"),
        )
        .withColumn("h1", _h(F.col("walk_id")))
    )
    out = state.select("walk_id", F.lit(0).alias("step"), "node")
    for t in range(1, walk_length + 1):
        nxt = (
            state.join(deg, state["node"] == deg["d_node"])
            .withColumn("pick", F.pmod(_h(F.col("h1") + F.lit(t)), F.col("deg")))
            .drop("d_node", "deg")
            .join(adj, (F.col("node") == F.col("a_node")) & (F.col("pick") == F.col("idx")))
            .select("walk_id", F.col("a_next").alias("node"), "h1")
        )
        if t % checkpoint_every == 0 and t < walk_length:
            nxt = nxt.localCheckpoint(eager=False)
        state = nxt
        out = out.unionByName(state.select("walk_id", F.lit(t).alias("step"), "node"))
    return out


def personalized_pagerank(
    edges: DataFrame,
    sources: list[int],
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank) — PageRank with teleport restricted to ``sources``
    (uniformly): the random surfer restarts at the seed set, so rank is
    relatedness TO the seeds — the standard KG entity-similarity /
    recommendation signal (seed = a query entity's neighborhood). Ranks
    sum to 1; nodes unreachable from the seeds converge to 0.

    Same plan shape as pagerank (one src-keyed join + one dst-keyed SUM
    aggregate per iteration, dangling mass as a broadcast one-row frame,
    lineage cut every ``checkpoint_every`` rounds); the teleport vector
    rides as a broadcast |seeds|-row frame instead of a constant — seed
    sets are query-sized, never corpus-sized.
    """
    if not sources:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    spark = edges.sparkSession
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
    from ..functions.ranking import _literal_df

    seeds = set(int(s) for s in sources)
    t = F.broadcast(
        _literal_df(spark, [(s,) for s in sorted(seeds)], [("node", "long")])
        .withColumn("t", F.lit(1.0 / len(seeds)))
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    w_edges = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .persist()
    )
    dangling = nodes.join(
        e.select("src").distinct(), nodes["node"] == F.col("src"), "left_anti"
    ).persist()

    ranks = nodes.join(t, "node", "left").select(
        "node", F.coalesce(F.col("t"), F.lit(0.0)).alias("rank")
    )
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
            .join(t, "node", "left")
            .crossJoin(F.broadcast(dmass))
            .select(
                "node",
                (
                    F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") * F.coalesce(F.col("t"), F.lit(0.0))
                    )
                    + (1.0 - damping) * F.coalesce(F.col("t"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.localCheckpoint(eager=True)
    for df in (nodes, w_edges, dangling):
        df.unpersist()
    return out


def weighted_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    checkpoint_every: int = 2,
) -> DataFrame:
    """(source, node, dist) — minimum total edge weight from each seed
    over directed paths of AT MOST ``max_hops`` edges (exact integers).
    The weighted complement of bfs_distances: cost-bounded neighborhood
    extraction over a KG whose edges carry confidence / latency /
    toll-style integer costs. The hop bound is part of the SEMANTICS
    (k-hop Bellman-Ford), which keeps the answer well-defined and
    SQL-replayable on any graph — including ones with cycles — without
    assuming convergence.

    Scale shape per round (classic Bellman-Ford relaxation): one
    equi-join of the current best frame keyed on node against the edge
    list keyed on src, then one (source, node) min-aggregate over
    best ∪ relaxed — map-side partial mins absorb hub fan-in. The best
    frame is (|seeds| × reachable-nodes) rows of three integers;
    lineage is cut every ``checkpoint_every`` rounds. Negative weights
    are rejected (with a hop bound they would be path-length-dependent,
    not shortest-path, semantics).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    # parallel edges collapse to their cheapest — the only one a
    # shortest path ever uses
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w"))
    e = e.withColumn(
        "w",
        F.when(
            F.col("w") < 0,
            F.raise_error(F.lit("weighted_distances: negative edge weight")),
        ).otherwise(F.col("w")),
    ).localCheckpoint(eager=False)
    best = (
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("source"))
        .dropDuplicates()
        .select("source", F.col("source").alias("node"), F.lit(0).cast("long").alias("dist"))
        .localCheckpoint()
    )
    for h in range(1, max_hops + 1):
        relaxed = (
            best.join(e, best["node"] == e["src"])
            .select("source", F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        best = (
            best.unionByName(relaxed)
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
        )
        if h % checkpoint_every == 0 or h == max_hops:
            best = best.localCheckpoint(eager=False)
    return best
