"""Canonicalization: connected components over link edges, then
frequency-based representative selection (north-rule step 3).

CC algorithm: iterative min-label propagation over the symmetrized edge
set — label(v) ← min(label(v), min label of neighbors) until fixpoint.
Alias clusters have tiny diameter (surface variants of one entity), so
convergence is 2-4 rounds; each round is one shuffle join + one skew-safe
two-level min aggregation (hub surfaces — the zipf head the reference's
range census documents, /root/reference/include/stats.hpp:63-114 — are
salted so no single reducer owns a hub's whole edge list). Each round is
localCheckpoint'ed to cut lineage, which is what makes the loop viable at
10^12-edge scale (and resumable mid-pipeline via the stage manifest).

For adversarial long-chain graphs, swap the body for alternating
large-star/small-star (Kiveris et al., "Connected Components in MapReduce
and Beyond") — the helper is structured so only ``_one_round`` changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_endpoints(edges: DataFrame) -> DataFrame:
    """Distinct surfaces incident to at least one link edge. CC only ever
    needs these: every other surface is trivially its own component (and
    canonicalize_mentions' left-join+coalesce maps it to itself for free).
    At scale the link graph is orders of magnitude smaller than the
    surface vocabulary, so restricting CC to endpoints shrinks the
    iterated state from |vocab| to |linked surfaces|."""
    return (
        edges.select(F.col("a").alias("surface"))
        .unionAll(edges.select(F.col("b").alias("surface")))
        .distinct()
    )


def _propagate(sym_id: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label round over the self-looped symmetric edge set:
    labels' = min component over neighbors (incl. self via the loops).
    ONE join + ONE groupBy; labels referenced ONCE, so a k-round plan
    grows linearly (a naive union(labels, nbr-mins) references labels
    twice and doubles the plan every round: 2^k analysis blowup)."""
    return (
        sym_id.join(labels, sym_id.dst == labels.surface)
        .groupBy("src")
        .agg(F.min("component").alias("component"))
        .select(F.col("src").alias("surface"), "component")
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
    fixed_rounds: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """nodes(surface) + edges(a,b) → (surface, component) with component =
    lexicographic-min surface reachable from each node.

    fixed_rounds=k builds k propagation rounds as ONE lazy plan — no
    per-round checkpoint — then runs ONE verification round and counts
    changed labels (a single cheap job over link-graph-sized state): if
    any label still moves, k was below the component diameter and the
    loop continues to the fixpoint instead of silently under-merging.
    The default (None) is the general fixpoint loop with per-round
    lineage checkpoints — the 10^12-edge-safe path.

    num_partitions sizes the loop's exchanges by the LINK GRAPH (callers
    pass an edge-count-derived value), not the session default: the loop
    is ~2 stage waves per round over graph-sized state, so surplus
    partitions are pure task-dispatch latency repeated every round — a
    fixed cost identical at every cluster size. The aggregations inside
    the rounds follow spark.sql.shuffle.partitions, and every CC stage
    executes inside this function's verification job (the k-round plan +
    lazy checkpoints all materialize there), so the conf is scoped to
    the function body and restored on exit — keeping ALL loop exchanges
    at num_partitions so each round's join stays co-partitioned (a
    mismatch would re-exchange the labels side every round)."""
    salt_k = 16
    spark = nodes.sparkSession
    _conf_key = "spark.sql.shuffle.partitions"
    _old_parts = spark.conf.get(_conf_key)
    if num_partitions:
        spark.conf.set(_conf_key, str(num_partitions))
    try:
        return _connected_components_body(
            nodes, edges, max_iter, fixed_rounds, num_partitions, salt_k
        )
    finally:
        spark.conf.set(_conf_key, _old_parts)


def _connected_components_body(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int,
    fixed_rounds: int | None,
    num_partitions: int | None,
    salt_k: int,
) -> DataFrame:
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    if fixed_rounds is not None:
        # no dedup shuffle on sym: min-aggregation is idempotent under
        # duplicate edges, and candidate edges are already distinct pairs
        # repartition BEFORE persist: the 3-way union otherwise caches with
        # the summed partition count of its inputs (~5x shuffle.partitions
        # of near-empty blocks), and every round re-reads all of them — a
        # per-round fixed cost that is identical at every cluster size
        # (profiled: the single largest serial-floor item). One hash
        # exchange on the join key collapses it; rounds then join
        # co-partitioned sides.
        # partitions sized by the LINK GRAPH, not the cluster (callers pass
        # edge-count-derived num_partitions): the loop is ~2 stage waves
        # per round over graph-sized state, so surplus partitions are pure
        # task-dispatch latency — a per-round fixed cost identical at
        # every cluster size (the serial-floor shape again).
        nparts = num_partitions or int(
            nodes.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        sym_id = (
            sym.unionByName(
                nodes.select(F.col("surface").alias("src"), F.col("surface").alias("dst"))
            )
            .repartition(nparts, "dst")
            .persist()  # reused every round inside the one consuming job
        )
        # try/finally: the cached symmetrized graph must not outlive this
        # call on ANY path — success returns (the check job has already
        # materialized labels' lazy checkpoint, so the result no longer
        # needs the cache) or a failed check job (direct callers have no
        # pipeline-level cache snapshot to clean up leaked graph-scale
        # RDDs after a retry).
        try:
            labels = nodes.select(F.col("surface"), F.col("surface").alias("component"))
            for _ in range(fixed_rounds):
                labels = _propagate(sym_id, labels)
            # convergence proof: one extra round must change zero labels.
            # labels is cut so the k-round prefix computes once; the check
            # is one count over |linked surfaces| rows.
            labels = labels.localCheckpoint(eager=False)
            rounds = fixed_rounds
            while rounds < max_iter:
                nxt = _propagate(sym_id, labels).localCheckpoint(eager=False)
                changed = (
                    nxt.join(labels.withColumnRenamed("component", "_old"), "surface")
                    .filter(F.col("component") != F.col("_old"))
                    .limit(1)
                    .count()
                )
                if changed == 0:
                    return labels
                labels = nxt  # under-converged: keep propagating to fixpoint
                rounds += 1
            return labels
        finally:
            sym_id.unpersist()
    nparts = num_partitions or int(
        nodes.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    sym = sym.repartition(nparts, "dst").persist()
    labels = nodes.select(F.col("surface"), F.col("surface").alias("component")).localCheckpoint()
    for _ in range(max_iter):
        # neighbor labels via one shuffle join; previous label rides along
        # (as `old`) so convergence needs no second join.
        nbr = sym.join(labels, sym.dst == labels.surface).select(
            F.col("src").alias("surface"), "component", F.lit(None).cast("string").alias("old")
        )
        cand = labels.select("surface", "component", F.col("component").alias("old")).unionByName(nbr)
        # two-level min: (surface, salt) then surface — hub surfaces never
        # funnel their whole neighbor list through one reducer.
        lvl1 = (
            cand.withColumn("_salt", F.pmod(F.xxhash64("component"), F.lit(salt_k)))
            .groupBy("surface", "_salt")
            .agg(F.min("component").alias("component"), F.max("old").alias("old"))
        )
        new_labels = (
            lvl1.groupBy("surface")
            .agg(F.min("component").alias("component"), F.max("old").alias("old"))
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("component") != F.col("old")).limit(1).count()
        labels = new_labels.drop("old")
        if changed == 0:
            break
    sym.unpersist()
    return labels


def canonical_map(
    mentions_facts: DataFrame, components: DataFrame, broadcast_components: bool = True
) -> DataFrame:
    """(surface, canonical): representative = most frequent surface in the
    component across subj+obj fact occurrences; ties → lexicographic min.

    Frequency semantics mirror the reference's vocab counting over the raw
    corpus (/root/reference/scripts/extract_vocabs.py:33-56) — duplicates
    count.

    broadcast_components: the semi-filter below force-broadcasts the
    component surfaces (an explicit hint BYPASSES autoBroadcastJoinThreshold
    — it is not best-effort). Right for link graphs orders of magnitude
    below the corpus; pass False for billion-edge graphs and the filter
    becomes a shuffled left-semi join instead (same semantics, no driver
    collect) — the same escape hatch as canonicalize_mentions'
    broadcast_map."""
    # only LINKED surfaces ever consume a frequency (lab below is
    # components LEFT-join occ) — semi-filter the melted fact stream by
    # the component surfaces BEFORE aggregating, so the occ exchange
    # ships link-graph-scale rows, not one per distinct corpus surface.
    # This keeps every exchange in this function graph-scale, matching
    # the edge-count-derived shuffle width pipeline callers scope around
    # it.
    surfaces = components.select("surface")
    if broadcast_components:
        surfaces = F.broadcast(surfaces)
    occ = (
        mentions_facts.select(F.col("subj").alias("surface"))
        .unionAll(mentions_facts.select(F.col("obj").alias("surface")))
        .join(surfaces, "surface", "left_semi")
        .groupBy("surface")
        .agg(F.count("*").alias("freq"))
    )
    # lazy cut: lab is referenced three times below (max-freq agg, the
    # tie filter, the final join) — uncut, the components⋈occ subtree
    # would compute three times inside the one consuming job.
    lab = (
        components.join(occ, "surface", "left")
        .fillna(0, subset=["freq"])
        .localCheckpoint(eager=False)
    )
    # representative via two aggregations instead of a per-component
    # window: Window.partitionBy(component) funnels a giant component's
    # whole surface list through ONE task (the same hub-skew shape fixed
    # in rank_remap); max/min aggs keep partial aggregation and spread.
    best = lab.groupBy("component").agg(F.max("freq").alias("_mf"))
    reps = (
        lab.join(best, "component")
        .filter(F.col("freq") == F.col("_mf"))
        .groupBy("component")
        .agg(F.min("surface").alias("canonical"))
    )
    return lab.join(reps, "component").select("surface", "canonical")


def canonicalize_mentions(
    mentions_facts: DataFrame, cmap: DataFrame, broadcast_map: bool = True
) -> DataFrame:
    """Rewrite fact mentions through the canonical map (two hash joins).

    The map is surface-vocabulary-sized — orders of magnitude below the
    mention count — so broadcast is the right default; pass
    broadcast_map=False for billion-surface corpora and let AQE pick a
    (skew-handled) shuffle join instead.
    """
    cm = F.broadcast(cmap) if broadcast_map else cmap
    return (
        mentions_facts.join(
            cm.select(F.col("surface").alias("subj"), F.col("canonical").alias("_cs")),
            "subj",
            "left",
        )
        .join(
            cm.select(F.col("surface").alias("obj"), F.col("canonical").alias("_co")),
            "obj",
            "left",
        )
        # left + coalesce: surfaces outside the canonical map (no link edge
        # touches them) are their own canonical form — this is what lets CC
        # run over edge endpoints only instead of the whole vocabulary.
        .select(
            "conv_id",
            "turn_idx",
            "mention_idx",
            F.coalesce(F.col("_cs"), F.col("subj")).alias("cs"),
            F.col("pred"),
            F.coalesce(F.col("_co"), F.col("obj")).alias("co"),
        )
    )


def smush(
    triples: DataFrame,
    sameas_p,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_iter: int = 25,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """owl:sameAs smushing: rewrite every triple onto one canonical
    member per sameAs equivalence class, dropping the sameAs edges.

    ``p == sameas_p`` rows are identity assertions (a sameAs b).
    Equivalence classes are the connected components of the undirected
    sameAs graph; the canonical member is the class minimum (the same
    deterministic rule the dictionary pipeline's canonicalizer uses —
    cheap, order-stable across engines). Every other triple has its
    subject AND object rewritten through the class map; identical
    post-rewrite triples collapse to one row. The reference stores
    asserted triples only (no owl surface); a KG-construction pipeline
    smushes before dictionary encoding so one entity gets one id.

    Scale plan: CC runs over the sameAs graph ONLY (identity-link scale,
    orders of magnitude below the corpus). The rewrite map keeps just
    the NON-identity entries and is broadcast when under
    ``broadcast_threshold`` rows, so the corpus-scale side crosses the
    wire once — for the final dedup exchange — and never for the joins.
    For billion-alias graphs pass a larger threshold=0-style escape by
    setting broadcast_threshold=0 (shuffled joins, same semantics).
    """
    p_type = triples.schema[p_col].dataType
    sa_lit = F.lit(sameas_p).cast(p_type)
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    sa = (
        t.filter(F.col("p") == sa_lit)
        .select(F.col("s").alias("a"), F.col("o").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    nodes = (
        sa.select(F.col("a").alias("surface"))
        .unionAll(sa.select(F.col("b").alias("surface")))
        .dropDuplicates()
    )
    comp = connected_components(nodes, sa, max_iter=max_iter)
    cmap = (
        comp.filter(F.col("surface") != F.col("component"))
        .select("surface", F.col("component").alias("_canon"))
        .localCheckpoint()
    )
    if broadcast_threshold and cmap.count() <= broadcast_threshold:
        cmap = F.broadcast(cmap)

    rest = t.filter(F.col("p") != sa_lit)
    return (
        rest.join(cmap.withColumnRenamed("surface", "s"), "s", "left")
        .withColumnRenamed("_canon", "_cs")
        .join(cmap.withColumnRenamed("surface", "o"), "o", "left")
        .select(
            F.coalesce(F.col("_canon"), F.col("o")).alias("_o2"),
            F.coalesce(F.col("_cs"), F.col("s")).alias("s"),
            "p",
        )
        .select("s", "p", F.col("_o2").alias("o"))
        .dropDuplicates()
    )
