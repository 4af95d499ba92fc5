"""KG schema induction + fact provenance — the profiling passes a
knowledge-graph construction pipeline runs AFTER materializing triples.

The reference computes global triple statistics only (7 counts,
src/statistics.cpp via tools/stats — distinct s/p/o and pair counts);
a KG builder additionally needs PER-PREDICATE structure to validate the
extracted graph: cardinality classes (is `manages` functional? is
`aka` symmetric-ish N:M?) drive canonicalization key choice (functional
+ inverse-functional predicates are entity-resolution keys, the same
role owl:InverseFunctionalProperty plays in linked-data ER), and
assertion provenance (how many independent conversations asserted this
triple, over what time span) is the confidence signal that decides
which extracted facts survive into the published graph.

Both are single-aggregation shapes:

- ``predicate_profile``: two hash aggregates keyed (p, s) and (p, o) —
  the SAME keys the SPO/POS permutation sorts already cluster, so at
  100 TB these aggregations shuffle nothing new — reduced to a
  predicate-sized frame (|P| rows, thousands at most) joined on p.
  Exact integers and booleans only: ratios like functionality are left
  to the consumer (float division is the one thing two engines never
  agree on bit-for-bit).
- ``fact_provenance``: one hash aggregate keyed (s, p, o) — map-side
  partials absorb the per-fact repetition (hot facts are exactly the
  high-n_assertions ones, so the combiner eats the skew before the
  exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def predicate_profile(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Per-predicate cardinality profile over a (s, p, o) triple table.

    Returns one row per predicate:

      p, n_triples, n_subjects, n_objects,
      max_out  (largest object count a single subject reaches),
      max_in   (largest subject count a single object reaches),
      is_functional          (every subject has exactly one object),
      is_inverse_functional  (every object has exactly one subject),
      card  ('1:1' | '1:N' | 'N:1' | 'N:M' from the two flags)

    Works on encoded (int) or decoded (string) triples — the columns
    ride opaque. Duplicate triples are collapsed first (a triple table
    is a SET; assertion multiplicity is ``fact_provenance``'s job).
    """
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).distinct()
    # (p, s) grouping: per-subject out-degrees, reduced to per-p shape
    by_s = (
        t.groupBy("p", "s")
        .agg(F.count(F.lit(1)).alias("outd"))
        .groupBy("p")
        .agg(
            F.sum("outd").alias("n_triples"),
            F.count(F.lit(1)).alias("n_subjects"),
            F.max("outd").alias("max_out"),
        )
    )
    by_o = (
        t.groupBy("p", "o")
        .agg(F.count(F.lit(1)).alias("ind"))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.max("ind").alias("max_in"),
        )
    )
    prof = by_s.join(by_o, "p")  # |P|-sized both sides; any join works
    fun = F.col("max_out") == 1
    inv = F.col("max_in") == 1
    return prof.select(
        "p",
        F.col("n_triples").cast("long").alias("n_triples"),
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_objects").cast("long").alias("n_objects"),
        F.col("max_out").cast("long").alias("max_out"),
        F.col("max_in").cast("long").alias("max_in"),
        fun.alias("is_functional"),
        inv.alias("is_inverse_functional"),
        F.when(fun & inv, "1:1")
        .when(fun, "N:1")
        .when(inv, "1:N")
        .otherwise("N:M")
        .alias("card"),
    )


def fact_provenance(
    assertions: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Collapse an ASSERTION stream (one row per time a triple was
    stated, carrying which conversation said it and when) into one row
    per distinct fact with its evidence:

      s, p, o, n_assertions, n_conversations (distinct),
      first_ts, last_ts

    ``n_conversations`` is the independent-evidence count a confidence
    policy thresholds on (the same fact repeated inside ONE
    conversation is weaker than the same fact from ten); first/last
    give the fact's observed validity span. Exact countDistinct — at
    |facts| granularity the expand is per-group tiny (a fact's
    conversation list, not the corpus's).
    """
    return (
        assertions.groupBy(
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_assertions"),
            F.countDistinct(F.col(conv_col)).alias("n_conversations"),
            F.min(F.col(ts_col)).alias("first_ts"),
            F.max(F.col(ts_col)).alias("last_ts"),
        )
        .select(
            "s",
            "p",
            "o",
            F.col("n_assertions").cast("long").alias("n_assertions"),
            F.col("n_conversations").cast("long").alias("n_conversations"),
            "first_ts",
            "last_ts",
        )
    )


def fact_history(
    assertions: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    ts_col: str = "ts",
) -> DataFrame:
    """Belief revision for FUNCTIONAL predicates: treat each assertion
    of (s, p, o) as "as of ts, s's value for p is o" and produce the
    value HISTORY per (s, p) key — one row per maximal run of one
    value, with its half-open validity interval:

      s, p, o, valid_from, valid_to (NULL = still current), version

    Re-assertions of the CURRENT value do not open a new version (the
    run is gaps-and-islands compressed: a value change is lag(o) != o
    over the ts order); asserting an older value again DOES (belief
    reverted). Ties on ts within a key break on the object value, so
    the history is a pure function of the assertion set. This is the
    SCD-2 shape a temporal KG snapshot/as-of query consumes.

    Scale: ONE (s, p)-keyed exchange feeding two window passes (change
    flag + running version sum, then the per-version aggregate and the
    lead() that closes each interval). Per-key state is O(1).
    """
    w = Window.partitionBy("s", "p").orderBy("ts", "o")
    rows = (
        assertions.select(
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
            F.col(ts_col).alias("ts"),
        )
        .withColumn(
            "_chg",
            F.when(F.lag("o").over(w).isNull(), F.lit(1))
            .when(F.lag("o").over(w) != F.col("o"), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .withColumn("_ver", F.sum("_chg").over(w))
    )
    runs = rows.groupBy("s", "p", "_ver").agg(
        F.min_by("o", F.struct("ts", "o")).alias("o"),
        F.min("ts").alias("valid_from"),
    )
    wv = Window.partitionBy("s", "p").orderBy("_ver")
    return runs.select(
        "s",
        "p",
        "o",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        (F.col("_ver") - 1).cast("long").alias("version"),
    )


def current_facts(
    assertions: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    ts_col: str = "ts",
) -> DataFrame:
    """The current-belief snapshot: per (s, p), the object of the
    latest assertion (ties on ts break on the object value — the same
    total order ``fact_history`` uses, so this equals history's
    valid_to-IS-NULL rows). One (s, p)-keyed max_by aggregate — no
    window, map-side partials absorb hot keys.
    """
    return (
        assertions.groupBy(
            F.col(s_col).alias("s"), F.col(p_col).alias("p")
        )
        .agg(
            F.max_by(
                F.col(o_col), F.struct(F.col(ts_col).alias("ts"), F.col(o_col).alias("o"))
            ).alias("o"),
            F.max(F.col(ts_col)).alias("as_of"),
        )
    )


def inverse_predicate_counts(
    triples: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Relation-algebra induction: for every predicate pair (p, q),
    how many edges of p exist REVERSED under q —

      p, q, n_overlap (|p(s,o) ∩ q(o,s)|), n_p, n_q

    The p == q diagonal measures SYMMETRY (aka/spouse-type relations:
    n_overlap ≈ n_p); off-diagonal rows with n_overlap ≈ n_p ≈ n_q are
    INVERSE pairs (manages / reports_to) — the signals a KG builder
    uses to normalize relation direction before materialization, the
    owl:SymmetricProperty / owl:inverseOf analogue of
    ``predicate_profile``'s key discovery. Ratios are left to the
    consumer (exact integers only).

    Plan: dedup + ONE self-equi-join on the REVERSED node pair (s, o)
    × (o, s) — keyed on the pair, so predicate fan-out per node pair is
    the only multiplicity (pairs with many parallel predicates are rare
    and bounded by |P|) — then a (p, q)-keyed aggregate and two
    broadcast-able |P|-sized marginal joins. Only pairs with overlap
    ≥ 1 are emitted.
    """
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).distinct()
    marg = t.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    fwd = t.select("s", "o", F.col("p").alias("p"))
    rev = t.select(
        F.col("o").alias("s"), F.col("s").alias("o"), F.col("p").alias("q")
    )
    pairs = (
        fwd.join(rev, ["s", "o"])
        .groupBy("p", "q")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        pairs.join(F.broadcast(marg), "p")
        .join(
            F.broadcast(marg.select(F.col("p").alias("q"), F.col("n_p").alias("n_q"))),
            "q",
        )
        .select(
            "p",
            "q",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.col("n_p").cast("long").alias("n_p"),
            F.col("n_q").cast("long").alias("n_q"),
        )
    )


def rdfs_closure(
    triples: DataFrame,
    subclass_p,
    type_p,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_rounds: int = 64,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """RDFS entailment materialization (rules rdfs9 + rdfs11): the
    subClassOf transitive closure plus every entailed rdf:type triple.

    Input: a (s, p, o) triple table where ``p == subclass_p`` rows are
    the class hierarchy (C subClassOf D) and ``p == type_p`` rows are
    instance typing (x type C). Output: the ENTAILED set —

      (x, type_p, D)        for every asserted (x, type_p, C) with
                            C subClassOf* D (asserted types included),
      (C, subclass_p, D)    for every 1+-hop hierarchy pair,

    duplicate-free. The reference stores triples as asserted
    (/root/reference/src/build.cpp workflow) and has no inference
    surface; a KG-construction pipeline materializes this closure so
    type-filtered queries need no runtime reasoning.

    Scale plan: the hierarchy is SCHEMA-scale (thousands of classes at
    most) while typing is INSTANCE-scale (billions). The closure runs
    linear semi-naive iteration on the schema-sized edge set only
    (``plans.paths.closure_pairs``), is checkpointed once, and — when
    under ``broadcast_threshold`` pairs — is BROADCAST into the typing
    join, so the instance-scale side crosses the wire exactly once for
    the final dedup exchange and never for the join itself.
    """
    from ..plans.paths import closure_pairs

    p_type = triples.schema[p_col].dataType
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    sub_lit = F.lit(subclass_p).cast(p_type)
    type_lit = F.lit(type_p).cast(p_type)

    sub_edges = t.filter(F.col("p") == sub_lit).select("s", "o")
    closure = closure_pairs(sub_edges, max_rounds=max_rounds).localCheckpoint()

    sup = closure.select(F.col("s").alias("c"), F.col("o").alias("d"))
    if closure.count() <= broadcast_threshold:
        sup = F.broadcast(sup)

    types = t.filter(F.col("p") == type_lit).select("s", F.col("o").alias("c"))
    inferred = types.join(sup, "c").select("s", F.col("d").alias("o"))
    all_types = (
        types.select("s", F.col("c").alias("o"))
        .unionByName(inferred)
        .dropDuplicates(["s", "o"])
        .select("s", type_lit.alias("p"), "o")
    )
    all_sub = closure.select("s", sub_lit.alias("p"), "o")
    return all_types.unionByName(all_sub)


def _maybe_broadcast(df: DataFrame, threshold: int) -> DataFrame:
    """Checkpoint a schema-scale frame and broadcast it when small.

    The count gate runs on the checkpointed frame, so the closure /
    filter plan above it computes exactly once regardless of how many
    joins consume the result."""
    df = df.localCheckpoint()
    if threshold and df.count() <= threshold:
        return F.broadcast(df)
    return df


def rhodf_entailment(
    triples: DataFrame,
    subclass_p,
    subproperty_p,
    domain_p,
    range_p,
    type_p,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    max_rounds: int = 64,
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Full ρdf deductive closure (Muñoz/Pérez/Gutierrez's minimal RDFS
    fragment): rules rdfs2 (domain), rdfs3 (range), rdfs5+7
    (subPropertyOf transitivity + property entailment), rdfs9+11
    (subClassOf transitivity + type entailment), over one (s, p, o)
    graph whose schema rows are tagged by the five predicate arguments.

    Output = the entailed graph, duplicate-free:
      - every asserted instance triple plus its (s, q, o) expansion for
        each superproperty q of p (rdfs7 over the rdfs5 closure),
      - every type triple — asserted, domain-derived (subject of any
        expanded instance triple whose property declares a domain),
        range-derived (object likewise) — closed upward under
        subClassOf (rdfs9 over the rdfs11 closure),
      - the schema itself: 1+-hop subPropertyOf and subClassOf closure
        pairs and the asserted domain/range rows.

    Restriction (documented, standard in practice): the five schema
    predicates themselves must not appear as subjects of subPropertyOf
    — i.e. no meta-hierarchy over rdf:type & co.

    Scale plan — single-pass rule explosion: all four rules are
    PRECOMPILED schema-side into one per-predicate ACTION table
    (property expansions via the rdfs5 closure; domain/range typings
    already lifted through the rdfs11 closure), checkpointed and
    broadcast under ``broadcast_threshold``. The instance stream then
    crosses the executor exactly ONCE: a single broadcast left-join
    multiplies each row by its actions (rows whose predicate has no
    schema pass through unchanged), each joined row emits exactly one
    output triple map-side. A naive per-rule-join formulation re-scans
    the corpus once per rule PER CONSUMER (Spark plans are trees — a
    subplan referenced k times executes k times unless persisted);
    this shape needs no corpus-scale cache to avoid that. Asserted
    rdf:type rows take one more single-pass broadcast join (their rdfs9
    lift); the one wide exchange is the final global dedup. The
    reference materializes asserted triples only
    (/root/reference/src/build.cpp workflow); this closure is the KG
    -construction step that makes its pattern queries inference-aware.
    """
    from ..plans.paths import closure_pairs

    p_type = triples.schema[p_col].dataType
    o_type = triples.schema[o_col].dataType
    lits = {
        name: F.lit(v).cast(p_type)
        for name, v in (
            ("sc", subclass_p), ("sp", subproperty_p), ("dom", domain_p),
            ("rng", range_p), ("type", type_p),
        )
    }
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )

    # ---- schema-scale frames (tiny; cut once each) ----
    sp_clo = closure_pairs(
        t.filter(F.col("p") == lits["sp"]).select("s", "o"), max_rounds=max_rounds
    ).localCheckpoint()
    sc_clo = closure_pairs(
        t.filter(F.col("p") == lits["sc"]).select("s", "o"), max_rounds=max_rounds
    ).localCheckpoint()
    dom = t.filter(F.col("p") == lits["dom"]).select(
        F.col("s").alias("dp"), F.col("o").alias("c")
    )
    rng = t.filter(F.col("p") == lits["rng"]).select(
        F.col("s").alias("rp"), F.col("o").alias("c")
    )

    # identity-closed property map: p sp* q, q including p itself for
    # every schema-known predicate (so superproperty domains fire on p)
    p_keys = (
        sp_clo.select(F.col("s").alias("k"))
        .unionAll(sp_clo.select(F.col("o").alias("k")))
        .unionAll(dom.select(F.col("dp").alias("k")))
        .unionAll(rng.select(F.col("rp").alias("k")))
        .dropDuplicates()
    )
    pmap_full = sp_clo.select(F.col("s").alias("p"), F.col("o").alias("q")).unionAll(
        p_keys.select(F.col("k").alias("p"), F.col("k").alias("q"))
    )
    # identity-closed class map: C sc* D
    c_keys = (
        sc_clo.select(F.col("s").alias("k"))
        .unionAll(sc_clo.select(F.col("o").alias("k")))
        .unionAll(dom.select(F.col("c").alias("k")))
        .unionAll(rng.select(F.col("c").alias("k")))
        .dropDuplicates()
    )
    scmap_full = sc_clo.select(F.col("s").alias("c"), F.col("o").alias("d")).unionAll(
        c_keys.select(F.col("k").alias("c"), F.col("k").alias("d"))
    )

    # ---- compile the action table: (p, kind, pval, oval) ----
    # 't': emit (s, pval, o) — rdfs7 expansion incl. the identity row;
    # 's': emit (s, type, oval) — rdfs2 through rdfs9; 'o': emit
    # (o, type, oval) — rdfs3 through rdfs9.
    null_o = F.lit(None).cast(o_type)
    null_p = F.lit(None).cast(p_type)
    texp = pmap_full.select(
        "p", F.lit("t").alias("kind"), F.col("q").alias("pval"), null_o.alias("oval")
    )
    stype = (
        pmap_full.join(dom, pmap_full["q"] == dom["dp"])
        .join(scmap_full, "c")
        .select("p", F.lit("s").alias("kind"), null_p.alias("pval"),
                F.col("d").alias("oval"))
    )
    otype = (
        pmap_full.join(rng, pmap_full["q"] == rng["rp"])
        .join(scmap_full, "c")
        .select("p", F.lit("o").alias("kind"), null_p.alias("pval"),
                F.col("d").alias("oval"))
    )
    rules = _maybe_broadcast(
        texp.unionAll(stype).unionAll(otype).dropDuplicates(), broadcast_threshold
    )

    # ---- the single instance pass ----
    is_schema = (
        (F.col("p") == lits["sc"]) | (F.col("p") == lits["sp"])
        | (F.col("p") == lits["dom"]) | (F.col("p") == lits["rng"])
        | (F.col("p") == lits["type"])
    )
    inst = t.filter(~is_schema)
    joined = inst.join(rules, "p", "left")
    kind = F.col("kind")
    inst_out = joined.select(
        F.when(kind == "o", F.col("o")).otherwise(F.col("s")).alias("s"),
        F.when(kind.isNull(), F.col("p"))
        .when(kind == "t", F.col("pval"))
        .otherwise(lits["type"])
        .alias("p"),
        F.when(kind.isNull() | (kind == "t"), F.col("o"))
        .otherwise(F.col("oval"))
        .alias("o"),
    )

    # asserted rdf:type rows: one more single-pass broadcast lift
    # (classes the schema never mentions pass through via the left join)
    sc_lift = _maybe_broadcast(scmap_full.dropDuplicates(), broadcast_threshold)
    typed_out = (
        t.filter(F.col("p") == lits["type"])
        .select("s", F.col("o").alias("c"))
        .join(sc_lift, "c", "left")
        .select("s", lits["type"].alias("p"), F.coalesce("d", "c").alias("o"))
    )

    out = (
        inst_out
        .unionByName(typed_out)
        .unionByName(sp_clo.select("s", lits["sp"].alias("p"), "o"))
        .unionByName(sc_clo.select("s", lits["sc"].alias("p"), "o"))
        .unionByName(t.filter(F.col("p") == lits["dom"]))
        .unionByName(t.filter(F.col("p") == lits["rng"]))
    )
    return out.dropDuplicates()


def property_table(
    triples: DataFrame,
    predicates: list,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
) -> DataFrame:
    """Property-table pivot: one row per subject, one column per
    requested predicate holding the MINIMUM object (deterministic under
    multi-valued predicates; absent → null). The classic triple-store
    physical design (Abadi et al., SW-Store) re-expressed as an export:
    KG pipelines pivot entity attributes into a feature table before
    training-data assembly. The reference's per-permutation layout
    (/root/reference/include/index.hpp) answers (s, p, ?) point
    lookups; this is the columnar batch form of |predicates| of them.

    Scale plan: ONE hash aggregate (groupBy subject, pivot with an
    EXPLICIT predicate list — no extra distinct-values job), map-side
    partials absorb subjects with many facts; predicate filter pushed
    to the scan. Column names are exactly the predicate strings.
    """
    if not predicates:
        raise ValueError("predicates must be non-empty")
    preds = [str(x) for x in predicates]
    if len(set(preds)) != len(preds):
        raise ValueError("duplicate predicate names collide as columns")
    t = triples.select(
        F.col(s_col).alias("s"),
        F.col(p_col).cast("string").alias("p"),
        F.col(o_col).alias("o"),
    ).filter(F.col("p").isin(preds))
    return t.groupBy("s").pivot("p", preds).agg(F.min("o"))


def table_to_triples(
    df: DataFrame,
    id_col: str,
    value_cols: list[str],
    drop_nulls: bool = True,
) -> DataFrame:
    """Wide-table ingest: melt entity records into (s, p, o) triples —
    one triple per (row, column) with the column name as predicate; the
    inverse of ``property_table`` and the standard way a relational
    dimension table enters the KG before dictionary encoding
    (/root/reference/scripts/extract_vocabs.py consumes exactly this
    (s, p, o) text shape).

    Values cast to string (the reference's vocabularies are byte
    strings); nulls dropped by default (a null cell asserts nothing).

    Plan: pure map-side stack expression — |value_cols| output rows per
    input row, ZERO exchanges, whole-stage codegen.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    if len(set(value_cols)) != len(value_cols):
        raise ValueError("duplicate value_cols")
    pairs = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in value_cols
    )
    out = df.select(
        F.col(id_col).cast("string").alias("s"),
        F.expr(f"stack({len(value_cols)}, {pairs}) as (p, o)"),
    )
    return out.filter(F.col("o").isNotNull()) if drop_nulls else out


def domain_range_induction(
    triples: DataFrame,
    types: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    entity_col: str = "entity",
    class_col: str = "cls",
) -> DataFrame:
    """Induce rdfs:domain / rdfs:range per predicate from a typed triple
    set — the inverse problem of :func:`rhodf_entailment` (which APPLIES
    declared domain/range via rdfs2/3, this one proposes them): the modal
    subject class and modal object class of each predicate, with support
    counts a schema curator thresholds on before publishing the rule.

    ``types`` is an (entity, cls) assignment (an entity may carry several
    classes; every (triple, class) pairing counts — standard type-usage
    counting). Returns one row per predicate:

      p, n_triples,
      domain_cls, domain_support, n_typed_s  (triples whose s is typed),
      range_cls,  range_support,  n_typed_o

    Ties break on class string ascending (deterministic cross-engine).

    Scale plan: the two typing joins key on entity ids (entity-sized
    dimension, corpus-sized fact stream — plain shuffle hash joins, hub
    entities bounded by their real degree); each reduces straight into a
    (p, cls) hash aggregate, so the wide frames never carry more than
    (p, cls) pairs afterward. The modal pick is a row_number window over
    the |P|x|classes| profile frame — thousands of rows, one partition
    exchange, nothing corpus-sized.
    """
    t = triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    )
    ty = types.select(
        F.col(entity_col).alias("e"), F.col(class_col).cast("string").alias("cls")
    ).distinct()

    def _modal(side: str, out_cls: str, out_sup: str, out_n: str) -> DataFrame:
        per = (
            t.join(ty, t[side] == ty["e"])
            .groupBy("p", "cls")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("p").orderBy(F.col("cnt").desc(), F.col("cls").asc())
        tot = per.groupBy("p").agg(F.sum("cnt").cast("long").alias(out_n))
        top = (
            per.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("p", F.col("cls").alias(out_cls), F.col("cnt").cast("long").alias(out_sup))
        )
        return top.join(tot, "p")

    n_tri = t.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n_triples"))
    dom = _modal("s", "domain_cls", "domain_support", "n_typed_s")
    rng = _modal("o", "range_cls", "range_support", "n_typed_o")
    return (
        n_tri.join(dom, "p", "left")
        .join(rng, "p", "left")
        .select(
            "p", "n_triples",
            "domain_cls", "domain_support", "n_typed_s",
            "range_cls", "range_support", "n_typed_o",
        )
    )


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column data-quality census — the ingest-time profiling pass a
    pipeline runs on every new table before trusting it: (col_name, n,
    n_null, n_distinct, min_value, max_value) with min/max rendered as
    strings so one output schema covers heterogeneous column types.

    Everything is computed in ONE aggregation job over ONE scan: all
    per-column aggregates live in a single wide agg row, melted to
    per-column rows map-side afterwards (the melt is over a 1-row
    frame — free). n excludes nothing, n_null counts SQL NULLs,
    min/max ignore NULLs (SQL semantics) and render NULL as the empty
    marker when a column is all-NULL.

    ``exact_distinct=True`` uses countDistinct — one expand ×|columns|
    inside the single aggregate, exact, the oracle-checkable contract.
    At petabyte scale with many columns pass ``exact_distinct=False``
    to switch to HyperLogLog++ ``approx_count_distinct`` (fixed-size
    mergeable sketch per column, no expand — the 100 TB path; ±2%
    by default, not oracle-comparable across engines by design).
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.select(
        F.col("_n").alias("n"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_null, n_distinct, min_value, max_value)"
        ),
    ).select(
        "col_name",
        F.col("n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def fuse_facts(
    assertions: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Knowledge fusion / truth discovery: when independent extractions
    assert CONFLICTING objects for the same (subject, predicate) — the
    normal state of a transcript-mined KG — pick one value per (s, p) by
    independent-evidence majority vote (Dong et al.'s knowledge-fusion
    baseline; the reference has no conflict story at all — its prep
    keeps every distinct triple, scripts/sort.py:6-10).

    Vote = distinct ``conv_col`` count per (s, p, o) — repeats inside one
    conversation are one vote, matching :func:`fact_provenance`'s
    independence rule. Winner = max votes, ties broken by smallest o
    (codepoint order; deterministic and engine-portable). Returns one
    row per (s, p):

      s, p, o (the winner), support (its votes),
      total_votes (sum over candidates), n_candidates
      confidence_x1000 = floor(1000 * support / total_votes)

    Shape at scale: one (s,p,o,conv) distinct hash-aggregate (absorbs
    within-conversation repeats map-side), one (s,p,o) count, one
    (s,p) max-struct reduce — three exchanges on progressively smaller
    key spaces, no window, no join; integer outputs only.
    """
    votes = (
        assertions.select(
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
            F.col(conv_col).alias("conv"),
        )
        .distinct()
        .groupBy("s", "p", "o")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    # max(struct(votes, neg-codepoint-rank o)) in ONE reduce: encode the
    # tie rule directly in the struct order — max votes first, then the
    # SMALLEST o, via a descending string under max = filter-free argmin.
    # Spark/DuckDB both order structs field-by-field, but a "negated
    # string" is not portable — so take min(struct(-votes, o)) instead:
    # the smallest (-votes) is the largest vote count, and ties fall to
    # the smallest o in plain codepoint order.
    return (
        votes.groupBy("s", "p")
        .agg(
            F.min(F.struct((-F.col("votes")).alias("nv"), F.col("o").alias("o"))).alias("w"),
            F.sum("votes").cast("long").alias("total_votes"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
        )
        .select(
            "s",
            "p",
            F.col("w.o").alias("o"),
            (-F.col("w.nv")).cast("long").alias("support"),
            "total_votes",
            "n_candidates",
            F.floor(F.lit(1000) * (-F.col("w.nv")) / F.col("total_votes"))
            .cast("long")
            .alias("confidence_x1000"),
        )
    )
