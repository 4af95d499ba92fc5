"""Basic-graph-pattern (BGP) joins: conjunctive multi-pattern queries
over the permutation tables.

The reference's query surface stops at single triple patterns
(/root/reference/src/queries.cpp:95-186 streams one pattern's range);
a triple store's real workload is the CONJUNCTION of patterns sharing
variables (SPARQL BGPs). This layer composes the existing router:
each pattern resolves through ``router.select`` (permutation choice,
pushed-down equality filters, pruned scan), then patterns are joined
on their shared variables.

Scale design:
 - join ORDER is chosen greedily by boundedness (patterns with more
   constants first — smallest intermediate results), and each next
   pattern must share a variable with what's already joined, so no
   accidental cartesian products;
 - a pattern with >= 2 bound components is a single sorted-range probe
   (at most one free column) — small by construction, so it is
   broadcast; everything else is a shuffled hash join on the shared
   variables, which AQE can re-plan at runtime on a real cluster;
 - each pattern side projects ONLY its variable columns before the
   join (column pruning reaches the scan).

Terms: an ``int`` is a constant; a string starting with ``?`` is a
variable. A variable repeated WITHIN one pattern (e.g. ``(?x, p, ?x)``)
becomes an equality filter on that pattern's scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .router import select

Term = "int | str"
_POS = ("s", "p", "o")


def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _pattern_df(tables: dict[str, DataFrame], pattern) -> tuple[DataFrame, list[str]]:
    """Resolve one pattern through the router; return (df, its variables).

    The returned frame has one column per DISTINCT variable, named
    without the '?' sigil."""
    consts = {}
    for pos, term in zip(_POS, pattern):
        if not _is_var(term):
            consts[pos] = int(term)
    df = select(tables, **consts)
    first_pos: dict[str, str] = {}  # var -> first position column
    for pos, term in zip(_POS, pattern):
        if not _is_var(term):
            continue
        v = term[1:]
        if not v:
            raise ValueError("anonymous variable '?' is not supported")
        if v in first_pos:
            # repeated variable within the pattern: equality filter
            df = df.filter(F.col(pos) == F.col(first_pos[v]))
        else:
            first_pos[v] = pos
    out_cols = [F.col(pos).alias(v) for v, pos in first_pos.items()]
    return df.select(*out_cols), list(first_pos)


def _bound_count(pattern) -> int:
    return sum(0 if _is_var(t) else 1 for t in pattern)


# stats-row field per bound-position mask — the same 7 counts the
# reference pre-loads to size every structure (include/parameters.hpp:
# 13-29, scripts/build_stats.py): estimated pattern cardinality is
# num_triples / distinct(bound prefix), the uniform-frequency estimate.
_MASK_DIVISOR = {
    frozenset(): None,  # full scan: num_triples
    frozenset("s"): "distinct_subjects",
    frozenset("p"): "distinct_predicates",
    frozenset("o"): "distinct_objects",
    frozenset("sp"): "distinct_sp_pairs",
    frozenset("po"): "distinct_po_pairs",
    frozenset("os"): "distinct_os_pairs",
    frozenset("so"): "distinct_os_pairs",
}


def estimate_pattern(stats: dict, pattern) -> float:
    """Uniform-frequency cardinality estimate for one triple pattern
    from the index's 7-count stats row (D1): |pattern| ≈ n_triples /
    distinct(bound-prefix). Fully-bound patterns estimate 1 (membership
    probe); repeated variables tighten nothing (conservative)."""
    bound = frozenset(
        pos for pos, term in zip(_POS, pattern) if not _is_var(term)
    )
    n = float(stats["num_triples"])
    if len(bound) == 3:
        return 1.0
    div = _MASK_DIVISOR[bound]
    return n if div is None else n / max(1.0, float(stats[div]))


def bgp_join(
    tables: dict[str, DataFrame],
    patterns: list[tuple],
    project: list[str] | None = None,
    stats: dict | None = None,
    broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Answer a conjunction of triple patterns (a SPARQL BGP).

    Result multiplicity is standard join semantics over the (distinct)
    triple set — identical to the equivalent SQL self-join. Columns are
    the variables (sans '?'), in ``project`` order if given, else
    sorted by name.

    Join ORDER and broadcast decisions are statistics-driven when a
    ``stats`` row (the D1 7-count stats — ``art.stats.first().asDict()``
    or the index's ``stats`` parquet) is passed: patterns are estimated
    via ``estimate_pattern`` and joined smallest-first, and a side is
    broadcast when its estimate is under ``broadcast_rows`` — the same
    role the reference's pre-loaded ``parameters`` play in sizing
    (include/parameters.hpp:13-29). Without stats, the structural
    fallback: most-bound first, broadcast when >=2 components are bound
    (at most one free column in a sorted range — bounded by
    construction). Either way each next pattern must share a variable
    with the accumulated result, so a connected BGP never plans an
    accidental cartesian product."""
    if not patterns:
        raise ValueError("empty BGP")
    if stats is not None:
        est = [estimate_pattern(stats, p) for p in patterns]
    else:  # structural proxy: more bound = smaller; rank within ties stable
        est = [-_bound_count(p) for p in patterns]
    resolved = [
        (_pattern_df(tables, p), est[i], _bound_count(p), i)
        for i, p in enumerate(patterns)
    ]
    # greedy smallest-estimate-first, connected-only growth
    remaining = sorted(resolved, key=lambda r: (r[1], r[3]))

    def _small(e: float, bound: int) -> bool:
        if stats is not None:
            return e <= broadcast_rows
        return bound >= 2

    (acc, acc_vars), acc_est, acc_bound, _ = remaining.pop(0)
    acc_vars = set(acc_vars)
    acc_small = _small(acc_est, acc_bound)
    while remaining:
        idx = next(
            (i for i, ((_, vs), _, _, _) in enumerate(remaining) if acc_vars & set(vs)),
            0,  # disconnected BGP: fall back to a cross join
        )
        (df, vs), e, bound, _ = remaining.pop(idx)
        shared = sorted(acc_vars & set(vs))
        if _small(e, bound):
            df = F.broadcast(df)
        elif acc_small:
            acc = F.broadcast(acc)
        if shared:
            acc = acc.join(df, on=shared)
        else:
            acc = acc.crossJoin(df)
        # the joined result stays broadcastable only if BOTH inputs were
        acc_small = acc_small and _small(e, bound)
        acc_vars |= set(vs)
    cols = project if project is not None else sorted(acc_vars)
    missing = [c for c in cols if c not in acc_vars]
    if missing:
        raise ValueError(f"projected variables not in BGP: {missing}")
    return acc.select(*cols)
