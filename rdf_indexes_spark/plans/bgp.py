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


def bgp_join(
    tables: dict[str, DataFrame],
    patterns: list[tuple],
    project: list[str] | None = None,
) -> DataFrame:
    """Answer a conjunction of triple patterns (a SPARQL BGP).

    Result multiplicity is standard join semantics over the (distinct)
    triple set — identical to the equivalent SQL self-join. Columns are
    the variables (sans '?'), in ``project`` order if given, else
    sorted by name."""
    if not patterns:
        raise ValueError("empty BGP")
    resolved = [(_pattern_df(tables, p), _bound_count(p), i) for i, p in enumerate(patterns)]
    # greedy: seed with the most-bound pattern, then repeatedly take the
    # most-bound remaining pattern that shares a variable with the
    # accumulated result (cartesian only when the BGP is disconnected).
    remaining = sorted(resolved, key=lambda r: (-r[1], r[2]))
    (acc, acc_vars), acc_bound, _ = remaining.pop(0)
    acc_vars = set(acc_vars)
    # a pattern with >=2 constants leaves at most one free column in a
    # sorted range — a bounded probe result, safe to broadcast
    acc_small = acc_bound >= 2
    while remaining:
        idx = next(
            (i for i, ((_, vs), _, _) in enumerate(remaining) if acc_vars & set(vs)),
            0,  # disconnected BGP: fall back to a cross join
        )
        (df, vs), bound, _ = remaining.pop(idx)
        shared = sorted(acc_vars & set(vs))
        if bound >= 2:
            df = F.broadcast(df)
        elif acc_small:
            acc = F.broadcast(acc)
        if shared:
            acc = acc.join(df, on=shared)
        else:
            acc = acc.crossJoin(df)
        # the joined result is bounded only if BOTH inputs were
        acc_small = acc_small and bound >= 2
        acc_vars |= set(vs)
    cols = project if project is not None else sorted(acc_vars)
    missing = [c for c in cols if c not in acc_vars]
    if missing:
        raise ValueError(f"projected variables not in BGP: {missing}")
    return acc.select(*cols)
