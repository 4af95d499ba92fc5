"""Querylog sampling + workload execution (SURVEY.md A7).

The reference samples 5000 random triples from the corpus (`shuf -n
5000`, /root/reference/README.md:190-194) and stamps wildcards onto the
TRAILING components of the chosen permutation's order — `-w 1` on perm
spo turns (s,p,o) into the pattern S P ?; `-w 2` into S ? ?
(/root/reference/src/queries.cpp:50-93: the last `num_wildcards`
components in permutation order are set to uint64(-1)).

Sampling here is a deterministic hash-order top-n (xxhash64 ordering ≙
shuf with a fixed seed — reproducible across runs and engines), so query
workloads are stable inputs for the latency bench.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.permutations import PERM_ORDERS
from .router import select


@dataclass(frozen=True)
class Pattern:
    s: int | None
    p: int | None
    o: int | None


def sample_querylog(
    triples: DataFrame,
    n: int = 5000,
    seed: int = 7,
    order: str = "hash",
) -> list[tuple[int, int, int]]:
    """n corpus triples in deterministic order (collect is driver-side by
    design: a querylog is a tiny workload artifact, exactly like the
    reference's `shuf -n 5000 > queries` file).

    order="hash": pseudo-random via xxhash64 (≙ shuf with a fixed seed) —
    the bench workload. order="sorted": first n triples in (s,p,o) order —
    engine-portable, so an ANSI-SQL oracle (row_number OVER (ORDER BY
    s,p,o)) can replay the exact same sample."""
    key = (
        F.xxhash64(F.lit(seed), "s", "p", "o")
        if order == "hash"
        else F.struct("s", "p", "o")
    )
    rows = triples.select("s", "p", "o").orderBy(key).limit(n).collect()
    return [(r["s"], r["p"], r["o"]) for r in rows]


def stamp_wildcards(
    triple: tuple[int, int, int], perm: str = "spo", num_wildcards: int = 1
) -> Pattern:
    """Blank the trailing `num_wildcards` components of `perm`'s order."""
    keys = PERM_ORDERS[perm]
    vals = dict(zip(("s", "p", "o"), triple))
    for k in keys[3 - num_wildcards :] if num_wildcards else ():
        vals[k] = None
    return Pattern(s=vals["s"], p=vals["p"], o=vals["o"])


def run_querylog(
    tables: dict[str, DataFrame],
    patterns: list[Pattern],
) -> dict[str, float]:
    """Execute each pattern, count results; return the reference driver's
    report shape (musec/query, ns/triple — /root/reference/src/queries.cpp:
    155-161). Per-query latency in local mode is dominated by job-launch
    overhead (~ms), not data — the honest per-triple number is the
    aggregate."""
    t0 = time.monotonic()
    total_triples = 0
    for q in patterns:
        total_triples += select(tables, s=q.s, p=q.p, o=q.o).count()
    elapsed = time.monotonic() - t0
    nq = max(1, len(patterns))
    return {
        "queries": float(nq),
        "triples": float(total_triples),
        "musec_per_query": elapsed * 1e6 / nq,
        "ns_per_triple": (elapsed * 1e9 / total_triples) if total_triples else 0.0,
        "elapsed_sec": elapsed,
    }


def run_querylog_batched(
    tables: dict[str, DataFrame],
    patterns: list[Pattern],
) -> DataFrame:
    """Set-oriented execution of a whole querylog: ONE job per wildcard
    class instead of one per query — the Spark-native way to run a 5000-
    query workload (a driver loop of jobs measures scheduler overhead,
    not the engine). Patterns become a small keys DataFrame; each class
    is a broadcast semi-equi-join against its routed permutation table.

    Returns (qid, s, p, o) result rows for ALL patterns."""
    spark = next(iter(tables.values())).sparkSession
    by_mask: dict[tuple[bool, bool, bool], list[tuple[int, Pattern]]] = {}
    for i, q in enumerate(patterns):
        by_mask.setdefault((q.s is not None, q.p is not None, q.o is not None), []).append((i, q))
    out: DataFrame | None = None
    for mask, items in by_mask.items():
        bound = [c for c, m in zip(("s", "p", "o"), mask) if m]
        from .router import _ROUTE, _best_available

        # reduced variants (2tp/2to/3t) may lack the preferred permutation;
        # the equi-join on bound columns is order-independent, so ANY
        # materialized permutation answers the class — _best_available picks
        # the one whose sort order prunes best (same fallback as select()).
        table = tables[_best_available(tables, _ROUTE[mask], set(bound))]
        if not bound:  # ??? — full scan once, each such query sees it all
            for qid, _ in items:
                part = table.select(F.lit(qid).cast("long").alias("qid"), "s", "p", "o")
                out = part if out is None else out.unionByName(part)
            continue
        # pure-JVM literal keys table: createDataFrame(list) would put a
        # PythonRDD inside the broadcast and spin a python worker per task
        # (~7s dead wait each, see functions/ranking._literal_df).
        from ..functions.ranking import _literal_df

        keys = _literal_df(
            spark,
            [(qid, *[getattr(q, c) for c in bound]) for qid, q in items],
            [("qid", "long")] + [(c, "long") for c in bound],
        )
        joined = table.join(F.broadcast(keys), on=bound).select("qid", "s", "p", "o")
        out = joined if out is None else out.unionByName(joined)
    return out
