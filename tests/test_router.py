"""9-pattern router vs pandas filters — mirrors the reference's
check_queries (every triple × every wildcard mask,
/root/reference/test/check_queries.cpp:51-105), sampled."""

from __future__ import annotations

import itertools
import os

import pytest

from rdf_indexes_spark.pipeline import run_pipeline
from rdf_indexes_spark.plans.router import count_pattern, is_member, route, select


@pytest.fixture(scope="module")
def kg(spark, transcripts, workdir):
    art = run_pipeline(spark, transcripts, os.path.join(workdir, "pipe"), input_id="test600")
    triples_pdf = art.triples.toPandas()
    return art, triples_pdf


MASKS = list(itertools.product([True, False], repeat=3))


def test_routing_table():
    assert route(1, 1, 1).perm == "spo"
    assert route(1, 1, None).perm == "spo"
    assert route(1, None, None).perm == "spo"
    assert route(None, 1, 1).perm == "pos"
    assert route(None, 1, None).perm == "pos"
    assert route(None, None, 1).perm == "osp"
    assert route(1, None, 1).perm == "osp"
    assert route(None, None, None).perm == "spo"
    # bound components must lead the routed permutation's sort order
    for mask in MASKS:
        r = route(*[1 if b else None for b in mask])
        bound = {c for c, b in zip("spo", mask) if b}
        assert set(r.order[: len(bound)]) == bound or not bound


def test_all_patterns_vs_pandas(kg):
    art, pdf = kg
    tables = art.permutations
    # sample triples deterministically; probe all 8 masks each
    sample = pdf.sort_values(["s", "p", "o"]).iloc[:: max(1, len(pdf) // 25)]
    for t in sample.itertuples():
        for mask in MASKS:
            q = {
                "s": int(t.s) if mask[0] else None,
                "p": int(t.p) if mask[1] else None,
                "o": int(t.o) if mask[2] else None,
            }
            got = select(tables, **q).toPandas().sort_values(["s", "p", "o"]).reset_index(drop=True)
            want = pdf
            for col, val in q.items():
                if val is not None:
                    want = want[want[col] == val]
            want = want.sort_values(["s", "p", "o"]).reset_index(drop=True)[["s", "p", "o"]]
            assert got.values.tolist() == want.values.tolist(), (q, len(got), len(want))


def test_is_member_and_counts(kg):
    art, pdf = kg
    tables = art.permutations
    t0 = pdf.iloc[0]
    assert is_member(tables, int(t0.s), int(t0.p), int(t0.o))
    max_id = int(pdf[["s", "p", "o"]].to_numpy().max())
    assert not is_member(tables, max_id + 10, 0, 0)
    assert count_pattern(tables) == len(pdf)
    s0 = int(pdf.s.mode().iloc[0])
    assert count_pattern(tables, s=s0) == int((pdf.s == s0).sum())


def test_ordered_result_matches_permutation_order(kg):
    """orderBy(permutation keys) over a routed result equals the golden
    permutation's contiguous run for the bound prefix (the reference's
    contract: results stream in permutation order,
    /root/reference/src/queries.cpp:123-151). The table is already
    range-partitioned+sorted on those keys, so the orderBy is
    partition-local (no extra shuffle at scale)."""
    art, pdf = kg
    p0 = int(pdf.p.mode().iloc[0])
    got = select(art.permutations, p=p0).orderBy("p", "o", "s").toPandas()
    want = (
        pdf[pdf.p == p0]
        .sort_values(["p", "o", "s"], kind="stable")
        .reset_index(drop=True)[["s", "p", "o"]]
    )
    assert got[["s", "p", "o"]].values.tolist() == want.values.tolist()


def test_reduced_variant_fallback(kg):
    """2to/2tp analogue: every pattern must still be answerable when only
    a subset of permutations is materialized (reference fallback
    iterators, /root/reference/include/algorithms.hpp:115-278)."""
    art, pdf = kg
    full = art.permutations
    t = pdf.iloc[0]
    for subset in (["spo", "pos"], ["spo", "ops"], ["spo"]):
        tables = {k: full[k] for k in subset}
        for mask in MASKS:
            got = select(
                tables,
                s=int(t.s) if mask[0] else None,
                p=int(t.p) if mask[1] else None,
                o=int(t.o) if mask[2] else None,
            ).toPandas()
            exp = pdf
            for col, b in zip("spo", mask):
                if b:
                    exp = exp[exp[col] == t[col]]
            assert len(got) == len(exp)
            assert (
                got.sort_values(["s", "p", "o"]).reset_index(drop=True)[["s", "p", "o"]]
                .equals(exp.sort_values(["s", "p", "o"]).reset_index(drop=True)[["s", "p", "o"]])
            )


def test_member_position_matches_sorted_rank(kg):
    """member_position == the triple's index in the fully sorted (s,p,o)
    list (reference is_member returns the global rank,
    algorithms.hpp:280-298); absent triples return -1."""
    from rdf_indexes_spark.plans.router import member_position

    art, triples_pdf = kg
    tables = art.permutations
    ordered = sorted(map(tuple, triples_pdf[["s", "p", "o"]].to_numpy().tolist()))
    for idx in (0, 1, len(ordered) // 2, len(ordered) - 1):
        s, p, o = ordered[idx]
        assert member_position(tables, s, p, o) == idx
    assert member_position(tables, -5, -5, -5) == -1


def test_find_semi_exhaustive_over_sampled_ranges(kg):
    """Mirror of check_find.cpp:8-71: for sampled (s,p) prefixes, every
    value probed inside the group's [min_o, max_o] range must be found
    iff present — probes cover all present values plus absent values
    inside the range (bounded sample of the gap set)."""
    art, pdf = kg
    tables = art.permutations
    groups = (
        pdf.groupby(["s", "p"])["o"]
        .apply(set)
        .reset_index()
        .sort_values(["s", "p"])
        .head(3)
    )
    for r in groups.itertuples():
        present = sorted(r.o)
        lo, hi = present[0], present[-1]
        absent = [v for v in range(lo, hi + 1) if v not in r.o][:8]
        for o in present:
            assert is_member(tables, r.s, r.p, o), (r.s, r.p, o)
        for o in absent:
            assert not is_member(tables, r.s, r.p, o), (r.s, r.p, o)
        # range boundaries behave like next_geq walls (E3 semantics)
        assert not is_member(tables, r.s, r.p, lo - 1)
        assert not is_member(tables, r.s, r.p, hi + 1)
