"""Property-path closure: path-doubling transitive closure (plans/paths)
against a Python BFS oracle — chains, branches, CYCLES (termination),
and the cross-id-space bridge."""

from __future__ import annotations

import pytest

from rdf_indexes_spark.plans.paths import closure_pairs, transitive_closure


def _bfs_closure(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out = set()
    for src in adj:
        seen, frontier = set(), {src}
        while frontier:
            nxt = set()
            for m in frontier:
                for dst in adj.get(m, ()):
                    if (src, dst) not in out:
                        out.add((src, dst))
                        nxt.add(dst)
            frontier = nxt - seen
            seen |= frontier
    return out


EDGES = [
    (1, 2), (2, 3), (3, 4),          # chain
    (5, 6), (6, 5),                  # 2-cycle
    (7, 7),                          # self-loop
    (1, 8), (8, 9),                  # branch
    (10, 11),                        # isolated edge
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "s long, o long")


def test_closure_matches_bfs_oracle(spark, edges_df):
    got = {(r["s"], r["o"]) for r in closure_pairs(edges_df).collect()}
    assert got == _bfs_closure(EDGES)


def test_cycle_terminates_and_is_complete(spark):
    # 4-cycle: every node reaches every node (including itself)
    ring = [(i, (i + 1) % 4) for i in range(4)]
    df = spark.createDataFrame(ring, "s long, o long")
    got = {(r["s"], r["o"]) for r in closure_pairs(df).collect()}
    assert got == {(a, b) for a in range(4) for b in range(4)}


def test_max_rounds_caps_depth(spark):
    # linear semi-naive: round k adds paths of length k+1, so a 9-node
    # chain (8 hops) closes at max_rounds=7; max_rounds=0 leaves only
    # the raw edges, max_rounds=2 paths of length <= 3
    chain = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(chain, "s long, o long")
    got0 = {(r["s"], r["o"]) for r in closure_pairs(df, max_rounds=0).collect()}
    assert got0 == set(chain)
    got2 = {(r["s"], r["o"]) for r in closure_pairs(df, max_rounds=2).collect()}
    assert got2 == {(a, b) for a in range(9) for b in range(a + 1, min(a + 4, 9))}
    got7 = {(r["s"], r["o"]) for r in closure_pairs(df, max_rounds=7).collect()}
    assert got7 == _bfs_closure(chain)


def test_bridge_crosses_id_spaces(spark):
    """Object ids are shifted by 100 relative to subject ids for the
    same node; hop composition must go through the bridge. Raw id
    composition would find NO multi-hop pairs."""
    # term graph 1→2→3; o-space id of node k is k+100
    edges = spark.createDataFrame([(1, 102), (2, 103)], "s long, o long")
    bridge = spark.createDataFrame(
        [(101, 1), (102, 2), (103, 3)], "o_id long, s_id long"
    )
    got = {(r["s"], r["o"]) for r in closure_pairs(edges, bridge=bridge).collect()}
    # endpoints stay in o-space: 1→102, 2→103, and the 2-hop 1→103
    assert got == {(1, 102), (2, 103), (1, 103)}
    raw = {(r["s"], r["o"]) for r in closure_pairs(edges).collect()}
    assert raw == {(1, 102), (2, 103)}  # no composition without the bridge


def test_transitive_closure_routes_predicate(spark, edges_df):
    from pyspark.sql import functions as F

    t = (
        edges_df.select("s", F.lit(7).alias("p"), "o")
        .unionByName(
            spark.createDataFrame([(1, 9, 4)], "s long, p long, o long")
        )
    )
    tables = {name: t for name in ("spo", "pos", "osp", "ops", "pso")}
    got = {(r["s"], r["o"]) for r in transitive_closure(tables, 7).collect()}
    assert got == _bfs_closure(EDGES)  # the p=9 edge is not part of p=7+
