"""BGP (multi-pattern conjunctive query) semantics vs a pandas
merge oracle, on a handcrafted triple set with known join structure."""

from __future__ import annotations

import pandas as pd
import pytest

from rdf_indexes_spark.plans.bgp import bgp_join

# triples chosen so chains (o of one = s of another), stars (shared s),
# self-loops (s == o) and dead ends all occur
TRIPLES = [
    (1, 10, 2), (1, 10, 3), (1, 11, 4),
    (2, 10, 3), (2, 11, 1),
    (3, 11, 3),           # self-loop: s == o
    (4, 10, 5), (4, 12, 2),
    (5, 12, 5), (5, 10, 1),
]


@pytest.fixture(scope="module")
def tables(spark):
    df = spark.createDataFrame(TRIPLES, "s long, p long, o long")
    return {name: df for name in ("spo", "pos", "osp", "ops", "pso")}


def _pdf():
    return pd.DataFrame(TRIPLES, columns=["s", "p", "o"])


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_chain_join_matches_pandas(tables):
    got = bgp_join(tables, [("?x", 10, "?y"), ("?y", 11, "?z")], project=["x", "y", "z"])
    t = _pdf()
    a = t[t.p == 10][["s", "o"]].rename(columns={"s": "x", "o": "y"})
    b = t[t.p == 11][["s", "o"]].rename(columns={"s": "y", "o": "z"})
    want = a.merge(b, on="y")[["x", "y", "z"]]
    assert _sorted_rows(got) == sorted(map(tuple, want.itertuples(index=False)))
    assert len(got.collect()) > 0


def test_star_join_matches_pandas(tables):
    got = bgp_join(tables, [("?x", 10, "?y"), ("?x", 11, "?z")])
    t = _pdf()
    a = t[t.p == 10][["s", "o"]].rename(columns={"s": "x", "o": "y"})
    b = t[t.p == 11][["s", "o"]].rename(columns={"s": "x", "o": "z"})
    want = a.merge(b, on="x")[sorted(["x", "y", "z"])]
    assert got.columns == ["x", "y", "z"]  # default projection: sorted vars
    assert _sorted_rows(got) == sorted(map(tuple, want.itertuples(index=False)))


def test_three_pattern_path(tables):
    got = bgp_join(
        tables,
        [("?a", 10, "?b"), ("?b", 10, "?c"), ("?c", 11, "?d")],
        project=["a", "b", "c", "d"],
    )
    t = _pdf()
    p10 = t[t.p == 10][["s", "o"]]
    p11 = t[t.p == 11][["s", "o"]]
    ab = p10.rename(columns={"s": "a", "o": "b"})
    bc = p10.rename(columns={"s": "b", "o": "c"})
    cd = p11.rename(columns={"s": "c", "o": "d"})
    want = ab.merge(bc, on="b").merge(cd, on="c")[["a", "b", "c", "d"]]
    assert _sorted_rows(got) == sorted(map(tuple, want.itertuples(index=False)))


def test_repeated_variable_in_one_pattern(tables):
    # (?x, ?p, ?x) — self-loops only
    got = bgp_join(tables, [("?x", "?p", "?x")], project=["x", "p"])
    assert _sorted_rows(got) == [(3, 11), (5, 12)]


def test_shared_variable_multiplicity_is_join_semantics(tables):
    # x=1 has two p=10 edges (to 2 and 3); each pairs with each p=11 edge
    got = bgp_join(tables, [(1, 10, "?y"), (1, 11, "?z")], project=["y", "z"])
    assert _sorted_rows(got) == [(2, 4), (3, 4)]


def test_disconnected_bgp_is_cross_join(tables):
    got = bgp_join(tables, [(3, 11, "?x"), (5, 12, "?y")], project=["x", "y"])
    assert _sorted_rows(got) == [(3, 5)]


def test_projection_subset_and_errors(tables):
    got = bgp_join(tables, [("?x", 10, "?y"), ("?y", 11, "?z")], project=["x"])
    assert got.columns == ["x"]
    with pytest.raises(ValueError):
        bgp_join(tables, [("?x", 10, "?y")], project=["nope"])
    with pytest.raises(ValueError):
        bgp_join(tables, [])


def test_bounded_pattern_broadcasts(tables):
    plan = bgp_join(
        tables, [("?x", 10, "?y"), ("?x", 11, 4)]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


STATS = {
    "num_triples": 10, "distinct_subjects": 5, "distinct_predicates": 3,
    "distinct_objects": 5, "distinct_sp_pairs": 8, "distinct_po_pairs": 9,
    "distinct_os_pairs": 10,
}


def test_estimate_pattern_uniform_frequency():
    from rdf_indexes_spark.plans.bgp import estimate_pattern

    assert estimate_pattern(STATS, ("?x", "?p", "?o")) == 10          # scan
    assert estimate_pattern(STATS, (1, "?p", "?o")) == 10 / 5         # s-bound
    assert estimate_pattern(STATS, ("?x", 10, "?o")) == 10 / 3        # p-bound
    assert estimate_pattern(STATS, (1, 10, "?o")) == 10 / 8           # sp
    assert estimate_pattern(STATS, ("?x", 10, 2)) == 10 / 9           # po
    assert estimate_pattern(STATS, (1, "?p", 2)) == 10 / 10           # so
    assert estimate_pattern(STATS, (1, 10, 2)) == 1.0                 # member


def test_stats_driven_plan_matches_structural(tables):
    """Stats-driven ordering must not change SEMANTICS, only the plan."""
    pats = [("?x", 10, "?y"), ("?y", 11, "?z"), ("?z", 12, "?w")]
    base = bgp_join(tables, pats, project=["x", "y", "z", "w"])
    st = bgp_join(tables, pats, project=["x", "y", "z", "w"], stats=STATS)
    assert _sorted_rows(base) == _sorted_rows(st)


def test_stats_broadcast_decision(tables):
    """Under the estimate threshold every side broadcasts; with a
    tiny threshold the join falls back to a shuffled hash join."""
    pats = [("?x", 10, "?y"), ("?y", 11, "?z")]
    small = bgp_join(tables, pats, stats=STATS, broadcast_rows=100)
    assert "BroadcastHashJoin" in small._jdf.queryExecution().executedPlan().toString()
    big = bgp_join(tables, pats, stats=STATS, broadcast_rows=0)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert _sorted_rows(small) == _sorted_rows(big)
