"""PageRank: closed-form cases, dangling-mass conservation, and parity
with a pure-pandas power iteration on a deterministic random graph."""

from __future__ import annotations

import numpy as np
import pytest

from rdf_indexes_spark.operators.graph import pagerank


def _ranks(df) -> dict[int, float]:
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_cycle_is_uniform(spark):
    # 3-cycle: symmetry forces rank 1/3 everywhere at every iteration
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = _ranks(pagerank(e, iterations=5))
    assert got.keys() == {0, 1, 2}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_mass_conserved_with_dangling(spark):
    # node 2 is dangling; total rank must stay exactly 1 each iteration
    e = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "src long, dst long")
    got = _ranks(pagerank(e, iterations=7))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the sink accumulates the most rank
    assert got[2] == max(got.values())


def _numpy_pagerank(edges: list[tuple[int, int]], n: int, d: float, iters: int):
    out = np.zeros(n)
    for s, _ in edges:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dm = r[out == 0].sum()
        nxt += d * dm / n
        for s, t in edges:
            nxt[t] += d * r[s] / out[s]
        r = nxt
    return r


def test_pagerank_matches_numpy_power_iteration(spark):
    rng = np.random.RandomState(7)
    n = 40
    edges = sorted(
        {(int(rng.randint(n)), int(rng.randint(n))) for _ in range(220)}
    )
    edges = [(s, t) for s, t in edges if s != t]
    want = _numpy_pagerank(edges, n, 0.85, 10)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = _ranks(pagerank(e, damping=0.85, iterations=10))
    # isolated numpy nodes (no edges at all) don't appear in the edge
    # frame; compare only nodes present in the graph
    present = {s for s, _ in edges} | {t for _, t in edges}
    # renormalize the numpy side to the same node universe: pagerank()
    # teleports over graph nodes only, numpy over range(n)
    if present != set(range(n)):
        want = _numpy_pagerank(edges, n, 0.85, 10)  # same universe needed
        pytest.skip("random graph left isolated nodes; universe mismatch")
    for node in present:
        assert got[node] == pytest.approx(want[node], rel=1e-9)


def test_pagerank_star_prefers_hub(spark):
    # leaves 1..5 all point at hub 0; hub points back at leaf 1
    rows = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = _ranks(pagerank(e, iterations=10))
    # hub 0 and leaf 1 (which receives the hub's whole out-flow) dominate
    # the other leaves, which by symmetry hold identical teleport-only rank
    assert min(got[0], got[1]) > got[2]
    assert got[2] == pytest.approx(got[3], abs=1e-12)
    assert got[3] == pytest.approx(got[4], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------- triangles

from rdf_indexes_spark.operators.graph import triangle_count


def _tri_counts(df) -> dict[int, int]:
    return {r["node"]: r["triangles"] for r in df.collect()}


def _python_triangles(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Brute-force per-node triangle counts over the simple undirected graph."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {n: 0 for n in adj}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in (n for n in adj[x] if n > x):
            for z in (n for n in adj[x] & adj[y] if n > y):
                for c in (x, y, z):
                    counts[c] += 1
    return {n: c for n, c in counts.items() if c > 0}


def test_triangle_count_golden(spark):
    # K4 minus one edge: two triangles sharing edge (0,1); plus noise:
    # a self-loop, a duplicate, and a reversed duplicate — all ignored
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 2), (1, 0), (0, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = _tri_counts(triangle_count(e))
    assert got == {0: 2, 1: 2, 2: 1, 3: 1}


def test_triangle_count_triangle_free(spark):
    # bipartite graphs have no triangles
    e = spark.createDataFrame(
        [(i, 100 + j) for i in range(5) for j in range(5)], "src long, dst long"
    )
    assert triangle_count(e).count() == 0


def test_triangle_count_matches_bruteforce(spark):
    # deterministic random graph, dense enough for many triangles
    rng = np.random.RandomState(11)
    edges = [tuple(map(int, p)) for p in rng.randint(0, 40, size=(300, 2))]
    e = spark.createDataFrame(edges, "src long, dst long")
    assert _tri_counts(triangle_count(e)) == _python_triangles(edges)


def test_triangle_count_skew_hub(spark):
    # a hub in every triangle: star + rim cycle (wheel graph) — the hub's
    # count equals the rim length, each rim node sees 2 wheel triangles
    rim = 20
    edges = [(100, i) for i in range(rim)] + [
        (i, (i + 1) % rim) for i in range(rim)
    ]
    got = _tri_counts(triangle_count(spark.createDataFrame(edges, "src long, dst long")))
    assert got[100] == rim
    assert all(got[i] == 2 for i in range(rim))
    assert _python_triangles(edges) == got


# ------------------------------------------------------- clustering profile

from rdf_indexes_spark.operators.graph import clustering_profile


def test_clustering_profile_golden(spark):
    # K4 minus edge (2,3): degrees 3,3,2,2; wedges 3,3,1,1; triangles 2,2,1,1
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)], "src long, dst long"
    )
    got = {
        r.node: (r.degree, r.triangles, r.wedges)
        for r in clustering_profile(e).collect()
    }
    assert got == {0: (3, 2, 3), 1: (3, 2, 3), 2: (2, 1, 1), 3: (2, 1, 1)}


def test_clustering_profile_triangle_free_rows_present(spark):
    # star: hub degree 4, leaves degree 1 (0 wedges), all triangles 0
    e = spark.createDataFrame([(9, i) for i in range(4)], "src long, dst long")
    got = {
        r.node: (r.degree, r.triangles, r.wedges)
        for r in clustering_profile(e).collect()
    }
    assert got[9] == (4, 0, 6)
    assert all(got[i] == (1, 0, 0) for i in range(4))


def test_clustering_profile_matches_bruteforce(spark):
    rng = np.random.RandomState(23)
    edges = [tuple(map(int, p)) for p in rng.randint(0, 35, size=(250, 2))]
    tri_want = _python_triangles(edges)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.degree, r.triangles, r.wedges)
        for r in clustering_profile(e).collect()
    }
    assert set(got) == set(adj)
    for n, nbrs in adj.items():
        d = len(nbrs)
        assert got[n] == (d, tri_want.get(n, 0), d * (d - 1) // 2)


# ------------------------------------------------------- co-occurrence

from rdf_indexes_spark.operators.graph import cooccurrence_counts


def test_cooccurrence_golden(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup (1,a) collapses
        (2, "a"), (2, "b"),
        (3, "a"),
    ]
    df = spark.createDataFrame(rows, "group_id long, item string")
    got = {
        (r.a, r.b): (r.n_ab, r.n_a, r.n_b, r.n_groups)
        for r in cooccurrence_counts(df).collect()
    }
    assert got == {
        ("a", "b"): (2, 3, 2, 3),
        ("a", "c"): (1, 3, 1, 3),
        ("b", "c"): (1, 2, 1, 3),
    }


def test_cooccurrence_group_cap_guards_pairs_not_stats(spark):
    """A group above the cap contributes NO pairs, but its members still
    count in the marginals and it still counts in n_groups."""
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c")]
    df = spark.createDataFrame(rows, "group_id long, item string")
    got = {
        (r.a, r.b): (r.n_ab, r.n_a, r.n_b, r.n_groups)
        for r in cooccurrence_counts(df, max_group_size=2).collect()
    }
    # only group 1 (size 2) pairs; group 2 (size 3) is capped out
    assert got == {("a", "b"): (1, 2, 2, 2)}


def test_cooccurrence_matches_bruteforce(spark):
    from collections import Counter
    from itertools import combinations

    rng = np.random.RandomState(7)
    rows = [(int(g), f"i{rng.randint(0, 12)}") for g in rng.randint(0, 25, 400)]
    groups: dict[int, set[str]] = {}
    for g, i in rows:
        groups.setdefault(g, set()).add(i)
    n_ab = Counter()
    n_i = Counter()
    for g, its in groups.items():
        for i in its:
            n_i[i] += 1
        for a, b in combinations(sorted(its), 2):
            n_ab[(a, b)] += 1
    df = spark.createDataFrame(rows, "group_id long, item string")
    got = {
        (r.a, r.b): (r.n_ab, r.n_a, r.n_b, r.n_groups)
        for r in cooccurrence_counts(df).collect()
    }
    want = {
        (a, b): (c, n_i[a], n_i[b], len(groups)) for (a, b), c in n_ab.items()
    }
    assert got == want


# ------------------------------------------------------------------ k-core

from rdf_indexes_spark.operators.graph import k_core


def _python_kcore(edges: list[tuple[int, int]], k: int) -> set[int]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return set(adj)


def test_k_core_golden_chain_of_peels(spark):
    """Triangle + pendant path: peeling the path must cascade (node 3
    becomes low-degree only after 4 is removed) — exercises multi-round
    convergence, not just one filter pass."""
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node for r in k_core(e, k=2).collect()}
    assert got == {0, 1, 2}
    assert _python_kcore(edges, 2) == got


def test_k_core_whole_graph_survives(spark):
    # K4: every node has degree 3 — the 3-core is the whole graph
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    assert {r.node for r in k_core(e, k=3).collect()} == {0, 1, 2, 3}


def test_k_core_empty_result(spark):
    # a tree has no 2-core
    edges = [(0, 1), (1, 2), (1, 3), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    assert k_core(e, k=2).count() == 0


def test_k_core_matches_bruteforce(spark):
    rng = np.random.RandomState(5)
    edges = [tuple(map(int, p)) for p in rng.randint(0, 30, size=(120, 2))]
    e = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 3, 4):
        got = {r.node for r in k_core(e, k=k).collect()}
        assert got == _python_kcore(edges, k), k


def test_label_propagation_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA must find exactly
    the two cliques (the bridge can't outvote 3 in-clique neighbors),
    each labeled by its minimum member."""
    from rdf_indexes_spark.operators.graph import label_propagation

    import itertools
    c1, c2 = [0, 1, 2, 3], [10, 11, 12, 13]
    edges = (
        list(itertools.combinations(c1, 2))
        + list(itertools.combinations(c2, 2))
        + [(3, 10)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.n: r.community for r in label_propagation(df).collect()}
    assert {got[n] for n in c1} == {0}
    assert {got[n] for n in c2} == {10}


def test_label_propagation_deterministic_and_layout_free(spark):
    from rdf_indexes_spark.operators.graph import label_propagation

    import random
    rng = random.Random(5)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted((r.n, r.community) for r in label_propagation(df).collect())
    b = sorted(
        (r.n, r.community)
        for r in label_propagation(df.repartition(13)).collect()
    )
    assert a == b


def test_label_propagation_components_never_merge(spark):
    """Communities refine connected components: two disconnected paths
    can never share a label (labels only flow along edges)."""
    from rdf_indexes_spark.operators.graph import label_propagation

    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.n: r.community for r in label_propagation(df).collect()}
    assert {got[0], got[1], got[2], got[3]}.isdisjoint({got[10], got[11], got[12]})
    # bipartite path: self-inclusion damping must still converge
    assert len(got) == 7


def test_label_propagation_matches_python_model(spark):
    """Exact parity with a python replay of the same synchronous
    min-tie-break vote on a random graph."""
    from rdf_indexes_spark.operators.graph import label_propagation

    import random
    from collections import Counter

    rng = random.Random(11)
    raw = {(rng.randrange(40), rng.randrange(40)) for _ in range(80)}
    edges = {(min(u, v), max(u, v)) for u, v in raw if u != v}
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    lbl = {n: n for n in nbrs}
    for _ in range(30):
        new = {}
        for n in nbrs:
            votes = Counter(lbl[m] for m in nbrs[n])
            votes[lbl[n]] += 1
            top = max(votes.values())
            new[n] = min(l for l, c in votes.items() if c == top)
        if new == lbl:
            break
        lbl = new
    else:
        raise AssertionError("python model did not converge")

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r.n: r.community for r in label_propagation(df).collect()}
    assert got == lbl


def test_bfs_distances_golden(spark):
    """Diamond + tail: min distance wins on converging paths, the hop
    bound truncates, isolated seeds stay at 0, directionality holds."""
    from rdf_indexes_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("e", "f"), ("z", "a")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("lone",)], "node string")
    got = {(r.node, r.dist) for r in bfs_distances(edges, seeds, 2).collect()}
    # z→a edge must NOT pull z in (directed); f is 3 hops — cut off
    assert got == {("a", 0), ("lone", 0), ("b", 1), ("c", 1), ("d", 2)}
    und = {(r.node, r.dist)
           for r in bfs_distances(edges, seeds, 1, directed=False).collect()}
    assert und == {("a", 0), ("lone", 0), ("b", 1), ("c", 1), ("z", 1)}


def test_bfs_distances_brute_force(spark):
    import random

    from rdf_indexes_spark.operators.graph import bfs_distances

    rng = random.Random(17)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(80)}
    seed_nodes = [0, 1]
    # python BFS
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    want, frontier = {s: 0 for s in seed_nodes}, list(seed_nodes)
    for d in range(1, 5):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in want:
                    want[v] = d
                    nxt.append(v)
        frontier = nxt
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    s = spark.createDataFrame([(n,) for n in seed_nodes], "node long")
    got = {r.node: r.dist for r in bfs_distances(e, s, 4).collect()}
    assert got == want


def test_fuzzy_pairs_brute_force(spark):
    """Blocked pairs = the brute-force pairs whose names share the
    block prefix; duplicates collapse; guard raises on over-full
    blocks."""
    import itertools

    import pytest

    from rdf_indexes_spark.operators.link import fuzzy_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    names = ["Hot Rod!", "hot ring", "hot rod", "blue bolt", "blue  bolt",
             "bolt blue", "b0lt"]
    df = spark.createDataFrame([(n,) for n in names], "surface string")
    got = {(r.name_a, r.name_b, r.dist)
           for r in fuzzy_pairs(df, max_dist=3).collect()}
    norm = sorted({"".join(c for c in n.lower() if c.isalnum()) for n in names})
    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(norm, 2)
        if a[0] == b[0] and lev(a, b) <= 3
    }
    assert got == want and got  # non-empty by construction
    # the guard raises inside the broadcast-exchange thread, so it
    # surfaces as a wrapped execution error — match on the message
    with pytest.raises(Exception, match="max_block"):
        fuzzy_pairs(df, max_dist=1, max_block=2).collect()


def test_degree_histogram_golden(spark):
    from rdf_indexes_spark.operators.graph import degree_histogram

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 2), (2, 3), (4, 1)], "src long, dst long"
    )
    out_deg = {r.degree: r.n_nodes for r in degree_histogram(edges).collect()}
    # dedup: 1→{2,3}, 2→{3}, 4→{1}
    assert out_deg == {2: 1, 1: 2}
    und = {r.degree: r.n_nodes
           for r in degree_histogram(edges, directed=False).collect()}
    # simple undirected: 1-2,1-3,2-3,1-4 → deg(1)=3, deg(2)=2, deg(3)=2, deg(4)=1
    assert und == {3: 1, 2: 2, 1: 1}


# ---------------------------------------------------------------- link_prediction


def _lp_model(edges, max_center_degree=None, min_common=1):
    """Pure-python common-neighbor scorer (the brute-force oracle)."""
    import math
    from collections import defaultdict

    simple = set()
    for a, b in edges:
        if a != b:
            simple.add((min(a, b), max(a, b)))
    nbrs = defaultdict(set)
    for u, v in simple:
        nbrs[u].add(v)
        nbrs[v].add(u)
    deg = {n: len(s) for n, s in nbrs.items()}
    out = {}
    nodes = sorted(nbrs)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            if (x, y) in simple:
                continue
            common = nbrs[x] & nbrs[y]
            if max_center_degree is not None:
                common = {z for z in common if deg[z] <= max_center_degree}
            if len(common) < min_common:
                continue
            out[(x, y)] = {
                "cn": len(common),
                "deg_x": deg[x],
                "deg_y": deg[y],
                "n_union": deg[x] + deg[y] - len(common),
                "aa": sum(1.0 / math.log(deg[z]) for z in common),
                "ra": sum(1.0 / deg[z] for z in common),
            }
    return out


def test_link_prediction_golden_path(spark):
    from rdf_indexes_spark.operators.graph import link_prediction

    # path 0-1-2-3: non-adjacent pairs sharing a neighbor are (0,2) via 1
    # and (1,3) via 2; (0,3) shares none. Center degrees are both 2.
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    rows = {(r["x"], r["y"]): r for r in link_prediction(e).collect()}
    assert set(rows) == {(0, 2), (1, 3)}
    r = rows[(0, 2)]
    assert (r["cn"], r["deg_x"], r["deg_y"], r["n_union"]) == (1, 1, 2, 2)
    assert r["jaccard"] == pytest.approx(0.5)
    import math

    assert r["aa"] == pytest.approx(1 / math.log(2))
    assert r["ra"] == pytest.approx(0.5)


def test_link_prediction_excludes_existing_edges_and_self(spark):
    from rdf_indexes_spark.operators.graph import link_prediction

    # triangle + pendant: every triangle pair is adjacent (excluded even
    # though each shares the third vertex); duplicate/reversed/self edges
    # collapse first
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 3)], "src long, dst long"
    )
    got = {(r["x"], r["y"]) for r in link_prediction(e).collect()}
    assert got == {(0, 3), (1, 3)}  # pendant 3 pairs with 2's other neighbors


def test_link_prediction_center_cap_prunes_candidates_not_degrees(spark):
    from rdf_indexes_spark.operators.graph import link_prediction

    # star center 9 (degree 3) + an edge 1-2: capping centers at degree 2
    # kills the star's wedges but keeps TRUE degrees in the survivors
    e = spark.createDataFrame(
        [(9, 0), (9, 1), (9, 2), (1, 2)], "src long, dst long"
    )
    uncapped = {(r["x"], r["y"]): r for r in link_prediction(e).collect()}
    assert (0, 1) in uncapped and (0, 2) in uncapped  # via center 9
    capped = {(r["x"], r["y"]): r for r in link_prediction(e, max_center_degree=2).collect()}
    assert (0, 1) not in capped and (0, 2) not in capped
    # 0-9 pair survives via centers 1 and 2? 0's nbrs={9}, 9 adjacent to 0 -> excluded.
    # survivors: none share a sub-cap center while non-adjacent
    assert capped == {}


def test_link_prediction_matches_bruteforce(spark):
    import random

    from rdf_indexes_spark.operators.graph import link_prediction

    rng = random.Random(4177)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    for cap in (None, 4):
        want = _lp_model(edges, max_center_degree=cap)
        got = {
            (r["x"], r["y"]): r
            for r in link_prediction(
                spark.createDataFrame(edges, "src long, dst long"),
                max_center_degree=cap,
            ).collect()
        }
        assert set(got) == set(want)
        for k, w in want.items():
            g = got[k]
            assert (g["cn"], g["deg_x"], g["deg_y"], g["n_union"]) == (
                w["cn"], w["deg_x"], w["deg_y"], w["n_union"],
            ), k
            assert g["aa"] == pytest.approx(w["aa"], rel=1e-9)
            assert g["ra"] == pytest.approx(w["ra"], rel=1e-9)


# ---------------------------------------------------------------- random_walks


def _walk_model(edges, num_walks, walk_length):
    """Pure-python replay of the deterministic walk contract."""
    from rdf_indexes_spark.operators.dedup import _P
    from rdf_indexes_spark.operators.sampling import _A, _B

    def h(k):
        return (_A * (k % _P) + _B) % _P

    nbrs = {}
    for s, d in sorted(set(edges)):
        nbrs.setdefault(s, []).append(d)
    for s in nbrs:
        nbrs[s] = sorted(set(nbrs[s]))
    rows = set()
    for node in nbrs:
        for w in range(num_walks):
            wid = node * num_walks + w
            h1 = h(wid)
            cur = node
            rows.add((wid, 0, cur))
            for t in range(1, walk_length + 1):
                if cur not in nbrs:
                    break
                cur = nbrs[cur][h(h1 + t) % len(nbrs[cur])]
                rows.add((wid, t, cur))
    return rows


def test_random_walks_matches_python_model(spark):
    import random

    from rdf_indexes_spark.operators.graph import random_walks

    rng = random.Random(99)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(80)]
    got = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(
            spark.createDataFrame(edges, "src long, dst long"),
            num_walks=3,
            walk_length=6,
        ).collect()
    }
    assert got == _walk_model(edges, 3, 6)


def test_random_walks_dead_end_stops_early(spark):
    from rdf_indexes_spark.operators.graph import random_walks

    # 0 -> 1 -> 2, 2 has no out-edges: every walk is exactly 0,1,2 / 1,2
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = random_walks(e, num_walks=1, walk_length=5).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert by_walk[0] == {0: 0, 1: 1, 2: 2}  # stops at the dead end
    assert by_walk[1] == {0: 1, 1: 2}
    assert 2 * 1 not in by_walk or by_walk.get(2) is None  # node 2 never starts


def test_random_walks_layout_invariant(spark):
    import random

    from rdf_indexes_spark.operators.graph import random_walks

    rng = random.Random(5)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(df, num_walks=2, walk_length=4).collect()
    }
    shuffled = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(df.repartition(7), num_walks=2, walk_length=4).collect()
    }
    assert base == shuffled


# ------------------------------------------------------------ personalized_pagerank


def _numpy_ppr(edges, n, seeds, d, iters):
    out = np.zeros(n)
    for s, _ in edges:
        out[s] += 1
    t = np.zeros(n)
    for s in seeds:
        t[s] = 1.0 / len(seeds)
    r = t.copy()
    for _ in range(iters):
        nxt = (1 - d) * t
        dm = 0.0
        for i in range(n):
            if out[i] == 0:
                dm += r[i]
        nxt += d * dm * t
        for s, dst in edges:
            nxt[dst] += d * r[s] / out[s]
        r = nxt
    return r


def test_personalized_pagerank_matches_numpy(spark):
    import random

    from rdf_indexes_spark.operators.graph import personalized_pagerank

    rng = random.Random(31)
    n = 20
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(60)})
    seeds = [0, 7]
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            spark.createDataFrame(edges, "src long, dst long"),
            sources=seeds,
            iterations=8,
        ).collect()
    }
    want = _numpy_ppr(edges, n, seeds, 0.85, 8)
    for node, rank in got.items():
        assert rank == pytest.approx(want[node], abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_pagerank_unreachable_is_zero(spark):
    from rdf_indexes_spark.operators.graph import personalized_pagerank

    # two components; seeding in one leaves the other at exactly 0
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (5, 6), (6, 5)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, sources=[0], iterations=6).collect()
    }
    assert got[5] == 0.0 and got[6] == 0.0
    assert got[0] > got[1] > 0  # seed holds the teleport mass
    import pytest as _pt

    with _pt.raises(ValueError):
        personalized_pagerank(e, sources=[])


# ---------------------------------------------------------------- weighted_distances


def _wd_model(edges, seeds, max_hops):
    """Hop-bounded Bellman-Ford in pure python."""
    best = {}
    cheapest = {}
    for s, d, w in edges:
        k = (s, d)
        cheapest[k] = min(cheapest.get(k, w), w)
    for src in set(seeds):
        dist = {src: 0}
        for _ in range(max_hops):
            nxt = dict(dist)
            for (s, d), w in cheapest.items():
                if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                    nxt[d] = dist[s] + w
            dist = nxt
        for node, dv in dist.items():
            best[(src, node)] = dv
    return best


def test_weighted_distances_matches_python_model(spark):
    import random

    from rdf_indexes_spark.operators.graph import weighted_distances

    rng = random.Random(13)
    edges = [
        (rng.randrange(15), rng.randrange(15), rng.randrange(1, 9))
        for _ in range(50)
    ]
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    got = {
        (r["source"], r["node"]): r["dist"]
        for r in weighted_distances(
            spark.createDataFrame(edges, "src long, dst long, w long"),
            seeds,
            max_hops=4,
        ).collect()
    }
    assert got == _wd_model(edges, [0, 3], 4)


def test_weighted_distances_hop_bound_is_semantics(spark):
    from rdf_indexes_spark.operators.graph import weighted_distances

    # cheap long way (1+1+1) vs expensive shortcut (10): the 2-hop answer
    # must take the shortcut, the 3-hop answer the cheap path
    e = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    two = {r["node"]: r["dist"] for r in weighted_distances(e, seeds, 2).collect()}
    three = {r["node"]: r["dist"] for r in weighted_distances(e, seeds, 3).collect()}
    assert two[3] == 10 and three[3] == 3


def test_weighted_distances_rejects_negative(spark):
    from rdf_indexes_spark.operators.graph import weighted_distances

    e = spark.createDataFrame([(0, 1, -2)], "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(Exception, match="negative edge weight"):
        weighted_distances(e, seeds, 2).collect()
