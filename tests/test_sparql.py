"""SPARQL-subset front-end: parser, string-level BGP semantics (the
three independent id spaces make raw id joins WRONG across roles — these
tests pin the term-level contract), decode, and modifiers."""

from __future__ import annotations

import pandas as pd
import pytest

from rdf_indexes_spark.plans.sparql import (
    Const,
    Var,
    decode_triples,
    parse_sparql,
    run_sparql,
)

# Hand-built index with DELIBERATELY misaligned role id spaces:
# the same surface form gets different ids as subject vs object, and
# id collisions across roles pair UNRELATED terms — so any id-level
# cross-role join produces wrong strings.
_VOCAB_S = [("alice", 0), ("bob", 1), ("carol", 2), ("dave", 3)]
_VOCAB_P = [("knows", 0), ("likes", 1)]
_VOCAB_O = [("bob", 0), ("carol", 1), ("dave", 2), ("alice", 3)]
_TRIPLES_STR = [
    ("alice", "knows", "bob"),
    ("bob", "knows", "carol"),
    ("carol", "likes", "dave"),
    ("bob", "likes", "alice"),
    ("dave", "knows", "dave"),
]


@pytest.fixture(scope="module")
def idx(spark):
    s_ids = dict(_VOCAB_S)
    p_ids = dict(_VOCAB_P)
    o_ids = dict(_VOCAB_O)
    triples = [(s_ids[s], p_ids[p], o_ids[o]) for s, p, o in _TRIPLES_STR]
    t = spark.createDataFrame(triples, "s long, p long, o long")
    tables = {name: t for name in ("spo", "pos", "osp", "ops", "pso")}
    vocabs = {
        role: spark.createDataFrame(rows, "term string, id long")
        for role, rows in (("s", _VOCAB_S), ("p", _VOCAB_P), ("o", _VOCAB_O))
    }
    return tables, vocabs


# ---------------------------------------------------------------- parser


def test_parse_select():
    q = parse_sparql('SELECT ?x ?y WHERE { ?x <knows> ?y . ?y "likes it" ?z }')
    assert q.form == "SELECT" and q.variables == ["x", "y"]
    assert q.patterns[0] == (Var("x"), Const("knows"), Var("y"))
    assert q.patterns[1] == (Var("y"), Const("likes it"), Var("z"))


def test_parse_star_distinct_order_limit():
    q = parse_sparql(
        "SELECT DISTINCT * WHERE { ?b knows ?a . } ORDER BY ?a ?b LIMIT 7"
    )
    assert q.distinct and q.variables == ["a", "b"]
    assert q.order_by == [("a", False), ("b", False)] and q.limit == 7


def test_parse_ask_and_escapes():
    q = parse_sparql(r'ASK { alice knows "bo\"b" }')
    assert q.form == "ASK" and q.patterns[0][2] == Const('bo"b')


@pytest.mark.parametrize(
    "bad",
    [
        "WHERE { ?x ?y ?z }",  # no form
        "SELECT WHERE { ?x ?y ?z }",  # no projection
        "SELECT ?x WHERE { ?x knows }",  # short pattern
        "SELECT ?x WHERE { ?x knows ?y",  # unterminated
        "SELECT ?q WHERE { ?x knows ?y }",  # unbound projection
        "SELECT ?x WHERE { ?x knows ?y } ORDER BY ?y",  # unprojected order
        "SELECT ?x WHERE { ?x knows ?y } LIMIT x",  # bad limit
        "SELECT ?x WHERE { }",  # empty BGP
    ],
)
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


# ------------------------------------------------------------- semantics


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chain_crosses_roles_by_term(idx):
    """?y is an object in p1 and a subject in p2. Term semantics: only
    bob and carol chain. An id-level join would emit (bob, alice) —
    carol's o-id equals bob's s-id — which must NOT appear."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x knows ?y . ?y likes ?z }", tables, vocabs
    )
    assert _rows(out) == [("alice", "alice"), ("bob", "dave")]


def test_repeated_var_in_pattern_compares_terms(idx):
    """(?x knows ?x): only dave-knows-dave holds at the string level;
    alice-knows-bob has s_id == o_id == 0 and must not match."""
    tables, vocabs = idx
    out = run_sparql("SELECT ?x WHERE { ?x knows ?x }", tables, vocabs)
    assert _rows(out) == [("dave",)]


def test_single_role_star_join(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?who ?other WHERE { ?who knows ?other . ?who likes alice }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "carol")]


def test_predicate_variable(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?p WHERE { bob ?p ?y }", tables, vocabs)
    assert _rows(out) == [("knows",), ("likes",)]


def test_distinct_order_limit(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT DISTINCT ?x WHERE { ?x ?p ?y } ORDER BY ?x LIMIT 2",
        tables,
        vocabs,
    )
    assert [r["x"] for r in out.collect()] == ["alice", "bob"]


def test_ask(idx):
    tables, vocabs = idx
    assert run_sparql("ASK { alice knows bob }", tables, vocabs).first()["ask"]
    assert not run_sparql("ASK { alice likes bob }", tables, vocabs).first()["ask"]


def test_unknown_constant_is_empty(idx):
    """A term absent from its vocabulary proves the answer empty without
    touching the triple tables (the reference's missing-key drop)."""
    tables, vocabs = idx
    out = run_sparql("SELECT ?x WHERE { ?x knows zelda9 }", tables, vocabs)
    assert out.columns == ["x"] and out.count() == 0
    assert not run_sparql("ASK { zelda9 knows ?x }", tables, vocabs).first()["ask"]


def test_decode_triples(idx):
    tables, vocabs = idx
    out = decode_triples(tables["spo"], vocabs)
    assert _rows(out) == sorted(_TRIPLES_STR)


def test_optional_left_joins_with_nulls(idx):
    """OPTIONAL keeps every required solution; ?z is NULL where the
    optional pattern has no match (only bob and carol like anyone)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", None), ("bob", "alice"), ("dave", None)]


def test_optional_unknown_constant_keeps_required(idx):
    """An OPTIONAL whose constant is missing from the vocabulary never
    matches — required rows survive with NULL."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x likes ?y . OPTIONAL { ?x zzz9 ?z } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", None), ("carol", None)]


def test_filter_regex_on_id_var_pushes_into_vocab(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x WHERE { ?x likes ?y . FILTER regex(?x, "^b") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob",)]


def test_filter_eq_ne(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?y != carol ) }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "bob"), ("dave", "dave")]
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y . FILTER ( ?x = dave ) }", tables, vocabs
    )
    assert _rows(out) == [("dave",)]


def test_filter_on_multi_role_var(idx):
    """?y crosses roles (term-typed), so the filter is a plain string
    predicate on the joined result."""
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?z WHERE { ?x knows ?y . ?y likes ?z . FILTER regex(?y, "^c") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "dave")]


def test_filter_drops_unmatched_optional(idx):
    """SPARQL error-on-unbound: a FILTER over an OPTIONAL-only variable
    removes the NULL rows."""
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?z WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } . '
        'FILTER regex(?z, ".") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "alice")]


def test_parse_optional_filter_errors():
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { OPTIONAL { ?x knows ?y } }")  # no required...
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . OPTIONAL { FILTER ( ?x = a ) } }")
    with pytest.raises(ValueError):
        parse_sparql('SELECT ?x WHERE { ?x knows ?y . FILTER regex(?q, "a") }')
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . FILTER ( ?x ~ a ) }")


def test_path_plus_term_semantics(idx):
    """knows+ composes hops by TERM across the misaligned id spaces:
    alice→bob→carol must chain even though bob's o-id (0) and s-id (1)
    differ. dave's self-loop must terminate."""
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x knows+ ?y }", tables, vocabs)
    assert _rows(out) == [
        ("alice", "bob"),
        ("alice", "carol"),
        ("bob", "carol"),
        ("dave", "dave"),
    ]


def test_path_plus_bound_subject_and_join(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?y WHERE { alice knows+ ?y }", tables, vocabs)
    assert _rows(out) == [("bob",), ("carol",)]
    # path endpoint feeding a further pattern (?y crosses roles again)
    out = run_sparql(
        "SELECT ?x ?y ?z WHERE { ?x knows+ ?y . ?y likes ?z }", tables, vocabs
    )
    assert _rows(out) == [
        ("alice", "bob", "alice"),
        ("alice", "carol", "dave"),
        ("bob", "carol", "dave"),
    ]


def test_path_plus_separate_token_and_errors(idx):
    tables, vocabs = idx
    out = run_sparql("ASK { alice knows + carol }", tables, vocabs)
    assert out.first()["ask"]
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x ?p + ?y }")  # var predicate path


def test_not_exists_anti_join(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y . FILTER NOT EXISTS { ?x likes ?z } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice",), ("dave",)]  # bob likes alice → dropped


def test_exists_semi_join(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER EXISTS { ?x likes ?z } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "carol")]


def test_exists_cross_role_shared_var(idx):
    """The shared ?y is an object outside and a subject inside — the
    semi/anti join must compare TERMS across the id spaces."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER NOT EXISTS { ?y likes ?z } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("dave", "dave")]  # bob and carol both like someone


def test_exists_unknown_constant(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { ?x likes ?y . FILTER NOT EXISTS { ?x zzz9 ?z } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob",), ("carol",)]  # vacuously true
    assert (
        not run_sparql(
            "ASK { ?x likes ?y . FILTER EXISTS { ?x zzz9 ?z } }", tables, vocabs
        ).first()["ask"]
    )


def test_exists_scoped_vars_not_projectable(idx):
    with pytest.raises(ValueError):
        parse_sparql(
            "SELECT ?z WHERE { ?x knows ?y . FILTER EXISTS { ?x likes ?z } }"
        )
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . FILTER NOT regex(?x, \"a\") }")


def test_union_bag_semantics(idx):
    """UNION keeps duplicates (multiset): dave knows dave matches BOTH
    branches of an s/o-symmetric union and must appear twice."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { { ?x knows ?y } UNION { ?y knows ?x } } ORDER BY ?x",
        tables,
        vocabs,
    )
    rows = _rows(out)
    assert rows.count(("dave",)) == 2
    assert rows.count(("alice",)) == 1  # alice knows bob: left branch only
    assert ("bob",) in rows  # bob as object of knows: right branch (?x is o-role)


def test_union_joins_outer_pattern_cross_role(idx):
    """The union's ?y is an object in the outer pattern and a subject in
    branch 1 / object in branch 2 — joins must compare TERMS."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x knows ?y . { ?y likes ?z } UNION { ?z likes ?y } }",
        tables,
        vocabs,
    )
    # ?x knows ?y: (alice,bob),(bob,carol),(dave,dave)
    # branch1 ?y likes ?z: bob likes alice; carol likes dave
    # branch2 ?z likes ?y: (carol likes dave → z=carol,y=dave)... y must be
    # an o-term of likes: alice (z=bob), dave (z=carol)
    assert sorted(_rows(out)) == [
        ("alice", "alice"),  # y=bob likes alice (branch 1)
        ("bob", "dave"),  # y=carol likes dave (branch 1)
        ("dave", "carol"),  # z=carol likes y=dave (branch 2)
    ]


def test_union_unbound_branch_vars_are_null(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y ?z WHERE { { ?x likes ?y } UNION { ?x knows ?z } }",
        tables,
        vocabs,
    )
    rows = [tuple(r) for r in out.collect()]  # unsortable: None mixes with str
    assert ("bob", "alice", None) in rows  # likes branch: ?z unbound
    assert ("alice", None, "bob") in rows  # knows branch: ?y unbound
    assert len(rows) == 5


def test_union_unknown_constant_branches(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { { ?x zzz9 ?y } UNION { ?x likes ?y } }", tables, vocabs
    )
    assert sorted(_rows(out)) == [("bob",), ("carol",)]  # dead branch dropped
    empty = run_sparql(
        "SELECT ?x WHERE { { ?x zzz9 ?y } UNION { ?x zzz8 ?y } }", tables, vocabs
    )
    assert _rows(empty) == []  # every branch dead: provably empty


def test_union_distinct_and_parse_errors(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT DISTINCT ?x WHERE { { ?x knows ?y } UNION { ?y knows ?x } }",
        tables,
        vocabs,
    )
    assert sorted(_rows(out)) == [(t,) for t in ["alice", "bob", "carol", "dave"]]
    with pytest.raises(ValueError):  # braced group without UNION
        parse_sparql("SELECT ?x WHERE { { ?x knows ?y } }")
    with pytest.raises(ValueError):  # UNION not followed by a group
        parse_sparql("SELECT ?x WHERE { { ?x knows ?y } UNION ?x likes ?y }")
    with pytest.raises(ValueError):  # empty branch
        parse_sparql("SELECT ?x WHERE { { ?x knows ?y } UNION { } }")
    with pytest.raises(ValueError):  # OPTIONAL cannot nest in a branch
        parse_sparql(
            "SELECT ?x WHERE { { ?x knows ?y . OPTIONAL { ?x likes ?z } } UNION { ?x likes ?y } }"
        )


def test_minus_anti_join(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y . MINUS { ?x likes ?z } }", tables, vocabs
    )
    assert _rows(out) == [("alice",), ("dave",)]  # same as NOT EXISTS here


def test_minus_disjoint_domain_removes_nothing(idx):
    """The SPARQL 1.1 MINUS/NOT-EXISTS split: a MINUS sharing no variable
    with the outer pattern removes NOTHING; NOT EXISTS there is rejected
    by this subset."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y . MINUS { ?a likes ?b } }", tables, vocabs
    )
    assert sorted(_rows(out)) == [("alice",), ("bob",), ("dave",)]
    with pytest.raises(ValueError):
        run_sparql(
            "SELECT ?x WHERE { ?x knows ?y . FILTER NOT EXISTS { ?a likes ?b } }",
            tables,
            vocabs,
        )


def test_minus_unknown_constant_and_cross_role(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y . MINUS { ?x zzz9 ?z } }", tables, vocabs
    )
    assert sorted(_rows(out)) == [("alice",), ("bob",), ("dave",)]  # removes nothing
    out2 = run_sparql(  # shared ?y: o-role outside, s-role inside — term join
        "SELECT ?x ?y WHERE { ?x knows ?y . MINUS { ?y likes ?z } }", tables, vocabs
    )
    assert _rows(out2) == [("dave", "dave")]


def test_values_restriction(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?y WHERE { ?x knows ?y . VALUES ?x { alice "dave" } }',
        tables,
        vocabs,
    )
    assert sorted(_rows(out)) == [("alice", "bob"), ("dave", "dave")]
    out2 = run_sparql(  # multi-role var: term-level restriction
        "SELECT ?x ?y WHERE { ?x knows ?y . { ?y likes ?z } UNION { ?z likes ?y } . "
        "VALUES ?y { bob } }",
        tables,
        vocabs,
    )
    assert _rows(out2) == [("alice", "bob")]
    out3 = run_sparql(  # absent term matches nothing
        "SELECT ?x WHERE { ?x knows ?y . VALUES ?x { zzz9 } }", tables, vocabs
    )
    assert _rows(out3) == []


def test_minus_values_parse_errors(idx):
    with pytest.raises(ValueError):  # empty MINUS
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . MINUS { } }")
    with pytest.raises(ValueError):  # empty VALUES
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . VALUES ?x { } }")
    with pytest.raises(ValueError):  # VALUES needs a variable
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . VALUES alice { bob } }")
    with pytest.raises(ValueError):  # VALUES var must be bound
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . VALUES ?q { bob } }")
    with pytest.raises(ValueError):  # MINUS cannot nest inside OPTIONAL
        parse_sparql(
            "SELECT ?x WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z . MINUS { ?x knows ?w } } }"
        )
    with pytest.raises(ValueError):  # MINUS-scoped vars not projectable
        parse_sparql("SELECT ?z WHERE { ?x knows ?y . MINUS { ?x likes ?z } }")


def test_matches_pandas_string_oracle(idx):
    """The full star+chain BGP against a pandas merge over the STRING
    triples — the string level is the ground truth the id machinery must
    reproduce."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?a ?b ?c WHERE { ?a knows ?b . ?b likes ?c . ?a knows bob }",
        tables,
        vocabs,
    )
    df = pd.DataFrame(_TRIPLES_STR, columns=["s", "p", "o"])
    p1 = df[df.p == "knows"].rename(columns={"s": "a", "o": "b"})[["a", "b"]]
    p2 = df[df.p == "likes"].rename(columns={"s": "b", "o": "c"})[["b", "c"]]
    p3 = df[(df.p == "knows") & (df.o == "bob")].rename(columns={"s": "a"})[["a"]]
    exp = p1.merge(p2, on="b").merge(p3, on="a")
    assert _rows(out) == sorted(map(tuple, exp[["a", "b", "c"]].values))


# -------------------------------------------------- composite property paths


def test_parse_path_expressions():
    from rdf_indexes_spark.plans.sparql import PathExpr, PathPlus

    q = parse_sparql("SELECT ?x ?y WHERE { ?x knows/likes ?y }")
    assert q.patterns[0][1] == PathExpr(("seq", (("atom", "knows"), ("atom", "likes"))))
    # precedence: / binds tighter than |
    q = parse_sparql("SELECT ?x ?y WHERE { ?x a/b|c ?y }")
    assert q.patterns[0][1] == PathExpr(
        ("alt", (("seq", (("atom", "a"), ("atom", "b"))), ("atom", "c")))
    )
    # ^ applies to the modified step; bare p+ stays the PathPlus fast path
    q = parse_sparql("SELECT ?x ?y WHERE { ?x ^knows+ ?y }")
    assert q.patterns[0][1] == PathExpr(("inv", ("plus", ("atom", "knows"))))
    assert parse_sparql("SELECT ?x ?y WHERE { ?x knows+ ?y }").patterns[0][1] == PathPlus("knows")
    q = parse_sparql("SELECT ?x ?y WHERE { ?x (knows|likes)* ?y }")
    assert q.patterns[0][1] == PathExpr(("star", ("alt", (("atom", "knows"), ("atom", "likes")))))
    with pytest.raises(ValueError):  # variable inside a path
        parse_sparql("SELECT ?x ?y WHERE { ?x knows/?p ?y }")


def test_path_sequence(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x knows/likes ?y }", tables, vocabs)
    assert _rows(out) == [("alice", "alice"), ("bob", "dave")]
    # bound start
    out = run_sparql("SELECT ?y WHERE { alice knows/knows ?y }", tables, vocabs)
    assert _rows(out) == [("carol",)]


def test_path_inverse(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x ^knows ?y }", tables, vocabs)
    assert _rows(out) == [("bob", "alice"), ("carol", "bob"), ("dave", "dave")]


def test_path_alternation_is_bag(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x knows|likes ?y }", tables, vocabs)
    assert len(_rows(out)) == 5  # all edges, both predicates
    # duplicate branches keep duplicates (SPARQL multiset alternation)
    out = run_sparql("SELECT ?x ?y WHERE { ?x knows|knows ?y }", tables, vocabs)
    assert len(_rows(out)) == 6
    assert len(set(_rows(out))) == 3


def test_path_alt_closure(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x (knows|likes)+ ?y }", tables, vocabs)
    got = set(_rows(out))
    # BFS over the union graph
    edges = {("alice", "bob"), ("bob", "carol"), ("carol", "dave"), ("bob", "alice"), ("dave", "dave")}
    exp = set()
    for start in ("alice", "bob", "carol", "dave"):
        seen, frontier = set(), {start}
        while frontier:
            frontier = {o for (s, o) in edges if s in frontier} - seen
            seen |= frontier
        exp |= {(start, x) for x in seen}
    assert got == exp and len(_rows(out)) == len(got)  # closure is duplicate-free


def test_path_star_and_opt(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x knows* ?y }", tables, vocabs)
    ident = {(t, t) for t in ("alice", "bob", "carol", "dave")}
    assert set(_rows(out)) == ident | {("alice", "bob"), ("bob", "carol"), ("alice", "carol"), ("dave", "dave")}
    out = run_sparql("SELECT ?x ?y WHERE { ?x likes? ?y }", tables, vocabs)
    assert set(_rows(out)) == ident | {("carol", "dave"), ("bob", "alice")}


def test_path_absent_atom_is_empty_not_fatal(idx):
    tables, vocabs = idx
    # alternation with one absent branch still answers through the other
    out = run_sparql("SELECT ?x ?y WHERE { ?x knows|nosuch ?y }", tables, vocabs)
    assert len(_rows(out)) == 3
    # a wholly absent path is empty, not an error
    out = run_sparql("SELECT ?x ?y WHERE { ?x nosuch/knows ?y }", tables, vocabs)
    assert _rows(out) == []


def test_path_joins_patterns_by_term(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y ?z WHERE { ?x knows/likes ?y . ?y knows ?z }", tables, vocabs
    )
    assert _rows(out) == [("alice", "alice", "bob"), ("bob", "dave", "dave")]


def test_path_object_only_term_unified_space(spark):
    """A term that exists ONLY in the object vocabulary must be a valid
    path endpoint (displaced unified id): start an inverse path there."""
    t = spark.createDataFrame([(0, 0, 0), (1, 0, 1)], "s long, p long, o long")
    tables = {name: t for name in ("spo", "pos", "osp", "ops", "pso")}
    vocabs = {
        "s": spark.createDataFrame([("alice", 0), ("bob", 1)], "term string, id long"),
        "p": spark.createDataFrame([("knows", 0)], "term string, id long"),
        "o": spark.createDataFrame([("zed", 0), ("alice", 1)], "term string, id long"),
    }
    out = run_sparql("SELECT ?y WHERE { zed ^knows ?y }", tables, vocabs)
    assert _rows(out) == [("alice",)]
    # and the forward direction decodes the displaced id back to its term
    out = run_sparql("SELECT ?y WHERE { alice knows ?y }", tables, vocabs)
    assert _rows(out) == [("zed",)]
    out = run_sparql("SELECT ?x ?y WHERE { ?x knows/^knows ?y }", tables, vocabs)
    assert ("alice", "alice") in set(_rows(out))


# ------------------------------------------------------------ aggregates


def test_parse_aggregates():
    q = parse_sparql(
        "SELECT ?p (COUNT(*) AS ?n) (COUNT(DISTINCT ?s) AS ?d) (MIN(?o) AS ?lo) "
        "WHERE { ?s ?p ?o } GROUP BY ?p"
    )
    assert q.variables == ["p", "n", "d", "lo"]
    assert q.aggregates == [
        ("COUNT", None, False, "n"),
        ("COUNT", "s", True, "d"),
        ("MIN", "o", False, "lo"),
    ]
    assert q.group_by == ["p"]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT (COUNT(*) ?n) WHERE { ?s ?p ?o }",  # missing AS
        "SELECT (MEDIAN(?s) AS ?n) WHERE { ?s ?p ?o }",  # unsupported fn
        "SELECT (MIN(*) AS ?n) WHERE { ?s ?p ?o }",  # MIN(*) meaningless
        "SELECT DISTINCT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }",  # DISTINCT+agg
        "SELECT (COUNT(*) AS ?n) * WHERE { ?s ?p ?o }",  # * after agg
        "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o }",  # ?s not grouped
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?q",  # unknown key
        "SELECT (COUNT(*) AS ?s) WHERE { ?s ?p ?o }",  # alias shadows var
        "SELECT (COUNT(*) AS ?n) (MAX(?o) AS ?n) WHERE { ?s ?p ?o }",  # dup alias
        "SELECT (COUNT(?q) AS ?n) WHERE { ?s ?p ?o }",  # unbound agg arg
        "SELECT ?s WHERE { ?s ?p ?o } GROUP BY",  # empty GROUP BY
    ],
)
def test_parse_aggregate_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


def test_count_star_implicit_group(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }", tables, vocabs)
    assert _rows(out) == [(5,)]


def test_group_by_count(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY ?p",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [("knows", 3), ("likes", 2)]


def test_count_distinct(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT (COUNT(DISTINCT ?s) AS ?n) WHERE { ?s knows ?o }", tables, vocabs
    )
    assert _rows(out) == [(3,)]  # alice, bob, dave


def test_min_max_compare_terms_not_ids(idx):
    """likes-objects are dave (o-id 2) and alice (o-id 3): id order would
    put dave first, STRING order puts alice first — MIN/MAX must act on
    decoded surface forms."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?p (MIN(?o) AS ?lo) (MAX(?o) AS ?hi) WHERE { ?s ?p ?o } "
        "GROUP BY ?p ORDER BY ?p",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [
        ("knows", "bob", "dave"),
        ("likes", "alice", "dave"),
    ]


def test_count_var_skips_unbound_optional(idx):
    """COUNT ?z counts BOUND values: dave's knows-target has no likes
    edge, so its group counts 0 (the row itself survives)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x (COUNT(?z) AS ?n) WHERE { ?x knows ?y . "
        "OPTIONAL { ?y likes ?z } } GROUP BY ?x ORDER BY ?x",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [
        ("alice", 1),
        ("bob", 1),
        ("dave", 0),
    ]


def test_count_distinct_multi_role_var(idx):
    """?y crosses roles (object then subject): the DISTINCT set is over
    TERMS — bob and carol chain, dave does not."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT (COUNT(DISTINCT ?y) AS ?n) WHERE { ?x knows ?y . ?y likes ?z }",
        tables,
        vocabs,
    )
    assert _rows(out) == [(2,)]


def test_aggregate_over_empty_pattern(idx):
    """Unknown constant: implicit group -> ONE row with COUNT 0 and
    unbound MIN (SPARQL 1.1 / SQL semantics); GROUP BY -> zero rows."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT (COUNT(*) AS ?n) (MIN(?o) AS ?lo) WHERE { ?s frobnicates ?o }",
        tables,
        vocabs,
    )
    assert _rows(out) == [(0, None)]
    out = run_sparql(
        "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s frobnicates ?o } GROUP BY ?s",
        tables,
        vocabs,
    )
    assert _rows(out) == []


def test_group_by_without_aggregates_is_distinct(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?p WHERE { ?s ?p ?o } GROUP BY ?p", tables, vocabs)
    assert _rows(out) == [("knows",), ("likes",)]


def test_aggregate_order_by_alias_and_limit(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
        "ORDER BY ?n LIMIT 1",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [("likes", 2)]


# ------------------------- negated property sets, HAVING, modifiers


def test_negated_property_set(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x !knows ?y }", tables, vocabs)
    assert _rows(out) == [("bob", "alice"), ("carol", "dave")]


def test_negated_property_set_multi(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x !(knows|likes) ?y }", tables, vocabs)
    assert _rows(out) == []
    # absent atoms exclude nothing: all 5 edges survive
    out = run_sparql("SELECT ?x ?y WHERE { ?x !(nosuch) ?y }", tables, vocabs)
    assert len(_rows(out)) == 5


def test_negated_property_set_closure(idx):
    """!likes+ == knows+: alice->bob->carol composes."""
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x !likes+ ?y }", tables, vocabs)
    assert _rows(out) == [
        ("alice", "bob"),
        ("alice", "carol"),
        ("bob", "carol"),
        ("dave", "dave"),
    ]


def test_negated_property_set_inverse(idx):
    tables, vocabs = idx
    out = run_sparql("SELECT ?x ?y WHERE { ?x ^!knows ?y }", tables, vocabs)
    assert _rows(out) == [("alice", "bob"), ("dave", "carol")]


def test_having_on_count(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
        "HAVING ( ?n > 2 )",
        tables,
        vocabs,
    )
    assert _rows(out) == [("knows", 3)]


def test_having_on_group_key_and_multiple(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
        "HAVING ( ?p != knows ) ( ?n >= 2 )",
        tables,
        vocabs,
    )
    assert _rows(out) == [("likes", 2)]


def test_order_desc_offset_limit(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y } ORDER BY DESC(?x) OFFSET 1 LIMIT 1",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [("bob",)]
    # LIMIT before OFFSET parses too
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y } ORDER BY ASC(?x) LIMIT 2 OFFSET 2",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [("dave",)]


def test_sample_is_deterministic_min(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?p (SAMPLE(?o) AS ?x) WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY ?p",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [("knows", "bob"), ("likes", "alice")]


def test_group_concat(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?p (GROUP_CONCAT(?o ; SEPARATOR = ",") AS ?g) '
        "WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY ?p",
        tables,
        vocabs,
    )
    assert [tuple(r) for r in out.collect()] == [
        ("knows", "bob,carol,dave"),
        ("likes", "alice,dave"),
    ]


def test_group_concat_distinct_default_sep(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT (GROUP_CONCAT(DISTINCT ?p) AS ?g) WHERE { ?s ?p ?o }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("knows likes",)]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?x WHERE { ?x knows ?y } HAVING ( ?x = alice )",  # no grouping
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } HAVING ( ?q > 1 )",  # unknown
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } HAVING ( ?n > abc )",  # non-int
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } HAVING ( ?n ~ 1 )",  # bad op
        'SELECT (COUNT(?s ; SEPARATOR = ",") AS ?n) WHERE { ?s ?p ?o }',  # sep on COUNT
        "SELECT ?x ?y WHERE { ?x !?p ?y }",  # NPS needs constants
        "SELECT ?x WHERE { ?x knows ?y } OFFSET x",  # bad offset
        "SELECT ?x WHERE { ?x knows ?y } ORDER BY DESC ?x",  # DESC needs parens
    ],
)
def test_parse_modifier_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


# ------------------------------------------------------------- CONSTRUCT


def test_construct_builds_graph(idx):
    """Two template triples per solution, constants minted freely (the
    'rel' predicate exists in no vocabulary), result is a SET."""
    tables, vocabs = idx
    out = run_sparql(
        "CONSTRUCT { ?x rel ?z . ?z rev ?x } WHERE { ?x knows ?y . ?y likes ?z }",
        tables,
        vocabs,
    )
    assert out.columns == ["s", "p", "o"]
    # chain solutions: (x=alice, z=alice) and (x=bob, z=dave)
    assert _rows(out) == [
        ("alice", "rel", "alice"),
        ("alice", "rev", "alice"),
        ("bob", "rel", "dave"),
        ("dave", "rev", "bob"),
    ]


def test_construct_dedups_and_reifies_constants(idx):
    """Every solution instantiates the same all-constant triple -> it
    appears ONCE (graph set semantics)."""
    tables, vocabs = idx
    out = run_sparql(
        "CONSTRUCT { g hasEdge yes } WHERE { ?x knows ?y }", tables, vocabs
    )
    assert _rows(out) == [("g", "hasEdge", "yes")]


def test_construct_skips_unbound_optional(idx):
    """dave's knows-target never likes: the OPTIONAL ?z is NULL there and
    the template triple is NOT generated for that solution."""
    tables, vocabs = idx
    out = run_sparql(
        "CONSTRUCT { ?x likesVia ?z } WHERE { ?x knows ?y . "
        "OPTIONAL { ?y likes ?z } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "likesVia", "alice"), ("bob", "likesVia", "dave")]


def test_construct_unknown_constant_is_empty_graph(idx):
    tables, vocabs = idx
    out = run_sparql(
        "CONSTRUCT { ?x r ?y } WHERE { ?x frobnicates ?y }", tables, vocabs
    )
    assert out.columns == ["s", "p", "o"] and out.count() == 0


@pytest.mark.parametrize(
    "bad",
    [
        "CONSTRUCT { } WHERE { ?x knows ?y }",  # empty template
        "CONSTRUCT { ?x r ?z } WHERE { ?x knows ?y }",  # unbound template var
        "CONSTRUCT { ?x r ?y } WHERE { ?x knows ?y } LIMIT 2",  # modifier
        "CONSTRUCT { ?x r ?y } WHERE { ?x knows ?y } ORDER BY ?x",  # modifier
        "CONSTRUCT { ?x knows+ ?y } WHERE { ?x knows ?y }",  # path in template
    ],
)
def test_construct_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


# ------------------------- SUM/AVG, BIND, DESCRIBE, ordering FILTERs


# numeric OBJECT terms (plus one non-numeric 'young') for the SPARQL
# numeric-semantics aggregates and ordering filters
_VOCAB_P2 = [("knows", 0), ("likes", 1), ("age", 2)]
_VOCAB_O2 = _VOCAB_O + [("30", 4), ("7", 5), ("young", 6)]
_TRIPLES_STR2 = _TRIPLES_STR + [
    ("alice", "age", "30"),
    ("bob", "age", "7"),
    ("carol", "age", "young"),
]


@pytest.fixture(scope="module")
def idx_num(spark):
    s_ids, p_ids, o_ids = dict(_VOCAB_S), dict(_VOCAB_P2), dict(_VOCAB_O2)
    triples = [(s_ids[s], p_ids[p], o_ids[o]) for s, p, o in _TRIPLES_STR2]
    t = spark.createDataFrame(triples, "s long, p long, o long")
    tables = {name: t for name in ("spo", "pos", "osp", "ops", "pso")}
    vocabs = {
        role: spark.createDataFrame(rows, "term string, id long")
        for role, rows in (("s", _VOCAB_S), ("p", _VOCAB_P2), ("o", _VOCAB_O2))
    }
    return tables, vocabs


def test_parse_sum_avg():
    q = parse_sparql(
        "SELECT ?x (SUM(?a) AS ?t) (AVG(?a) AS ?m) WHERE { ?x age ?a } GROUP BY ?x"
    )
    assert ("SUM", "a", False, "t") in q.aggregates
    assert ("AVG", "a", False, "m") in q.aggregates


def test_sum_avg_grouped_numeric_and_type_error(idx_num):
    """Numeric groups sum/average exactly; carol's group contains the
    non-numeric 'young' -> BOTH aggregates unbound (NULL) for that group
    only (SPARQL type-error-unbinds-the-aggregate semantics)."""
    tables, vocabs = idx_num
    out = run_sparql(
        "SELECT ?x (SUM(?a) AS ?t) (AVG(?a) AS ?m) WHERE { ?x age ?a } GROUP BY ?x",
        tables,
        vocabs,
    )
    assert _rows(out) == [
        ("alice", 30.0, 30.0),
        ("bob", 7.0, 7.0),
        ("carol", None, None),
    ]


def test_sum_implicit_group_type_error_unbinds(idx_num):
    tables, vocabs = idx_num
    out = run_sparql("SELECT (SUM(?a) AS ?t) WHERE { ?x age ?a }", tables, vocabs)
    assert _rows(out) == [(None,)]


def test_sum_avg_empty_group_is_zero(idx_num):
    """Sum({}) = Avg({}) = 0 (SPARQL 1.1 section 18.5) while COUNT is 0 —
    one implicit-group row even though no solution survives the filter."""
    tables, vocabs = idx_num
    out = run_sparql(
        'SELECT (SUM(?a) AS ?t) (AVG(?a) AS ?m) (COUNT(*) AS ?c) '
        'WHERE { ?x age ?a . FILTER (?a = "nosuch") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [(0.0, 0.0, 0)]


def test_sum_skips_unbound_optional(idx_num):
    """SUM over an OPTIONAL variable: solutions where the OPTIONAL did
    not match contribute nothing (unbound-skipped, the COUNT ?v rule) —
    dave has no age edge yet stays a group with SUM 0."""
    tables, vocabs = idx_num
    out = run_sparql(
        "SELECT ?x (SUM(?a) AS ?t) WHERE { ?x knows ?y . "
        "OPTIONAL { ?x age ?a } } GROUP BY ?x",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", 30.0), ("bob", 7.0), ("dave", 0.0)]


def test_having_on_sum_alias(idx_num):
    tables, vocabs = idx_num
    out = run_sparql(
        "SELECT ?x (SUM(?a) AS ?t) WHERE { ?x age ?a } GROUP BY ?x "
        "HAVING (?t > 10)",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", 30.0)]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT (SUM(DISTINCT ?a) AS ?t) WHERE { ?x age ?a }",
        "SELECT (AVG(DISTINCT ?a) AS ?t) WHERE { ?x age ?a }",
        "SELECT (SUM(*) AS ?t) WHERE { ?x age ?a }",
        'SELECT ?x (SUM(?a) AS ?t) WHERE { ?x age ?a } GROUP BY ?x HAVING (?t > "ten")',
    ],
)
def test_sum_avg_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


def test_bind_concat_and_copy(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?k ?c WHERE { ?x likes ?y . '
        'BIND(CONCAT(?x, "->", ?y) AS ?k) . BIND(?x AS ?c) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [
        ("bob", "bob->alice", "bob"),
        ("carol", "carol->dave", "carol"),
    ]


def test_bind_chains_and_constant(idx):
    """A later BIND may reference an earlier alias; a constant BIND is a
    plain literal column."""
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?k2 ?tag WHERE { ?x likes ?y . BIND(?y AS ?k) . '
        'BIND(CONCAT("via-", ?k) AS ?k2) . BIND("v1" AS ?tag) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("via-alice", "v1"), ("via-dave", "v1")]


def test_bind_as_group_key(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?k (COUNT(*) AS ?n) WHERE { ?x knows ?y . '
        'BIND(CONCAT(?x, "!") AS ?k) } GROUP BY ?k',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice!", 1), ("bob!", 1), ("dave!", 1)]


def test_bind_null_propagates_from_optional(idx):
    """CONCAT over an unbound (OPTIONAL-null) input is unbound — SPARQL
    error propagation; dave's knows-target likes nothing."""
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?k WHERE { ?x knows ?y . OPTIONAL { ?y likes ?z } . '
        'BIND(CONCAT(?x, "/", ?z) AS ?k) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [
        ("alice", "alice/alice"),
        ("bob", "bob/dave"),
        ("dave", None),
    ]


def test_bind_in_construct_template(idx):
    tables, vocabs = idx
    out = run_sparql(
        'CONSTRUCT { ?k is pair } WHERE { ?x likes ?y . '
        'BIND(CONCAT(?x, "+", ?y) AS ?k) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob+alice", "is", "pair"), ("carol+dave", "is", "pair")]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?x WHERE { ?x knows ?y . BIND(?y AS ?x) }",  # rebind
        "SELECT ?x WHERE { ?x knows ?y . BIND(?nope AS ?z) }",  # unknown src
        "SELECT ?x WHERE { ?x knows ?y . BIND(?y AS ?z) . BIND(?y AS ?z) }",
        "SELECT ?x WHERE { ?x knows ?y . BIND(CONCAT(CONCAT(?x, ?y), ?y) AS ?z) }",
        "SELECT ?x WHERE { ?x knows ?y . BIND(?y ?z) }",  # no AS
    ],
)
def test_bind_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


def test_describe_term_in_two_roles(idx):
    """dave is a subject (dave knows dave) and an object (carol likes
    dave; dave knows dave): DESCRIBE unions the role probes and dedups
    the triple reached through both roles."""
    tables, vocabs = idx
    out = run_sparql("DESCRIBE dave", tables, vocabs)
    assert out.columns == ["s", "p", "o"]
    assert _rows(out) == [("carol", "likes", "dave"), ("dave", "knows", "dave")]


def test_describe_predicate_and_multiple_terms(idx):
    tables, vocabs = idx
    out = run_sparql("DESCRIBE likes carol", tables, vocabs)
    # likes as predicate: 2 triples; carol: object of bob-knows-carol +
    # subject of carol-likes-dave (already in the likes set — dedup)
    assert _rows(out) == [
        ("bob", "knows", "carol"),
        ("bob", "likes", "alice"),
        ("carol", "likes", "dave"),
    ]


def test_describe_unknown_term_empty(idx):
    tables, vocabs = idx
    out = run_sparql("DESCRIBE nosuchterm", tables, vocabs)
    assert out.columns == ["s", "p", "o"] and out.count() == 0


@pytest.mark.parametrize(
    "bad",
    [
        "DESCRIBE",  # no terms
        "DESCRIBE ?x WHERE { ?x knows ?y }",  # variables/WHERE unsupported
        "DESCRIBE dave { }",  # no graph pattern allowed
    ],
)
def test_describe_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


def test_filter_cmp_codepoint_strings(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?y WHERE { ?x knows ?y . FILTER (?x >= "carol") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("dave", "dave")]


def test_filter_cmp_numeric_typing(idx_num):
    """A numeric constant forces numeric comparison: '30' >= 10 passes,
    '7' fails numerically (codepoint order would pass it), 'young' is a
    type error and drops."""
    tables, vocabs = idx_num
    out = run_sparql(
        "SELECT ?x ?a WHERE { ?x age ?a . FILTER (?a >= 10) }", tables, vocabs
    )
    assert _rows(out) == [("alice", "30")]


def test_filter_cmp_on_multirole_and_unbound(idx):
    """Ordering filter over a MULTI-role (term-typed) variable, and the
    unbound-drops rule: ?z is null for dave's solution."""
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?z WHERE { ?x knows ?y . OPTIONAL { ?y likes ?z } . '
        'FILTER (?z < "dave") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "alice")]


# ------------------------------------------------- SPARQL 1.1 subqueries


def test_subquery_join_on_shared_var(idx):
    """Per-subject knows-degree joined to the outer likes pattern —
    inner join on the shared ?x (carol likes dave but knows nothing, so
    she drops)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y ?n WHERE { ?x likes ?y . "
        "{ SELECT ?x (COUNT(*) AS ?n) WHERE { ?x knows ?z } GROUP BY ?x } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "alice", 1)]


def test_subquery_filter_on_typed_alias(idx):
    """A COUNT alias stays a LONG: FILTER compares numerically."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?n WHERE { ?x knows ?y . "
        "{ SELECT ?x (COUNT(*) AS ?n) WHERE { ?x knows ?z } GROUP BY ?x } . "
        "FILTER (?n >= 1) }",
        tables,
        vocabs,
    )
    # every knower has degree 1 in the module fixture: one row per edge
    assert _rows(out) == [("alice", 1), ("bob", 1), ("dave", 1)]


def test_subquery_cartesian_attaches_global_aggregate(idx):
    """No shared variable: the implicit-group COUNT extends every outer
    solution (the 'attach the corpus total' shape)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?total WHERE { ?x likes ?y . "
        "{ SELECT (COUNT(*) AS ?total) WHERE { ?a knows ?b } } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", 3), ("carol", 3)]


def test_subquery_only_group(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?n WHERE { "
        "{ SELECT ?x (COUNT(*) AS ?n) WHERE { ?x knows ?z } GROUP BY ?x } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", 1), ("bob", 1), ("dave", 1)]


def test_subquery_shares_var_across_roles_by_term(idx):
    """?y is an OBJECT outside and a SUBJECT inside the subquery: the
    join must be term-level (raw id joins would pair unrelated terms in
    the misaligned fixture)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?y ?c WHERE { ?x knows ?y . "
        "{ SELECT ?y (COUNT(*) AS ?c) WHERE { ?y likes ?w } GROUP BY ?y } }",
        tables,
        vocabs,
    )
    # knows-objects: bob, carol, dave(x2); likes-subjects: carol, bob
    assert _rows(out) == [("bob", 1), ("carol", 1)]


def test_subquery_nested_two_levels(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?total WHERE { { SELECT (COUNT(*) AS ?total) WHERE { "
        "{ SELECT ?q (COUNT(*) AS ?m) WHERE { ?q knows ?w } GROUP BY ?q } } } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [(3,)]  # three distinct knowers


def test_subquery_modifiers_apply_inside(idx):
    """LIMIT inside the subquery caps the inner solutions before the
    outer join (SPARQL bottom-up evaluation)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x WHERE { "
        "{ SELECT ?x WHERE { ?x knows ?y } ORDER BY ?x LIMIT 1 } }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice",)]


@pytest.mark.parametrize(
    "bad",
    [
        # aggregate alias shadows an outer pattern variable
        "SELECT ?x WHERE { ?x knows ?y . "
        "{ SELECT (COUNT(*) AS ?y) WHERE { ?a knows ?b } } }",
        # unterminated subquery
        "SELECT ?x WHERE { { SELECT ?x WHERE { ?x knows ?y } ",
        # ASK cannot nest as a subquery (only SELECT parses after '{')
        "SELECT ?x WHERE { { ASK { ?x knows ?y } } }",
    ],
)
def test_subquery_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


def test_filter_string_builtins(idx):
    """STRSTARTS/STRENDS/CONTAINS match literally (no regex semantics)
    and push into the vocab dimension for single-role variables."""
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?y WHERE { ?x knows ?y . FILTER STRSTARTS(?x, "da") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("dave", "dave")]
    out = run_sparql(
        'SELECT ?x WHERE { ?x knows ?y . FILTER STRENDS(?y, "ol") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob",)]
    # multi-role var: plain string predicate on the joined result
    out = run_sparql(
        'SELECT ?x ?z WHERE { ?x knows ?y . ?y likes ?z . FILTER CONTAINS(?y, "aro") }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "dave")]
    # verbatim match: "." is a literal dot, not regex any-char
    out = run_sparql(
        'SELECT ?x WHERE { ?x knows ?y . FILTER CONTAINS(?x, ".") }',
        tables,
        vocabs,
    )
    assert _rows(out) == []


def test_filter_strlen(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( STRLEN(?x) <= 4 ) }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "carol"), ("dave", "dave")]
    out = run_sparql(
        "SELECT ?x WHERE { ?x likes ?y . FILTER ( STRLEN(?y) = 5 ) }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob",)]


def test_parse_string_builtin_errors():
    with pytest.raises(ValueError):
        parse_sparql('SELECT ?x WHERE { ?x knows ?y . FILTER STRSTARTS(?x, ?y) }')
    with pytest.raises(ValueError):
        parse_sparql('SELECT ?x WHERE { ?x knows ?y . FILTER ( STRLEN(?x) > abc ) }')


def test_filter_boolean_or_across_vars(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x = dave || ?y = carol ) }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "carol"), ("dave", "dave")]


def test_filter_boolean_not_and_precedence(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x WHERE { ?x knows ?y . FILTER ( !STRSTARTS(?y, "c") ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice",), ("dave",)]
    # || is lower precedence than &&: a || (b && c)
    out = run_sparql(
        'SELECT ?x ?y WHERE { ?x knows ?y . '
        'FILTER ( ?x = alice || ?x = dave && ?y = dave ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "bob"), ("dave", "dave")]
    # parens override: (a || b) && c
    out = run_sparql(
        'SELECT ?x ?y WHERE { ?x knows ?y . '
        'FILTER ( ( ?x = alice || ?x = dave ) && ?y = dave ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("dave", "dave")]


def test_filter_boolean_three_valued_with_optional(idx):
    """SPARQL error-table semantics via SQL NULL logic: an unbound
    OPTIONAL var's atom is an error — true||error keeps the row,
    false||error and !error drop it."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } . "
        'FILTER ( ?x = alice || CONTAINS(?z, "li") ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", None), ("bob", "alice")]
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } . "
        'FILTER ( !CONTAINS(?z, "x") ) }',
        tables,
        vocabs,
    )
    # bob's z=alice passes !; alice's and dave's NULL z drops under !
    assert _rows(out) == [("bob", "alice")]


def test_filter_boolean_and_equals_two_filters(idx):
    tables, vocabs = idx
    a = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x != dave && ?y != bob ) }",
        tables,
        vocabs,
    )
    b = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x != dave ) . "
        "FILTER ( ?y != bob ) }",
        tables,
        vocabs,
    )
    assert _rows(a) == _rows(b) == [("bob", "carol")]


def test_filter_boolean_parse_errors():
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . FILTER ( ?x = a || ) }")
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x knows ?y . FILTER ( ?q = a || ?x = b ) }")


def test_filter_var_var_comparison(idx):
    """?a op ?b — decoded-term comparison, incl. cross-role equality
    (id-level equality would be WRONG: the role id spaces differ)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x = ?y ) }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("dave", "dave")]
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x < ?y ) }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "bob"), ("bob", "carol")]
    # inside a boolean tree
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x = ?y || ?x = alice ) }",
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "bob"), ("dave", "dave")]


def test_filter_in(idx):
    """?v IN (...) — exact term membership, pushed into the vocab
    dimension for single-role vars; absent terms exclude nothing extra."""
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x IN ("alice", "dave") ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "bob"), ("dave", "dave")]
    # an absent term in the list is harmless
    out = run_sparql(
        'SELECT ?x WHERE { ?x knows ?y . FILTER ( ?y IN ("carol", "zz") ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob",)]
    # empty list = constant false
    out = run_sparql(
        "SELECT ?x WHERE { ?x knows ?y . FILTER ( ?x IN () ) }", tables, vocabs
    )
    assert _rows(out) == []


def test_filter_not_in(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?x ?y WHERE { ?x knows ?y . FILTER ( ?x NOT IN ("alice", "bob") ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("dave", "dave")]
    # multi-role var: membership evaluated on the decoded TERM — ids
    # collide across roles, so id-level membership would be wrong
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x knows ?y . ?y likes ?z . "
        'FILTER ( ?y NOT IN ("carol") ) }',
        tables,
        vocabs,
    )
    # bridges: y=bob -> (alice, alice), y=carol -> (bob, dave); carol cut
    assert _rows(out) == [("alice", "alice")]


def test_filter_in_boolean_tree(idx):
    """IN composes inside || / && / ! trees (decoded-term evaluation)."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?y WHERE { ?x knows ?y . "
        'FILTER ( ?x IN ("dave") || STRSTARTS(?y, "bo") ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "bob"), ("dave", "dave")]
    out = run_sparql(
        'SELECT ?x WHERE { ?x knows ?y . FILTER ( !(?y IN ("bob", "dave")) ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob",)]


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?x WHERE { ?x knows ?y . FILTER ( ?x NOT EQ () ) }",
        'SELECT ?x WHERE { ?x knows ?y . FILTER ( ?x IN ("a" "b") ) }',
        "SELECT ?x WHERE { ?x knows ?y . FILTER ( ?x IN (?y) ) }",
    ],
)
def test_filter_in_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


def test_bind_string_functions(idx):
    """UCASE/LCASE/SUBSTR/REPLACE/STRBEFORE/STRAFTER in BIND — evaluated
    over decoded terms, nullable-correct, nestable under CONCAT args."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?u WHERE { ?x knows ?y . BIND( UCASE(?x) AS ?u ) }",
        tables,
        vocabs,
    )
    assert ("alice", "ALICE") in _rows(out) and ("dave", "DAVE") in _rows(out)
    # SUBSTR is 1-based; omitted length runs to the end
    out = run_sparql(
        "SELECT ?x ?a ?b WHERE { ?x knows ?y . "
        "BIND( SUBSTR(?x, 2, 3) AS ?a ) . BIND( SUBSTR(?x, 3) AS ?b ) }",
        tables,
        vocabs,
    )
    rows = {r[0]: (r[1], r[2]) for r in _rows(out)}
    assert rows["alice"] == ("lic", "ice")
    assert rows["bob"] == ("ob", "b")
    # REPLACE is regex-based
    out = run_sparql(
        'SELECT ?x ?r WHERE { ?x knows ?y . BIND( REPLACE(?x, "[aeiou]", "_") AS ?r ) }',
        tables,
        vocabs,
    )
    assert dict(_rows(out))["dave"] == "d_v_"
    # STRBEFORE/STRAFTER: literal search; absent needle -> ""
    out = run_sparql(
        'SELECT ?x ?b ?a WHERE { ?x knows ?y . '
        'BIND( STRBEFORE(?x, "o") AS ?b ) . BIND( STRAFTER(?x, "o") AS ?a ) }',
        tables,
        vocabs,
    )
    rows = {r[0]: (r[1], r[2]) for r in _rows(out)}
    assert rows["bob"] == ("b", "b")
    assert rows["dave"] == ("", "")  # no 'o' in dave -> both empty
    assert rows["alice"] == ("", "")  # no 'o' in alice -> both empty
    # composition: string fn inside CONCAT, and LCASE(UCASE(...)) nesting
    out = run_sparql(
        'SELECT ?x ?c WHERE { ?x knows ?y . '
        'BIND( CONCAT(UCASE(SUBSTR(?x, 1, 1)), SUBSTR(?x, 2)) AS ?c ) }',
        tables,
        vocabs,
    )
    assert dict(_rows(out))["dave"] == "Dave"


def test_bind_string_functions_unbound(idx):
    """An OPTIONAL-unbound input propagates NULL through every string
    function (SPARQL error propagation), never the absent-needle ''."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?b WHERE { ?x likes ?y . "
        "OPTIONAL { ?y knows ?z } . "
        'BIND( STRAFTER(?z, "a") AS ?b ) }',
        tables,
        vocabs,
    )
    rows = dict(_rows(out))
    # carol likes dave; dave knows dave -> z=dave -> "ve"
    assert rows["carol"] == "ve"
    # bob likes alice; alice knows bob -> z=bob, no 'a' -> ""
    assert rows["bob"] == ""


def test_bind_string_functions_unbound_null(idx):
    tables, vocabs = idx
    # nobody likes carol-the-subject's targets... construct a genuinely
    # unbound case: x likes y, OPTIONAL y likes z (dave likes nothing)
    out = run_sparql(
        "SELECT ?y ?u WHERE { ?x likes ?y . "
        "OPTIONAL { ?y likes ?z } . BIND( UCASE(?z) AS ?u ) }",
        tables,
        vocabs,
    )
    rows = dict(_rows(out))
    assert rows["dave"] is None  # carol likes dave; dave likes nothing
    assert rows["alice"] is None  # bob likes alice; alice likes nothing


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?u WHERE { ?x knows ?y . BIND( SUBSTR(?x) AS ?u ) }",
        'SELECT ?u WHERE { ?x knows ?y . BIND( SUBSTR(?x, "a") AS ?u ) }',
        "SELECT ?u WHERE { ?x knows ?y . BIND( REPLACE(?x, ?y, \"z\") AS ?u ) }",
        'SELECT ?u WHERE { ?x knows ?y . BIND( STRBEFORE(?x) AS ?u ) }',
        'SELECT ?u WHERE { ?x knows ?y . BIND( UCASE() AS ?u ) }',
    ],
)
def test_bind_string_fn_parse_errors(bad):
    with pytest.raises(ValueError):
        parse_sparql(bad)


# ------------------------------------------------- BOUND / COALESCE / IF


def test_filter_bound_and_negation_split_optional(idx):
    """FILTER BOUND keeps matched-OPTIONAL rows; !BOUND keeps the rest
    (the pre-1.1 negation idiom) — together they partition the left join."""
    tables, vocabs = idx
    base = "SELECT ?x ?z WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } %s }"
    assert _rows(run_sparql(base % "FILTER BOUND(?z)", tables, vocabs)) == [
        ("bob", "alice")
    ]
    assert _rows(run_sparql(base % "FILTER ( !BOUND(?z) )", tables, vocabs)) == [
        ("alice", None),
        ("dave", None),
    ]


def test_filter_bound_in_boolean_tree(idx):
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?z WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } "
        'FILTER ( BOUND(?z) || ?x = "dave" ) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("bob", "alice"), ("dave", None)]


def test_bind_coalesce_optional_fallback(idx):
    """COALESCE returns the first BOUND argument — ?z where the optional
    matched, else ?y; the constant tail never fires here."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?v WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } "
        'BIND(COALESCE(?z, ?y, "never") AS ?v) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "bob"), ("bob", "alice"), ("dave", "dave")]


def test_bind_coalesce_constant_shortcircuits(idx):
    tables, vocabs = idx
    out = run_sparql(
        'SELECT ?v WHERE { ?x likes ?y . BIND(COALESCE("k", ?y) AS ?v) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("k",), ("k",)]


def test_bind_if_bound_branches(idx):
    """IF(BOUND(?z), then, else) — then-branch functions apply only to
    matched rows; unmatched rows take the else constant."""
    tables, vocabs = idx
    out = run_sparql(
        "SELECT ?x ?w WHERE { ?x knows ?y . OPTIONAL { ?x likes ?z } "
        'BIND(IF(BOUND(?z), UCASE(?z), "none") AS ?w) }',
        tables,
        vocabs,
    )
    assert _rows(out) == [("alice", "none"), ("bob", "ALICE"), ("dave", "none")]


def test_bound_coalesce_if_parse_errors(idx):
    for bad in (
        'SELECT ?x WHERE { ?x knows ?y . BIND(IF(?x = ?y, "a", "b") AS ?w) }',
        'SELECT ?x WHERE { ?x knows ?y . FILTER BOUND("lit") }',
        "SELECT ?x WHERE { ?x knows ?y . BIND(IF(BOUND(?y)) AS ?w) }",
        "SELECT ?x WHERE { ?x knows ?y . BIND(COALESCE() AS ?w) }",
        "SELECT ?x WHERE { ?x knows ?y . FILTER BOUND(?nosuch) }",
    ):
        with pytest.raises(ValueError):
            q = parse_sparql(bad)
            tables, vocabs = idx
            run_sparql(q, tables, vocabs)
