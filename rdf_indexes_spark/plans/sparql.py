"""String-level SPARQL subset: SELECT/ASK over basic graph patterns.

The reference is strictly an INTEGER-triple engine — its query driver
consumes pre-encoded id triples and leaves surface forms in the three
vocabulary files (/root/reference/README.md:54-58, 173-214;
scripts/map_dataset.py:36-38 loads the vocabs only to encode, never to
query). A user of the full system therefore runs: encode the query's
terms through the vocabularies, probe the index, decode results. This
module packages that workflow as a small SPARQL subset so the index is
usable at the string level end-to-end:

    SELECT [DISTINCT] (?v ... | *) WHERE {
        s path o . ...          path := seq ('|' seq)*
                                seq  := step ('/' step)*
                                step := '^'? (p | '(' path ')'
                                              | '!' p | '!' '(' p|p|... ')')
                                        ('+'|'*'|'?')?
        [{ s p o ... } UNION { s p o ... } [UNION { ... }]] ...
        [{ SELECT ... WHERE { ... } [GROUP BY ...] ... }] ...
        [OPTIONAL { s p o ... }] ...
        [MINUS { s p o ... }] ...
        [VALUES ?v { term ... }] ...
        [BIND( expr AS ?new )] ...
            expr := ?v | term | CONCAT(expr, ...) | UCASE/LCASE(expr)
                  | SUBSTR(expr, start[, len]) | REPLACE(expr, "re", "rep")
                  | STRBEFORE/STRAFTER(expr, "lit")
                  | COALESCE(expr, ...) | IF(BOUND(?v), expr, expr)
        [FILTER regex(?v, "pattern")] [FILTER ( ?v op term )] ...
            op := = | != | < | <= | > | >=
        [FILTER STRSTARTS|STRENDS|CONTAINS(?v, "lit")] ...
        [FILTER ( STRLEN(?v) op n )] ...
        [FILTER ( atom (|| / && / ! boolean combinations, parens) )] ...
        [FILTER ( ?a op ?b )] (variable-variable, decoded-term compare) ...
        [FILTER ( ?v [NOT] IN (term, term, ...) )] ...
        [FILTER BOUND(?v)] (and !BOUND — the OPTIONAL negation idiom) ...
        [FILTER EXISTS { s p o ... }] [FILTER NOT EXISTS { s p o ... }] ...
    } [GROUP BY ?v ...] [HAVING ( ?a op const ) ...]
      [ORDER BY (?v | ASC(?v) | DESC(?v)) ...] [LIMIT n] [OFFSET n]
    ASK WHERE { ... }
    CONSTRUCT { s p o . ... } WHERE { ... }
    DESCRIBE term [term ...]

``CONSTRUCT`` instantiates every template triple per solution and
returns the resulting GRAPH — a duplicate-free (s, p, o) frame of
surface forms. Template constants are free output terms (no
vocabulary presence needed — CONSTRUCT mints new predicates/IRIs);
a solution with an unbound (OPTIONAL-null) template variable
generates nothing for that triple (SPARQL 1.1 §16.2). Solution
modifiers are not supported on CONSTRUCT in this subset.

``DESCRIBE term ...`` returns every triple of the graph in which any
of the listed constant terms occupies any role — the union of the
(S??), (?P?) and (??O) probes per term through each role's vocabulary,
decoded and duplicate-free (a term can reach the same triple through
two roles). A term absent from every vocabulary contributes nothing;
no WHERE clause or solution modifiers in this subset.

``{ SELECT ... }`` inside a group is a SPARQL 1.1 §12 subquery: it
evaluates bottom-up as an independent query (its own aggregates,
grouping, modifiers — anything this subset supports, including further
nesting) and ONLY its projected variables are visible outside. The
solution frame joins the rest of the group on shared variables — at
the TERM level for plain variables (decoded strings on both sides) —
and extends it cartesianly when nothing is shared (the classic
"attach the global average" shape). COUNT/SUM/AVG aliases stay typed
(long/double): projectable, ORDER BY-able, FILTER-comparable
numerically, usable as outer aggregate arguments — but never decoded
through a vocabulary. An aggregate alias that shadows an outer pattern
variable is rejected.

``BIND(expr AS ?new)`` extends every solution with a derived TERM
column — ``expr`` is a variable copy, a constant, or
``CONCAT(arg, ...)`` over variables and constants. Binds evaluate
AFTER the group's patterns and filters (so FILTER/VALUES see only
pattern variables — document order, one deterministic scoping) and in
listed order, so a later bind may reference an earlier alias. An
unbound (OPTIONAL-null) input makes the bound value unbound too
(SPARQL error-propagation through CONCAT). Bind aliases are
string-typed everywhere downstream: projectable, GROUP BY keys,
aggregate arguments, CONSTRUCT template variables, ORDER BY keys.

Projection items may be aggregates — ``(COUNT(*) AS ?c)``,
``(COUNT([DISTINCT] ?v) AS ?c)``, ``(MIN(?v) AS ?m)``, ``(MAX(?v) AS
?m)``, ``(SUM(?v) AS ?t)``, ``(AVG(?v) AS ?a)``,
``(SAMPLE(?v) AS ?x)``, ``(GROUP_CONCAT([DISTINCT] ?v ;
SEPARATOR = "s") AS ?g)`` — grouped by ``GROUP BY`` keys (no GROUP BY
= one implicit group; an implicit-group aggregate over an empty
pattern yields ONE row with COUNT 0 and unbound MIN/MAX, per SPARQL
1.1 §11.1). With grouping, every projected non-aggregate variable
must be a group key. ``COUNT ?v`` counts bound values only; MIN/MAX
compare decoded SURFACE FORMS (codepoint string order), never
internal ids. Where the spec leaves a choice open this subset pins a
DETERMINISTIC one: SAMPLE returns the codepoint-minimum value and
GROUP_CONCAT concatenates in codepoint order (all-NULL group → NULL,
the SQL ``string_agg`` convention). ``SUM``/``AVG`` follow SPARQL 1.1
numeric semantics over the graph's STRING terms: a term is numeric iff
it matches ``-?[0-9]+(\\.[0-9]+)?`` (cast to double); unbound values
are skipped (the COUNT ?v rule), any NON-numeric bound value in the
group is a type error that makes the whole aggregate unbound (NULL),
and an empty numeric multiset yields 0 (Sum({}) = Avg({}) = 0, §18.5).
DISTINCT is not supported on SUM/AVG in this subset. Results are
doubles. ``HAVING`` conditions compare an
aggregate alias or group key against a constant (`=` `!=` `>` `>=`
`<` `<=`; numeric for COUNT/SUM/AVG aliases, codepoint order
otherwise) and
AND together. Aggregation is a plain hash aggregate over the solution
frame — map-side partial aggregation and AQE sizing come free.

``!p`` / ``!(p1|p2|...)`` is the SPARQL 1.1 negated property set
(forward direction only — no ``^`` inside the set): every edge whose
predicate is NOT listed, one NOT-IN-filtered scan. Set members absent
from the p-vocabulary exclude nothing.

``MINUS`` removes solutions compatible with some inner-group solution
on their SHARED variables — like NOT EXISTS it is a left-anti join, but
per the SPARQL 1.1 distinction a MINUS group that shares NO variable
with the outer pattern removes NOTHING (NOT EXISTS in that position is
rejected by this subset), and a MINUS group whose constant is missing
from its vocabulary also removes nothing.

``VALUES ?v { t1 t2 ... }`` restricts solutions to the listed terms —
an inner join against an inline literal table. For a single-role
variable the terms are resolved through that role's vocabulary (absent
terms simply match nothing); a multi-role variable compares decoded
terms directly.

``UNION`` takes the bag union of its branches' solutions (duplicates
kept, SPARQL multiset semantics); a variable a branch does not bind is
NULL in that branch's rows, and the union joins the rest of the group
on shared variables — a NULL shared variable does not join (consistent
with this subset's unbound-never-matches FILTER rule). A branch whose
constant is absent from its vocabulary contributes no solutions; if
EVERY branch is absent the union is empty and so is the query.

``FILTER [NOT] EXISTS`` keeps (drops) solutions for which the inner
pattern has at least one match on the shared variables — a LEFT-SEMI
(LEFT-ANTI) join, never a row-multiplying one. Variables bound only
inside an EXISTS group are not visible outside it. A NULL shared
variable (unmatched OPTIONAL) never matches the inner pattern.

``p+`` on a constant predicate is the SPARQL 1.1 one-or-more property
path, answered by the distributed semi-naive closure in ``plans.paths``
(hop composition bridges the object id space onto the subject id space
by term, so multi-hop semantics are string-correct).

Composite property paths — inverse ``^p``, sequence ``p1/p2``,
alternation ``p1|p2``, the ``+``/``*``/``?`` modifiers, and
parenthesized nesting — are evaluated by ``plans.paths.eval_path`` over
a UNIFIED node id space (a term's subject id, or its displaced object
id when the term is object-only), so inversion and composition are
exact across the independent role id spaces. Endpoint variables of a
composite path come back as decoded TERMS and join the rest of the
group at the string level. Per SPARQL 1.1 multiset semantics ``^ / |``
preserve bags while ``+ * ?`` are duplicate-free; zero-length paths
(``*``/``?``) match every term of the graph. A path ATOM absent from
the predicate vocabulary is an empty edge relation (the path may still
match through an alternation), unlike an absent constant in a required
pattern, which empties the query. Path operator characters split bare
tokens, so a bare TERM containing ``/ | ^ + * ?`` needs the ``<iri>``
or quoted form (same rule as ``( ) ,``).

``OPTIONAL`` groups left-join onto the required pattern's solutions on
their shared variables (unmatched rows keep NULLs — standard SPARQL).
``FILTER`` supports ``regex(?v, "re")`` (Spark ``rlike`` / Java regex),
``?v op term`` for ``= != < <= > >=``, the string built-ins
``STRSTARTS/STRENDS/CONTAINS(?v, "lit")`` (verbatim match, no regex
metacharacters — codegen'd StartsWith/EndsWith/Contains), and
``STRLEN(?v) op n``. Ordering comparisons follow
SPARQL 1.1 operand typing: when the constant is NUMERIC (matches
``-?[0-9]+(\\.[0-9]+)?``) the comparison is numeric and a non-numeric
term is a type error that drops the row; otherwise both sides compare
as plain codepoint strings. Comparisons against an unbound
(NULL) variable remove the row, per SPARQL error semantics. Filters
apply to the whole group. Operators and parentheses must be
whitespace-or-punctuation separated; terms containing ``( ) ,`` need
the quoted form.

Terms: ``?name`` is a variable; ``<iri>`` resolves to the IRI text
between the brackets (the NT/NQ parser stores bracket-STRIPPED URIs as
vocabulary terms, sources/ntriples.py — and standard SPARQL brackets
denote the IRI itself); ``"quoted literal"`` resolves to the quoted
content (spaces and ``\"`` escapes supported); a bare token resolves to
itself. Constants match vocabulary terms exactly.

Semantics & the three id spaces
-------------------------------
The reference gives subjects, predicates and objects three INDEPENDENT
dense-id spaces (scripts/extract_vocabs.py:29-31), so an id-level join
between an object column and a subject column (what ``plans.bgp`` does,
by documented contract) relates UNRELATED ids. String-level SPARQL
semantics require joining on the TERM. This layer therefore classifies
every variable by the set of roles it occupies across the whole BGP:

 - a SINGLE-ROLE variable (the common case — every predicate variable,
   and chain variables that stay on one side) joins on the raw dense id:
   long keys, no decode until final projection;
 - a MULTI-ROLE variable is decoded to its term per pattern (one
   id-keyed join against that role's vocabulary — vocab-scale dimension,
   AQE picks broadcast vs shuffle) and patterns join on the term string.
   Exact by construction; the id-space bridge only pays where the query
   actually crosses roles.

Constant lookups push an ``IN`` filter into each vocabulary scan and
collect at most one id per constant — O(query) driver data, never a
table scan. A constant absent from its vocabulary short-circuits the
whole query to an empty result (the reference's missing-key drop
semantics, scripts/map_dataset.py:61-83).

Scale: per-pattern scans route through ``plans.router`` (permutation
choice + pushdown + partition pruning); join order is greedy
bound-first exactly as ``plans.bgp``; 2-bound probe patterns are
broadcast. Final decode is one id-keyed vocab join per projected
single-role variable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .router import select

_POS = ("s", "p", "o")


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Const:
    text: str


@dataclass(frozen=True)
class PathPlus:
    """A ``p+`` one-or-more property path over a constant predicate."""

    text: str


@dataclass(frozen=True)
class PathExpr:
    """A composite SPARQL 1.1 property path at the predicate position.

    ``node`` is a nested-tuple AST: ('atom', text) | ('inv', n) |
    ('seq', (n...,)) | ('alt', (n...,)) | ('plus'|'star'|'opt', n) —
    evaluated by plans.paths.eval_path over the unified node id space.
    The bare one-or-more ``p+`` stays the dedicated PathPlus fast path."""

    node: tuple

    def atoms(self) -> list[str]:
        out: list[str] = []

        def walk(n: tuple) -> None:
            if n[0] == "atom":
                out.append(n[1])
            elif n[0] == "nps":
                out.extend(n[1])
            elif n[0] in ("seq", "alt"):
                for sub in n[1]:
                    walk(sub)
            else:
                walk(n[1])

        walk(self.node)
        return out


@dataclass(frozen=True)
class Filter:
    kind: str  # "regex" | "eq" | "ne" | "lt" | "le" | "gt" | "ge"
    #          | "strstarts" | "strends" | "contains" | "strlen_<cmp>"
    #          | "in" | "not_in" (arg = tuple of term texts)
    var: str
    arg: str  # regex pattern, literal, length bound, constant term
    #           text, or (for in/not_in) a tuple of term texts


@dataclass(frozen=True)
class BoolFilter:
    """Boolean combination of FILTER atoms: ``op`` is "and" | "or" |
    "not"; ``kids`` holds Filter atoms or nested BoolFilters (1 kid for
    "not", 2+ otherwise)."""

    op: str
    kids: tuple


def _filter_vars(f) -> list[str]:
    if isinstance(f, BoolFilter):
        return [v for k in f.kids for v in _filter_vars(k)]
    if f.kind.startswith("var_"):  # ?a op ?b — arg is the second variable
        return [f.var, f.arg]
    return [f.var]


@dataclass
class SparqlQuery:
    form: str  # "SELECT" | "ASK" | "CONSTRUCT"
    variables: list[str] | None  # None = SELECT *
    template: list[tuple] = field(default_factory=list)  # CONSTRUCT triples
    distinct: bool = False
    patterns: list[tuple] = field(default_factory=list)
    unions: list[list[list[tuple]]] = field(default_factory=list)  # block -> branches -> patterns
    optionals: list[list[tuple]] = field(default_factory=list)
    minuses: list[list[tuple]] = field(default_factory=list)
    values: list[tuple[str, list[str]]] = field(default_factory=list)  # (var, terms)
    # (expr, alias) in listed order; expr is a nested tuple:
    # ('var', name) | ('const', text) | ('concat', (expr, ...))
    binds: list[tuple[tuple, str]] = field(default_factory=list)
    # nested { SELECT ... } groups, each a full SparqlQuery (form SELECT)
    subqueries: list["SparqlQuery"] = field(default_factory=list)
    describe_terms: list[str] = field(default_factory=list)  # DESCRIBE form
    filters: list[Filter] = field(default_factory=list)
    exists_filters: list[tuple[bool, list[tuple]]] = field(default_factory=list)
    # (fn, arg var | None for COUNT(*), distinct, alias) per aggregate in
    # the SELECT list; aliases appear in ``variables`` at their position
    aggregates: list[tuple[str, str | None, bool, str]] = field(default_factory=list)
    gc_separators: dict[str, str] = field(default_factory=dict)  # alias -> sep
    group_by: list[str] = field(default_factory=list)
    having: list[tuple[str, str, str]] = field(default_factory=list)  # (var, op, value)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    limit: int | None = None
    offset: int | None = None


_TOKEN = re.compile(
    r"""\s*(?:
        (?P<brace>[{}])
      | (?P<punct>[(),;])
      | (?P<dot>\.(?=\s|}|$))
      | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
      | (?P<iri><[^<>\s]*>)
      | (?P<lit>"(?:[^"\\]|\\.)*")
      | (?P<neq>!=)
      | (?P<pathop>[/|^+*?!])
      | (?P<bare>[^\s{}(),;/|^+*?!]+)
    )""",
    re.X,
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            break
        i = m.end()
        for kind in ("brace", "punct", "dot", "var", "iri", "lit", "neq", "pathop", "bare"):
            v = m.group(kind)
            if v is not None:
                toks.append(("bare", v) if kind == "neq" else (kind, v))
                break
    if text[i:].strip():
        raise ValueError(f"cannot tokenize SPARQL near: {text[i:i+40]!r}")
    return toks


def _term(kind: str, v: str):
    if kind == "var":
        return Var(v[1:])
    if kind == "lit":
        return Const(re.sub(r"\\(.)", r"\1", v[1:-1]))
    if kind == "iri":
        return Const(v[1:-1])  # the IRI text — vocab terms are bracket-stripped
    return Const(v)  # bare token, verbatim


def parse_sparql(text: str) -> SparqlQuery:
    toks = _tokenize(text)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take():
        nonlocal pos
        t = peek()
        pos += 1
        return t

    def kw(word: str) -> bool:
        k, v = peek()
        return k == "bare" and v.upper() == word

    def expect(kind: str, val: str) -> None:
        k, v = take()
        if (k, v) != (kind, val):
            raise ValueError(f"expected {val!r}, got {v!r}")

    def agg_item(q: SparqlQuery) -> None:
        # ( FN ( * | [DISTINCT] ?v [; SEPARATOR "sep"] ) AS ?alias )
        k, v = take()
        fn = v.upper() if k == "bare" else None
        if fn not in ("COUNT", "MIN", "MAX", "SUM", "AVG", "SAMPLE", "GROUP_CONCAT"):
            raise ValueError(
                f"unsupported aggregate {v!r} (COUNT/MIN/MAX/SUM/AVG/SAMPLE/GROUP_CONCAT)"
            )
        expect("punct", "(")
        distinct = False
        k, v = peek()
        if k == "bare" and v.upper() == "DISTINCT":
            if fn in ("SUM", "AVG"):
                raise ValueError(f"DISTINCT is not supported on {fn} in this subset")
            take()
            distinct = True
            k, v = peek()
        if v == "*" and k in ("bare", "pathop"):
            if fn != "COUNT":
                raise ValueError(f"{fn}(*) is not meaningful")
            take()
            arg = None
        elif k == "var":
            take()
            arg = v[1:]
        else:
            raise ValueError(f"aggregate needs * or a ?variable, got {v!r}")
        sep = " "  # the SPARQL 1.1 default separator
        if peek() == ("punct", ";"):
            if fn != "GROUP_CONCAT":
                raise ValueError("only GROUP_CONCAT takes a ; SEPARATOR clause")
            take()
            k, v = take()
            if not (k == "bare" and v.upper() == "SEPARATOR"):
                raise ValueError("expected SEPARATOR after ';'")
            k, v = take()
            if k != "bare" or v != "=":
                raise ValueError("SEPARATOR needs '=' then a quoted string")
            k, v = take()
            if k != "lit":
                raise ValueError('SEPARATOR needs a quoted "string"')
            sep = _term("lit", v).text
        expect("punct", ")")
        k, v = take()
        if not (k == "bare" and v.upper() == "AS"):
            raise ValueError("aggregate needs 'AS ?alias'")
        k, v = take()
        if k != "var":
            raise ValueError("aggregate alias must be a ?variable")
        expect("punct", ")")
        q.aggregates.append((fn, arg, distinct, v[1:]))
        if fn == "GROUP_CONCAT":
            q.gc_separators[v[1:]] = sep
        q.variables.append(v[1:])

    if kw("SELECT"):
        take()
        q = SparqlQuery(form="SELECT", variables=[])
        if kw("DISTINCT"):
            take()
            q.distinct = True
        while True:
            k, v = peek()
            if k == "var":
                take()
                q.variables.append(v[1:])
            elif (k, v) == ("punct", "("):
                take()
                agg_item(q)
            elif v == "*" and k in ("bare", "pathop"):
                take()
                if q.aggregates:
                    raise ValueError("SELECT * cannot be mixed with aggregates")
                q.variables = None
                break
            else:
                break
        if q.variables == []:
            raise ValueError("SELECT needs at least one ?variable or *")
        if q.aggregates and q.distinct:
            raise ValueError("SELECT DISTINCT with aggregates is not supported")
    elif kw("ASK"):
        take()
        q = SparqlQuery(form="ASK", variables=None)
    elif kw("CONSTRUCT"):
        # CONSTRUCT { tmpl triples } WHERE { ... } — the graph-building
        # form: each solution instantiates every template triple; the
        # result is a SET of (s, p, o) surface-form triples
        take()
        q = SparqlQuery(form="CONSTRUCT", variables=None)
        expect("brace", "{")
        while peek() != ("brace", "}"):
            if peek()[0] is None:
                raise ValueError("unterminated CONSTRUCT template")
            triple = []
            for _ in range(3):
                k, v = take()
                if k not in ("var", "iri", "lit", "bare"):
                    raise ValueError(
                        f"CONSTRUCT templates take plain terms, got {v!r}"
                    )
                triple.append(_term(k, v))
            q.template.append(tuple(triple))
            if peek()[0] == "dot":
                take()
        take()  # closing }
        if not q.template:
            raise ValueError("empty CONSTRUCT template")
    elif kw("DESCRIBE"):
        # DESCRIBE term [term ...] — constants only, no WHERE clause in
        # this subset; result is the decoded sub-graph touching the terms
        take()
        q = SparqlQuery(form="DESCRIBE", variables=[])
        while peek()[0] in ("iri", "lit", "bare"):
            k, v = take()
            q.describe_terms.append(_term(k, v).text)
        if not q.describe_terms:
            raise ValueError("DESCRIBE needs at least one constant term")
        if pos != len(toks):
            raise ValueError(
                f"trailing tokens after DESCRIBE (no WHERE/modifiers): {toks[pos:]}"
            )
        return q
    else:
        raise ValueError("query must start with SELECT, ASK, CONSTRUCT or DESCRIBE")

    def nps_set() -> tuple:
        # !atom or !( atom | atom | ... ) — negated property set
        # (SPARQL 1.1 §9.1, forward direction only; no ^ inside the set)
        k, v = peek()
        if (k, v) == ("punct", "("):
            take()
            atoms = []
            while True:
                k, v = take()
                if k not in ("iri", "lit", "bare"):
                    raise ValueError(
                        f"negated property sets take constant predicates, got {v!r}"
                    )
                atoms.append(_term(k, v).text)
                k, v = peek()
                if (k, v) == ("pathop", "|"):
                    take()
                    continue
                expect("punct", ")")
                break
            return ("nps", tuple(atoms))
        if k in ("iri", "lit", "bare"):
            take()
            return ("nps", (_term(k, v).text,))
        raise ValueError(f"'!' needs a predicate or (set), got {v!r}")

    def path_step() -> tuple:
        inv = False
        if peek() == ("pathop", "^"):
            take()
            inv = True
        k, v = peek()
        if (k, v) == ("pathop", "!"):
            take()
            node = nps_set()
            k, v = peek()
            if k == "pathop" and v in "+*?":
                take()
                node = ({"+": "plus", "*": "star", "?": "opt"}[v], node)
            if inv:
                node = ("inv", node)
            return node
        if (k, v) == ("punct", "("):
            take()
            node = path_alt()
            expect("punct", ")")
        elif k in ("iri", "lit", "bare"):
            take()
            node = ("atom", _term(k, v).text)
        elif k == "var":
            raise ValueError("property paths need constant predicates")
        else:
            raise ValueError(f"expected a path element, got {v!r}")
        k, v = peek()
        if k == "pathop" and v in "+*?":
            take()
            node = ({"+": "plus", "*": "star", "?": "opt"}[v], node)
        if inv:
            node = ("inv", node)
        return node

    def path_seq() -> tuple:
        parts = [path_step()]
        while peek() == ("pathop", "/"):
            take()
            parts.append(path_step())
        return parts[0] if len(parts) == 1 else ("seq", tuple(parts))

    def path_alt() -> tuple:
        parts = [path_seq()]
        while peek() == ("pathop", "|"):
            take()
            parts.append(path_seq())
        return parts[0] if len(parts) == 1 else ("alt", tuple(parts))

    def predicate_term():
        k, v = peek()
        if k == "var":  # a plain ?p variable — no path machinery
            take()
            return Var(v[1:])
        node = path_alt()
        if node[0] == "atom":  # plain constant predicate
            return Const(node[1])
        if node[0] == "plus" and node[1][0] == "atom":  # bare p+ fast path
            return PathPlus(node[1][1])
        return PathExpr(node)

    def triple_pattern() -> tuple:
        triple = []
        for posi in range(3):
            if posi == 1:
                triple.append(predicate_term())
                continue
            k, v = take()
            if k not in ("var", "iri", "lit", "bare"):
                raise ValueError(f"expected a term, got {v!r}")
            triple.append(_term(k, v))
        return tuple(triple)

    def filter_expr():
        """One FILTER expression: ``||`` over ``&&`` over ``!``/parens
        over atoms (SPARQL 1.1 §17.2 operator precedence). A bare atom
        (or a pure conjunction/parenthesized atom) parses to the plain
        Filter forms the pushdown paths consume; anything with || or !
        builds a BoolFilter tree."""

        def f_or():
            parts = [f_and()]
            while (
                peek() == ("pathop", "|")
                and pos + 1 < len(toks)
                and toks[pos + 1] == ("pathop", "|")
            ):
                take()
                take()
                parts.append(f_and())
            return parts[0] if len(parts) == 1 else BoolFilter("or", tuple(parts))

        def f_and():
            parts = [f_unary()]
            while peek() == ("bare", "&&"):
                take()
                parts.append(f_unary())
            return parts[0] if len(parts) == 1 else BoolFilter("and", tuple(parts))

        def f_unary():
            if peek() == ("pathop", "!"):
                take()
                return BoolFilter("not", (f_unary(),))
            if peek() == ("punct", "("):
                take()
                e = f_or()
                expect("punct", ")")
                return e
            return filter_atom()

        return f_or()

    def filter_atom() -> Filter:
        k, v = take()
        if k == "bare" and v.lower() == "regex":
            expect("punct", "(")
            kk, vv = take()
            if kk != "var":
                raise ValueError("regex() needs a ?variable first")
            var = vv[1:]
            expect("punct", ",")
            kk, pat = take()
            if kk != "lit":
                raise ValueError('regex() needs a quoted "pattern"')
            expect("punct", ")")
            f = Filter("regex", var, _term("lit", pat).text)
        elif k == "bare" and v.lower() in ("strstarts", "strends", "contains"):
            # STRSTARTS/STRENDS/CONTAINS(?v, "lit") — literal-match
            # built-ins (SPARQL 1.1 §17.4.3); argument must be a plain
            # literal, no regex metacharacter interpretation
            fn = v.lower()
            expect("punct", "(")
            kk, vv = take()
            if kk != "var":
                raise ValueError(f"{fn}() needs a ?variable first")
            var = vv[1:]
            expect("punct", ",")
            kk, lit = take()
            if kk != "lit":
                raise ValueError(f'{fn}() needs a quoted "literal"')
            expect("punct", ")")
            f = Filter(fn, var, _term("lit", lit).text)
        elif k == "bare" and v.lower() == "bound":
            # BOUND(?v) (§17.4.1.1) — true iff the variable is bound;
            # with ! this is the pre-1.1 negation idiom over OPTIONAL
            expect("punct", "(")
            kk, vv = take()
            if kk != "var":
                raise ValueError("BOUND() needs a ?variable")
            expect("punct", ")")
            f = Filter("bound", vv[1:], None)
        elif k == "bare" and v.lower() == "strlen":
            # STRLEN(?v) <op> n — length comparison against an integer
            expect("punct", "(")
            kk, vv = take()
            if kk != "var":
                raise ValueError("strlen() needs a ?variable")
            var = vv[1:]
            expect("punct", ")")
            kk, op = take()
            kinds = {"=": "eq", "!=": "ne", "<": "lt", "<=": "le", ">": "gt", ">=": "ge"}
            if kk != "bare" or op not in kinds:
                raise ValueError(f"strlen comparison needs =/!=/</<=/>/>=, got {op!r}")
            kk, num = take()
            if kk != "bare" or not num.isdigit():
                raise ValueError("strlen comparison needs an integer constant")
            f = Filter("strlen_" + kinds[op], var, num)
        elif k == "var":
            var = v[1:]
            kk, op = take()
            # ?v [NOT] IN (term, term, ...) — SPARQL 1.1 §17.4.1.9/.10;
            # an empty list is legal (IN () = false, NOT IN () = true)
            if kk == "bare" and op.upper() in ("IN", "NOT"):
                neg = op.upper() == "NOT"
                if neg:
                    kk2, v2 = take()
                    if kk2 != "bare" or v2.upper() != "IN":
                        raise ValueError("FILTER ?v NOT must be followed by IN")
                expect("punct", "(")
                terms: list[str] = []
                if peek() != ("punct", ")"):
                    while True:
                        kk2, v2 = take()
                        if kk2 not in ("iri", "lit", "bare"):
                            raise ValueError(
                                f"IN list needs constant terms, got {v2!r}"
                            )
                        terms.append(_term(kk2, v2).text)
                        if peek() == ("punct", ","):
                            take()
                            continue
                        break
                expect("punct", ")")
                return Filter("not_in" if neg else "in", var, tuple(terms))
            kinds = {"=": "eq", "!=": "ne", "<": "lt", "<=": "le", ">": "gt", ">=": "ge"}
            if kk != "bare" or op not in kinds:
                raise ValueError(f"unsupported FILTER operator {op!r}")
            kk, vv = take()
            if kk == "var":  # variable-variable comparison: ?a op ?b
                f = Filter("var_" + kinds[op], var, vv[1:])
            elif kk in ("iri", "lit", "bare"):
                f = Filter(kinds[op], var, _term(kk, vv).text)
            else:
                raise ValueError(
                    f"FILTER comparison needs a constant or ?variable, got {vv!r}"
                )
        else:
            raise ValueError(f"unsupported FILTER expression starting at {v!r}")
        return f

    def group(into: list[tuple], allow_blocks: bool) -> None:
        expect("brace", "{")
        while True:
            k, v = peek()
            if (k, v) == ("brace", "}"):
                take()
                return
            if k is None:
                raise ValueError("unterminated graph pattern (missing '}')")
            if (
                allow_blocks
                and (k, v) == ("brace", "{")
                and pos + 1 < len(toks)
                and toks[pos + 1][0] == "bare"
                and toks[pos + 1][1].upper() == "SELECT"
            ):
                # { SELECT ... } — SPARQL 1.1 subquery: capture the
                # balanced token slice and parse it recursively. Token
                # values are atomic (literals keep their quotes, no token
                # contains whitespace outside quotes), so the space-join
                # retokenizes to the identical stream.
                take()  # opening {
                nonlocal_depth = 1
                start = pos
                while nonlocal_depth:
                    k2, v2 = take()
                    if k2 is None:
                        raise ValueError("unterminated subquery (missing '}')")
                    if k2 == "brace":
                        nonlocal_depth += 1 if v2 == "{" else -1
                inner = toks[start : pos - 1]
                sub = parse_sparql(" ".join(v2 for _, v2 in inner))
                if sub.form != "SELECT":
                    raise ValueError("subqueries must be SELECT queries")
                q.subqueries.append(sub)
            elif allow_blocks and (k, v) == ("brace", "{"):
                # { branch } UNION { branch } [UNION { branch }]*
                branches: list[list[tuple]] = []
                while True:
                    br: list[tuple] = []
                    group(br, allow_blocks=False)
                    if not br:
                        raise ValueError("empty UNION branch")
                    branches.append(br)
                    if kw("UNION"):
                        take()
                        if peek() != ("brace", "{"):
                            raise ValueError("UNION must be followed by a { group }")
                    else:
                        break
                if len(branches) < 2:
                    raise ValueError("a braced group must be a UNION of 2+ branches")
                q.unions.append(branches)
            elif allow_blocks and kw("OPTIONAL"):
                take()
                opt: list[tuple] = []
                group(opt, allow_blocks=False)
                if not opt:
                    raise ValueError("empty OPTIONAL group")
                q.optionals.append(opt)
            elif allow_blocks and kw("MINUS"):
                take()
                mns: list[tuple] = []
                group(mns, allow_blocks=False)
                if not mns:
                    raise ValueError("empty MINUS group")
                q.minuses.append(mns)
            elif allow_blocks and kw("VALUES"):
                take()
                kk, vv = take()
                if kk != "var":
                    raise ValueError("VALUES needs a ?variable")
                expect("brace", "{")
                terms: list[str] = []
                while peek() != ("brace", "}"):
                    kk, tv = take()
                    if kk not in ("iri", "lit", "bare") or (kk, tv) == (None, None):
                        raise ValueError(f"VALUES needs constant terms, got {tv!r}")
                    terms.append(_term(kk, tv).text)
                take()  # closing }
                if not terms:
                    raise ValueError("empty VALUES list")
                q.values.append((vv[1:], terms))
            elif allow_blocks and kw("BIND"):
                # BIND( expr AS ?alias ): expr = ?var | constant |
                # CONCAT(arg, ...) over variables and constants
                take()
                expect("punct", "(")

                def bind_lit(fn: str) -> str:
                    kk, vv = take()
                    if kk != "lit":
                        raise ValueError(f'{fn}() needs a quoted "literal" here')
                    return _term(kk, vv).text

                def bind_int(fn: str) -> int:
                    kk, vv = take()
                    if kk != "bare" or not vv.isdigit():
                        raise ValueError(f"{fn}() needs an integer constant here")
                    return int(vv)

                def bind_atom() -> tuple:
                    kk, vv = take()
                    if kk == "var":
                        return ("var", vv[1:])
                    if kk in ("iri", "lit", "bare"):
                        fn = vv.upper() if kk == "bare" else ""
                        if fn == "CONCAT":
                            expect("punct", "(")
                            args: list[tuple] = []
                            while True:
                                args.append(bind_atom())
                                if args[-1][0] == "concat":
                                    raise ValueError("nested CONCAT is not supported")
                                if peek() == ("punct", ","):
                                    take()
                                    continue
                                expect("punct", ")")
                                break
                            return ("concat", tuple(args))
                        if fn == "COALESCE":
                            # first bound argument (§17.4.1.3); with
                            # NULL-as-error this is exactly SQL COALESCE
                            expect("punct", "(")
                            args = []
                            while True:
                                args.append(bind_atom())
                                if peek() == ("punct", ","):
                                    take()
                                    continue
                                expect("punct", ")")
                                break
                            return ("coalesce", tuple(args))
                        if fn == "IF":
                            # IF(BOUND(?v), then, else) (§17.4.1.2 with a
                            # §17.4.1.1 condition — the OPTIONAL idiom)
                            expect("punct", "(")
                            k3, v3 = take()
                            if not (k3 == "bare" and v3.upper() == "BOUND"):
                                raise ValueError(
                                    "IF() condition supports BOUND(?var) only"
                                )
                            expect("punct", "(")
                            k3, v3 = take()
                            if k3 != "var":
                                raise ValueError("BOUND() needs a ?variable")
                            cond = ("var", v3[1:])
                            expect("punct", ")")
                            expect("punct", ",")
                            then_e = bind_atom()
                            expect("punct", ",")
                            else_e = bind_atom()
                            expect("punct", ")")
                            return ("if_bound", (cond, then_e, else_e))
                        if fn in ("UCASE", "LCASE"):
                            expect("punct", "(")
                            arg = bind_atom()
                            expect("punct", ")")
                            return (fn.lower(), (arg,))
                        if fn == "SUBSTR":
                            # SUBSTR(expr, start [, len]) — 1-based (§17.4.3.3)
                            expect("punct", "(")
                            arg = bind_atom()
                            expect("punct", ",")
                            start = bind_int("SUBSTR")
                            length = None
                            if peek() == ("punct", ","):
                                take()
                                length = bind_int("SUBSTR")
                            expect("punct", ")")
                            return ("substr", (arg,), start, length)
                        if fn == "REPLACE":
                            # REPLACE(expr, "regex", "replacement") (§17.4.3.15)
                            expect("punct", "(")
                            arg = bind_atom()
                            expect("punct", ",")
                            pat = bind_lit("REPLACE")
                            expect("punct", ",")
                            rep = bind_lit("REPLACE")
                            expect("punct", ")")
                            return ("replace", (arg,), pat, rep)
                        if fn in ("STRBEFORE", "STRAFTER"):
                            # literal (non-regex) split (§17.4.3.7/.8)
                            expect("punct", "(")
                            arg = bind_atom()
                            expect("punct", ",")
                            lit = bind_lit(fn)
                            expect("punct", ")")
                            return (fn.lower(), (arg,), lit)
                        return ("const", _term(kk, vv).text)
                    raise ValueError(
                        f"BIND expects ?var, constant or a string function, got {vv!r}"
                    )

                expr = bind_atom()
                k2, v2 = take()
                if not (k2 == "bare" and v2.upper() == "AS"):
                    raise ValueError("BIND needs 'AS ?alias'")
                k2, v2 = take()
                if k2 != "var":
                    raise ValueError("BIND alias must be a ?variable")
                expect("punct", ")")
                q.binds.append((expr, v2[1:]))
            elif allow_blocks and kw("FILTER"):
                take()
                if kw("NOT") or kw("EXISTS"):
                    positive = True
                    if kw("NOT"):
                        take()
                        positive = False
                    k2, v2 = take()
                    if not (k2 == "bare" and v2.upper() == "EXISTS"):
                        raise ValueError("FILTER NOT must be followed by EXISTS")
                    ex: list[tuple] = []
                    group(ex, allow_blocks=False)
                    if not ex:
                        raise ValueError("empty EXISTS group")
                    q.exists_filters.append((positive, ex))
                else:
                    q.filters.append(filter_expr())
            elif kw("OPTIONAL") or kw("FILTER") or kw("MINUS") or kw("VALUES") or kw("BIND"):
                raise ValueError(
                    "OPTIONAL/FILTER/MINUS/VALUES/BIND cannot nest inside a sub-group"
                )
            else:
                into.append(triple_pattern())
            if peek()[0] == "dot":
                take()

    if kw("WHERE"):
        take()
    group(q.patterns, allow_blocks=True)
    if not q.patterns and not q.unions and not q.subqueries:
        raise ValueError("empty graph pattern")

    if kw("GROUP"):
        take()
        k, v = take()
        if not (k == "bare" and v.upper() == "BY"):
            raise ValueError("GROUP must be followed by BY")
        while peek()[0] == "var":
            q.group_by.append(take()[1][1:])
        if not q.group_by:
            raise ValueError("GROUP BY needs at least one ?variable")
    while kw("HAVING") or (q.having and peek() == ("punct", "(")):
        # HAVING (?a op value) [(?a op value)]... — conditions over
        # aggregate aliases (or group keys), ANDed
        if kw("HAVING"):
            take()
        expect("punct", "(")
        k, v = take()
        if k != "var":
            raise ValueError("HAVING needs a ?variable comparison")
        hv = v[1:]
        k, op = take()
        if k != "bare" or op not in ("=", "!=", ">", ">=", "<", "<="):
            raise ValueError(f"unsupported HAVING operator {op!r}")
        k, val = take()
        if k not in ("iri", "lit", "bare"):
            raise ValueError(f"HAVING comparison needs a constant, got {val!r}")
        q.having.append((hv, op, _term(k, val).text))
        expect("punct", ")")
    if kw("ORDER"):
        take()
        k, v = take()
        if not (k == "bare" and v.upper() == "BY"):
            raise ValueError("ORDER must be followed by BY")
        while True:
            k, v = peek()
            if k == "var":
                take()
                q.order_by.append((v[1:], False))
            elif k == "bare" and v.upper() in ("ASC", "DESC"):
                take()
                desc = v.upper() == "DESC"
                expect("punct", "(")
                k, v = take()
                if k != "var":
                    raise ValueError("ASC/DESC need a (?variable)")
                expect("punct", ")")
                q.order_by.append((v[1:], desc))
            else:
                break
        if not q.order_by:
            raise ValueError("ORDER BY needs at least one ?variable")
    for _ in range(2):  # LIMIT / OFFSET, either order
        if kw("LIMIT") and q.limit is None:
            take()
            k, v = take()
            if k != "bare" or not v.isdigit():
                raise ValueError("LIMIT needs a non-negative integer")
            q.limit = int(v)
        elif kw("OFFSET") and q.offset is None:
            take()
            k, v = take()
            if k != "bare" or not v.isdigit():
                raise ValueError("OFFSET needs a non-negative integer")
            q.offset = int(v)
    if pos != len(toks):
        raise ValueError(f"trailing tokens after query: {toks[pos:]}")

    # variables bound only inside an EXISTS group are scoped to it —
    # not projectable, orderable, or filterable outside
    all_pats = (
        q.patterns
        + [p for u in q.unions for br in u for p in br]
        + [p for opt in q.optionals for p in opt]
    )
    pattern_vars = {t.name for pat in all_pats for t in pat if isinstance(t, Var)}
    # subquery projections are bound in the outer scope (SPARQL 1.1 §12:
    # only SELECTed variables are visible); an aggregate alias that
    # shadows an outer pattern variable would silently join two different
    # things — reject it
    sub_agg_aliases = {a for sub in q.subqueries for *_, a in sub.aggregates}
    clash_sub = sorted(sub_agg_aliases & pattern_vars)
    if clash_sub:
        raise ValueError(
            f"subquery aggregate aliases shadow outer pattern variables: {clash_sub}"
        )
    pattern_vars |= {v for sub in q.subqueries for v in (sub.variables or [])}

    def _expr_vars(e: tuple) -> list[str]:
        return _expr_source_vars(e)

    bind_aliases: list[str] = []
    for expr, alias in q.binds:
        bad_src = [
            s for s in _expr_vars(expr)
            if s not in pattern_vars and s not in bind_aliases
        ]
        if bad_src:
            raise ValueError(f"BIND source variables not bound: {bad_src}")
        if alias in pattern_vars or alias in bind_aliases:
            raise ValueError(f"BIND alias rebinds an existing variable: ?{alias}")
        bind_aliases.append(alias)
    bound_vars = pattern_vars | set(bind_aliases)
    if q.form == "CONSTRUCT":
        if q.group_by or q.having or q.order_by or q.limit is not None or q.offset is not None:
            raise ValueError("CONSTRUCT takes no solution modifiers in this subset")
        tvars = sorted({t.name for pat in q.template for t in pat if isinstance(t, Var)})
        missing_t = [v for v in tvars if v not in bound_vars]
        if missing_t:
            raise ValueError(f"template variables not bound in the pattern: {missing_t}")
        q.variables = tvars
    if q.variables is None:
        q.variables = sorted(bound_vars) if q.form == "SELECT" else []
    unbound_filters = [
        v for f in q.filters for v in _filter_vars(f) if v not in pattern_vars
    ]
    if unbound_filters:
        raise ValueError(f"FILTER variables not bound in the pattern: {unbound_filters}")
    unbound_values = [v for v, _ in q.values if v not in pattern_vars]
    if unbound_values:
        raise ValueError(f"VALUES variables not bound in the pattern: {unbound_values}")
    agg_aliases = [alias for *_, alias in q.aggregates]
    if len(set(agg_aliases)) != len(agg_aliases):
        raise ValueError("duplicate aggregate aliases")
    clash = [a for a in agg_aliases if a in bound_vars]
    if clash:
        raise ValueError(f"aggregate aliases shadow pattern variables: {clash}")
    bad_args = [a for _, a, _, _ in q.aggregates if a is not None and a not in bound_vars]
    if bad_args:
        raise ValueError(f"aggregate arguments not bound in the pattern: {bad_args}")
    unknown_gb = [v for v in q.group_by if v not in bound_vars]
    if unknown_gb:
        raise ValueError(f"GROUP BY variables not bound in the pattern: {unknown_gb}")
    if q.aggregates or q.group_by:
        # SPARQL 1.1 §11.4: with grouping, every projected non-aggregate
        # variable must be a group key (no group_by = one implicit group)
        stray = [v for v in q.variables if v not in agg_aliases and v not in q.group_by]
        if stray:
            raise ValueError(f"projected variables must be GROUP BY keys: {stray}")
    if q.having and not (q.aggregates or q.group_by):
        raise ValueError("HAVING requires aggregates or GROUP BY")
    bad_having = [
        hv for hv, _, _ in q.having
        if hv not in agg_aliases and hv not in q.group_by
    ]
    if bad_having:
        raise ValueError(
            f"HAVING variables must be aggregate aliases or group keys: {bad_having}"
        )
    count_aliases = {alias for fn, _, _, alias in q.aggregates if fn == "COUNT"}
    bad_num = [
        val for hv, _, val in q.having
        if hv in count_aliases and not val.lstrip("-").isdigit()
    ]
    if bad_num:
        raise ValueError(f"HAVING against a COUNT needs integer constants: {bad_num}")
    fnum_aliases = {alias for fn, _, _, alias in q.aggregates if fn in ("SUM", "AVG")}
    bad_fnum = [
        val for hv, _, val in q.having
        if hv in fnum_aliases and not _NUM_PAT.fullmatch(val)
    ]
    if bad_fnum:
        raise ValueError(f"HAVING against a SUM/AVG needs numeric constants: {bad_fnum}")
    order_names = [n for n, _ in q.order_by]
    missing = [
        v for v in (q.variables + order_names)
        if v not in bound_vars and v not in agg_aliases
    ]
    if missing:
        raise ValueError(f"variables not bound in the pattern: {missing}")
    unprojected = [v for v in order_names if v not in q.variables]
    if unprojected:
        raise ValueError(f"ORDER BY variables must be projected: {unprojected}")
    return q


# ------------------------------------------------------------- execution


def _var_roles(patterns: list[tuple]) -> dict[str, set[str]]:
    roles: dict[str, set[str]] = {}
    for pat in patterns:
        for role, t in zip(_POS, pat):
            if isinstance(t, Var):
                roles.setdefault(t.name, set()).add(role)
    return roles


def _resolve_constants(
    patterns: list[tuple], vocabs: dict[str, DataFrame]
) -> dict[tuple[str, str], int]:
    """(role, term) -> id for every constant that exists in its
    vocabulary; absent constants are simply missing from the map (the
    caller decides: required pattern -> empty answer, OPTIONAL group ->
    unmatched). One pushed-down IN-filter scan per role that has
    constants; collects O(#constants) rows."""
    wanted: dict[str, set[str]] = {r: set() for r in _POS}
    for pat in patterns:
        for role, t in zip(_POS, pat):
            if isinstance(t, (Const, PathPlus)):
                wanted[role].add(t.text)
            elif isinstance(t, PathExpr):
                wanted["p"].update(t.atoms())
        if isinstance(pat[1], PathExpr):
            # path endpoints live in the UNIFIED node space: a constant
            # there may resolve through EITHER role's vocabulary (e.g. the
            # start of an inverse path is an object-only term)
            for t in (pat[0], pat[2]):
                if isinstance(t, Const):
                    wanted["s"].add(t.text)
                    wanted["o"].add(t.text)
    out: dict[tuple[str, str], int] = {}
    for role, terms in wanted.items():
        if not terms:
            continue
        rows = (
            vocabs[role]
            .filter(F.col("term").isin(list(terms)))
            .select("term", "id")
            .collect()
        )
        for r in rows:
            out[(role, r["term"])] = int(r["id"])
    return out


def _consts_resolved(patterns: list[tuple], const_ids: dict) -> bool:
    """True when every REQUIRED constant resolved. A PathExpr pattern's
    endpoint constants resolve in EITHER role vocabulary (unified node
    space); its predicate atoms are never required — an absent atom is
    an empty edge relation, and an alternation or * around it may still
    produce solutions (plans/paths.atom_rel)."""
    for pat in patterns:
        path = isinstance(pat[1], PathExpr)
        for role, t in zip(_POS, pat):
            if not isinstance(t, (Const, PathPlus)):
                continue
            if path and role in ("s", "o"):
                if ("s", t.text) not in const_ids and ("o", t.text) not in const_ids:
                    return False
            elif (role, t.text) not in const_ids:
                return False
    return True


def _path_pattern_frame(
    tables: dict[str, DataFrame],
    vocabs: dict[str, DataFrame],
    pattern: tuple,
    const_ids: dict[tuple[str, str], int],
) -> tuple[DataFrame, list[str]]:
    """A composite property-path pattern → (frame, vars).

    The path relation is evaluated in the UNIFIED node space
    (plans/paths.eval_path); endpoint constants resolve to their unified
    id (subject id when the term is a subject, else displaced object
    id); endpoint variables decode to TERMS via the unified decode map —
    the caller classifies them multi-role, so every downstream join
    compares terms, which is exact across the independent id spaces."""
    from .paths import UID_OFFSET, eval_path, unified_maps

    expr: PathExpr = pattern[1]
    omap, decode = unified_maps(vocabs)
    pmap = {a: const_ids.get(("p", a)) for a in expr.atoms()}
    rel = eval_path(expr.node, tables, pmap, omap)

    def const_uid(term: str) -> int:
        if ("s", term) in const_ids:
            return const_ids[("s", term)]
        return const_ids[("o", term)] + UID_OFFSET

    occ_cols: dict[str, list] = {}
    for col, t in (("a", pattern[0]), ("b", pattern[2])):
        if isinstance(t, Const):
            rel = rel.filter(F.col(col) == F.lit(const_uid(t.text)))
        else:
            occ_cols.setdefault(t.name, []).append(F.col(col))
    for cols in occ_cols.values():
        for extra in cols[1:]:  # same var both ends: uid equality == term equality
            rel = rel.filter(cols[0] == extra)
    for v, cols in occ_cols.items():
        d = decode.select(F.col("uid").alias(f"_puid_{v}"), F.col("term").alias(f"_pterm_{v}"))
        rel = rel.join(d, cols[0] == d[f"_puid_{v}"], "inner")
    out = [F.col(f"_pterm_{v}").alias(v) for v in occ_cols]
    return rel.select(*out), list(occ_cols)


def _pattern_frame(
    tables: dict[str, DataFrame],
    vocabs: dict[str, DataFrame],
    pattern: tuple,
    const_ids: dict[tuple[str, str], int],
    multi_role: set[str],
) -> tuple[DataFrame, list[str]]:
    """One pattern → routed scan → frame with one column per distinct
    variable: raw id for single-role vars, decoded term for multi-role
    vars (id-keyed vocab join). Repeated variables inside a pattern are
    necessarily multi-role, so their equality filter compares terms."""
    if isinstance(pattern[1], PathExpr):
        return _path_pattern_frame(tables, vocabs, pattern, const_ids)
    if isinstance(pattern[1], PathPlus):
        from .paths import transitive_closure

        # o-id -> s-id bridge for identical terms: hop composition must
        # cross the independent id spaces by TERM
        bridge = (
            vocabs["o"]
            .select(F.col("id").alias("o_id"), "term")
            .join(vocabs["s"].select(F.col("id").alias("s_id"), "term"), "term")
            .select("o_id", "s_id")
        )
        df = transitive_closure(tables, const_ids[("p", pattern[1].text)], bridge=bridge)
        for role, t in (("s", pattern[0]), ("o", pattern[2])):
            if isinstance(t, Const):
                df = df.filter(F.col(role) == F.lit(const_ids[(role, t.text)]))
    else:
        consts = {
            role: const_ids[(role, t.text)]
            for role, t in zip(_POS, pattern)
            if isinstance(t, Const)
        }
        df = select(tables, **consts)
    occ_cols: dict[str, list] = {}
    for role, t in zip(_POS, pattern):
        if not isinstance(t, Var):
            continue
        if t.name in multi_role:
            voc = vocabs[role].select(
                F.col("id").alias(f"_vid_{role}"), F.col("term").alias(f"_term_{role}")
            )
            df = df.join(voc, df[role] == voc[f"_vid_{role}"], "inner")
            occ_cols.setdefault(t.name, []).append(F.col(f"_term_{role}"))
        else:
            occ_cols.setdefault(t.name, []).append(F.col(role))
    for cols in occ_cols.values():
        for extra in cols[1:]:  # repeated var inside the pattern
            df = df.filter(cols[0] == extra)
    out = [cols[0].alias(v) for v, cols in occ_cols.items()]
    return df.select(*out), list(occ_cols)


def _bound_count(pattern: tuple) -> int:
    return sum(isinstance(t, Const) for t in pattern)


def _greedy_join(
    resolved: list[tuple[tuple[DataFrame, list[str]], int, int]],
) -> tuple[DataFrame, set[str]]:
    """Bound-first greedy join over resolved pattern frames (most
    constants first, each next pattern must share a variable; 2-bound
    probe patterns are broadcast — same policy as plans.bgp)."""
    remaining = sorted(resolved, key=lambda r: (-r[1], r[2]))
    (acc, acc_vars), acc_bound, _ = remaining.pop(0)
    acc_vars = set(acc_vars)
    acc_small = acc_bound >= 2
    while remaining:
        idx = next(
            (i for i, ((_, vs), _, _) in enumerate(remaining) if acc_vars & set(vs)),
            0,  # disconnected BGP: cross join
        )
        (df, vs), bound, _ = remaining.pop(idx)
        shared = sorted(acc_vars & set(vs))
        if bound >= 2:
            df = F.broadcast(df)
        elif acc_small:
            acc = F.broadcast(acc)
        acc = acc.join(df, on=shared) if shared else acc.crossJoin(df)
        acc_small = acc_small and bound >= 2
        acc_vars |= set(vs)
    return acc, acc_vars


# SPARQL numeric literal shape shared by SUM/AVG and the ordering
# filters: what casts cleanly to double in BOTH Spark and an ANSI-SQL
# oracle (no exponents/INF — deterministic cross-engine semantics)
_NUM_RE = "^-?[0-9]+(\\.[0-9]+)?$"
_NUM_PAT = re.compile(r"-?[0-9]+(\.[0-9]+)?")

_CMP_OPS = {
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
}


def _typed_value_predicate(col, f: Filter):
    """FILTER over a TYPED value column (a subquery COUNT/SUM/AVG alias):
    numeric constant ⇒ numeric comparison on the native type, otherwise
    compare the value's string form; regex matches the string form."""
    if f.kind == "bound":
        return col.isNotNull()
    if f.kind == "regex":
        return col.cast("string").rlike(f.arg)
    if f.kind in _STR_FNS or f.kind.startswith("strlen_"):
        return _string_fn_predicate(col.cast("string"), f)
    if f.kind in ("in", "not_in"):
        if not f.arg:
            return F.lit(f.kind == "not_in")
        if all(_NUM_PAT.fullmatch(a) for a in f.arg):
            cond = col.cast("double").isin([float(a) for a in f.arg])
        else:
            cond = col.cast("string").isin(list(f.arg))
        return cond if f.kind == "in" else ~cond
    ops = {"eq": lambda a, b: a == b, "ne": lambda a, b: a != b, **_CMP_OPS}
    op = ops[f.kind]
    if _NUM_PAT.fullmatch(f.arg):
        return op(col.cast("double"), F.lit(float(f.arg)))
    return op(col.cast("string"), F.lit(f.arg))


_STR_FNS = {"strstarts", "strends", "contains"}


def _string_fn_predicate(col, f: Filter):
    """SPARQL 1.1 string built-ins over a string column. The literal
    argument is matched verbatim (no regex interpretation — `.` is a
    dot), so these map to Column.startswith/endswith/contains which
    Catalyst compiles to codegen'd StartsWith/EndsWith/Contains (and
    pushes into the parquet scan when the column is a data column)."""
    if f.kind == "strstarts":
        return col.startswith(f.arg)
    if f.kind == "strends":
        return col.endswith(f.arg)
    if f.kind == "contains":
        return col.contains(f.arg)
    op = {"eq": lambda a, b: a == b, "ne": lambda a, b: a != b, **_CMP_OPS}[
        f.kind.removeprefix("strlen_")
    ]
    return op(F.length(col), F.lit(int(f.arg)))


def _term_predicate(col, f: Filter):
    """The FILTER condition over a TERM column. Ordering comparisons
    follow SPARQL operand typing: a numeric constant forces a numeric
    comparison (non-numeric terms are a type error — row dropped), a
    non-numeric constant compares codepoint strings."""
    if f.kind == "bound":
        # BOUND never errors: a plain (non-NULL) boolean, so !BOUND
        # keeps the unmatched-OPTIONAL rows (the pre-1.1 negation idiom)
        return col.isNotNull()
    if f.kind == "regex":
        return col.rlike(f.arg)
    if f.kind in _STR_FNS or f.kind.startswith("strlen_"):
        return _string_fn_predicate(col, f)
    if f.kind in ("in", "not_in"):
        # IN ≡ chained = over term texts (consistent with this subset's
        # exact-term eq); unbound is an error → drop in BOTH polarities
        # (isin yields NULL; ~NULL is NULL); empty list is constant
        # false / true per SPARQL 1.1 §17.4.1.9/.10
        if not f.arg:
            return F.lit(f.kind == "not_in")
        cond = col.isin(list(f.arg))
        return cond if f.kind == "in" else ~cond
    if f.kind == "eq":
        return col == F.lit(f.arg)
    if f.kind == "ne":
        return col != F.lit(f.arg)
    op = _CMP_OPS[f.kind]
    if _NUM_PAT.fullmatch(f.arg):
        return col.rlike(_NUM_RE) & op(col.cast("double"), F.lit(float(f.arg)))
    return op(col, F.lit(f.arg))


def _apply_filter(
    acc: DataFrame,
    f: Filter,
    roles: dict[str, set[str]],
    multi_role: set[str],
    vocabs: dict[str, DataFrame],
) -> DataFrame:
    """FILTER at the right layer: a multi-role variable already carries
    its term, so the predicate is a plain string expression; a
    single-role variable carries an id, so the predicate is pushed into
    the VOCABULARY dimension (matching ids resolved by one pushed-down
    vocab scan) and applied as a left-semi join on the long id. NULLs
    (unmatched OPTIONAL vars) never satisfy a filter — SPARQL's
    error-on-unbound semantics."""
    if f.kind == "bound":
        # boundness is visible on the id/term column itself — no vocab
        # dimension needed regardless of typing
        return acc.filter(F.col(f.var).isNotNull())
    if f.var in multi_role:
        return acc.filter(_term_predicate(F.col(f.var), f))
    role = next(iter(roles[f.var]))
    pred = _term_predicate(F.col("term"), f)
    matching = vocabs[role].filter(pred).select(F.col("id").alias(f"_fid_{f.var}"))
    return acc.join(
        matching, acc[f.var] == matching[f"_fid_{f.var}"], "left_semi"
    )


def _apply_bool_filter(
    acc: DataFrame,
    tree: BoolFilter,
    roles: dict[str, set[str]],
    multi_role: set[str],
    vocabs: dict[str, DataFrame],
    sub_numeric: set[str],
) -> DataFrame:
    """Boolean FILTER combination (``||`` / ``&&`` / ``!``): a semi-join
    per atom cannot express disjunction or negation, so each involved
    id-typed variable gets its surface term decoded alongside (one LEFT
    vocab dimension join per var — the same join final decode performs)
    and the whole tree evaluates as ONE three-valued boolean column.
    SQL's NULL logic IS SPARQL §17.2's error logic here: an unbound
    (OPTIONAL-null) variable makes its atom NULL; true||NULL = true,
    false||NULL = NULL → row dropped, !NULL = NULL → dropped — exactly
    the SPARQL error tables. (One documented divergence, shared with the
    scalar path: a numeric-typed comparison on a non-numeric term is
    FALSE rather than an error, so under ``!`` such a row survives.)"""
    need = sorted(set(_filter_vars(tree)))
    helpers = []
    for var in need:
        if var in multi_role or var in sub_numeric or var not in roles:
            continue
        role = next(iter(roles[var]))
        v = vocabs[role].select(
            F.col("id").alias(f"_fbid_{var}"), F.col("term").alias(f"_fterm_{var}")
        )
        acc = acc.join(v, acc[var] == v[f"_fbid_{var}"], "left").drop(f"_fbid_{var}")
        helpers.append(f"_fterm_{var}")

    def colof(var):
        if var in sub_numeric:  # typed aggregate alias — string form
            return F.col(var).cast("string")
        term_typed = var in multi_role or var not in roles  # BIND vars too
        return F.col(var) if term_typed else F.col(f"_fterm_{var}")

    def build(n):
        if isinstance(n, BoolFilter):
            if n.op == "not":
                return ~build(n.kids[0])
            out = build(n.kids[0])
            for k in n.kids[1:]:
                out = (out & build(k)) if n.op == "and" else (out | build(k))
            return out
        if n.kind.startswith("var_"):
            # ?a op ?b: decoded-term (codepoint) comparison — SPARQL's
            # simple-literal ordering; eq/ne are exact term equality
            ops = {"eq": lambda a, b: a == b, "ne": lambda a, b: a != b, **_CMP_OPS}
            return ops[n.kind.removeprefix("var_")](colof(n.var), colof(n.arg))
        if n.var in sub_numeric:
            return _typed_value_predicate(F.col(n.var), n)
        return _term_predicate(colof(n.var), n)

    return acc.filter(build(tree)).drop(*helpers)


def _expr_source_vars(e: tuple) -> list[str]:
    if e[0] == "var":
        return [e[1]]
    if e[0] == "const":
        return []
    # concat and the string functions all keep child exprs in e[1]
    return [v for sub in e[1] for v in _expr_source_vars(sub)]


def _bind_column(e: tuple):
    """BIND expression over DECODED term columns. Every function here is
    NULL-in → NULL-out (Spark's semantics match SPARQL's error
    propagation through string functions over an unbound argument)."""
    if e[0] == "var":
        return F.col(e[1])
    if e[0] == "const":
        return F.lit(e[1])
    if e[0] == "concat":
        return F.concat(*[_bind_column(sub) for sub in e[1]])
    if e[0] == "coalesce":
        return F.coalesce(*[_bind_column(sub) for sub in e[1]])
    if e[0] == "if_bound":
        # IF(BOUND(?v), then, else): BOUND never errors, so the branch
        # chooses cleanly; the chosen branch's own NULL (error) flows out
        cond, then_e, else_e = e[1]
        return F.when(
            _bind_column(cond).isNotNull(), _bind_column(then_e)
        ).otherwise(_bind_column(else_e))
    col = _bind_column(e[1][0])
    if e[0] == "ucase":
        return F.upper(col)
    if e[0] == "lcase":
        return F.lower(col)
    if e[0] == "substr":
        start, length = e[2], e[3]
        return F.substring(col, start, 2147483647 if length is None else length)
    if e[0] == "replace":
        return F.regexp_replace(col, e[2], e[3])
    # STRBEFORE/STRAFTER: literal (non-regex) search; when the needle is
    # absent the result is "" (§17.4.3.7/.8), but an unbound input stays
    # unbound — the isNull arm keeps NULL out of the otherwise("")
    lit = e[2]
    if lit == "":
        # STRBEFORE(x, "") = "", STRAFTER(x, "") = x (empty-pattern rule)
        return F.when(col.isNull(), F.lit(None)).otherwise(
            F.lit("") if e[0] == "strbefore" else col
        )
    pos = F.instr(col, lit)
    hit = (
        F.substring(col, 1, pos - 1)
        if e[0] == "strbefore"
        else F.substring(col, pos + len(lit), 2147483647)
    )
    return F.when(col.isNull(), F.lit(None)).when(pos > 0, hit).otherwise(F.lit(""))


def _run_describe(
    terms: list[str],
    tables: dict[str, DataFrame],
    vocabs: dict[str, DataFrame],
) -> DataFrame:
    """DESCRIBE: the decoded sub-graph touching any of ``terms`` in any
    role — per (term, role) one routed, pushed-down pattern probe
    (reference-style S??/?P?/??O selections); the union dedups on ids
    BEFORE decoding (a term can reach one triple through two roles, and
    decode joins then touch the deduped rows only)."""
    spark = next(iter(tables.values())).sparkSession
    frames: list[DataFrame] = []
    for role in _POS:
        hits = (
            vocabs[role]
            .filter(F.col("term").isin(terms))
            .select("id")
            .collect()
        )  # O(|terms|) driver rows — same contract as _resolve_constants
        for r in hits:
            frames.append(select(tables, **{role: int(r["id"])}))
    if not frames:
        return spark.range(0).select(
            *[F.lit(None).cast("string").alias(c) for c in _POS]
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return decode_triples(out.dropDuplicates(), vocabs).select(
        *[F.col(f"{c}_term").alias(c) for c in _POS]
    )


def run_sparql(
    query: str | SparqlQuery,
    tables: dict[str, DataFrame],
    vocabs: dict[str, DataFrame],
) -> DataFrame:
    """Answer a SPARQL-subset query over the permutation ``tables`` with
    the per-role ``vocabs`` (DataFrames with columns term, id).

    SELECT returns one string column per projected variable (decoded
    surface forms; NULL where an OPTIONAL did not match). ASK returns a
    single-row frame ``(ask boolean)``. CONSTRUCT returns the built
    graph as a duplicate-free ``(s, p, o)`` string frame."""
    q = parse_sparql(query) if isinstance(query, str) else query
    spark = next(iter(tables.values())).sparkSession
    if q.form == "DESCRIBE":
        return _run_describe(q.describe_terms, tables, vocabs)
    all_pats = (
        q.patterns
        + [p for u in q.unions for br in u for p in br]
        + [p for opt in q.optionals for p in opt]
        + [p for mns in q.minuses for p in mns]
        + [p for _, ex in q.exists_filters for p in ex]
    )
    roles = _var_roles(all_pats)
    multi_role = {v for v, rs in roles.items() if len(rs) > 1}
    # composite-path endpoint variables live in the unified node space and
    # come back DECODED (terms): force term-typed joins everywhere they
    # appear, same as genuinely multi-role variables
    for pat in all_pats:
        if isinstance(pat[1], PathExpr):
            for t in (pat[0], pat[2]):
                if isinstance(t, Var):
                    multi_role.add(t.name)
    # subquery projections arrive DECODED: string columns for plain vars
    # and MIN/MAX/SAMPLE/GROUP_CONCAT aliases (→ multi_role, so outer
    # occurrences join at the term level and decode no-ops), typed
    # long/double for COUNT/SUM/AVG aliases (→ sub_numeric: never decode,
    # compare numerically)
    sub_numeric: set[str] = set()
    for sub in q.subqueries:
        agg_types = {alias: fn for fn, _, _, alias in sub.aggregates}
        for v in sub.variables or []:
            if agg_types.get(v) in ("COUNT", "SUM", "AVG"):
                sub_numeric.add(v)
            else:
                multi_role.add(v)

    def provably_empty() -> DataFrame:
        if q.form == "ASK":
            return spark.range(1).select(F.lit(False).alias("ask"))
        if q.form == "CONSTRUCT":
            return spark.range(0).select(
                *[F.lit(None).cast("string").alias(c) for c in _POS]
            )
        agg_cols = {
            alias: (
                F.lit(0).cast("long")
                if fn == "COUNT"
                # Sum({}) = Avg({}) = 0 per SPARQL 1.1 §18.5
                else F.lit(0.0) if fn in ("SUM", "AVG")
                else F.lit(None).cast("string")
            )
            for fn, _, _, alias in q.aggregates
        }
        cols = [agg_cols.get(v, F.lit(None).cast("string")).alias(v) for v in q.variables]
        # an implicit-group aggregate over an empty pattern is ONE row
        # (COUNT = 0, MIN/MAX unbound) — SPARQL 1.1 §11.1 / SQL semantics;
        # with GROUP BY there are zero groups, hence zero rows
        n = 1 if (q.aggregates and not q.group_by) else 0
        return spark.range(n).select(*cols)

    const_ids = _resolve_constants(all_pats, vocabs)
    if not _consts_resolved(q.patterns, const_ids):
        # a REQUIRED constant is unknown: provably empty
        return provably_empty()

    if q.patterns:
        resolved = [
            (_pattern_frame(tables, vocabs, p, const_ids, multi_role), _bound_count(p), i)
            for i, p in enumerate(q.patterns)
        ]
        acc, acc_vars = _greedy_join(resolved)
    else:  # union-only or subquery-only group
        acc, acc_vars = None, set()

    for branches in q.unions:
        # each branch is an independent BGP; align columns (NULL of the
        # right type where a branch does not bind a variable) and take
        # the BAG union — duplicates kept, SPARQL multiset semantics
        frames: list[tuple[DataFrame, set[str]]] = []
        for br in branches:
            if not _consts_resolved(br, const_ids):
                continue  # unknown constant: this branch has no solutions
            br_resolved = [
                (_pattern_frame(tables, vocabs, p, const_ids, multi_role), _bound_count(p), i)
                for i, p in enumerate(br)
            ]
            frames.append(_greedy_join(br_resolved))
        if not frames:  # every branch had an unknown constant
            return provably_empty()
        u_vars: set[str] = set().union(*(vs for _, vs in frames))
        aligned = []
        for sub, vs in frames:
            for v in sorted(u_vars - vs):
                typ = "string" if v in multi_role else "long"
                sub = sub.withColumn(v, F.lit(None).cast(typ))
            aligned.append(sub.select(*sorted(u_vars)))
        u = aligned[0]
        for nxt in aligned[1:]:
            u = u.unionByName(nxt)
        if acc is None:
            acc, acc_vars = u, u_vars
        else:
            shared = sorted(acc_vars & u_vars)
            acc = acc.join(u, on=shared) if shared else acc.crossJoin(u)
            acc_vars |= u_vars

    for sub in q.subqueries:
        # SPARQL 1.1 §12: evaluate the subquery bottom-up, then join its
        # solution frame with the rest of the group on shared variables
        # (terms for plain vars — outer occurrences were forced
        # multi_role above; typed values for aggregate aliases). No
        # shared variable = cartesian extension, per the algebra.
        sub_df = run_sparql(sub, tables, vocabs)
        sub_vars = set(sub_df.columns)
        if acc is None:
            acc, acc_vars = sub_df, set(sub_vars)
        else:
            shared = sorted(acc_vars & sub_vars)
            acc = acc.join(sub_df, on=shared) if shared else acc.crossJoin(sub_df)
            acc_vars |= sub_vars

    for opt in q.optionals:
        opt_vars = {t.name for pat in opt for t in pat if isinstance(t, Var)}
        new_vars = opt_vars - acc_vars
        if not _consts_resolved(opt, const_ids):
            # OPTIONAL with an unknown constant never matches: its new
            # variables stay NULL on every row
            for v in sorted(new_vars):
                typ = "string" if v in multi_role else "long"
                acc = acc.withColumn(v, F.lit(None).cast(typ))
            acc_vars |= new_vars
            continue
        shared = sorted(acc_vars & opt_vars)
        if not shared:
            raise ValueError(
                "OPTIONAL group shares no variable with the required pattern"
            )
        sub_resolved = [
            (_pattern_frame(tables, vocabs, p, const_ids, multi_role), _bound_count(p), i)
            for i, p in enumerate(opt)
        ]
        sub, _ = _greedy_join(sub_resolved)
        if all(_bound_count(p) >= 2 for p in opt):
            sub = F.broadcast(sub)
        acc = acc.join(sub, on=shared, how="left")
        acc_vars |= opt_vars

    for mns in q.minuses:
        # SPARQL 1.1 MINUS: remove solutions compatible on SHARED vars.
        # Unlike NOT EXISTS, a disjoint-domain MINUS removes nothing, and
        # so does one whose constant is absent from its vocabulary.
        if not _consts_resolved(mns, const_ids):
            continue
        m_resolved = [
            (_pattern_frame(tables, vocabs, p, const_ids, multi_role), _bound_count(p), i)
            for i, p in enumerate(mns)
        ]
        sub, sub_vars = _greedy_join(m_resolved)
        shared = sorted(acc_vars & sub_vars)
        if not shared:
            continue
        acc = acc.join(sub.select(*shared), on=shared, how="left_anti")

    for var, terms in q.values:
        # inner restriction to the listed terms: string predicate for a
        # term-typed (multi-role) var; pushed-down vocab IN-scan + id
        # semi-join for an id-typed var (absent terms match nothing)
        if var in multi_role:
            acc = acc.filter(F.col(var).isin(terms))
        elif var not in roles:  # typed subquery aggregate alias
            acc = acc.filter(F.col(var).cast("string").isin(terms))
        else:
            role = next(iter(roles[var]))
            matching = vocabs[role].filter(F.col("term").isin(terms)).select(
                F.col("id").alias(f"_vval_{var}")
            )
            acc = acc.join(
                matching, acc[var] == matching[f"_vval_{var}"], "left_semi"
            )

    for f in q.filters:
        if isinstance(f, BoolFilter) or f.kind.startswith("var_"):
            # boolean trees AND var-var comparisons need decoded terms
            acc = _apply_bool_filter(acc, f, roles, multi_role, vocabs, sub_numeric)
        elif f.var in sub_numeric:  # typed value column, no vocab dimension
            acc = acc.filter(_typed_value_predicate(F.col(f.var), f))
        else:
            acc = _apply_filter(acc, f, roles, multi_role, vocabs)

    for positive, ex in q.exists_filters:
        if not _consts_resolved(ex, const_ids):
            if positive:  # EXISTS over an unknown constant: provably empty
                return provably_empty()
            continue  # NOT EXISTS over an unknown constant: always true
        ex_resolved = [
            (_pattern_frame(tables, vocabs, p, const_ids, multi_role), _bound_count(p), i)
            for i, p in enumerate(ex)
        ]
        sub, sub_vars = _greedy_join(ex_resolved)
        shared = sorted(acc_vars & sub_vars)
        if not shared:
            raise ValueError(
                "FILTER [NOT] EXISTS group shares no variable with the outer pattern"
            )
        acc = acc.join(
            sub.select(*shared), on=shared, how="left_semi" if positive else "left_anti"
        )

    if q.form == "ASK":
        return acc.limit(1).agg((F.count("*") > 0).alias("ask"))

    def decode_var(df: DataFrame, v: str) -> DataFrame:
        if v in multi_role:
            return df.withColumn(v, F.col(v).cast("string"))
        role = next(iter(roles[v]))
        voc = vocabs[role].select(
            F.col("id").alias(f"_did_{v}"), F.col("term").alias(f"_dterm_{v}")
        )
        return (  # LEFT join: unmatched-OPTIONAL NULL ids decode to NULL
            df.join(voc, df[v] == voc[f"_did_{v}"], "left")
            .drop(v, f"_did_{v}")
            .withColumnRenamed(f"_dterm_{v}", v)
        )

    # BIND extensions evaluate here — after patterns/filters, before
    # aggregation/projection (the documented scoping). Inputs decode to
    # TERMS first (a bind is a string-level expression); once decoded,
    # a variable is term-typed for the rest of the plan, so it joins
    # multi_role (decode_var then no-ops on it, group keys skip the
    # post-aggregation id decode).
    for expr, alias in q.binds:
        for sv in sorted(set(_expr_source_vars(expr))):
            if sv not in multi_role:
                acc = decode_var(acc, sv)
                multi_role.add(sv)
        acc = acc.withColumn(alias, _bind_column(expr))
        multi_role.add(alias)
        acc_vars.add(alias)

    # decode single-role variables to terms (multi-role are terms
    # already); one id-keyed vocab join per variable. With aggregates,
    # decode BEFORE the shuffle only what must compare as a surface form
    # — MIN/MAX/SAMPLE/GROUP_CONCAT arguments (SPARQL string order, not
    # frequency-rank id order). COUNT arguments never decode (id ↔ term
    # is bijective within a role, so the [distinct] count is identical),
    # and GROUP KEYS stay ids through the aggregation and decode AFTER
    # it — the wide exchange then carries longs, and the vocab join
    # touches group-cardinality rows, not solution-cardinality ones.
    agg_aliases = {alias for *_, alias in q.aggregates}
    if q.aggregates or q.group_by:
        to_decode = sorted(
            {a for fn, a, _, _ in q.aggregates
             if a is not None and fn != "COUNT" and a not in sub_numeric}
        )
        post_decode = [
            v for v in q.group_by if v not in multi_role and v not in sub_numeric
        ]
    else:
        to_decode = [v for v in q.variables if v not in sub_numeric]
        post_decode = []

    for v in to_decode:
        acc = decode_var(acc, v)
    if q.form == "CONSTRUCT":
        # one projection of the solution frame per template triple —
        # constants are free literals (they need no vocabulary presence:
        # CONSTRUCT mints output terms); a solution with an unbound
        # template variable generates nothing for that triple (SPARQL
        # 1.1 §16.2); the result graph is a SET
        frames = []
        for pat in q.template:
            cols = [
                (F.lit(t.text) if isinstance(t, Const) else F.col(t.name)).alias(c)
                for c, t in zip(_POS, pat)
            ]
            tf = acc.select(*cols).filter(
                F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
            )
            frames.append(tf)
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out.dropDuplicates()
    if q.aggregates:
        # partial (map-side) aggregation comes free from HashAggregate;
        # COUNT ?v counts BOUND values only (F.count skips NULL, the
        # SPARQL unbound rule), COUNT(*) counts rows
        aggs = []
        for fn, arg, distinct, alias in q.aggregates:
            if fn == "COUNT":
                if arg is None:
                    e = F.count(F.lit(1))
                elif distinct:
                    e = F.count_distinct(F.col(arg))
                else:
                    e = F.count(F.col(arg))
            elif fn == "MIN":
                e = F.min(F.col(arg))
            elif fn == "MAX":
                e = F.max(F.col(arg))
            elif fn in ("SUM", "AVG"):
                # SPARQL numeric semantics over string terms: unbound
                # skipped; any non-numeric BOUND value is a type error
                # that unbinds the whole aggregate (NULL); empty numeric
                # multiset -> 0 (Sum({}) = Avg({}) = 0, §18.5). Integer
                # terms keep the double exact, so results are
                # cross-engine deterministic.
                col = F.col(arg).cast("string")
                is_num = col.rlike(_NUM_RE)
                num = F.when(is_num, col.cast("double"))
                any_bad = F.max(
                    F.when(col.isNotNull() & ~is_num, F.lit(1)).otherwise(F.lit(0))
                )
                base = F.sum(num) if fn == "SUM" else F.avg(num)
                e = F.when(any_bad == 1, F.lit(None).cast("double")).otherwise(
                    F.coalesce(base, F.lit(0.0))
                )
            elif fn == "SAMPLE":
                # SPARQL leaves the choice arbitrary; pin MIN so results
                # are deterministic and oracle-replayable
                e = F.min(F.col(arg))
            else:  # GROUP_CONCAT — pin codepoint order (spec leaves the
                # concatenation order unspecified); all-NULL group -> NULL
                # (the SQL string_agg convention, not the spec's "")
                vals = F.collect_set(F.col(arg)) if distinct else F.collect_list(F.col(arg))
                vals = F.array_sort(vals)
                e = F.when(
                    F.size(vals) > 0,
                    F.array_join(vals, q.gc_separators.get(alias, " ")),
                )
            aggs.append(e.alias(alias))
        acc = acc.groupBy(*q.group_by).agg(*aggs) if q.group_by else acc.agg(*aggs)
        for v in post_decode:  # group keys: id -> term on grouped rows
            acc = decode_var(acc, v)
    elif q.group_by:
        # GROUP BY with no aggregate: one solution per group (SPARQL
        # sample semantics degenerate to the keys themselves here, since
        # only group keys are projectable); dedup on ids, decode after
        acc = acc.select(*q.group_by).dropDuplicates()
        for v in post_decode:
            acc = decode_var(acc, v)
    # HAVING: post-aggregation filter; COUNT aliases compare numerically,
    # everything else (group keys, MIN/MAX/SAMPLE/GROUP_CONCAT results)
    # as strings. NULL aggregates fail every comparison (SPARQL unbound).
    count_aliases = {alias for fn, _, _, alias in q.aggregates if fn == "COUNT"}
    fnum_aliases = {alias for fn, _, _, alias in q.aggregates if fn in ("SUM", "AVG")}
    _OPS = {
        "=": lambda c, x: c == x,
        "!=": lambda c, x: c != x,
        ">": lambda c, x: c > x,
        ">=": lambda c, x: c >= x,
        "<": lambda c, x: c < x,
        "<=": lambda c, x: c <= x,
    }
    for hv, op, val in q.having:
        if hv in count_aliases:
            lit = F.lit(int(val))
        elif hv in fnum_aliases:
            lit = F.lit(float(val))
        else:
            lit = F.lit(val)
        acc = acc.filter(_OPS[op](F.col(hv), lit))
    out = acc.select(*q.variables)
    if q.distinct:
        out = out.dropDuplicates()
    if q.order_by:
        out = out.orderBy(*[F.col(n).desc() if d else F.col(n).asc() for n, d in q.order_by])
    if q.offset:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def decode_triples(triples: DataFrame, vocabs: dict[str, DataFrame]) -> DataFrame:
    """Id triples → surface forms: the read-side inverse of the
    dictionary-encode star join (operators/encode.py encode_mentions;
    reference scripts/map_dataset.py:61-83 only ever encodes — decode is
    what a human consumer of query results needs). Three id-keyed joins
    against the role vocabularies."""
    out = triples
    for role in _POS:
        voc = vocabs[role].select(
            F.col("id").alias(f"_id_{role}"), F.col("term").alias(f"{role}_term")
        )
        out = out.join(voc, out[role] == voc[f"_id_{role}"], "inner").drop(f"_id_{role}")
    return out.select("s_term", "p_term", "o_term")
