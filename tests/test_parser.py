"""Parser unit tests — grammar scope per the reference whitelist
(src/ast/cypher_whitelist.c:25-140)."""

import pytest

from redisgraph_spark.cypher import ast as A
from redisgraph_spark.cypher.parser import parse


def single(q):
    out = parse(q)
    assert len(out.parts) == 1
    return out.parts[0]


def test_match_return():
    q = single("MATCH (a:L)-[:R]->(b) RETURN a, b.x AS bx")
    m, r = q.clauses
    assert isinstance(m, A.MatchClause) and not m.optional
    path = m.paths[0]
    assert path.elements[0].labels == ["L"]
    assert path.elements[1].types == ["R"]
    assert path.elements[1].direction == "out"
    assert isinstance(r, A.ReturnClause)
    assert r.items[1].alias == "bx"


def test_keyword_case_preserved_in_labels():
    q = single("MATCH (o:Order)-[:Contains]->(p) RETURN o")
    assert q.clauses[0].paths[0].elements[0].labels == ["Order"]
    assert q.clauses[0].paths[0].elements[1].types == ["Contains"]


def test_directions():
    q = single("MATCH (a)<-[:R]-(b)--(c)-->(d) RETURN a")
    els = q.clauses[0].paths[0].elements
    assert els[1].direction == "in"
    assert els[3].direction == "both"
    assert els[5].direction == "out"


def test_var_len():
    q = single("MATCH (a)-[e:R*2..4]->(b) RETURN a")
    rel = q.clauses[0].paths[0].elements[1]
    assert rel.min_hops == 2 and rel.max_hops == 4 and rel.var == "e"
    q2 = single("MATCH (a)-[*]->(b) RETURN a")
    rel2 = q2.clauses[0].paths[0].elements[1]
    assert rel2.min_hops == 1 and rel2.max_hops is None


def test_rel_alternation():
    q = single("MATCH (a)-[:R1|R2|:R3]->(b) RETURN a")
    assert q.clauses[0].paths[0].elements[1].types == ["R1", "R2", "R3"]


def test_where_precedence():
    q = single("MATCH (a) WHERE a.x = 1 OR a.y = 2 AND a.z = 3 RETURN a")
    w = q.clauses[0].where
    assert isinstance(w, A.Binary) and w.op == "OR"
    assert isinstance(w.right, A.Binary) and w.right.op == "AND"


def test_chained_comparison():
    q = single("MATCH (a) WHERE 1 < a.x <= 5 RETURN a")
    w = q.clauses[0].where
    assert isinstance(w, A.Comparison) and len(w.rest) == 2


def test_pattern_predicate_vs_paren_expr():
    q = single("MATCH (a) WHERE (a)-[:R]->(:B) RETURN a")
    assert isinstance(q.clauses[0].where, A.PatternPredicate)
    q2 = single("MATCH (a) WHERE (a.x + 1) > 2 RETURN a")
    assert not isinstance(q2.clauses[0].where, A.PatternPredicate)


def test_shortest_path_with_path_var():
    q = single("MATCH p = shortestPath((a:X)-[*..5]->(b:Y)) RETURN length(p)")
    path = q.clauses[0].paths[0]
    assert path.var == "p" and path.shortest == "single"


def test_case_forms():
    q = single("RETURN CASE WHEN 1=1 THEN 'a' ELSE 'b' END AS x, "
               "CASE 2 WHEN 1 THEN 'one' WHEN 2 THEN 'two' END AS y")
    x, y = q.clauses[0].items
    assert x.expr.test is None
    assert y.expr.test is not None and len(y.expr.whens) == 2


def test_list_comprehension_and_quantifiers():
    q = single("RETURN [x IN [1,2] WHERE x > 1 | x * 2] AS a, "
               "any(y IN [1] WHERE y = 1) AS b, "
               "reduce(s = 0, z IN [1,2] | s + z) AS c")
    a, b, c = (i.expr for i in q.clauses[0].items)
    assert isinstance(a, A.ListComprehension) and a.projection is not None
    assert isinstance(b, A.Quantifier) and b.kind == "any"
    assert isinstance(c, A.Reduce)


def test_keyword_named_variables():
    """Keywords are legal identifiers in comprehension-variable and
    named-path positions too, while literal keywords still start
    membership tests."""
    q = single("RETURN [end IN [1,2] | end + 1] AS a, "
               "null IN [1, null] AS b")
    a, b = (i.expr for i in q.clauses[0].items)
    assert isinstance(a, A.ListComprehension) and a.var == "end"
    assert not isinstance(b, A.ListComprehension)
    q2 = single("MATCH order = (a)-[:R]->(b) RETURN order")
    assert q2.clauses[0].paths[0].var == "order"


def test_union():
    out = parse("RETURN 1 AS x UNION RETURN 2 AS x UNION ALL RETURN 3 AS x")
    assert len(out.parts) == 3
    assert out.union_all == [False, True]


def test_merge_on_clauses():
    q = single("MERGE (a:L {k: 1}) ON CREATE SET a.c = 1 "
               "ON MATCH SET a.m = 2")
    m = q.clauses[0]
    assert isinstance(m, A.MergeClause)
    assert len(m.on_create) == 1 and len(m.on_match) == 1


def test_call_yield():
    q = single("CALL db.labels() YIELD label AS l RETURN l")
    c = q.clauses[0]
    assert c.proc == "db.labels" and c.yields == [("label", "l")]


def test_params_and_literals():
    q = single("RETURN $p AS a, 1.5e2 AS b, 'it\\'s' AS c, "
               "true AS d, null AS e, [1, 'x'] AS f, {k: 1} AS g")
    items = [i.expr for i in q.clauses[0].items]
    assert isinstance(items[0], A.Parameter) and items[0].name == "p"
    assert items[1].value == 150.0
    assert items[2].value == "it's"
    assert items[4].value is None


def test_string_operators():
    q = single("MATCH (a) WHERE a.s STARTS WITH 'x' AND a.s ENDS WITH 'y' "
               "AND a.s CONTAINS 'z' AND a.s =~ '.*' RETURN a")
    assert q.clauses[0].where is not None


def test_syntax_errors():
    for bad in ["MATCH (a", "RETURN", "MATCH (a) RETURN a ORDER",
                "MATCH (a)-->", "FOO BAR"]:
        with pytest.raises(SyntaxError):
            parse(bad)


def test_with_where_skip_limit():
    q = single("MATCH (a) WITH a.x AS x ORDER BY x DESC SKIP 1 LIMIT 2 "
               "WHERE x > 0 RETURN x")
    w = q.clauses[1]
    assert isinstance(w, A.WithClause)
    assert w.where is not None and not w.order_by[0].ascending


def test_block_comment_tokenizes():
    from redisgraph_spark.cypher.parser import parse
    q = parse("MATCH (n) /* a\n block */ RETURN /* x */ n // tail")
    assert q is not None


def test_parser_fuzz_no_internal_errors():
    """Arbitrary input must parse or raise SyntaxError/ValueError —
    never an internal IndexError/KeyError/AttributeError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from redisgraph_spark.cypher.parser import parse

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def check(q):
        try:
            parse(q)
        except (SyntaxError, ValueError):
            pass

    check()


def test_parser_fuzz_cypherish():
    """Fuzz with Cypher-shaped token soup (keywords, symbols) to reach
    deeper parser states than raw unicode does."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from redisgraph_spark.cypher.parser import parse

    toks = st.sampled_from(
        ["MATCH", "RETURN", "WHERE", "WITH", "CREATE", "MERGE", "SET",
         "DELETE", "UNWIND", "CALL", "(", ")", "[", "]", "{", "}",
         "-", "->", "<-", ":", ",", "*", "..", "a", "b", "n", "Person",
         "KNOWS", "1", "1.5", "'x'", "=", ">", "<", "+", "|", "AS",
         "ORDER", "BY", "LIMIT", "SKIP", "DISTINCT", "OPTIONAL", "$p",
         ".", "count", "collect", "NULL", "true"])

    @given(st.lists(toks, max_size=14))
    @settings(max_examples=400, deadline=None)
    def check(parts):
        try:
            parse(" ".join(parts))
        except (SyntaxError, ValueError):
            pass

    check()
