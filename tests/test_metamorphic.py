"""Metamorphic checks (the reference's reversepattern trick,
tests/flow/reversepattern/): a pattern and its mirror must return
identical results; equivalent formulations must agree."""

from tests.conftest import rows


def test_reversed_single_hop(graph):
    a = rows(graph.query(
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "RETURN c.c_custkey AS c, o.o_orderkey AS o"))
    b = rows(graph.query(
        "MATCH (o:Order)<-[:PLACED]-(c:Customer) "
        "RETURN c.c_custkey AS c, o.o_orderkey AS o"))
    assert a == b


def test_reversed_two_hop(graph):
    a = rows(graph.query(
        "MATCH (c:Customer)-[:IN_NATION]->(n:Nation)-[:IN_REGION]->"
        "(r:Region) RETURN c.c_custkey AS c, r.r_regionkey AS r"))
    b = rows(graph.query(
        "MATCH (r:Region)<-[:IN_REGION]-(n:Nation)<-[:IN_NATION]-"
        "(c:Customer) RETURN c.c_custkey AS c, r.r_regionkey AS r"))
    assert a == b


def test_undirected_equals_both_directions(social):
    und = rows(social.query(
        "MATCH (a:person {name: 'Alon'})-[:friend]-(b) "
        "RETURN b.name AS n"))
    expl = rows(social.query(
        "MATCH (a:person {name: 'Alon'})-[:friend]->(b) RETURN b.name AS n "
        "UNION ALL "
        "MATCH (a:person {name: 'Alon'})<-[:friend]-(b) "
        "RETURN b.name AS n"))
    assert und == expl


def test_pattern_predicate_equals_semi_join_formulation(graph):
    a = rows(graph.query(
        "MATCH (p:Part) WHERE (p)<-[:CONTAINS]-() "
        "RETURN p.p_partkey AS k"))
    b = rows(graph.query(
        "MATCH (o:Order)-[:CONTAINS]->(p:Part) "
        "RETURN DISTINCT p.p_partkey AS k"))
    assert a == b


def test_var_len_one_equals_single_hop(social):
    a = rows(social.query(
        "MATCH (x:person {name: 'Roi'})-[:friend*1..1]->(f) "
        "RETURN f.name AS n"))
    b = rows(social.query(
        "MATCH (x:person {name: 'Roi'})-[:friend]->(f) "
        "RETURN f.name AS n"))
    assert a == b


def test_count_star_equals_count_rows(graph):
    a = graph.query("MATCH (c:Customer)-[:PLACED]->(o:Order) "
                    "RETURN count(*) AS n").collect()[0]["n"]
    b = len(graph.query("MATCH (c:Customer)-[:PLACED]->(o:Order) "
                        "RETURN c, o").collect())
    assert a == b


def test_map_projection_matches_properties(social):
    got = rows(social.query(
        "MATCH (p:person {name: 'Roi'}) "
        "RETURN p {.name, .age, flag: p.age > 30} AS m"))
    assert got[0][0].asDict() == {"name": "Roi", "age": 32, "flag": True}


def test_rel_endpoint_hints_preserve_results(spark):
    """Scan elision driven by rel-endpoint label hints must be
    invisible: the same queries on a hinted and an unhinted graph
    return identical results."""
    from redisgraph_spark import Graph
    sf = "/root/testdata/sf0.001"
    hinted = Graph.from_tpch(spark, sf)
    plain = Graph.from_tpch(spark, sf)
    plain.rel_endpoints = None
    queries = [
        # labeled, unreferenced endpoints (elision candidates)
        "MATCH (:Customer)-[:IN_NATION]->(n:Nation) "
        "RETURN n.n_name AS nm, count(*) AS c ORDER BY nm",
        "MATCH (c:Customer)-[:PLACED]->(:Order) RETURN count(c) AS c",
        "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN r.r_name AS nm, count(n) AS c ORDER BY nm",
        # mixed-label source side of IN_NATION (both labels possible —
        # NOT elidable when filtered to one)
        "MATCH (s:Supplier)-[:IN_NATION]->(:Nation) RETURN count(s) AS c",
        "MATCH (x)-[:IN_NATION]->(:Nation) RETURN count(x) AS c",
    ]
    for q in queries:
        assert rows(hinted.query(q)) == rows(plain.query(q)), q
