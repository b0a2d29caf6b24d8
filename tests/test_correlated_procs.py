"""Correlated CALL vectorization (VERDICT r8 #2) and custom
table-valued procedures (Graph.register_procedure, the reference's
Proc_Register analog — src/procedures/procedure.h).

The per-row-source procedures must run as ONE keyed multi-source job
(algo.BFS/algo.SSSP precedent), never the driver distinct-tuple loop;
per-row personalized pageRank is a STATIC PlanError naming the
vectorized alternative."""

import pytest

from redisgraph_spark import Graph


@pytest.fixture(scope="module")
def chain_graph(spark):
    g = Graph(spark, {}, {})
    g.query("CREATE (a:P {k:1}),(b:P {k:2}),(c:P {k:3}),(d:P {k:4}), "
            "(a)-[:R]->(b),(b)-[:R]->(c),(c)-[:R]->(d),(a)-[:R]->(c)")
    return g


def test_correlated_closeness_vectorized(chain_graph):
    rows = chain_graph.query(
        "MATCH (n:P) CALL algo.closeness(n) YIELD reached, closeness "
        "RETURN n.k AS k, reached, closeness ORDER BY k").collect()
    got = [(r.k, r.reached, r.closeness) for r in rows]
    # a→{b,c,d} dist 1,1,2 → closeness 3/4; b→{c,d}; c→{d}; d→{}
    assert got == [(1, 3, 0.75), (2, 2, 0.666667), (3, 1, 1.0),
                   (4, 0, 0.0)]


def test_correlated_closeness_no_driver_loop(chain_graph, monkeypatch):
    """The vectorized branch must claim these calls — the generic
    distinct-tuple loop would raise through this poisoned hook."""
    import redisgraph_spark.planner.planner as P

    def boom(self, ctx, clause):  # pragma: no cover
        raise AssertionError("correlated driver loop used")

    monkeypatch.setattr(P.CypherPlanner, "_correlated_call", boom)
    rows = chain_graph.query(
        "MATCH (n:P) WHERE n.k <= 2 CALL algo.closeness(n) "
        "YIELD reached RETURN sum(reached) AS s").collect()
    assert rows[0].s == 5


def test_correlated_randomwalk(chain_graph):
    rows = chain_graph.query(
        "MATCH (n:P) CALL algo.randomWalk(n, 3) YIELD walk, step, node "
        "RETURN n.k AS k, step, node ORDER BY k, step").collect()
    # every node starts exactly one walk; step 0 is the start itself
    by_k = {}
    for r in rows:
        by_k.setdefault(r.k, []).append((r.step, r.node))
    assert set(by_k) == {1, 2, 3, 4}
    for k, steps in by_k.items():
        assert steps[0][0] == 0
        assert [s for s, _ in steps] == list(range(len(steps)))
    # d (k=4) is a sink: its walk is just the start node
    assert len(by_k[4]) == 1
    # determinism: same seed → same walks
    again = chain_graph.query(
        "MATCH (n:P) CALL algo.randomWalk(n, 3) YIELD walk, step, node "
        "RETURN n.k AS k, step, node ORDER BY k, step").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_correlated_pagerank_static_error(chain_graph):
    with pytest.raises(Exception) as ei:
        chain_graph.query(
            "MATCH (n:P) CALL algo.pageRank(5, 0.85, n) "
            "YIELD node, score RETURN score")
    msg = str(ei.value)
    assert "per-row bound sources" in msg
    assert "algo.SSSP" in msg      # names the vectorized alternatives


# ------------------------------------------------- custom procedures

@pytest.fixture(scope="module")
def proc_graph(spark):
    g = Graph(spark, {}, {})
    g.query("CREATE (:A {name: 'a'}), (:B {name: 'b'})")
    g.register_procedure(
        "test.my.proc",
        [("name", "STRING?"), ("id", "INTEGER?")],
        [("city", "STRING?"), ("country_code", "INTEGER?")],
        [("Andres", 1, "Malmö", 46), ("Tobias", 1, "Malmö", 46),
         ("Stefan", 1, "Berlin", 49), ("Stefan", 2, "York", 44)])
    g.register_procedure("test.labels", [],
                         [("label", "STRING?")],
                         [("A",), ("B",), ("C",)])
    g.register_procedure("test.doNothing", [], [], [])
    return g


def test_custom_proc_standalone(proc_graph):
    rows = proc_graph.query("CALL test.my.proc('Stefan', 1)").collect()
    assert [tuple(r) for r in rows] == [("Berlin", 49)]


def test_custom_proc_in_query(proc_graph):
    rows = proc_graph.query(
        "CALL test.labels() YIELD label RETURN label ORDER BY label"
    ).collect()
    assert [r.label for r in rows] == ["A", "B", "C"]


def test_custom_proc_implicit_args(proc_graph):
    rows = proc_graph.query("CALL test.my.proc",
                            {"name": "Stefan", "id": 1}).collect()
    assert [tuple(r) for r in rows] == [("Berlin", 49)]


def test_custom_proc_arg_validation(proc_graph):
    with pytest.raises(Exception, match="InvalidNumberOfArguments"):
        proc_graph.query("CALL test.my.proc('Dobby')")
    with pytest.raises(Exception, match="InvalidArgumentType"):
        proc_graph.query("CALL test.my.proc(true, 1)")
    with pytest.raises(Exception, match="YIELD"):
        proc_graph.query(
            "MATCH (n) CALL test.my.proc('Stefan', 1) RETURN n")
    with pytest.raises(Exception, match="already declared"):
        proc_graph.query(
            "WITH 'Hi' AS label CALL test.labels() YIELD label "
            "RETURN *")


def test_custom_proc_yields_nothing(proc_graph):
    assert proc_graph.query("CALL test.doNothing()").collect() == []
    rows = proc_graph.query(
        "MATCH (n) CALL test.doNothing() RETURN n.name AS name "
        "ORDER BY name").collect()
    assert [r.name for r in rows] == ["a", "b"]


def test_custom_proc_float_coercion(proc_graph):
    proc_graph.register_procedure(
        "test.num", [("in", "FLOAT?")], [("out", "STRING?")],
        [(42.0, "close enough")])
    rows = proc_graph.query("CALL test.num(42)").collect()
    assert [r.out for r in rows] == ["close enough"]
