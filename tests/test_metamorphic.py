"""Metamorphic checks (the reference's reversepattern trick,
tests/flow/reversepattern/): a pattern and its mirror must return
identical results; equivalent formulations must agree."""

import pytest

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


@pytest.mark.slow
def test_ternary_partition_law_fuzzed(social):
    """For ANY predicate P: rows(P) + rows(NOT P) + rows(P IS NULL)
    = all rows — the three-valued-logic partition. Fuzzed over
    predicate soup; parse/compile rejections are skipped, every
    predicate that PLANS must obey the law."""
    import random
    random.seed(99)
    total = social.query(
        "MATCH (p:person) RETURN count(*) AS n").collect()[0]["n"]
    nums = ["p.age", "30", "NULL", "p.age % 7", "p.age - 30",
            "coalesce(p.age, 0)", "size(p.name)"]
    strs = ["p.name", "'Roi'", "toupper(p.name)", "NULL"]
    cmps = ["=", "<>", "<", ">", "<=", ">="]

    def atom():
        if random.random() < 0.5:
            return f"{random.choice(nums)} {random.choice(cmps)} "                    f"{random.choice(nums)}"
        ss = random.choice(strs)
        if random.random() < 0.3:
            return f"{ss} CONTAINS {random.choice(strs)}"
        return f"{ss} {random.choice(cmps)} {random.choice(strs)}"

    def predgen(depth=0):
        r = random.random()
        if depth < 2 and r < 0.35:
            op = random.choice(["AND", "OR", "XOR"])
            return f"({predgen(depth + 1)}) {op} ({predgen(depth + 1)})"
        if depth < 2 and r < 0.45:
            return f"NOT ({predgen(depth + 1)})"
        if r < 0.55:
            return f"{random.choice(nums)} IN [30, 32, NULL]"
        return atom()

    checked = 0
    for _ in range(400):
        if checked >= 25:
            break
        pred = predgen()
        counts = []
        for wrapped in (f"({pred})", f"NOT ({pred})",
                        f"({pred}) IS NULL"):
            try:
                n = social.query(
                    f"MATCH (p:person) WHERE {wrapped} "
                    f"RETURN count(*) AS n").collect()[0]["n"]
            except Exception:
                counts = None
                break
            counts.append(n)
        if counts is None:
            continue
        checked += 1
        assert sum(counts) == total, (pred, counts, total)
    assert checked >= 10


@pytest.mark.slow
def test_cascade_equals_prefix_union_random_graphs(spark):
    """The single-cascade bounded var-len plan (absorbing stop-states)
    must return EXACTLY the prefix-union plan's multiset of rows on
    random graphs (self-loops, multi-edges, unreachable nodes) for
    every (min,max) shape. The fallback is forced by stubbing the
    stop-table builder to None — the cascade then declines."""
    import random

    from redisgraph_spark import Graph
    from redisgraph_spark.algorithms import traversal as TRAV

    rng = random.Random(7)
    n = 8
    for trial in range(3):
        nodes = spark.createDataFrame(
            [(i, f"n{i}") for i in range(n)], ["_id", "name"])
        edges = spark.createDataFrame(
            [(100 + i, rng.randrange(n), rng.randrange(n))
             for i in range(14)], ["_id", "_src", "_dst"])
        for mn, mx in ((0, 2), (1, 2), (1, 3), (2, 2), (0, 3), (0, 0)):
            q = (f"MATCH (a)-[*{mn}..{mx}]->(b) "
                 "RETURN a.name AS a, b.name AS b")
            got = sorted(map(tuple, Graph(
                spark, {"N": nodes}, {"R": edges}).query(q).collect()))
            orig = TRAV._stop_augmented
            TRAV._stop_augmented = lambda *a, **k: None
            try:
                exp = sorted(map(tuple, Graph(
                    spark, {"N": nodes}, {"R": edges}).query(q).collect()))
            finally:
                TRAV._stop_augmented = orig
            assert got == exp, (trial, mn, mx)


def test_minhash_pairs_invariant_to_row_order(spark):
    """Metamorphic: LSH candidate pairs are a set property of the
    corpus — shuffling row order and repartitioning must not change
    them."""
    from pyspark.sql import functions as F
    from redisgraph_spark.pipeline.dedup import minhash_lsh_pairs
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    docs = spark.createDataFrame(
        [(i, base + ("" if i % 3 else " tail")) for i in range(15)],
        ["doc_id", "text"])
    a = {(r["doc_a"], r["doc_b"])
         for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    shuffled = docs.orderBy(F.rand(seed=7)).repartition(13)
    b = {(r["doc_a"], r["doc_b"])
         for r in minhash_lsh_pairs(shuffled, threshold=0.5).collect()}
    assert a == b and len(a) > 0


def test_dedup_clusters_invariant_to_pair_orientation(spark):
    """Metamorphic: connected components must not depend on the
    orientation or order of the candidate pairs."""
    from pyspark.sql import functions as F
    from redisgraph_spark.pipeline.dedup import dedup_clusters
    docs = spark.createDataFrame([(i, 0) for i in range(10)],
                                 ["doc_id", "x"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (6, 7)], ["doc_a", "doc_b"])
    flipped = pairs.select(F.col("doc_b").alias("doc_a"),
                           F.col("doc_a").alias("doc_b")) \
        .orderBy(F.rand(seed=3))
    a = sorted(map(tuple, dedup_clusters(docs, pairs).collect()))
    b = sorted(map(tuple, dedup_clusters(docs, flipped).collect()))
    assert a == b
    # star solver agrees with propagation on the same input
    c = sorted(map(tuple,
                   dedup_clusters(docs, pairs, star_threshold=0)
                   .collect()))
    assert a == c


def test_temperature_alpha_one_equals_flat_sample(spark):
    """Metamorphic: alpha=1 removes the re-weighting — every stratum
    gets the identical cut, equal to base_rate exactly."""
    from redisgraph_spark.pipeline.sampling import (hash_sample,
                                                    temperature_sample)
    rows = [(i, "en" if i % 10 else "fr") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    t = temperature_sample(df, "doc_id", "lang", alpha=1.0,
                           base_rate=0.25, seed="s0")
    cuts = {r["cut"] for r in t.collect()}
    assert cuts == {int(0.25 * 65536)}
    flat = hash_sample(df, "doc_id", {}, "lang", default_rate=0.25,
                       seed="s0")
    assert {r["doc_id"] for r in t.collect()} == \
        {r["doc_id"] for r in flat.collect()}
