"""Variant (heterogeneous property) semantics against a Python oracle.

The oracle implements the reference's comparison spec directly:
same-type payloads compare by value with int/double cross-comparable
(src/value.h:58-60); cross-type `=` is false, `<>` true, and ordering
comparisons are null (DISJOINT, src/value.h:76-77,189-192); ORDER BY
uses the global type order string < bool < numeric with nulls last
(src/value.h:19-41). The graph side gets its variant column the
natural way — four labels with conflicting types for one property
name, merged by the unified scan."""

import pytest

VALUES = [
    (0, 5), (1, -3), (2, 0), (3, 7),              # ints
    (10, 2.5), (11, -0.5), (12, 6.5),             # floats
    (20, "abc"), (21, ""), (22, "5"), (23, "zz"),  # strings
    (30, True), (31, False),                       # bools
    (40, None),                                    # missing
]

LITERALS = [3, -1, 2.5, 7, "abc", "m", "", True, False]


def _is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _oracle_cmp(v, w, op):
    """Ternary comparison result: True/False/None."""
    if v is None or w is None:
        return None
    same = (_is_num(v) and _is_num(w)) or \
        (isinstance(v, str) and isinstance(w, str)) or \
        (isinstance(v, bool) and isinstance(w, bool))
    if op == "=":
        return (v == w) if same else False
    if op == "<>":
        return (v != w) if same else True
    if not same:
        return None  # DISJOINT → null
    return {"<": v < w, "<=": v <= w, ">": v > w, ">=": v >= w}[op]


def _rank(v):
    if isinstance(v, bool):
        return 2
    if isinstance(v, str):
        return 1
    return 3


@pytest.fixture()
def vgraph(spark):
    from redisgraph_spark import Graph
    ints = [(k, v) for k, v in VALUES if _is_num(v) and isinstance(v, int)]
    flts = [(k, v) for k, v in VALUES if isinstance(v, float)]
    strs = [(k, v) for k, v in VALUES if isinstance(v, str)]
    bls = [(k, v) for k, v in VALUES if isinstance(v, bool)]
    nulls = [(k,) for k, v in VALUES if v is None]
    nodes = {
        "I": spark.createDataFrame(ints, "_id long, v long"),
        "F": spark.createDataFrame(flts, "_id long, v double"),
        "S": spark.createDataFrame(strs, "_id long, v string"),
        "B": spark.createDataFrame(bls, "_id long, v boolean"),
        "N": spark.createDataFrame(nulls, "_id long"),
    }
    return Graph(spark, nodes, {})


def test_variant_comparisons_match_oracle(vgraph):
    """Every (value, literal, op) cell in one query per op."""
    vals = dict(VALUES)
    for op in ("=", "<>", "<", "<=", ">", ">="):
        items = []
        for j, lit in enumerate(LITERALS):
            cl = repr(lit) if not isinstance(lit, bool) else str(lit).lower()
            if isinstance(lit, str):
                cl = "'" + lit + "'"
            items.append(f"n.v {op} {cl} AS c{j}")
        got = vgraph.query(
            "MATCH (n) RETURN id(n) AS k, " + ", ".join(items)).collect()
        assert len(got) == len(VALUES)
        for row in got:
            v = vals[row["k"]]
            for j, lit in enumerate(LITERALS):
                want = _oracle_cmp(v, lit, op)
                assert row[f"c{j}"] == want, \
                    f"{v!r} {op} {lit!r}: got {row[f'c{j}']}, want {want}"


def test_variant_global_order(vgraph):
    vals = dict(VALUES)
    got = [r["k"] for r in vgraph.query(
        "MATCH (n) RETURN id(n) AS k ORDER BY n.v, id(n)").collect()]
    present = [(k, v) for k, v in VALUES if v is not None]
    want = [k for k, v in sorted(
        present,
        key=lambda kv: (_rank(kv[1]),
                        "" if not isinstance(kv[1], str) else kv[1],
                        kv[1] if isinstance(kv[1], bool) else False,
                        float(kv[1]) if _is_num(kv[1]) else 0.0,
                        kv[0]))]
    want += [k for k, v in VALUES if v is None]  # nulls last
    assert got == want


def test_variant_min_max_sum(vgraph):
    r = vgraph.query(
        "MATCH (n) RETURN min(n.v) AS mn, max(n.v) AS mx, "
        "sum(n.v) AS s, count(n.v) AS c").collect()[0]
    # min = first in global order = '' (empty string), max = largest
    # numeric = 7; sum over the numeric view only
    nums = [v for _, v in VALUES if _is_num(v)]
    assert r["mn"] == ""
    assert r["mx"] == "7"
    assert r["s"] == pytest.approx(sum(nums))
    assert r["c"] == len([v for _, v in VALUES if v is not None])


# ---------------------------------------------------------- array payloads

@pytest.fixture()
def vagraph(spark):
    """Labels whose shared property mixes scalars with array-of-scalar
    payloads — merged scan encodes a variant with an array payload
    (SI_VALID_PROPERTY_VALUE includes T_ARRAY, src/value.h:54)."""
    from redisgraph_spark import Graph
    nodes = {
        "I": spark.createDataFrame([(0, 5), (1, -3)], "_id long, v long"),
        "S": spark.createDataFrame([(20, "abc")], "_id long, v string"),
        "AL": spark.createDataFrame(
            [(50, [1, 2]), (51, [])], "_id long, v array<long>"),
        "AS2": spark.createDataFrame(
            [(60, ["x", "y"])], "_id long, v array<string>"),
        "AD": spark.createDataFrame(
            [(70, [1.0, 2.0]), (71, [9.5])], "_id long, v array<double>"),
    }
    return Graph(spark, nodes, {})


def test_array_variant_equality_and_order(vagraph):
    # plain-array literal vs variant array payload: elementwise, with
    # int/double cross-comparable (src/value.h:58-60)
    rows = vagraph.query(
        "MATCH (n) WHERE n.v = [1, 2] RETURN id(n) AS k ORDER BY k"
    ).collect()
    assert [r["k"] for r in rows] == [50, 70]
    # cross-type: array vs scalar is DISJOINT -> '=' false
    rows = vagraph.query(
        "MATCH (n) WHERE n.v = 5 RETURN id(n) AS k").collect()
    assert [r["k"] for r in rows] == [0]
    # global order: arrays sort before strings before numerics
    # (SIType enum order, src/value.h:22-41); within arrays, elements
    # compare elementwise with disjoint elements ordered by type delta
    # (src/value.c:553) — so string elements precede numeric ones
    got = [r["k"] for r in vagraph.query(
        "MATCH (n) RETURN id(n) AS k ORDER BY n.v, id(n)").collect()]
    assert got == [51, 60, 50, 70, 71, 20, 1, 0]


def test_array_variant_concat_size_subscript(vagraph):
    # '+' with an array payload concatenates/appends (SIValue_ConcatList,
    # src/value.c:380-410); render shape is '[e1, e2]'
    r = vagraph.query(
        "MATCH (n) WHERE id(n) = 50 "
        "RETURN n.v + [3] AS cat, n.v + 7 AS app, "
        "size(n.v) AS sz, n.v[0] AS h, n.v[-1] AS t").collect()[0]
    assert r["cat"] == "[1, 2, 3]"
    assert r["app"] == "[1, 2, 7]"
    assert r["sz"] == 2
    assert r["h"] == "1"
    assert r["t"] == "2"
    # scalar rows: size/subscript of a non-array payload -> null
    r = vagraph.query(
        "MATCH (n) WHERE id(n) = 0 "
        "RETURN size(n.v) AS sz, n.v[0] AS h").collect()[0]
    assert r["sz"] is None and r["h"] is None


def test_array_variant_min_max(vagraph):
    r = vagraph.query(
        "MATCH (n) RETURN min(n.v) AS mn, max(n.v) AS mx, "
        "sum(n.v) AS s").collect()[0]
    assert r["mn"] == "[]"      # empty array is globally first
    assert r["mx"] == "5"       # largest numeric
    assert r["s"] == pytest.approx(2.0)  # numeric view: 5 + (-3)


def test_variant_array_equality_is_ternary(spark):
    """Mixed-type (variant-encoded) list equality follows openCypher
    ternary semantics like plain lists: a definitely-unequal pair or a
    length mismatch is false, a null-involving pair is null, disjoint
    element types are definitively unequal (AR_EQ,
    boolean_funcs.c:143-163)."""
    from redisgraph_spark import Graph
    g = Graph(spark, {}, {})
    cases = [
        ("[1, 'a'] = [1, 'a']", True),
        ("[1, 'a'] = [1, 'b']", False),
        ("[1, 'a'] = [1, null]", None),
        ("[1, 'a'] = [2, null]", False),
        ("[1, 'a'] <> [1, null]", None),
        ("[1, 'a'] = [1, 'a', 3]", False),
        ("[1, 'a'] = [1, true]", False),
        ("[1, 'a'] >= [1, null]", None),
    ]
    q = "RETURN " + ", ".join(
        f"{expr} AS c{i}" for i, (expr, _) in enumerate(cases))
    row = g.query(q).collect()[0]
    for i, (expr, want) in enumerate(cases):
        assert row[f"c{i}"] == want or (
            row[f"c{i}"] is None and want is None), (expr, row[f"c{i}"])


def test_variant_property_equals_het_list_literal(spark):
    """A variant property holding a mixed-type list compares equal to
    the same heterogeneous list literal; a scalar-holding variant is
    <> it (cross-type, definitively unequal)."""
    from redisgraph_spark import Graph
    g = Graph(spark, {}, {})
    g.query("CREATE (:V {k: 0}), (:V {k: 1})")
    g.query("MATCH (v:V {k: 0}) SET v.tag = [1, 'a']")
    g.query("MATCH (v:V {k: 1}) SET v.tag = 7")
    eq = g.query("MATCH (v:V) WHERE v.tag = [1, 'a'] "
                 "RETURN v.k AS k").collect()
    assert [r["k"] for r in eq] == [0]
    ne = g.query("MATCH (v:V) WHERE v.tag <> [1, 'a'] "
                 "RETURN v.k AS k").collect()
    assert [r["k"] for r in ne] == [1]


def test_unary_minus_on_variant_and_string(spark):
    """-variant negates numeric payloads tag-preserving, nulls others;
    statically-string unary minus is a clean compile error."""
    import pytest as _pt

    from redisgraph_spark import Graph
    g = Graph(spark, {}, {})
    g.query("CREATE (:T {v: 5}), (:T {v: 2.5}), (:T {v: 'x'})")
    got = {str(r["v"]): r["neg"] for r in g.query(
        "MATCH (t:T) RETURN t.v AS v, -t.v AS neg").collect()}
    # mixed-numeric CREATE widens 5 -> 5.0 before variant encoding;
    # RETURN renders variant results as strings
    assert got.get("5", got.get("5.0")) in ("-5.0", "-5")
    assert got["2.5"] == "-2.5"
    assert got["x"] is None
    with _pt.raises(Exception, match="(?i)type mismatch"):
        g.query("MATCH (t:T) RETURN -toString(t.v)")
