"""Differential expression testing against DuckDB (the reference's
fuzz-testing strategy, tests/fuzz/, done deterministically): generate
seeded random *well-typed* scalar expressions, evaluate all of them in
ONE query on each engine, compare value-by-value."""

import math
import random

import duckdb
import pytest

_NUMS = ["0", "1", "2", "7", "-3", "2.5", "-0.5", "10"]
_STRS = ["'abc'", "'Hello World'", "''", "'xyz'"]


def _num(rng: random.Random, depth: int = 0) -> str:
    if depth > 2 or rng.random() < 0.35:
        return rng.choice(_NUMS)
    k = rng.randrange(9)
    if k == 0:
        op = rng.choice(["+", "-", "*"])
        return f"({_num(rng, depth + 1)} {op} {_num(rng, depth + 1)})"
    if k == 1:
        return f"abs({_num(rng, depth + 1)})"
    if k == 2:
        return f"({_num(rng, depth + 1)} % 7)"
    if k == 3:
        return f"coalesce(null, {_num(rng, depth + 1)})"
    if k == 4:
        return f"size({_str(rng, depth + 1)})"
    if k == 5:
        return f"sign({_num(rng, depth + 1)})"
    if k == 6:
        return rng.choice(["ceil", "floor"]) \
            + f"({_num(rng, depth + 1)})"
    if k == 7:
        return f"sqrt(abs({_num(rng, depth + 1)}))"
    return (f"(CASE WHEN {_bool(rng, depth + 1)} THEN "
            f"{_num(rng, depth + 1)} ELSE {_num(rng, depth + 1)} END)")


def _str(rng: random.Random, depth: int = 0) -> str:
    if depth > 2 or rng.random() < 0.4:
        return rng.choice(_STRS)
    k = rng.randrange(9)
    inner = _str(rng, depth + 1)
    if k == 0:
        return f"toupper({inner})"
    if k == 1:
        return f"tolower({inner})"
    if k == 2:
        return f"reverse({inner})"
    if k == 3:
        return f"trim({inner})"
    if k == 4:
        return f"left({inner}, 2)"
    if k == 5:
        return f"right({inner}, 2)"
    if k == 6:
        return rng.choice(["ltrim", "rtrim"]) + f"({inner})"
    if k == 7:
        return f"replace({inner}, 'l', 'x')"
    return (f"(CASE WHEN {_bool(rng, depth + 1)} THEN {inner} "
            f"ELSE {_str(rng, depth + 1)} END)")


def _bool(rng: random.Random, depth: int = 0) -> str:
    if depth > 2 or rng.random() < 0.4:
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"({rng.choice(_NUMS)} {op} {rng.choice(_NUMS)})"
    k = rng.randrange(4)
    if k == 0:
        return f"({_bool(rng, depth + 1)} AND {_bool(rng, depth + 1)})"
    if k == 1:
        return f"({_bool(rng, depth + 1)} OR {_bool(rng, depth + 1)})"
    if k == 2:
        return f"(NOT {_bool(rng, depth + 1)})"
    op = rng.choice(["=", "<>"])
    return f"({_str(rng, depth + 1)} {op} {_str(rng, depth + 1)})"


def _gen(rng: random.Random) -> str:
    return rng.choice([_num, _str, _bool])(rng)


_DUCK_MAP = [
    ("toupper(", "upper("), ("tolower(", "lower("),
    ("size(", "length("),
]


def _to_duck(e: str) -> str:
    for a, b in _DUCK_MAP:
        e = e.replace(a, b)
    return e


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6])
def test_random_expressions_match_duckdb(spark, seed):
    from redisgraph_spark import Graph
    rng = random.Random(seed)
    exprs = [_gen(rng) for _ in range(50)]
    cypher = "RETURN " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs))
    sql = "SELECT " + ", ".join(
        f"{_to_duck(e)} AS c{i}" for i, e in enumerate(exprs))
    g = Graph(spark, {}, {})
    srow = g.query(cypher).collect()[0]
    drow = duckdb.sql(sql).fetchall()[0]
    for i, (sv, dv) in enumerate(zip(srow, drow)):
        if isinstance(sv, float) or isinstance(dv, float):
            if sv is None or dv is None:
                assert sv == dv, f"c{i}: {exprs[i]} -> {sv} vs {dv}"
            else:
                assert math.isclose(float(sv), float(dv),
                                    rel_tol=1e-9, abs_tol=1e-12), \
                    f"c{i}: {exprs[i]} -> {sv} vs {dv}"
        else:
            assert sv == dv, f"c{i}: {exprs[i]} -> {sv} vs {dv}"


# ---------------------------------------------------------------- lists
# List semantics battery with a PYTHON oracle: the generator builds each
# expression together with its expected value, so no SQL translation
# layer can drift from the spec (Cypher 0-based subscripts with negative
# wrap, end-exclusive slices, inclusive range()).

_BASE_LISTS = [[1, 2, 3], [7], [-3, 0, 5, 9], [2, 4, 6, 8, 10]]


def _gen_list(rng: random.Random, depth: int = 0):
    """Returns (cypher_text, python_list)."""
    if depth > 1 or rng.random() < 0.4:
        v = rng.choice(_BASE_LISTS)
        return "[" + ", ".join(map(str, v)) + "]", list(v)
    k = rng.randrange(4)
    if k == 0:
        t, v = _gen_list(rng, depth + 1)
        return f"tail({t})", v[1:]
    if k == 1:
        t1, v1 = _gen_list(rng, depth + 1)
        t2, v2 = _gen_list(rng, depth + 1)
        return f"({t1} + {t2})", v1 + v2
    if k == 2:
        a, b = rng.randrange(0, 3), rng.randrange(3, 7)
        return f"range({a}, {b})", list(range(a, b + 1))  # inclusive
    t, v = _gen_list(rng, depth + 1)
    return f"sort({t})", sorted(v)


def _gen_list_scalar(rng: random.Random):
    """Returns (cypher_text, expected_python_value)."""
    t, v = _gen_list(rng)
    k = rng.randrange(7)
    if k == 0:
        return f"size({t})", len(v)
    if k == 1:
        return f"head({t})", v[0] if v else None
    if k == 2:
        return f"last({t})", v[-1] if v else None
    if k == 3:
        i = rng.randrange(-2, 3)
        inb = -len(v) <= i < len(v)
        return f"({t})[{i}]", v[i] if inb else None
    if k == 4:
        return f"size(({t})[1..3])", len(v[1:3])  # end-exclusive
    if k == 5:
        return f"reduce(acc = 0, x IN {t} | acc + x)", sum(v)
    return f"size([x IN {t} WHERE x > 2])", len([x for x in v if x > 2])


@pytest.mark.parametrize("seed", [7, 8])
def test_list_expressions_match_python_oracle(spark, seed):
    rng = random.Random(seed)
    gens = [_gen_list_scalar(rng) for _ in range(40)]
    from redisgraph_spark import Graph
    g = Graph(spark, {}, {})
    cypher = "RETURN " + ", ".join(
        f"{t} AS c{i}" for i, (t, _) in enumerate(gens))
    srow = g.query(cypher).collect()[0]
    for i, (t, want) in enumerate(gens):
        got = srow[f"c{i}"]
        assert got == want, f"c{i}: {t} -> {got}, want {want}"


# ------------------------------------------- toInteger numeric fast path
# ``toInteger(<provably numeric>)`` elides the string-parse fallback
# branch (one try_cast instead of a coalesce of two). The elision must
# be invisible: every numeric edge value — truncation toward zero,
# long-overflow, NaN/±inf, null — must agree with the generic
# string-capable path, and the compiled plan must really drop to a
# single try_cast.

def test_tointeger_numeric_fast_path_semantics(spark):
    from redisgraph_spark import Graph
    g = Graph(spark, {}, {})
    rows = g.query(
        "UNWIND [2.9, -2.9, 0.0, 1e18, 9.3e18, -9.3e18, 1e40, -1e40] "
        "AS x RETURN toInteger(toFloat(x)) AS fast, "
        "toInteger(toString(toFloat(x))) AS generic").collect()
    for r in rows:
        assert r["fast"] == r["generic"], r
    # NaN / ±inf (built via division so no literal folding) and null
    rows = g.query(
        "UNWIND [[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0]] AS p "
        "RETURN toInteger(p[0] / p[1]) AS q").collect()
    assert [r["q"] for r in rows] == [None, None, None]
    assert g.query("RETURN toInteger(null) AS n").collect()[0]["n"] is None


def test_tointeger_numeric_fast_path_plan(spark):
    from redisgraph_spark import Graph
    g = Graph(spark, {}, {})
    df = g.query("UNWIND [1.5, 2.5] AS x "
                 "RETURN sum(toInteger(round(x * 100))) AS s")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("try_cast") == 1, plan
    # the generic path (string input) must keep its fallback branch
    df = g.query("UNWIND ['1.5', '2'] AS x "
                 "RETURN sum(toInteger(x)) AS s")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("try_cast") >= 2, plan
