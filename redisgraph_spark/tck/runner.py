"""openCypher TCK scenario executor.

Runs TCK scenarios (parsed by ``gherkin.py``) against a fresh
``Graph`` per scenario, comparing collected Spark rows with the
expected tables via ``values.py`` canonicalization. This mirrors the
reference's conformance harness (``tests/tck/test_tck.py:13-23`` runs
the same corpus under behave, tags ``-crash -skip``).

Outcomes per scenario: PASS / FAIL / SKIP (uses a fixture or feature
the harness doesn't model: binary-tree graphs, procedure
registration, CSV resources) / ERROR. Side-effect assertions ("And
the side effects should be") are not asserted — the result-table
comparison is the gate — and are recorded as unchecked.
"""

from __future__ import annotations

import os
from collections import Counter
from dataclasses import dataclass

from .gherkin import Scenario, parse_feature
from .values import (TCKParseError, parse_cell, sort_lists_deep,
                     spark_to_canon)

DEFAULT_FEATURES = "/root/reference/tests/tck/features"


@dataclass
class Outcome:
    scenario: str        # "feature::name"
    status: str          # PASS | FAIL | SKIP | ERROR
    detail: str = ""


def load_scenarios(root: str | None = None) -> list[Scenario]:
    root = root or os.environ.get("SPARK_GRAFT_TCK_DIR", DEFAULT_FEATURES)
    out: list[Scenario] = []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if not f.endswith(".feature"):
                continue
            path = os.path.join(dirpath, f)
            with open(path, encoding="utf-8") as fh:
                text = fh.read()
            out.extend(parse_feature(text, os.path.splitext(f)[0]))
    return out


def _cell_to_python(s: str):
    """Parameter values must be real Python lists/dicts/scalars."""
    v = parse_cell(s)
    return _thaw(v)


def _thaw(v):
    if isinstance(v, tuple) and v and v[0] in ("node", "rel", "path"):
        raise TCKParseError("entity parameters unsupported")
    if isinstance(v, tuple) and all(
            isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], str)
            for x in v) and len(v) > 0:
        # ambiguous: frozen map vs list of pairs — TCK params use maps
        # only via {..} cells, which freeze to pair tuples
        return {k: _thaw(x) for k, x in v}
    if isinstance(v, tuple):
        return [_thaw(x) for x in v]
    return v


class _Skip(Exception):
    pass


class _Fail(Exception):
    pass


def _binary_tree_cypher(variant: int) -> str:
    """The openCypher TCK's binary-tree-1/-2 fixture graphs, as built
    by the reference harness (tests/tck/utils/graphs.py:43-116): root
    (:A) with two :KNOWS and two :FOLLOWS children, each child with two
    :FRIEND leaves, children linked in a :FRIEND ring. Variant 2 labels
    every second leaf :Y instead of :X."""
    leaf_lbl = (lambda i: "Y" if variant == 2 and i % 2 == 0 else "X")
    nodes = ["(a:A {name: 'a'})"] + \
        [f"(b{i}:X {{name: 'b{i}'}})" for i in range(1, 5)] + \
        [f"(c{i}{j}:{leaf_lbl(j)} {{name: 'c{i}{j}'}})"
         for i in range(1, 5) for j in (1, 2)]
    edges = ["(a)-[:KNOWS]->(b1)", "(a)-[:KNOWS]->(b2)",
             "(a)-[:FOLLOWS]->(b3)", "(a)-[:FOLLOWS]->(b4)"] + \
        [f"(b{i})-[:FRIEND]->(c{i}{j})"
         for i in range(1, 5) for j in (1, 2)] + \
        [f"(b{i})-[:FRIEND]->(b{i % 4 + 1})" for i in range(1, 5)]
    return "CREATE " + ", ".join(nodes + edges)


_PROC_SIG_RE = None


def _register_fixture_proc(g, step_text: str, table) -> None:
    """'there exists a procedure test.my.proc(name :: STRING?, id ::
    INTEGER?) :: (city :: STRING?):' + a lookup table → register it on
    the Graph (Graph.register_procedure, the reference's Proc_Register
    analog) so the Call1-6 scenarios run for real."""
    import re
    global _PROC_SIG_RE
    if _PROC_SIG_RE is None:
        _PROC_SIG_RE = re.compile(
            r"there exists a procedure\s+([\w.]+)\s*\(([^)]*)\)\s*"
            r"::\s*\(([^)]*)\)\s*:?\s*$")
    m = _PROC_SIG_RE.match(step_text.strip())
    if not m:
        raise _Skip(f"unparsable procedure signature: {step_text[:60]}")
    name, args_s, outs_s = m.group(1), m.group(2), m.group(3)

    def decls(s: str) -> list[tuple[str, str]]:
        out = []
        for part in s.split(","):
            part = part.strip()
            if not part:
                continue
            dn, _, dt = part.partition("::")
            out.append((dn.strip(), dt.strip()))
        return out

    args, outs = decls(args_s), decls(outs_s)
    rows = []
    body = table or []
    if body and body[0] and all(
            any(c == n for n, _t in args + outs) for c in body[0]):
        body = body[1:]           # header row
    for r in body:
        if not r:
            continue
        rows.append(tuple(_cell_to_python(c) for c in r))
    g.register_procedure(name, args, outs, rows)


def run_scenario(spark, sc: Scenario) -> Outcome:
    from redisgraph_spark import Graph
    name = f"{sc.feature}::{sc.name}"
    g = None
    params: dict = {}
    result = None            # collected rows (list of Row) or None
    result_cols: list[str] = []
    error: Exception | None = None
    executed_main = False

    def fresh_graph():
        gg = Graph(spark, {}, {})
        # keep variant unions typed — spark_to_canon decodes them
        gg.render_variants = False
        return gg

    def ensure_graph():
        nonlocal g
        if g is None:
            g = fresh_graph()
        return g

    try:
        for st in sc.steps:
            t = st.text
            if t in ("an empty graph", "any graph"):
                g = fresh_graph()
            elif t.startswith("the binary-tree"):
                # named fixtures from the reference harness
                # (tests/tck/utils/graphs.py:43-116)
                g = fresh_graph()
                g.query(_binary_tree_cypher(
                    2 if "binary-tree-2" in t else 1))
            elif t.startswith("there exists a procedure"):
                _register_fixture_proc(ensure_graph(), t, st.table)
            elif t.startswith("there exists a CSV file"):
                raise _Skip("fixture registration")
            elif t == "having executed:" or t == "having executed":
                ensure_graph().query(st.doc or "")
            elif t == "parameters are:" or t == "parameters are":
                for row in (st.table or []):
                    if len(row) >= 2:
                        params[row[0]] = _cell_to_python(row[1])
            elif t.startswith("executing query:") or \
                    t == "executing query" or \
                    t.startswith("executing control query:"):
                executed_main = True
                error = None
                result = None
                try:
                    df = ensure_graph().query(st.doc or "", params or None)
                    result_cols = list(df.columns)
                    result = df.collect()
                except Exception as ex:  # expected by negative tests
                    error = ex
            elif t.startswith("the result should be empty"):
                _expect_no_error(error)
                if result is None or len(result) != 0:
                    raise _Fail(f"expected empty, got "
                                f"{0 if result is None else len(result)} "
                                f"rows")
            elif t.startswith("the result should be, in order"):
                _compare(result_cols, result, st.table, error,
                         ordered=True)
            elif t.startswith("the result should be, in any order") or \
                    t.startswith("the result should be:"):
                _compare(result_cols, result, st.table, error,
                         ordered=False)
            elif t.startswith("the result should be (ignoring element "
                              "order for lists)"):
                _compare(result_cols, result, st.table, error,
                         ordered=False, sort_lists=True)
            elif "should be raised" in t:
                if not executed_main:
                    raise _Skip("error-step without query")
                if error is None:
                    raise _Fail(f"expected error ({t}), query succeeded")
                error = None  # consumed
            elif t == "no side effects" or \
                    t.startswith("the side effects should be"):
                continue  # recorded as unchecked (see module docstring)
            else:
                raise _Skip(f"unsupported step: {t[:60]}")
        if error is not None:
            raise _Fail(f"query raised {type(error).__name__}: "
                        f"{str(error)[:120]}")
        if not executed_main:
            raise _Skip("no query executed")
        return Outcome(name, "PASS")
    except _Skip as ex:
        return Outcome(name, "SKIP", str(ex))
    except _Fail as ex:
        return Outcome(name, "FAIL", str(ex))
    except TCKParseError as ex:
        return Outcome(name, "SKIP", f"expected-value parse: {ex}")
    except Exception as ex:
        return Outcome(name, "ERROR",
                       f"{type(ex).__name__}: {str(ex)[:160]}")


def _expect_no_error(error):
    if error is not None:
        raise _Fail(f"query raised {type(error).__name__}: "
                    f"{str(error)[:160]}")


def _compare(cols, rows, table, error, ordered: bool,
             sort_lists: bool = False) -> None:
    _expect_no_error(error)
    if rows is None:
        raise _Fail("no result captured")
    if not table:
        raise _Fail("expected table missing")
    exp_cols = table[0]
    if list(cols) != list(exp_cols):
        raise _Fail(f"columns {cols} != expected {exp_cols}")
    exp_rows = [tuple(parse_cell(c) for c in r) for r in table[1:]]
    got_rows = [tuple(spark_to_canon(v) for v in r) for r in rows]
    if sort_lists:
        exp_rows = [tuple(sort_lists_deep(v) for v in r) for r in exp_rows]
        got_rows = [tuple(sort_lists_deep(v) for v in r) for r in got_rows]
    if ordered:
        if got_rows != exp_rows:
            raise _Fail(_diff(got_rows, exp_rows))
    else:
        if Counter(map(_key, got_rows)) != Counter(map(_key, exp_rows)):
            raise _Fail(_diff(got_rows, exp_rows))


def _num_loose(v):
    """int/float-insensitive canonical form — the reference's TCK
    assertions coerce numerics through float() before comparing
    (tests/tck/utils/assertions.py:28-29,131), so 12/4 = 3.0 matches
    an expected integer 3.  Sets canonicalize to SORTED tuples: two
    equal frozensets can iterate (and therefore repr) in different
    orders when their hash tables grew through different insertion
    histories, and ``_key`` compares reprs."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, tuple):
        return tuple(_num_loose(x) for x in v)
    if isinstance(v, frozenset):
        return ("__set__",
                tuple(sorted((_num_loose(x) for x in v), key=repr)))
    return v


def _key(row) -> str:
    return repr(tuple(_num_loose(x) for x in row))


def _diff(got, exp) -> str:
    g = Counter(map(_key, got))
    e = Counter(map(_key, exp))
    missing = list((e - g).elements())[:3]
    extra = list((g - e).elements())[:3]
    return (f"{len(got)} rows vs {len(exp)} expected; "
            f"missing={missing} extra={extra}")


def run_all(spark, scenarios=None, root: str | None = None,
            progress=None) -> list[Outcome]:
    scenarios = scenarios if scenarios is not None else load_scenarios(root)
    outcomes = []
    for k, sc in enumerate(scenarios):
        outcomes.append(run_scenario(spark, sc))
        if progress and (k + 1) % 50 == 0:
            progress(k + 1, len(scenarios), outcomes)
    return outcomes
