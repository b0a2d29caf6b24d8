"""Plan-health regression tests for the temporal columnar path.

Round-9 verdict: composed temporal expressions re-inlined the packed
struct per operation, so fresh temporal plans took 10-33s of driver-
side Catalyst work and whole-stage codegen failed (silently dropping
the stage to interpreted row-at-a-time execution).  The fix let-binds
each temporal intermediate to a named projection column.  These tests
pin the three observable properties of the fix:

  1. the let-bound aliases survive optimization (``__tb`` columns in
     the optimized plan — CollapseProject / predicate pushdown must
     not re-inline them);
  2. the optimized plan stays small (linear, not multiplicative);
  3. the generated Java compiles — ``spark.sql.codegen.fallback`` is
     turned OFF so a codegen failure raises instead of silently
     falling back (the round-1 labels()[0] precedent).
"""

import time

import pytest

# the columnar temporal shapes of the four q_temporal_* contract
# entries (sf-independent formulations over the tpch graph)
TEMPORAL_QUERIES = [
    # q_temporal_arith shape: ctor over native date + duration literal,
    # comparison in WHERE, render in an aggregate
    "MATCH (o:Order) WHERE date(o.o_orderdate) + duration('P1M') > "
    "date('1998-06-01') RETURN count(*) AS n, "
    "min(toString(date(o.o_orderdate))) AS first",
    # q_temporal_truncate shape: truncate over ctor as a group key
    "MATCH (o:Order) RETURN "
    "toString(date.truncate('quarter', date(o.o_orderdate))) AS q, "
    "count(*) AS n ORDER BY q",
    # q_temporal_between shape: between over two ctors, component
    # accessor inside an aggregate, through a join
    "MATCH (o:Order)-[l:CONTAINS]->() RETURN l.l_returnflag AS flag, "
    "sum(duration.inDays(date(o.o_orderdate), date(l.l_shipdate))"
    ".days) AS total_days, count(*) AS n ORDER BY flag",
    # deep composition: arithmetic → truncate → render
    "MATCH (o:Order) RETURN toString(date.truncate('month', "
    "date(o.o_orderdate) + duration('P10D'))) AS m, count(*) AS n "
    "ORDER BY m LIMIT 5",
]


@pytest.mark.parametrize("q", TEMPORAL_QUERIES)
def test_temporal_plan_stays_linear_and_codegens(spark, graph, q):
    old = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        t0 = time.time()
        df = graph.query(q)
        build_s = time.time() - t0
        # was 10-33s at sf0.01 before the let-binding fix; generous
        # bound so a loaded CI box doesn't flake, but a multiplicative
        # regression (back to tens of seconds) still fails
        assert build_s < 10, f"plan construction took {build_s:.1f}s"
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "__tb" in opt, "let-bound temporal aliases were inlined"
        assert len(opt) < 60_000, \
            f"optimized plan blew up to {len(opt)} chars"
        # executes the full plan; codegen.fallback=false raises on any
        # whole-stage compile failure instead of interpreting
        df.write.format("noop").mode("overwrite").save()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_temporal_filter_binding_not_repushed(spark, graph):
    """The WHERE path specifically: deterministic binding projections
    under a Filter get substituted back by PushPredicateThroughNonJoin;
    the nondeterministic identity barrier must keep the Filter small."""
    df = graph.query(
        "MATCH (o:Order) WHERE date(o.o_orderdate) + duration('P1M') > "
        "date('1998-06-01') RETURN count(*) AS n")
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    filter_lines = [ln for ln in opt.splitlines() if "Filter" in ln]
    assert filter_lines, "expected a Filter node"
    assert max(len(ln) for ln in filter_lines) < 8_000, \
        "temporal WHERE was re-inlined into the pushed filter"
