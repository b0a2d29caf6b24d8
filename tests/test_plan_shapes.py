"""Executed-plan shape assertions for headline queries (r10).

PLANS.md records the load-bearing physical-plan shapes by hand; these
tests pin them in CI so a planner/Catalyst change can't silently
de-optimize (round-9 verdict #6):

  - q_entity_count answers from the statistics store (LocalTableScan,
    no scan of the data);
  - q_scan_filter_sort's ORDER BY + LIMIT is a top-k
    (TakeOrderedAndProject), not a global sort;
  - q_two_hop_revenue's join chain is broadcast-hash, never a
    nested-loop/cartesian;
  - no graph query evaluates Python per row (BatchEvalPython /
    ArrowEvalPython);
  - through the cluster-scale path (gate open), the scan-level filter
    reaches the parquet reader as PushedFilters.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def entry_queries(spark):
    sys.path.insert(0, REPO)
    import __spark_entry__ as em
    return em.queries(), spark


def _executed(qs, spark, name):
    df = qs[name](spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_entity_count_is_statistics_answer(entry_queries):
    qs, spark = entry_queries
    p = _executed(qs, spark, "q_entity_count")
    assert "LocalTableScan" in p
    assert "Join" not in p and "Exchange" not in p


def test_scan_filter_sort_is_topk(entry_queries):
    qs, spark = entry_queries
    p = _executed(qs, spark, "q_scan_filter_sort")
    assert "TakeOrderedAndProject" in p


def test_two_hop_join_strategy(entry_queries):
    qs, spark = entry_queries
    p = _executed(qs, spark, "q_two_hop_revenue")
    assert p.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


GRAPH_HEADLINE = [
    "q_entity_count", "q_scan_filter_sort", "q_single_hop_agg",
    "q_two_hop_revenue", "q_shared_node_join", "q_optional_match",
    "q_anti_semi_apply", "q_with_having", "q_var_len",
    "q_temporal_between",
]


@pytest.mark.parametrize("name", GRAPH_HEADLINE)
def test_no_per_row_python_in_graph_queries(entry_queries, name):
    qs, spark = entry_queries
    p = _executed(qs, spark, name)
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p


def test_pushed_filters_reach_parquet_gate_open():
    """Cluster-scale path: the small-input gate persists tables (scans
    become InMemoryTableScan), so predicate pushdown to parquet is only
    observable with the gate open. Runs in a subprocess because the
    gate env var is read at engine import."""
    script = r"""
import sys
sys.path.insert(0, %r)
import __spark_entry__ as em
from redisgraph_spark import get_spark
spark = get_spark("plan-shape-gate")
spark.sparkContext.setLogLevel("ERROR")
df = em.queries()["q_scan_filter_sort"](spark, %r)
print(df._jdf.queryExecution().executedPlan().toString())
""" % (REPO, SF)
    env = dict(os.environ, SPARK_GRAFT_ADAPTIVE_MIN_BYTES="0")
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=600,
                          env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    plan = proc.stdout
    assert "PushedFilters: [" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThan" in ln or "LessThan" in ln
               or "IsNotNull" in ln for ln in pushed), pushed
