"""Predicate-pushdown audit (guide §6): for every contract entry,
build the plan through the CLUSTER-SCALE path (gate open — persisted
small-mode tables hide the parquet scans) and report FileScan nodes
that carry DataFilters but push NOTHING to parquet.  Those scans read
every row of the column at 100 TB even though a filter exists.

Usage:  SPARK_GRAFT_ADAPTIVE_MIN_BYTES=0 python tools/pushdown_audit.py
                                                [entry ...]
(the env var must be set before engine import; the tool sets it
itself when run as a script). With entry names, audits only those
entries (tests/test_plan_shapes.py drives a representative sample this
way); with none, sweeps the whole contract.
"""

from __future__ import annotations

import os
import re
import sys

os.environ.setdefault("SPARK_GRAFT_ADAPTIVE_MIN_BYTES", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as em
    from redisgraph_spark import get_spark
    spark = get_spark("pushdown-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.001")
    qs = em.queries()
    names = sys.argv[1:]
    if names:
        qs = {n: qs[n] for n in names}
    flagged = 0
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"SKIP {name}: {type(exc).__name__}: "
                  f"{str(exc)[:80]}")
            continue
        for m in re.finditer(
                r"FileScan parquet \[([^\]]*)\][^\n]*?DataFilters: "
                r"\[([^\]]*)\][^\n]*?PushedFilters: \[([^\]]*)\]",
                plan):
            cols, data_f, pushed = m.group(1), m.group(2), m.group(3)
            if data_f.strip() and not pushed.strip():
                flagged += 1
                print(f"UNPUSHED {name}: cols=[{cols[:60]}] "
                      f"filter={data_f[:120]}")
    print(f"audit done: {flagged} unpushed filtered scans")


if __name__ == "__main__":
    main()
