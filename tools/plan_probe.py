"""Plan-construction / first-execution probe (guide §1: measure first).

For each named contract entry, measures on a FRESH plan (no plan-cache
hit):
  - build_s:   Python planning + Catalyst analysis (queries()[name] call)
  - phys_s:    physical planning (executedPlan materialization)
  - exec1_s:   first execution through the noop sink (includes Janino
               codegen + JIT for this plan shape)
  - exec2_s:   second noop execution (steady data path)
and writes `.explain("formatted")` to plans/<tag_dir>/<name>_<tag>.txt.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/plan_probe.py \
      before q_temporal_arith q_temporal_truncate ...

Codegen failures (`ERROR CodeGenerator`) surface on stderr — run with
stderr captured and grep it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from redisgraph_spark import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-probe")
    spark.sparkContext.setLogLevel("WARN")
    qs = entrymod.queries()
    # JVM / Catalyst / codegen warmup so the first probe isn't charged
    # session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    g = entrymod._graph(spark, sf_dir)
    g.query("MATCH (r:Region) RETURN count(r) AS n").collect()

    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        build_s = time.time() - t0
        t0 = time.time()
        df._jdf.queryExecution().executedPlan()
        phys_s = time.time() - t0
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        exec1_s = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        exec2_s = time.time() - t0
        results[name] = {"build_s": round(build_s, 2),
                         "phys_s": round(phys_s, 2),
                         "exec1_s": round(exec1_s, 2),
                         "exec2_s": round(exec2_s, 2)}
        print(json.dumps({name: results[name]}), flush=True)
    print("PROBE_RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
