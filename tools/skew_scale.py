"""Skewed-degree traversal proof for the cluster-scale (gate-open) path.

The reference's var-len KPI runs on ``datasets/highly_connected.rdb``
(``tests/benchmarks/variable_length_filter.yml``); the repo's TPC-H
scale curves are uniform-degree. This harness generates a power-law
graph (hub in-degree >= 1e4) ~10x the sf0.1 edge count, plus a
uniform-degree control with identical node/edge counts, and times the
traversal/algorithm shapes through the GATE-OPEN path
(SPARK_GRAFT_ADAPTIVE_MIN_BYTES=0: AQE on + skew-join, no planner
hints, no literal rewrites). Pass criterion recorded in docs/SCALE.md:
no entry regresses more than 2x on the skewed graph vs the uniform
control, and the executed 2-hop plan shows AQE handling
(AQEShuffleRead / skew annotations) rather than a planner hint.

Degrees are deterministic (xxhash64-based inverse-CDF — no RNG, so
reruns are bit-identical). Writes nothing outside /tmp.

Usage: python tools/skew_scale.py [--nodes N] [--edges M]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["SPARK_GRAFT_ADAPTIVE_MIN_BYTES"] = "0"   # before engine import
sys.path.insert(0, "/root/repo")

N_NODES = 200_000
N_EDGES = 2_000_000
OUT = "/tmp/skewgraph"


def build(spark, skewed: bool, tag: str) -> tuple[str, str]:
    from pyspark.sql import functions as F
    npath = f"{OUT}/{tag}_nodes.parquet"
    epath = f"{OUT}/{tag}_edges.parquet"
    if not os.path.exists(npath):
        nodes = spark.range(N_NODES).select(
            F.col("id").alias("_id"), F.col("id").alias("uid"))
        nodes.write.mode("overwrite").parquet(npath)
    if not os.path.exists(epath):
        e = spark.range(N_EDGES)
        u_src = (F.xxhash64("id", F.lit(1)).cast("double")
                 / F.lit(float(1 << 63)) + 1.0) / 2.0   # uniform [0,1)
        u_dst = (F.xxhash64("id", F.lit(2)).cast("double")
                 / F.lit(float(1 << 63)) + 1.0) / 2.0
        src = F.floor(u_src * N_NODES).cast("long")
        if skewed:
            # inverse-CDF log-uniform rank: P(dst=0) ~ ln2/lnN —
            # with 2M edges the top hub's in-degree is ~1e5 (>=1e4
            # per the round-7 verdict criterion)
            import math
            dst = (F.floor(F.exp(u_dst * float(math.log(N_NODES))))
                   - 1).cast("long")
        else:
            dst = F.floor(u_dst * N_NODES).cast("long")
        e.select((F.col("id") + 10_000_000).alias("_id"),
                 src.alias("_src"), dst.alias("_dst")) \
            .filter(F.col("_src") != F.col("_dst")) \
            .write.mode("overwrite").parquet(epath)
    return npath, epath


def run(spark, tag: str, npath: str, epath: str) -> dict:
    from pyspark.sql import functions as F

    from redisgraph_spark import Graph
    nodes = spark.read.parquet(npath)
    edges = spark.read.parquet(epath)
    g = Graph(spark, {"User": nodes}, {"FOLLOWS": edges},
              name=f"skew-{tag}")
    res: dict = {}
    hub = edges.groupBy("_dst").count().orderBy(F.desc("count")) \
        .first()
    res["max_in_degree"] = int(hub["count"])
    hub_id = int(hub["_dst"])

    ctr = {"n": 0}

    def timed(name, fn):
        # warm pass then best-of-2 measured passes (the box is shared;
        # min is the standard noise filter); fn(i) must vary the query
        # TEXT per pass (a process-unique pad) or the plan cache would
        # hand back the already-materialized handle
        fn(0)
        best = None
        out = None
        for i in (1, 2):
            t0 = time.time()
            out = fn(i)
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        res[name] = round(best, 2)
        return out

    def pad(i):
        ctr["n"] += 1
        return " " * ctr["n"]   # unique text per call → no plan cache

    # two-hop count through the hubs — the skew-join shape
    last2 = {}

    def two_hop(i):
        df2 = g.query(pad(i) + "MATCH (:User)-[:FOLLOWS]->(:User)"
                      "-[:FOLLOWS]->(c:User) RETURN count(*) AS c")
        out = df2.collect()
        last2["df"] = df2
        return out

    rows = timed("two_hop_count", two_hop)
    res["two_hop_rows"] = int(rows[0]["c"])
    plan = last2["df"]._jdf.queryExecution().executedPlan().toString()
    res["two_hop_join"] = ("BroadcastHashJoin" if "BroadcastHashJoin"
                           in plan else "SortMergeJoin"
                           if "SortMergeJoin" in plan else "other")
    # at ~30MB the edge table broadcasts (the right call); to prove the
    # BEYOND-broadcast path, force shuffle joins and check AQE's skew
    # split engages on the hub key
    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.forceOptimizeSkewedJoin")}
    # a multi-join pipeline needs the extra-shuffle waiver or
    # OptimizeSkewedJoin refuses to break the upper join's
    # co-partitioning (the exact veto a 100 TB chain hits)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin",
                   "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE re-plans small runtime sizes back to broadcast through its
    # OWN threshold — disable that too, or the skew path never runs
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                   "-1")
    # scale the skew-split thresholds DOWN in proportion to the test
    # data (the defaults are sized for 256MB+ partitions; the hot key
    # here is ~4MB) so the 100 TB mechanism is exercised, not skipped
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "100KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                   "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                   "100KB")
    try:
        rows = timed("two_hop_smj", two_hop)
        plan = last2["df"]._jdf.queryExecution() \
            .executedPlan().toString()
        res["smj_used"] = "SortMergeJoin" in plan
        res["smj_skew_split"] = ("skew=true" in plan
                                 or "skewed" in plan)
        res["smj_aqe_shuffle_read"] = "AQEShuffleRead" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    # var-len expansion FROM the hub (worst-case fan-out)
    rows = timed("var_len_from_hub", lambda i: g.query(
        pad(i) + f"MATCH (a:User {{uid: {hub_id}}})-[:FOLLOWS*1..2]->(x) "
        "RETURN count(*) AS c").collect())
    res["var_len_rows"] = int(rows[0]["c"])
    # var-len INTO the hub (bound target, reverse expansion)
    rows = timed("var_len_into_hub", lambda i: g.query(
        pad(i) + f"MATCH (x)-[:FOLLOWS*1..2]->(a:User {{uid: {hub_id}}}) "
        "RETURN count(*) AS c").collect())
    res["var_len_in_rows"] = int(rows[0]["c"])
    # in-degree aggregation — the hot-key groupBy (top hub ~1e5 rows
    # on one key; AQE partial aggregation must absorb it)
    timed("degree_topk", lambda i: g.query(
        pad(i) + "MATCH ()-[:FOLLOWS]->(b:User) "
        "RETURN b.uid AS u, count(*) AS d "
        "ORDER BY d DESC LIMIT 10").collect())
    # WCC over the full edge set (iterative join loop under skew)
    timed("wcc", lambda i: g.query(
        pad(i) + "CALL algo.wcc() YIELD node, component "
        "RETURN count(DISTINCT component) AS c").collect())
    return res


def main() -> int:
    argv = sys.argv[1:]
    global N_NODES, N_EDGES
    for i, a in enumerate(argv):
        if a == "--nodes":
            N_NODES = int(argv[i + 1])
        if a == "--edges":
            N_EDGES = int(argv[i + 1])
    from redisgraph_spark import get_spark
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true", \
        "gate-open run requires AQE on"
    out = {}
    for tag, skewed in (("uniform", False), ("skew", True)):
        npath, epath = build(spark, skewed, tag)
        out[tag] = run(spark, tag, npath, epath)
    ratios = {}
    for k in ("two_hop_count", "two_hop_smj", "var_len_from_hub",
              "var_len_into_hub", "degree_topk", "wcc"):
        u, s = out["uniform"][k], out["skew"][k]
        ratios[k] = round(s / u, 2) if u else None
    out["skew_over_uniform"] = ratios
    out["pass"] = all(r is not None and r <= 2.0 for r in ratios.values())
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
