"""Closeness / harmonic centrality by multi-source frontier BFS.

Additive scope like algo.wcc (the reference registry ships only
BFS/pageRank, ``/root/reference/src/procedures/procedure.c:27-42``).
Computed for an explicit SOURCE SET bounded to ``max_hops`` — the
scale-sane contract: all-nodes closeness is O(V·E) and never the right
cluster job, while k-bounded closeness for a candidate set (the usual
"how central are these accounts/pages" ask) is one multi-source BFS.

Definitions over nodes reached within ``max_hops`` directed hops
(self excluded): ``closeness = reached / Σ dist`` and
``harmonic = Σ 1/dist`` (harmonic is the variant that stays
well-defined on disconnected graphs — Boldi & Vigna 2014). Sources
reaching nothing report 0 for both.

Scale shape: the BFS frontier is keyed by (root, node) — one
equi-join + one anti-join against the visited set per hop, all
roots advanced together (the same one-join-per-level shape as
``algorithms/bfs.py``); the final centrality is one root-keyed
aggregation. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_HOPS = 16


def closeness(edges: DataFrame, source_ids: list[int],
              max_hops: int = MAX_HOPS,
              grid: float = 1e6) -> DataFrame:
    """``edges``: ``_src``/``_dst``. Returns one row per source id:
    ``(node, reached, closeness, harmonic)`` — reached/centralities
    over nodes at directed distance 1..max_hops, grid-rounded."""
    spark = edges.sparkSession
    e = edges.select(F.col("_src").alias("__u"),
                     F.col("_dst").alias("__v")).distinct() \
        .localCheckpoint(eager=True)
    roots = spark.createDataFrame(
        [(int(i),) for i in source_ids], "__root long").dropDuplicates() \
        .localCheckpoint(eager=True)
    visited = roots.select("__root", F.col("__root").alias("__nid"),
                           F.lit(0).alias("__d"))
    frontier = visited
    for depth in range(1, max_hops + 1):
        nxt = frontier.join(e, frontier["__nid"] == e["__u"]) \
            .select("__root", F.col("__v").alias("__nid"),
                    F.lit(depth).alias("__d")) \
            .dropDuplicates(["__root", "__nid"]) \
            .join(visited.select("__root", "__nid"),
                  ["__root", "__nid"], "left_anti") \
            .localCheckpoint(eager=True)
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    stats = visited.filter(F.col("__d") > 0).groupBy("__root").agg(
        F.count(F.lit(1)).alias("reached"),
        F.sum("__d").alias("__sumd"),
        F.sum(F.lit(1.0) / F.col("__d")).alias("__harm"))
    return roots.join(stats, "__root", "left").select(
        F.col("__root").alias("node"),
        F.coalesce("reached", F.lit(0)).cast("long").alias("reached"),
        F.coalesce(F.round(F.col("reached") / F.col("__sumd") * grid)
                   / grid, F.lit(0.0)).alias("closeness"),
        F.coalesce(F.round(F.col("__harm") * grid) / grid, F.lit(0.0))
        .alias("harmonic"))
