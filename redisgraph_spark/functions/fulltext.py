"""Fulltext search — the reference's RediSearch-backed procedures
(``/root/reference/src/procedures/proc_fulltext_create_index.c:65``,
``proc_fulltext_query.c:124``) re-expressed as an inverted-index
DataFrame + TF scoring.

Index layout: ``(token, _id, tf)`` — an inverted index as a table,
partitioned by token at scale so a query touches only its tokens'
partitions. Scoring: sum of term frequencies over matched query tokens
(RediSearch's default TF scoring shape; no IDF in the reference's
default either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_index(nodes: DataFrame, prop: str,
                id_col: str = "_id") -> DataFrame:
    """Tokenize `prop` (lowercase, split on non-alphanumerics) into an
    inverted index (token, _id, tf)."""
    toks = F.split(F.lower(F.col(prop)), r"[^a-z0-9]+")
    exploded = nodes.select(F.col(id_col),
                            F.explode(toks).alias("token")) \
        .filter(F.col("token") != "")
    return exploded.groupBy("token", id_col) \
        .agg(F.count(F.lit(1)).alias("tf"))


def query_index(index: DataFrame, nodes: DataFrame, text: str,
                id_col: str = "_id") -> DataFrame:
    """OR-match query tokens, score = Σ tf, descending. Returns the node
    rows + score (≈ db.idx.fulltext.queryNodes YIELD node, score)."""
    tokens = [t for t in
              __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
    if not tokens:
        return nodes.limit(0).withColumn("score", F.lit(0.0))
    matched = index.filter(F.col("token").isin(tokens)) \
        .groupBy(id_col).agg(F.sum("tf").cast("double").alias("score"))
    return nodes.join(matched, id_col) \
        .orderBy(F.col("score").desc(), F.col(id_col).asc())


class FulltextCatalog:
    """Per-graph registry: (label, prop) → index DataFrame.
    ≈ Schema.fulltextIdx (``src/schema/schema.h:20-28``)."""

    def __init__(self, graph) -> None:
        self.graph = graph
        self.indexes: dict[tuple[str, str], DataFrame] = {}

    def create(self, label: str, prop: str) -> None:
        nodes = self.graph.node_tables[label]
        idx = build_index(nodes, prop).localCheckpoint(eager=True)
        self.indexes[(label, prop)] = idx

    def drop(self, label: str, prop: str | None = None) -> None:
        for key in [k for k in self.indexes
                    if k[0] == label and (prop is None or k[1] == prop)]:
            del self.indexes[key]

    def query(self, label: str, text: str) -> DataFrame:
        hits = None
        nodes = self.graph.node_tables[label]
        for (l, p), idx in self.indexes.items():
            if l != label:
                continue
            res = query_index(idx, nodes, text)
            hits = res if hits is None else hits.unionByName(res)
        if hits is None:
            raise ValueError(f"No fulltext index on label {label}")
        return hits
