"""redisgraph_spark — a PySpark-native property-graph analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of RedisLabsModules/RedisGraph (openCypher over GraphBLAS
sparse matrices, see reference ``src/graph/graph.h:69-83``) as an
idiomatic Spark DataFrame engine:

- topology = ``edges`` DataFrames joined on ``src``/``dst`` (instead of
  boolean adjacency matrices),
- per-label / per-relation-type tables (instead of per-label and
  per-relation matrices) so label predicates become partition pruning,
- Cypher pattern matching compiled to Catalyst logical plans (scans,
  equi-joins, filters, aggregates) instead of Volcano iterators.

Public surface::

    from redisgraph_spark import Graph, get_spark
    g = Graph.from_tpch(spark, "/root/testdata/sf0.01")
    df = g.query("MATCH (c:Customer)-[:PLACED]->(o:Order) "
                 "RETURN c.c_name AS name, count(o) AS cnt")
"""

from redisgraph_spark.session import get_spark
from redisgraph_spark.graph.graph import Graph
from redisgraph_spark.graph.catalog import GraphCatalog

__all__ = ["Graph", "GraphCatalog", "get_spark"]
__version__ = "0.1.0"
