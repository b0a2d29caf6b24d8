from redisgraph_spark.graph.graph import Graph
from redisgraph_spark.graph.tpch import tpch_graph

__all__ = ["Graph", "tpch_graph"]
