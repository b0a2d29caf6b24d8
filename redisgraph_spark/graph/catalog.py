"""Multi-graph admin registry — the module command surface.

≈ the reference's Redis keyspace of graph keys and its module commands
(``/root/reference/src/module.c:132-176``): GRAPH.QUERY auto-creates a
missing graph, GRAPH.LIST enumerates, GRAPH.DELETE drops the key and
frees its data. Here each graph is a named :class:`Graph`; DELETE also
unpersists any cached/checkpointed DataFrames the graph holds so the
executors release block-manager memory.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from redisgraph_spark.graph.graph import Graph


class GraphCatalog:
    """Named-graph registry: one catalog per SparkSession (the analog
    of one Redis server holding many graph keys)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._graphs: dict[str, Graph] = {}

    # ------------------------------------------------------------- admin
    def register(self, name: str, graph: Graph) -> Graph:
        graph.name = name
        self._graphs[name] = graph
        return graph

    def get(self, name: str) -> Graph:
        if name not in self._graphs:
            raise KeyError(f"no such graph: {name}")
        return self._graphs[name]

    def list(self) -> list[str]:
        """≈ GRAPH.LIST (module.c:173, Graph_List)."""
        return sorted(self._graphs)

    def delete(self, name: str) -> None:
        """≈ GRAPH.DELETE (module.c:142, Graph_Delete): drop the key
        and release what can be released eagerly. Cache-manager blocks
        unpersist immediately; localCheckpoint RDD blocks (mutated
        tables, warm traversal projections) are not in the cache
        manager — dropping every reference here lets the
        ContextCleaner reclaim them at the next GC cycle."""
        g = self._graphs.pop(name, None)
        if g is None:
            raise KeyError(f"no such graph: {name}")
        import itertools
        for df in itertools.chain(
                getattr(g, "_scan_cache", {}).values(),
                g.node_tables.values(), g.edge_tables.values()):
            if isinstance(df, DataFrame):
                try:
                    df.unpersist()
                except Exception:
                    pass
        g._scan_cache = {}
        g.node_tables = {}
        g.edge_tables = {}
        g._count_cache = {}
        g._plan_cache.clear()

    # ------------------------------------------------------------- query
    def query(self, name: str, cypher: str,
              params: Mapping[str, object] | None = None) -> DataFrame:
        """≈ GRAPH.QUERY key "..." — auto-creates an empty graph for an
        unknown key, exactly like the reference (CommandDispatch with
        "write" flags creates the key on first use)."""
        if name not in self._graphs:
            self._graphs[name] = Graph(self.spark, {}, {}, name=name)
        return self._graphs[name].query(cypher, params)

    def ro_query(self, name: str, cypher: str,
                 params: Mapping[str, object] | None = None) -> DataFrame:
        """≈ GRAPH.RO_QUERY — readonly: no auto-create; write clauses
        AND catalog-mutating procedure CALLs (fulltext create/drop)
        are rejected."""
        g = self.get(name)
        from redisgraph_spark.cypher.parser import parse
        from redisgraph_spark.graph.graph import is_write_ast
        if is_write_ast(parse(cypher)):
            raise PermissionError("graph.RO_QUERY is read-only")
        return g.query(cypher, params)

    def explain(self, name: str, cypher: str) -> str:
        return self.get(name).explain(cypher)

    def profile(self, name: str, cypher: str) -> dict:
        return self.get(name).profile(cypher)

    def slowlog(self, name: str) -> list[dict]:
        return self.get(name).slow_log()

    def config_get(self, name: str, key: str):
        return self.get(name).config_get(key)

    def config_set(self, name: str, key: str, value) -> None:
        self.get(name).config_set(key, value)
