"""Bulk graph ingestion — ≈ GRAPH.BULK
(``/root/reference/src/commands/cmd_bulk_insert.c:63-137``,
``docs/bulk_spec.md``).

The reference streams a client-built binary format through Redis; on
Spark the equivalent is just reading columnar files in parallel — the
"bulk format" is parquet/CSV itself. Loaders below normalize arbitrary
tabular sources into the engine's canonical layout:

- node tables:  one file/dir per label with a unique id column
- edge tables:  one file/dir per relation with src/dst columns that
  reference node ids

ID namespacing mirrors ``graph/tpch.py``: caller supplies per-label
offsets (or uses ``auto_offsets``) so ids are globally unique without
coordination — O(1) per row, no driver-side sequence (the reference's
DataBlock id allocator needs a lock; at 100 TB we need none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def auto_offsets(labels: list[str],
                 base: int = 1_000_000_000_000) -> dict[str, int]:
    return {l: (i + 1) * base for i, l in enumerate(sorted(labels))}


def load_nodes(spark: SparkSession, path: str, fmt: str, label: str,
               id_col: str, offset: int = 0,
               options: dict | None = None) -> DataFrame:
    """Read a tabular source into a canonical node table
    ``(_id, <props>)``; the natural key is kept as a property."""
    reader = spark.read.options(**(options or {}))
    if fmt == "csv":
        df = reader.option("header", "true") \
            .option("inferSchema", "true").csv(path)
    elif fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "json":
        df = reader.json(path)
    else:
        raise ValueError(f"unsupported format {fmt}")
    # a pre-existing _id column (re-ingesting a saved canonical table)
    # must not survive alongside the new alias — ambiguous reference
    props = [c for c in df.columns if c != "_id"]
    return df.select(
        (F.col(id_col).cast("long") + offset).alias("_id"),
        *[F.col(c) for c in props])


def load_edges(spark: SparkSession, path: str, fmt: str,
               src_col: str, dst_col: str,
               src_offset: int = 0, dst_offset: int = 0,
               edge_offset: int = 0,
               options: dict | None = None) -> DataFrame:
    """Read a tabular source into a canonical edge table
    ``(_id, _src, _dst, <props>)``. Edge ids are row-content hashes in
    their own namespace — deterministic and coordination-free."""
    reader = spark.read.options(**(options or {}))
    if fmt == "csv":
        df = reader.option("header", "true") \
            .option("inferSchema", "true").csv(path)
    elif fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "json":
        df = reader.json(path)
    else:
        raise ValueError(f"unsupported format {fmt}")
    props = [c for c in df.columns if c not in (src_col, dst_col)]
    return df.select(
        (F.abs(F.xxhash64(*df.columns)) + edge_offset).alias("_id"),
        (F.col(src_col).cast("long") + src_offset).alias("_src"),
        (F.col(dst_col).cast("long") + dst_offset).alias("_dst"),
        *[F.col(c) for c in props])


def bulk_load(spark: SparkSession,
              node_specs: list[dict], edge_specs: list[dict]):
    """Assemble a Graph from declarative source specs.

    node spec: {label, path, format, id_col, [offset], [options]}
    edge spec: {rel, path, format, src_col, dst_col,
                [src_label], [dst_label], [src_offset], [dst_offset],
                [options]}

    Edge endpoint offsets MUST line up with the node-id namespacing:
    explicit ``src_offset``/``dst_offset`` win; else ``src_label``/
    ``dst_label`` look up the offset actually applied to that label's
    nodes; else, with exactly one node label, that label's offset is
    assumed. Multiple labels without endpoint info raise — defaulting
    to 0 would silently produce edges referencing no node.
    """
    from redisgraph_spark.graph.graph import Graph
    offsets = auto_offsets([s["label"] for s in node_specs])
    applied: dict[str, int] = {}
    nodes = {}
    for s in node_specs:
        off = s.get("offset", offsets[s["label"]])
        applied[s["label"]] = off
        nodes[s["label"]] = load_nodes(
            spark, s["path"], s["format"], s["label"], s["id_col"], off,
            s.get("options"))

    def endpoint_offset(s: dict, side: str) -> int:
        if f"{side}_offset" in s:
            return s[f"{side}_offset"]
        if f"{side}_label" in s:
            return applied[s[f"{side}_label"]]
        if len(applied) == 1:
            return next(iter(applied.values()))
        raise ValueError(
            f"edge spec {s['rel']!r}: {side}_offset or {side}_label "
            "required when loading multiple node labels (edge endpoint "
            "ids must share the node tables' id namespace)")

    edges = {}
    for i, s in enumerate(edge_specs):
        edges[s["rel"]] = load_edges(
            spark, s["path"], s["format"], s["src_col"], s["dst_col"],
            endpoint_offset(s, "src"), endpoint_offset(s, "dst"),
            edge_offset=(100 + i) * 1_000_000_000_000,
            options=s.get("options"))
    return Graph(spark, nodes, edges)
