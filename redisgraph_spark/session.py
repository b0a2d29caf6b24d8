"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, adaptive skew-join,
broadcast threshold sized for dimension tables) while remaining correct
on local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def inline_df(spark: SparkSession, rows: list[tuple],
              schema: list[tuple[str, str]]):
    """Tiny driver-side result as a ONE-task plan.

    ``spark.createDataFrame(small_list)`` parallelizes into
    defaultParallelism (32) mostly-empty tasks — ~1-3 s of scheduling
    per collect for a handful of rows. Building the rows as an exploded
    array of struct literals over a single-partition range keeps the
    whole thing one task (~0.1 s). ``schema`` is [(name, sql_type)].
    """
    from pyspark.sql import functions as F
    ddl = ", ".join(f"`{n}` {t}" for n, t in schema)
    if not rows:
        return spark.createDataFrame([], ddl)
    structs = [
        F.struct(*[F.lit(v).cast(t).alias(n)
                   for v, (n, t) in zip(row, schema)])
        for row in rows]
    return (spark.range(0, 1, 1, 1)
            .select(F.explode(F.array(*structs)).alias("__r"))
            .select("__r.*"))


def _lit_sql_type(v) -> str | None:
    """SQL type for a python literal, mirroring createDataFrame's
    inference; None = unsupported here (caller falls back)."""
    import datetime
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, list):
        inner = None
        for x in v:
            t = _lit_sql_type(x) if x is not None else None
            if isinstance(x, (list, dict)):
                return None
            if t is not None:
                if inner is not None and inner != t:
                    return None
                inner = t
        return f"array<{inner or 'string'}>"
    return None


def inline_rows_df(spark: SparkSession, rows: list[dict]):
    """``inline_df`` for row-dicts with inferred types (the CREATE/MERGE
    pending-row path). Returns None when a value needs full
    createDataFrame inference (structs, decimals, mixed-type lists)."""
    cols: list[str] = []
    types: dict[str, str | None] = {}
    for r in rows:
        for k, v in r.items():
            if k not in types:
                types[k] = None
                cols.append(k)
            if v is not None:
                t = _lit_sql_type(v)
                if t is None:
                    return None
                prev = types[k]
                if prev is None or prev == t:
                    types[k] = t
                elif {prev, t} == {"long", "double"}:
                    types[k] = "double"   # widen mixed numerics
                else:
                    # heterogeneous scalar types for one key — the
                    # caller must split rows into homogeneous groups
                    # (variant encoding happens at the table union)
                    return None
    schema = [(k, types[k] or "string") for k in cols]
    data = [tuple(r.get(k) for k in cols) for r in rows]
    return inline_df(spark, data, schema)


def get_spark(app_name: str = "redisgraph-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - AQE enabled: runtime coalescing of shuffle partitions and skew-join
      splitting replace the reference's fixed 16-row traversal batches
      (reference ``ops/op_conditional_traverse.c:13``) with adaptive,
      cluster-scale batching.
    - ``autoBroadcastJoinThreshold`` generous: graph traversals against
      small label tables (Region/Nation-sized dims) become broadcast
      hash joins — no shuffle of the big side.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 64MB static: any side whose FOOTER-KNOWN size is <64MB is
        # safe to broadcast at any scale (it fits in executor memory);
        # TB-scale tables never pass the footer check, so this does
        # not invert at 100TB. Statically-broadcast plans also run as
        # ONE job locally where the AQE shuffle-then-upgrade path runs
        # 6 stage-jobs (measured: 1.6s vs 0.6s on the two-hop at
        # sf0.1). The adaptive threshold additionally upgrades
        # shuffle joins to broadcast at runtime from REAL sizes when
        # the static estimate was unavailable.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet uses TIMESTAMP(NANOS); read as long
        # and convert (Spark has no native nanos timestamp)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-mode driver IS the executor: size the heap for 32
        # threads of shuffle + localCheckpoint blocks (8g heap showed
        # GC-driven 3-4x tail latencies on long sessions)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    active = SparkSession.getActiveSession()
    if active is not None:
        _quiet_probe_logger(active)
        return active
    spark = builder.master(master).getOrCreate()
    _quiet_probe_logger(spark)
    return spark


def _quiet_probe_logger(spark: SparkSession) -> None:
    """The planner's recoverable type probes (planner/expressions.py
    ``dtype``) analyze candidate expressions against an empty frame and
    catch the AnalysisException — but Spark's DataFrameQueryContextLogger
    logs each one at ERROR before raising, flooding driver logs with
    scary UNRESOLVED_COLUMN noise. Turn that one logger off; real
    failures still surface as Python exceptions."""
    import logging
    logging.getLogger("DataFrameQueryContextLogger").setLevel(
        logging.CRITICAL + 1)
