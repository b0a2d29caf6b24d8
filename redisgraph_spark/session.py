"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (AQE on, adaptive skew-join,
broadcast threshold sized for dimension tables) while remaining correct
on local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


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
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
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
    )
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return builder.master(master).getOrCreate()
