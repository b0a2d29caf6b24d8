"""Shared pipeline helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin a small-scan input up to the session's default
    parallelism before a compute-dense per-row stage.

    Spark sizes scan partitions by BYTES (`files.maxPartitionBytes`),
    so a small-but-compute-heavy table — 5k documents in a 1.5 MB
    parquet footer — arrives as ONE partition and every per-char/
    per-token HOF stage built on it runs as a single task: one core on
    local[32], one task on a 1000-executor cluster. Measured on
    winnowing fingerprints at sf0.1: 38 s → ~2 s. The repartition
    shuffles only the raw rows (bytes are small by construction — that
    is why the partition count was wrong) and is a no-op when the scan
    already has enough partitions.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
