"""Training-data shard exporter.

A pretraining run wants its corpus as N similarly-sized, globally
range-ordered shards (data loaders stream shard k of N; range order
keeps related docs — same source, same crawl — physically close for
locality). `write_shards` is the sink counterpart of the pipeline
operators: deterministic layout, no driver bottleneck.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_shards(df: DataFrame, path: str, rows_per_shard: int,
                 order_col: str, fmt: str = "parquet") -> int:
    """Write `df` as ceil(n/rows_per_shard) shards, globally ordered by
    `order_col` across shard boundaries and sorted within each shard.

    Layout contract: shard boundaries are `repartitionByRange` sample
    quantiles of `order_col` — every row in shard i orders before every
    row in shard i+1 (a total global sort, executed as the standard
    Spark range-partition + per-partition sort, no single-task
    bottleneck). Shard sizes are approximately `rows_per_shard`
    (exact equality would require a global row-number pass — one more
    full shuffle for cosmetics; range sampling is the scalable trade
    the built-in sort itself makes).

    Returns the shard count. The one job-level action is the count()
    that sizes the layout — at 100 TB that count comes from catalog
    statistics in one metadata pass.
    """
    n = df.count()
    shards = max(1, math.ceil(n / rows_per_shard))
    df.repartitionByRange(shards, F.col(order_col)) \
        .sortWithinPartitions(order_col) \
        .write.mode("overwrite").format(fmt).save(path)
    return shards
