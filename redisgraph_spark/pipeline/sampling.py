"""Corpus-curation sampling operators.

Training-data pipelines cap over-represented sources (domain quotas)
and build stratified mixtures; these are deterministic DataFrame
compositions — no RNG, so runs are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_key_quota(df: DataFrame, key_col: str, quota: int,
                  order_by: list[Column]) -> DataFrame:
    """Keep at most `quota` rows per `key_col`, chosen by the
    deterministic ordering `order_by` (pass a total order — e.g. a
    quality score descending with the row id as tiebreaker — or the
    'quota' is ambiguous). The standard over-represented-domain cap of
    pretraining mixes.

    Scale shape: one shuffle on the key + a per-partition sort
    (row_number window). Hot keys (a domain with 10% of the corpus)
    sort all their rows to discard all but `quota` — acceptable to
    ~10⁸ rows/key; beyond that, pre-prune with an approximate per-key
    threshold before the window."""
    w = Window.partitionBy(key_col).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") <= quota).drop("__rn")


def key_histogram(df: DataFrame, key_col: str) -> DataFrame:
    """(key, n_rows, share) — the mixture report that precedes any
    re-balancing decision. One aggregate + a broadcast of the 1-row
    total."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__t"))
    return counts.crossJoin(F.broadcast(total)) \
        .select(key_col, "n_rows",
                (F.col("n_rows") / F.col("__t")).alias("share"))
