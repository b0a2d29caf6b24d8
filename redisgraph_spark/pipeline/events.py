"""Event-stream analytics: time rollups, sessionization, top-k.

The reference has no streaming/temporal surface (Redis request/response
only — SURVEY.md §2.5); these are the additive operators a training-data
pipeline needs over event logs. Batch forms here; streaming variants in
``redisgraph_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(col: str) -> Column:
    # TIMESTAMP_NTZ (how Spark reads DuckDB-written parquet) cannot cast
    # straight to long; go through TIMESTAMP first. Session tz is UTC.
    return F.col(col).cast("timestamp").cast("long")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Count + value sum per (event_type, hour).
    SQL: date_trunc('hour', ts), count(*), round(sum(value), 2)."""
    return events.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("hour")) \
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per user: a session breaks after `gap_minutes`
    of inactivity. Window-function form (lag + cumulative sum) — one
    shuffle on user_id; at scale this is the standard sessionization
    plan and AQE handles hot users."""
    w = Window.partitionBy("user_id").orderBy("ts")
    with_gap = events.withColumn(
        "__prev", F.lag("ts").over(w)) \
        .withColumn(
        "__new_session",
        F.when(F.col("__prev").isNull(), 1).when(
            _epoch_seconds("ts") - _epoch_seconds("__prev")
            > gap_minutes * 60, 1).otherwise(0))
    return with_gap.withColumn(
        "session_seq", F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0))) \
        .drop("__prev", "__new_session")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates: events, span seconds, total value."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(_epoch_seconds("ts"))
         - F.min(_epoch_seconds("ts"))).alias("span_seconds"),
        F.round(F.sum("value"), 2).alias("total_value"))


def top_users_by_type(events: DataFrame, event_type: str, k: int = 10
                      ) -> DataFrame:
    """Top-k users by event count for one type — count + orderBy.limit
    (Spark plans TakeOrderedAndProject: the reference's bounded top-k
    heap, ``ops/op_sort.c:52-67``, for free)."""
    return events.filter(F.col("event_type") == event_type) \
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")) \
        .orderBy(F.col("n").desc(), F.col("user_id").asc()) \
        .limit(k)


def value_anomalies(events: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-user value-anomaly flags: an event is anomalous when its
    value deviates from the user's own mean by more than `z` population
    standard deviations (users with one event or zero variance flag
    nothing). The per-entity outlier sweep a pipeline runs before
    aggregating noisy telemetry.

    Output: (event_id, user_id, value, zscore) for flagged events only,
    zscore rounded to 1e-6 for engine-exact comparison.

    Scale shape: one groupBy per user for (mean, stddev_pop) + a
    broadcast-or-shuffle join back — two passes, no window over the
    full table needed.
    """
    stats = events.groupBy("user_id").agg(
        F.avg("value").alias("__mu"),
        F.stddev_pop("value").alias("__sd"))
    # the threshold compares the SAME 1e-6-rounded statistic both
    # engines emit — comparing the raw value instead would let a row
    # within float summation-order noise of the boundary flag on one
    # engine and not the other (grid-before-compare, like
    # temperature_sample/semdedup)
    zabs = F.round(F.abs(F.col("value") - F.col("__mu"))
                   / F.col("__sd") * 1e6) / 1e6
    return events.join(stats, "user_id") \
        .filter((F.col("__sd") > 0) & (zabs > z)) \
        .select("event_id", "user_id", "value",
                (F.round((F.col("value") - F.col("__mu"))
                         / F.col("__sd") * 1e6) / 1e6).alias("zscore"))
