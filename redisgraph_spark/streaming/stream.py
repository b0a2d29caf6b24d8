"""Structured Streaming surface.

The reference has no streaming (Redis request/response only —
SURVEY.md §2.5); this module is the additive scope that makes the
engine usable on event streams at 100 TB/day: the batch operators from
``pipeline/events.py`` re-expressed as incremental plans with
watermarks and state.

- windowed rollup  → watermark + tumbling window aggregation
- sessionization   → ``session_window`` (native state store, no UDF)
- streaming dedup  → ``dropDuplicates`` within the watermark horizon
- graph upserts    → ``foreachBatch`` appending into Graph edge tables
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# serializes run_to_memory drains: each drain temporarily lowers the
# session-global shuffle-partition conf and restores it on exit
_DRAIN_LOCK = threading.Lock()

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      fmt: str = "json",
                      schema: T.StructType = EVENT_SCHEMA) -> DataFrame:
    """File-based event stream (each micro-batch picks up new files —
    the cloud-storage ingestion pattern)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def windowed_rollup(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Count/sum per (event_type, window); late events beyond the
    watermark are dropped deterministically."""
    return stream.withWatermark("ts", watermark) \
        .groupBy(F.col("event_type"),
                 F.window("ts", window).alias("w")) \
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("sum_value")) \
        .select("event_type", F.col("w.start").alias("window_start"),
                "n", "sum_value")


def streaming_sessions(stream: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Per-user sessions via the native session_window state operator —
    the streaming twin of ``pipeline.events.sessionize``."""
    return stream.withWatermark("ts", watermark) \
        .groupBy(F.col("user_id"),
                 F.session_window("ts", gap).alias("w")) \
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("total_value")) \
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events",
                "total_value")


def stream_interval_join(stream: DataFrame, left_type: str = "click",
                         right_type: str = "purchase",
                         within: str = "10 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Stream-stream INTERVAL join: every `left_type` event joined to
    the same user's `right_type` events in ``(l_ts, l_ts + within]`` —
    the attribution-window primitive (click → purchase). Both sides
    carry watermarks and the join condition is a closed time range, so
    Spark bounds the state store: left rows evict once the right
    watermark passes ``l_ts + within``, right rows once the left
    watermark passes ``r_ts`` (the only configuration where
    stream-stream inner joins run with finite state — Structured
    Streaming's documented interval-join contract).

    Strictly-after semantics (``r_ts > l_ts``) keep the pair
    orientation unambiguous when both events share a timestamp.
    """
    l = stream.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event"),
        F.col("value").alias("l_value"))
    l = l.withWatermark("l_ts", watermark)
    r = stream.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
        F.col("value").alias("r_value"))
    r = r.withWatermark("r_ts", watermark)
    return l.join(
        r, (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "inner") \
        .select(F.col("l_user").alias("user_id"), "l_event", "r_event",
                "l_ts", "r_ts",
                (F.unix_micros(F.col("r_ts"))
                 - F.unix_micros(F.col("l_ts"))).alias("lag_micros"))


def streaming_dedup(stream: DataFrame, keys: list[str],
                    watermark: str = "1 hour") -> DataFrame:
    """Exactly-once per key within the watermark horizon (state-store
    dedup — the streaming form of exact_dedup).

    Uses ``dropDuplicatesWithinWatermark``: dedup state for a key is
    evicted once the watermark passes it, so state stays bounded on a
    continuous stream. Plain ``dropDuplicates(keys)`` without the
    event-time column in the subset would accumulate state forever."""
    return stream.withWatermark("ts", watermark) \
        .dropDuplicatesWithinWatermark(keys)


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals across
    micro-batches via ``applyInPandasWithState`` (Arrow-batched Python
    state — the escape hatch for semantics Spark's built-in stateful
    operators can't express; state itself lives in the state store).

    Emits one row per user per micro-batch:
    (user_id, n_events, total_value, max_value).
    """
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        n, total, mx = (state.get if state.exists else (0, 0.0, None))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = float(pdf["value"].max()) if len(pdf) else None
            if batch_max is not None:
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, total, mx))
        yield pd.DataFrame([{
            "user_id": key[0], "n_events": n,
            "total_value": round(total, 6), "max_value": mx,
        }])

    return stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "append",
                  source_bytes: int | None = None) -> None:
    """Drain all available input into an in-memory table (testing and
    interactive inspection).

    ``source_bytes`` (the stream source's on-disk size) sizes the
    STATE partition count: stateful operators fix it at query start
    from ``spark.sql.shuffle.partitions`` and AQE never coalesces it,
    so each state-store instance (a stream-stream join opens four per
    partition) is pure per-batch overhead when the input is small. The
    gate and formula are the batch path's small-input policy
    (``session.tune_for_input``): below ``SPARK_GRAFT_ADAPTIVE_MIN_BYTES``
    use ~1 partition per 2 MB (floor 8, never above the session
    setting); at or above it — including the gate-open setting of 0 —
    the session's configured partitions are kept untouched, so the
    cluster-scale path is exactly as before.

    The tuning mutates the session-global ``spark.sql.shuffle.partitions``
    for the duration of the drain; a module lock serializes overlapping
    drains on the same session so the restore cannot clobber another
    drain's value. Batch queries submitted concurrently from other
    threads can still observe the lowered value — the drain is
    drain-to-completion (availableNow), so the window is bounded."""
    spark = stream_df.sparkSession
    with _DRAIN_LOCK:
        prev = None
        if source_bytes is not None:
            from redisgraph_spark.session import _ADAPTIVE_MIN_BYTES
            if source_bytes < _ADAPTIVE_MIN_BYTES:
                prev = spark.conf.get("spark.sql.shuffle.partitions")
                sp = min(int(prev),
                         max(8, int(source_bytes) // (2 * 1024 * 1024) + 1))
                spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        try:
            q = stream_df.writeStream.format("memory").queryName(name) \
                .outputMode(output_mode).trigger(availableNow=True).start()
            q.awaitTermination()
        finally:
            if prev is not None:
                spark.conf.set("spark.sql.shuffle.partitions", prev)


def stream_into_graph(stream: DataFrame, graph, rel: str,
                      src_col: str, dst_col: str,
                      checkpoint: str) -> object:
    """foreachBatch upsert of an event stream into a Graph edge table —
    continuous graph construction (no reference analog; GRAPH.BULK is
    batch-only)."""
    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch's idempotence contract: a retried/replayed
        # micro-batch (failure between this upsert and the checkpoint
        # commit, or a query restart against the same Graph) must not
        # append twice — track applied batch ids per (checkpoint, rel).
        # Identical EVENTS stay distinct edges (batch_id + row salt in
        # the id hash), unlike a pure content hash which would
        # silently collapse legitimate duplicate events.
        seen = graph.__dict__.setdefault("_stream_batches", set())
        key = (checkpoint, rel, batch_id)
        if key in seen:
            return
        # pmod keeps the id in [3e16, ~8.03e18] — abs()+offset would
        # overflow int64 (ANSI ARITHMETIC_OVERFLOW, ~0.33% of rows)
        # whenever |hash| lands within 3e16 of Long.MAX.
        edges = batch_df.select(
            (F.pmod(F.xxhash64(
                F.lit(batch_id), F.monotonically_increasing_id(),
                *batch_df.columns), F.lit(8_000_000_000_000_000_000))
             + 30_000_000_000_000_000).alias("_id"),
            F.col(src_col).cast("long").alias("_src"),
            F.col(dst_col).cast("long").alias("_dst"))
        if rel in graph.edge_tables:
            merged = graph.edge_tables[rel] \
                .unionByName(edges, allowMissingColumns=True)
        else:
            merged = edges
        graph.edge_tables[rel] = merged.localCheckpoint(eager=True)
        seen.add(key)
        # invalidate version-keyed plan/scan/count caches — queries
        # must see the streamed edges, exactly like the write path
        # (Graph.query bumps _version on mutations)
        graph._version += 1
        graph._plan_cache.clear()
        graph._scan_cache.clear()

    return stream.writeStream.foreachBatch(upsert) \
        .option("checkpointLocation", checkpoint) \
        .trigger(availableNow=True).start()


def streaming_neardup_dedup(doc_stream: DataFrame, out_path: str,
                            checkpoint: str,
                            corpus_sig: DataFrame | None = None,
                            threshold: float = 0.5,
                            num_hashes: int = 32, bands: int = 8,
                            n: int = 3, hash_fn: str = "xxhash64",
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            sig_path: str | None = None,
                            source_bytes: int | None = None) -> None:
    """Streaming NEAR-duplicate gate — the incremental-corpus pattern
    (`pipeline.dedup.minhash_lsh_incremental`) run continuously: each
    micro-batch is MinHash-banded and probed against the accumulated
    signature index (the seed corpus plus every previously seen batch);
    survivors are appended to `out_path`, and ALL new signatures —
    kept or dropped — extend the index so later repeats of a dropped
    doc still match.

    Drop rule per batch doc d: d pairs (est >= threshold) with any
    already-indexed doc, or with a lower-id doc in its own batch. With
    batches arriving in id order this equals the batch rule "drop
    every doc that near-dups a lower id" exactly, independent of batch
    boundaries (differential-tested).

    Scale shape: per micro-batch cost ∝ batch size (shingle+minhash of
    the batch, band probe into the index) — the index is probed via the
    band equi-join, never rescanned; signatures are ids + 32 longs, so
    a trillion-doc index is a few TB of bucketed parquet in production.

    Durability: every batch's signatures append to `sig_path` (default
    `<out_path>.sig`, one `batch=<id>` subdirectory per batch) BEFORE
    the batch commits, and each batch probes the store's pre-append
    file set directly — the store IS the index, so a failure-restart
    keeps deduping against every previously indexed doc with no
    in-memory state to rebuild. A replayed batch re-appends its
    signatures into its own batch directory; duplicates are harmless
    for the drop rule (identical pairs; self-pairs drop on
    doc_a < doc_b).

    ``source_bytes`` (the stream source's on-disk size) gates the
    batch path's small-input policy for the foreachBatch body
    (``session.tune_for_input``'s gate and formula): below
    ``SPARK_GRAFT_ADAPTIVE_MIN_BYTES`` the signature and survivor
    writes run with adaptive execution off and shuffle partitions
    sized to the input (~1 per 2 MB, floor 8, never above the session
    setting) — AQE's per-stage job materialization otherwise turns
    each tiny batch write into 4–8 scheduled jobs of 1–3 tasks, pure
    scheduling floor. At or above the gate — including the gate-open
    cluster-scale setting of 0 — the session conf is untouched. The
    conf is set on the driving session BEFORE the stream starts (the
    micro-batch session clone snapshots it) and restored after the
    drain; ``_DRAIN_LOCK`` serializes overlapping drains exactly as in
    ``run_to_memory``.
    """
    from redisgraph_spark.pipeline.dedup import (minhash_lsh_incremental,
                                                 minhash_signatures)

    import glob as _glob
    import os as _os

    if sig_path is None:
        sig_path = out_path.rstrip("/") + ".sig"
    spark = doc_stream.sparkSession

    # The signature store IS the index (r11, guide §2.4/§5): batches
    # append to per-batch subdirectories (batch=<id>) and each batch
    # probes the store's pre-append file set directly — the r10 design
    # additionally maintained an in-memory localCheckpoint union chain
    # (one eager checkpoint job per batch, plus an eager checkpoint +
    # separate write for the new signatures), which duplicated the
    # durable store in RAM and would balloon with corpus size. Reading
    # the parquet back is one columnar scan of ids+signatures, and the
    # drop rule is insensitive to the duplicate signatures a replayed
    # batch can leave (identical pairs; self-pairs drop on doc_a<doc_b).

    def _prior_sig_files() -> list[str]:
        return sorted(_glob.glob(
            _os.path.join(sig_path, "batch=*", "*.parquet")))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sc = batch_df.sparkSession.sparkContext
        # pin the index file set BEFORE this batch's append so a batch
        # can never pair against itself through the store
        prior_files = _prior_sig_files()
        sig = minhash_signatures(
            batch_df, num_hashes, n, text_col, id_col,
            shingle="word", hash_fn=hash_fn)
        # durable FIRST: if the process dies between this append and
        # the stream-checkpoint commit, the worst case is a duplicate
        # signature on replay, never a lost one. The write is also the
        # batch's ONLY signature materialization — downstream uses
        # re-read the written parquet instead of a localCheckpoint.
        sc.setJobDescription(f"neardup b{batch_id}: signatures")
        sig.write.mode("append").parquet(
            _os.path.join(sig_path, f"batch={batch_id}"))
        new_sig = spark.read.parquet(
            _os.path.join(sig_path, f"batch={batch_id}")) \
            .select(sig.columns)
        parts = [p for p in (
            corpus_sig,
            spark.read.parquet(*prior_files).select(sig.columns)
            if prior_files else None) if p is not None]
        if not parts:
            index = new_sig.limit(0)
        elif len(parts) == 1:
            index = parts[0]
        else:
            index = parts[0].unionByName(parts[1])
        pairs = minhash_lsh_incremental(
            batch_df, index, num_hashes, bands, n,
            threshold=threshold, text_col=text_col, id_col=id_col,
            hash_fn=hash_fn, new_sig=new_sig)
        b_ids = new_sig.select(F.col(id_col).alias("__bid"))
        # orient each pair: which endpoint is the batch newcomer?
        fa = pairs.join(b_ids, pairs["doc_a"] == b_ids["__bid"],
                        "left").withColumnRenamed("__bid", "__ina")
        fb = fa.join(b_ids, fa["doc_b"] == b_ids["__bid"], "left") \
            .withColumnRenamed("__bid", "__inb")
        # no distinct: the left_anti below is duplicate-insensitive
        dropped = fb.select(
            F.when(F.col("__ina").isNotNull() &
                   F.col("__inb").isNotNull(),
                   F.greatest("doc_a", "doc_b"))
            .when(F.col("__inb").isNotNull(), F.col("doc_b"))
            .otherwise(F.col("doc_a")).alias(id_col))
        sc.setJobDescription(f"neardup b{batch_id}: survivor write")
        batch_df.join(dropped, id_col, "left_anti") \
            .write.mode("append").parquet(out_path)
        sc.setJobDescription(None)

    with _DRAIN_LOCK:
        prev_sp = prev_aqe = None
        if source_bytes is not None:
            from redisgraph_spark.session import _ADAPTIVE_MIN_BYTES
            if source_bytes < _ADAPTIVE_MIN_BYTES:
                prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
                prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
                sp = min(int(prev_sp),
                         max(8, int(source_bytes) // (2 * 1024 * 1024) + 1))
                spark.conf.set("spark.sql.shuffle.partitions", str(sp))
                spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            q = doc_stream.writeStream.foreachBatch(handle) \
                .option("checkpointLocation", checkpoint) \
                .trigger(availableNow=True).start()
            q.awaitTermination()
        finally:
            if prev_sp is not None:
                spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
            if prev_aqe is not None:
                spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
