"""Structured Streaming operators driven end-to-end with file sources
and availableNow triggers."""

import json
import tempfile

import pytest


@pytest.fixture()
def event_dir(spark):
    d = tempfile.mkdtemp(prefix="rgstream")
    rows = [
        # user 1: two sessions (10:00-10:10, then 11:30)
        (1, "2024-01-01T10:00:00", 1, "click", 1.0),
        (2, "2024-01-01T10:10:00", 1, "click", 2.0),
        (3, "2024-01-01T11:30:00", 1, "view", 3.0),
        # user 2: one session
        (4, "2024-01-01T10:05:00", 2, "click", 4.0),
        # duplicate event id
        (1, "2024-01-01T10:00:00", 1, "click", 1.0),
    ]
    with open(f"{d}/part1.json", "w") as f:
        for eid, ts, uid, et, v in rows:
            f.write(json.dumps({
                "event_id": eid, "ts": ts, "user_id": uid,
                "event_type": et, "value": v, "props": "{}"}) + "\n")
    return d


def test_windowed_rollup(spark, event_dir):
    from redisgraph_spark.streaming.stream import (read_event_stream,
                                                   run_to_memory,
                                                   windowed_rollup)
    stream = read_event_stream(spark, event_dir)
    run_to_memory(windowed_rollup(stream, "1 hour"), "rollup1",
                  output_mode="complete")
    got = {(r["event_type"], str(r["window_start"])): r["n"]
           for r in spark.sql("SELECT * FROM rollup1").collect()}
    assert got[("click", "2024-01-01 10:00:00")] == 4
    assert got[("view", "2024-01-01 11:00:00")] == 1


def test_streaming_sessions(spark, event_dir):
    from redisgraph_spark.streaming.stream import (read_event_stream,
                                                   run_to_memory,
                                                   streaming_sessions)
    stream = read_event_stream(spark, event_dir)
    run_to_memory(streaming_sessions(stream, gap="30 minutes"),
                  "sessions1", output_mode="complete")
    got = {(r["user_id"], str(r["session_start"])): r["n_events"]
           for r in spark.sql("SELECT * FROM sessions1").collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 3   # incl. duplicate row
    assert got[(1, "2024-01-01 11:30:00")] == 1
    assert got[(2, "2024-01-01 10:05:00")] == 1


def test_streaming_dedup(spark, event_dir):
    from redisgraph_spark.streaming.stream import (read_event_stream,
                                                   run_to_memory,
                                                   streaming_dedup)
    stream = read_event_stream(spark, event_dir)
    run_to_memory(streaming_dedup(stream, ["event_id"]), "dedup1")
    ids = [r["event_id"]
           for r in spark.sql("SELECT event_id FROM dedup1").collect()]
    assert sorted(ids) == [1, 2, 3, 4]


def test_run_to_memory_sizes_state_partitions(spark, event_dir):
    """State-store partition count is fixed at query start from
    spark.sql.shuffle.partitions (AQE never coalesces it), so
    run_to_memory sizes it from the stream source's bytes using the
    batch path's small-input formula — and restores the session
    setting afterwards.  At/above the gate (incl. gate-open = 0) the
    conf must not be touched at all."""
    from redisgraph_spark.session import _ADAPTIVE_MIN_BYTES
    from redisgraph_spark.streaming.stream import (read_event_stream,
                                                   run_to_memory,
                                                   streaming_dedup)
    conf = spark.conf          # RuntimeConfig is cached on the session
    calls = []
    orig_set = conf.set
    conf.set = lambda k, v: (calls.append((k, str(v))), orig_set(k, v))
    try:
        prev = conf.get("spark.sql.shuffle.partitions")
        # small source: 5 MB → min(prev, max(8, 5MB//2MB + 1)) = 8
        run_to_memory(streaming_dedup(read_event_stream(spark, event_dir),
                                      ["event_id"]),
                      "dedup_sized", source_bytes=5 * 1024 * 1024)
        sized = [v for k, v in calls
                 if k == "spark.sql.shuffle.partitions"]
        expect = min(int(prev), max(8, 5 * 1024 * 1024
                                    // (2 * 1024 * 1024) + 1))
        assert sized == [str(expect), prev]      # applied, then restored
        assert conf.get("spark.sql.shuffle.partitions") == prev
        # results identical to the unsized path
        ids = [r["event_id"] for r in
               spark.sql("SELECT event_id FROM dedup_sized").collect()]
        assert sorted(ids) == [1, 2, 3, 4]
        # at/above the gate: untouched (the cluster-scale path)
        calls.clear()
        run_to_memory(streaming_dedup(read_event_stream(spark, event_dir),
                                      ["event_id"]),
                      "dedup_gate", source_bytes=_ADAPTIVE_MIN_BYTES)
        assert not [c for c in calls
                    if c[0] == "spark.sql.shuffle.partitions"]
    finally:
        conf.set = orig_set


def test_stream_into_graph(spark, event_dir):
    from redisgraph_spark import Graph
    from redisgraph_spark.streaming.stream import (read_event_stream,
                                                   stream_into_graph)
    g = Graph(spark, {}, {})
    # prime the version-keyed plan/count caches — the upsert must
    # invalidate them so queries see the streamed edges
    assert g.query("MATCH ()-[e:DID]->() RETURN count(e) AS n") \
        .collect()[0]["n"] == 0
    ckpt = tempfile.mkdtemp(prefix="rgckpt")
    q = stream_into_graph(read_event_stream(spark, event_dir), g,
                          "DID", "user_id", "event_id", ckpt)
    q.awaitTermination()
    assert "DID" in g.edge_tables
    assert g.edge_tables["DID"].count() == 5
    assert g.query("MATCH ()-[e:DID]->() RETURN count(e) AS n") \
        .collect()[0]["n"] == 5


def test_stream_edge_ids_no_overflow(spark):
    """Edge-id expression must stay inside int64 under ANSI mode: with
    the old abs(xxhash64)+3e16 form ~0.33% of rows overflowed, so a
    3000-row batch failed with ARITHMETIC_OVERFLOW w.p. >99.99%."""
    from redisgraph_spark import Graph
    from redisgraph_spark.streaming.stream import (read_event_stream,
                                                   stream_into_graph)
    d = tempfile.mkdtemp(prefix="rgstreambig")
    with open(f"{d}/part1.json", "w") as f:
        for i in range(3000):
            f.write(json.dumps({
                "event_id": i, "ts": "2024-01-01T10:00:00",
                "user_id": i % 7, "event_type": "click",
                "value": float(i), "props": "{}"}) + "\n")
    g = Graph(spark, {}, {})
    ckpt = tempfile.mkdtemp(prefix="rgckptbig")
    q = stream_into_graph(read_event_stream(spark, d), g,
                          "DID", "user_id", "event_id", ckpt)
    q.awaitTermination()
    edges = g.edge_tables["DID"]
    assert edges.count() == 3000
    from pyspark.sql import functions as F
    bad = edges.filter((F.col("_id") < 30_000_000_000_000_000)
                       | (F.col("_id") > 8_030_000_000_000_000_000))
    assert bad.count() == 0


def test_custom_stateful_operator(spark, event_dir):
    from redisgraph_spark.streaming.stream import (read_event_stream,
                                                   running_user_stats)
    stream = read_event_stream(spark, event_dir)
    q = running_user_stats(stream).writeStream.format("memory") \
        .queryName("ustats").outputMode("update") \
        .trigger(availableNow=True).start()
    q.awaitTermination()
    got = {r["user_id"]: r for r in
           spark.sql("SELECT * FROM ustats").collect()}
    # user 1: 4 rows (incl. duplicated event), user 2: 1 row
    assert got[1]["n_events"] == 4
    assert abs(got[1]["total_value"] - 7.0) < 1e-9
    assert got[1]["max_value"] == 3.0
    assert got[2]["n_events"] == 1


@pytest.mark.slow
def test_streaming_neardup_batch_split_invariant(spark, tmp_path):
    import os
    import time as _time
    from pyspark.sql import functions as F
    from redisgraph_spark.streaming.stream import streaming_neardup_dedup
    from redisgraph_spark.pipeline.dedup import minhash_lsh_pairs
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    rows = [(i, base + ("" if i % 4 else " extra tail words here"))
            for i in range(12)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # ground truth: drop every doc that near-dups a lower id
    pairs = minhash_lsh_pairs(docs, threshold=0.5).collect()
    dropped = {max(r["doc_a"], r["doc_b"]) for r in pairs}
    want = {i for i, _ in rows} - dropped
    assert 0 < len(want) < 12          # fixture has dups AND survivors

    def run(split: list[range], tag: str) -> set[int]:
        src = tmp_path / f"src_{tag}"
        os.makedirs(src)
        for k, rng in enumerate(split):
            docs.filter(F.col("doc_id").isin(list(rng))) \
                .coalesce(1).write.parquet(str(src / f"b{k}.parquet"))
            _time.sleep(1.1)   # file-source ordering is by mtime
        stream = spark.readStream.schema(docs.schema) \
            .option("maxFilesPerTrigger", 1) \
            .option("recursiveFileLookup", "true").parquet(str(src))
        out = tmp_path / f"out_{tag}"
        streaming_neardup_dedup(stream, str(out),
                                str(tmp_path / f"ck_{tag}"))
        return {r["doc_id"]
                for r in spark.read.parquet(str(out)).collect()}

    one = run([range(0, 12)], "one")
    three = run([range(0, 4), range(4, 8), range(8, 12)], "three")
    assert one == want
    assert three == want               # batch boundaries don't matter


def test_streaming_neardup_survives_restart(spark, tmp_path):
    """The signature index is durable: a SECOND stream invocation (a
    fresh process in production — here a fresh call with no in-memory
    state, same sink) must still dedup new docs against docs indexed
    by the FIRST invocation, not just against its own batches."""
    import os
    from redisgraph_spark.streaming.stream import streaming_neardup_dedup
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    out, sig = str(tmp_path / "out"), str(tmp_path / "out.sig")

    def feed(rows, tag):
        src = tmp_path / f"src_{tag}"
        os.makedirs(src)
        spark.createDataFrame(rows, ["doc_id", "text"]) \
            .coalesce(1).write.parquet(str(src / "b.parquet"))
        stream = spark.readStream \
            .schema("doc_id long, text string") \
            .option("recursiveFileLookup", "true").parquet(str(src))
        # fresh checkpoint per invocation = a restart that lost its
        # stream state; only the parquet signature index carries over
        streaming_neardup_dedup(stream, out, str(tmp_path / f"ck_{tag}"))

    feed([(1, base)], "first")
    feed([(2, base), (3, "completely different words entirely here "
                         "nothing shared with anything else at all")],
         "second")
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # doc 2 duplicates doc 1 (seen only by the FIRST invocation) and
    # must be dropped; doc 3 is novel and survives
    assert kept == {1, 3}
    assert spark.read.parquet(sig).count() >= 2


def test_streaming_neardup_small_input_policy(spark, tmp_path):
    """source_bytes below the adaptive gate runs the foreachBatch body
    with AQE off + input-sized shuffle partitions (AQE's per-stage job
    materialization otherwise turns each tiny batch write into 4-8
    scheduled jobs), and restores BOTH confs after the drain; at/above
    the gate the conf is untouched (cluster-scale path). Results must
    be identical either way."""
    import os
    from redisgraph_spark.session import _ADAPTIVE_MIN_BYTES
    from redisgraph_spark.streaming.stream import streaming_neardup_dedup
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    rows = [(i, base + ("" if i % 3 else " extra tail words here"))
            for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    src = tmp_path / "src"
    os.makedirs(src)
    docs.coalesce(1).write.parquet(str(src / "b.parquet"))

    def run(tag, source_bytes):
        stream = spark.readStream.schema(docs.schema) \
            .option("recursiveFileLookup", "true").parquet(str(src))
        out = str(tmp_path / f"out_{tag}")
        streaming_neardup_dedup(stream, out, str(tmp_path / f"ck_{tag}"),
                                source_bytes=source_bytes)
        return {r["doc_id"] for r in spark.read.parquet(out).collect()}

    conf = spark.conf
    calls = []
    orig_set = conf.set
    conf.set = lambda k, v: (calls.append((k, str(v))), orig_set(k, v))
    try:
        prev_sp = conf.get("spark.sql.shuffle.partitions")
        prev_aqe = conf.get("spark.sql.adaptive.enabled")
        kept_sized = run("sized", 5 * 1024 * 1024)
        sized = [v for k, v in calls
                 if k == "spark.sql.shuffle.partitions"]
        expect = min(int(prev_sp), max(8, 5 * 1024 * 1024
                                       // (2 * 1024 * 1024) + 1))
        assert sized == [str(expect), prev_sp]    # applied, restored
        aqe = [v for k, v in calls
               if k == "spark.sql.adaptive.enabled"]
        assert aqe == ["false", prev_aqe]
        assert conf.get("spark.sql.shuffle.partitions") == prev_sp
        assert conf.get("spark.sql.adaptive.enabled") == prev_aqe
        # at/above the gate (incl. gate-open = 0): untouched
        # (source_bytes=None is the default path every other neardup
        # test exercises)
        calls.clear()
        kept_gate = run("gate", _ADAPTIVE_MIN_BYTES)
        assert not [c for c in calls if c[0] in
                    ("spark.sql.shuffle.partitions",
                     "spark.sql.adaptive.enabled")]
        assert kept_sized == kept_gate
    finally:
        conf.set = orig_set
