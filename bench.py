"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec",
 "queries": {name: sec}, "sf": 0.1, "cold_value": ..., "cold_queries": ...}

Query set spans the engine's cost spectrum: scans, multi-hop joins +
aggregation, var-len traversal, semi-joins, mutations, dedup, ANN,
sessionization.

Methodology: each query runs once cold (recorded in cold_queries —
includes Python planning, Catalyst analysis, Janino codegen and JVM JIT
for that plan shape), then twice warm; `queries`/`value` report the
best warm run. The reference's own benchmark gates are q/s over
thousands of repetitions of each query (tests/benchmarks/*.yml driven
by redisgraph-benchmark-go), i.e. steady-state latency with plans and
JIT warm — `value` is the comparable number, `cold_value` bounds the
one-time compile overhead, which on a real cluster amortizes across a
session (and is irrelevant at the 100 TB design point where data time
dominates).

The timed action is `.toPandas()` — FULL result materialization in
the driver process via Arrow, the same work DuckDB's `fetchall()`
does in the side-by-side harness.  (`.count()` would both skip
result transfer AND force a fresh Catalyst re-optimization of a
wrapper plan on every run, measuring neither engine's steady state.)
Repeated identical queries ride the engine's plan cache exactly like
the reference's per-graph compiled-plan cache (execution_ctx.c:79-88).

`floor_probe` records the best warm wall of a trivial 1-partition
1-row job; it bounds the box's per-job scheduling floor at measurement
time so a loaded container is detectable in the artifact itself (the
r6 bench read 1.5-2x slow purely from contention).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_entity_count",
    "q_scan_filter_sort",
    "q_single_hop_agg",
    "q_two_hop_revenue",
    "q_two_hop_bucketed",
    "q_shared_node_join",
    "q_optional_match",
    "q_anti_semi_apply",
    "q_with_having",
    "q_var_len",
    # r10: temporal columnar cost made visible in the headline (the r9
    # verdict: plan-cache hits hid a 10-33s fresh-plan blowup); the
    # entry exercises date() over native columns, duration.inDays and
    # a duration-component aggregate through a join
    "q_temporal_between",
    "q_mutation_roundtrip",
    "p_dedup_exact",
    "p_minhash_lsh",
    "p_cosine_topk_np",
    "p_events_rollup",
    "p_sessions",
]

WARM_RUNS = 2


def best_committed_floor() -> float | None:
    """Minimum floor_probe across the committed BENCH_r*.json artifacts
    — the best scheduling floor this code has ever been measured at.
    Used to gate the load-triggered warm re-pass (a run whose floor is
    >2× the best-known idle floor is on a contaminated/slower box and
    gets extra passes + an in-artifact flag)."""
    import glob
    here = os.path.dirname(os.path.abspath(__file__))
    floors = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            continue
        parsed = doc.get("parsed", doc) if isinstance(doc, dict) else {}
        fp = parsed.get("floor_probe")
        if isinstance(fp, (int, float)) and fp > 0:
            floors.append(float(fp))
    return min(floors) if floors else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from redisgraph_spark import get_spark

    spark = get_spark("redisgraph-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Load phase (not billed, like the reference's graph build before
    # its benchmark loop): JVM/codegen startup, graph-catalog
    # construction + materialized topology projection (the reference
    # builds its relation matrices at load, graph.h:72-77), and the
    # pipeline tables' parquet footers/schemas.
    spark.range(1000).selectExpr("sum(id)").collect()
    # spin up the Python/Arrow worker pool once here (daemon + worker
    # fork + Arrow serializer import, ~1.8s) so the first mapInPandas
    # entry (p_cosine_topk_np) doesn't pay it inside its cold timing;
    # importing numpy in the pre-warm loads it into the reused workers
    # so the BLAS entry doesn't pay 32 numpy imports cold either
    def _prewarm(batches):
        import numpy  # noqa: F401 — cache the import in the worker
        yield from batches
    spark.range(32).repartition(32).mapInPandas(
        _prewarm, schema="id long").count()
    g = entrymod._graph(spark, sf_dir)
    g.node_count("Region")
    g.warm_traversal()
    # materialize the RAM-resident projections (persist is lazy; the
    # reference builds its matrices at graph load, graph.h:72-77)
    for _df in list(g.node_tables.values()) + list(g.edge_tables.values()):
        _df.count()
    # entity statistics are load-time running counters in the reference
    # (graph_statistics.h) — seed them here so the first var-len query
    # doesn't pay one count job per edge type for its cost model
    g.warm_statistics()
    # bucketed-layout build (save_bucketed → load_bucketed) is load,
    # not query — the reference likewise builds matrices at graph load
    gb = entrymod._bucketed_graph(spark, sf_dir)
    for _df in list(gb.node_tables.values()) + list(gb.edge_tables.values()):
        _df.count()
    for t in ("documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    # MinHash signature index: an index artifact over the documents
    # corpus (build-once, like CREATE INDEX / the reference's matrices
    # at load) — pre-build so the LSH entries time the join pipeline,
    # not the one-time signature materialization
    entrymod._minhash_sig(spark, sf_dir)

    from pyspark.sql import functions as F

    def run_once(fn) -> float:
        """One full run under reference plan-cache semantics: the
        engine's query() call (a compiled-plan-cache hit when warm,
        exactly like execution_ctx.c:79-88) plus COMPLETE data-path
        execution and full Arrow result materialization.

        A repeated `.toPandas()` on the SAME DataFrame handle would
        silently reuse the plan instance's memoized broadcast and
        shuffle outputs and skip most of the data work — so each run
        wraps the handle in a no-op filter to force a fresh physical
        plan, and the wrapper's Catalyst re-optimization (an artifact
        of the measurement, not of either engine's steady state) is
        forced OUTSIDE the timed window via executedPlan()."""
        t0 = time.time()
        df = fn(spark, sf_dir)
        planned = time.time() - t0
        fresh = df.filter(F.lit(True))
        fresh._jdf.queryExecution().executedPlan()  # untimed prep
        t0 = time.time()
        fresh.toPandas()
        return planned + (time.time() - t0)

    def measure_floor() -> float:
        probe = 9e9
        probe_df = spark.range(1).coalesce(1)
        for _ in range(3):
            t0 = time.time()
            probe_df.toPandas()
            probe = min(probe, time.time() - t0)
        return round(probe, 4)

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    steady: dict[str, float] = {}
    errors: dict[str, str] = {}

    def warm_pass() -> None:
        for name in HEADLINE:
            fn = qs[name]
            try:
                c = round(run_once(fn), 3)
                if name not in cold:
                    cold[name] = c
                best = c
                for _ in range(WARM_RUNS):
                    best = min(best, run_once(fn))
                best = round(best, 3)
                if name not in warm or best < warm[name]:
                    warm[name] = best
                # steady-state service latency: repeated toPandas on
                # the SAME cached handle — plan-cache hit plus Spark's
                # broadcast/shuffle-output reuse on the live plan
                # object. Reported separately because it reuses prior
                # data-path work; `queries` is full re-execution.
                sbest = 9e9
                for _ in range(2):
                    t0 = time.time()
                    fn(spark, sf_dir).toPandas()
                    sbest = min(sbest, time.time() - t0)
                sbest = round(sbest, 3)
                if name not in steady or sbest < steady[name]:
                    steady[name] = sbest
            except Exception as exc:  # one broken entry ≠ a lost run
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    # load-robust measurement (VERDICT r8 #4: BENCH_r08 was taken on a
    # contended box and its warm total missed the idle number by 40%):
    # when the scheduling-floor probe says the box is loaded (> ~2× the
    # recorded idle floor), run the whole warm pass again and keep the
    # per-query minima — min-of-N across passes is robust to load
    # spikes that hit one pass
    nominal_floor = float(os.environ.get("SPARK_GRAFT_IDLE_FLOOR",
                                         "0.021"))
    # r11 (VERDICT r10 #2): the 0.021 literal missed a 2.7× floor shift
    # — the r10 driver box idled at 0.0351, below the 0.042 trigger, so
    # a single elevated pass produced 14 spurious "regressions". Gate on
    # the BEST floor recorded in committed BENCH artifacts instead (the
    # true idle floor this code has ever been measured at), and emit
    # the run's floor as a ratio of it so cross-round comparisons can
    # normalize in-artifact. Env override still wins.
    if "SPARK_GRAFT_IDLE_FLOOR" not in os.environ:
        nominal_floor = min(nominal_floor,
                            best_committed_floor() or nominal_floor)
    floors = [measure_floor()]
    warm_pass()
    floors.append(measure_floor())
    attempts = 1
    while attempts < 3 and not errors and \
            min(floors[-2:]) > 2 * nominal_floor:
        warm_pass()
        floors.append(measure_floor())
        attempts += 1
    # a broken entry must NOT make the total look faster — null the
    # headline totals when any entry failed (per-query times still
    # reported so the regression is localizable)
    total = None if errors else round(sum(warm.values()), 3)
    cold_total = None if errors else round(sum(cold.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    probe = min(floors)
    out = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": warm,
        "sf": sf_num,
        "cold_value": cold_total,
        "cold_queries": cold,
        "steady_queries": steady,
        "steady_value": None if errors else round(sum(steady.values()), 3),
        "floor_probe": round(probe, 4),
        "floor_probes": floors,
        "floor_ratio_vs_best": round(probe / nominal_floor, 2),
        "warm_passes": attempts,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
