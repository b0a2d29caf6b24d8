"""Variable-length traversal as iterative frontier joins.

Replaces the reference's DFS path enumerator
(``/root/reference/src/algorithms/all_paths.h:31-63``, driven by
``ops/op_cond_var_len_traverse.c``) with a breadth-synchronous loop of
DataFrame equi-joins: the frontier after hop *k* is
``frontier ⋈ edges`` with per-path visited-edge arrays enforcing the
Cypher edge-uniqueness rule (no edge twice on one path — which also
guarantees termination on cyclic graphs).

Scale notes:
- each hop is one shuffle join on the edge key — the same cost model as
  a distributed BFS; AQE handles frontier skew;
- ``localCheckpoint`` cuts lineage for unbounded expansions so plans
  don't grow with hop count;
- when the caller needs only reachability (no edge variable, no path
  variable), pass ``track_edges=False`` — the frontier then carries
  edge-id arrays only (the ``AllNeighborsCtx`` cheap mode of
  ``op_cond_var_len_traverse.h:16-37``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Safety valve for `[*]` on pathological graphs; edge-uniqueness already
# bounds depth by |E|, this just caps runaway local tests.
MAX_UNBOUNDED_HOPS = 32

# Frontier-broadcast gate: hint-broadcast the frontier side of a hop
# join only when the statistics-estimated frontier size (start_rows ×
# avg_degree^hops × bytes/row, ×4 hub-skew margin) stays under this.
# Catalyst left alone broadcasts the EDGE side (it has stats for the
# checkpointed projection but none for the frontier) — correct at
# 100 TB where neither side fits, but backwards when the frontier is a
# few thousand ids and the edge table is millions of rows: a frontier
# hash relation builds in ms and probes the edge table in place. The
# estimate assumes worst-case (nothing pruned) width and a 4× hub-skew
# margin, so the realized relation is typically ≪ this bound.
BROADCAST_FRONTIER_BYTES = 64 * 1024 * 1024


def oriented_edges(edge_df: DataFrame, direction: str,
                   from_col: str, to_col: str) -> DataFrame:
    """Edge table with traversal columns for the given direction.

    'both' materializes each edge in both orientations (minus duplicate
    self-loops) so undirected traversal stays an equi-join — the analog of
    the reference keeping transposed matrices (``graph.h:73``), but
    computed on the fly instead of stored.
    """
    if direction == "out":
        return edge_df.withColumn(from_col, F.col("_src")) \
                      .withColumn(to_col, F.col("_dst"))
    if direction == "in":
        return edge_df.withColumn(from_col, F.col("_dst")) \
                      .withColumn(to_col, F.col("_src"))
    fwd = edge_df.withColumn(from_col, F.col("_src")) \
                 .withColumn(to_col, F.col("_dst"))
    rev = edge_df.filter(F.col("_src") != F.col("_dst")) \
                 .withColumn(from_col, F.col("_dst")) \
                 .withColumn(to_col, F.col("_src"))
    return fwd.unionByName(rev)


def slim_cache_key(types, direction: str, track: bool, unbounded: bool,
                   version) -> tuple:
    """Graph-scoped cache key for the materialized slim-edge projection
    (shared between the planner and ``Graph.warm_traversal``)."""
    return ("vlckpt", tuple(sorted(types or ())), direction, track,
            unbounded, version)


def slim_projection(edges: DataFrame, from_col: str, to_col: str,
                    need_uniq: bool, track: bool,
                    edge_struct: Column | None) -> DataFrame:
    """The pre-projected edge side every hop joins against: traversal
    key + next id (+ edge id for uniqueness, + struct when the edge
    variable is referenced)."""
    esel = [F.col(from_col), F.col(to_col).alias("__vl_next")]
    if need_uniq:
        esel.append(F.col("_id").alias("__vl_eid"))
    if track:
        esel.append(edge_struct.alias("__vl_estruct"))
    return edges.select(esel)


def _gate_broadcast(frontier: DataFrame, hop: int, need_uniq: bool,
                    start_rows: int | None,
                    avg_degree: float | None) -> DataFrame:
    """Hint-broadcast the frontier entering hop `hop` when the
    statistics estimate says its hash relation is small (see
    BROADCAST_FRONTIER_BYTES); otherwise leave the join strategy to
    Catalyst (which at scale correctly shuffles both sides)."""
    if start_rows is None or avg_degree is None:
        return frontier

    def _leaves(dt) -> int:
        fields = getattr(dt, "fields", None)
        if fields is None:
            return 1
        return sum(_leaves(f.dataType) for f in fields)

    # bytes/row: ~12 per leaf field the frontier carries (worst case:
    # nothing pruned), plus the growing uniqueness array when carried
    row_bytes = 12 * _leaves(frontier.schema) \
        + (8 * hop if need_uniq else 0)
    est = start_rows * (avg_degree ** (hop - 1)) * row_bytes * 4
    return F.broadcast(frontier) if est < BROADCAST_FRONTIER_BYTES \
        else frontier


def _stop_augmented(e: DataFrame, from_col: str,
                    ckpt_cache: dict | None,
                    cache_key: tuple | None) -> DataFrame | None:
    """Edge projection augmented with absorbing stop-states: for every
    node v reachable as a hop destination, rows (v → ⊥v) and (⊥v → ⊥v)
    with ⊥v = -v-1. A path in the single-cascade expansion may take the
    stop transition once it has satisfied min_hops and then rides the
    deterministic ⊥ self-loop to the end of the cascade — so every
    admissible prefix length falls out of ONE join pipeline instead of
    a union that re-evaluates each shorter chain.

    The ⊥ encoding requires the real id space to be non-negative (so
    ⊥ ids can never collide with a live id); returns None when the edge
    projection contains a negative id and the caller falls back to the
    prefix-union plan. The stop table is checkpointed once per
    (relation set, direction, graph version) alongside the slim
    projection it derives from."""
    key = None if cache_key is None else ("vlstop",) + cache_key
    if ckpt_cache is not None and key is not None and key in ckpt_cache:
        stops = ckpt_cache[key]
    else:
        lo = e.select(F.least(F.min(from_col), F.min("__vl_next"))
                      .alias("lo")).collect()[0]["lo"]
        if lo is not None and lo < 0:
            stops = None
        else:
            bot = (-F.col("__v") - 1).cast("long")
            stops = e.select(F.col("__vl_next").alias("__v")) \
                .dropDuplicates() \
                .select(F.explode(F.array(
                    F.struct(F.col("__v").cast("long").alias(from_col),
                             bot.alias("__vl_next")),
                    F.struct(bot.alias(from_col),
                             bot.alias("__vl_next")))).alias("__s")) \
                .select("__s.*") \
                .localCheckpoint(eager=True)
        if ckpt_cache is not None and key is not None:
            ckpt_cache[key] = stops
    if stops is None:
        return None
    return e.select(F.col(from_col).cast("long").alias(from_col),
                    F.col("__vl_next").cast("long").alias("__vl_next")) \
        .unionByName(stops)


def _cascade_expand(base: DataFrame, frontier: DataFrame, e: DataFrame,
                    min_hops: int, max_hops: int, out_id: str,
                    from_col: str, ckpt_cache: dict | None,
                    cache_key: tuple | None,
                    start_rows: int | None,
                    avg_degree: float | None) -> DataFrame | None:
    """Bounded anonymous ``[*min..max]`` as one join cascade.

    Hops ≤ max(min,1) join the real edge projection (the path must
    advance); later hops join the stop-augmented projection, so a path
    may halt at any admissible length and is carried to the end by the
    absorbing ⊥ transitions. min=0 contributes the untouched base rows
    by union (no join subtree duplicated). Returns None when the stop
    encoding is unavailable (negative ids in the graph)."""
    must = max(min_hops, 1)
    e_plus = None
    if max_hops > must:
        e_plus = _stop_augmented(e, from_col, ckpt_cache, cache_key)
        if e_plus is None:
            return None
    keep = [F.col(c) for c in base.columns]
    cur = frontier
    for hop in range(1, max_hops + 1):
        side = e if hop <= must else e_plus
        probe = _gate_broadcast(cur, hop, False, start_rows, avg_degree)
        cur = probe.join(side, cur["__vl_cur"] == side[from_col],
                         "inner") \
            .select(*keep, F.col("__vl_next").alias("__vl_cur"))
    end = F.col("__vl_cur")
    if e_plus is not None:
        # ⊥ ids appear only when stop transitions were in play (and the
        # gate then guarantees real ids are non-negative)
        end = F.when(end < 0, -end - 1).otherwise(end)
    out = cur.select(*keep, end.alias(out_id))
    if min_hops == 0:
        zero = frontier.select(
            *keep, F.col("__vl_cur").alias(out_id))
        out = zero.unionByName(out) if max_hops > 0 else zero
    return out


def var_len_expand(base: DataFrame, start_id: Column, edges: DataFrame,
                   min_hops: int, max_hops: int | None,
                   out_id: str, out_edges: str | None,
                   from_col: str = "__vl_from", to_col: str = "__vl_to",
                   edge_struct: Column | None = None,
                   ckpt_cache: dict | None = None,
                   cache_key: tuple | None = None,
                   hop_cap: int | None = None,
                   start_rows: int | None = None,
                   avg_degree: float | None = None) -> DataFrame:
    """Expand ``base`` along ``edges`` for ``min_hops..max_hops``.

    base       — input records (any columns; preserved on output)
    start_id   — Column in `base` giving the start node id
    edges      — oriented edge df with `from_col`/`to_col` + `_id`
                 (+ whatever edge_struct needs)
    out_id     — name of the produced end-node-id column
    out_edges  — if not None, name of produced array<edge-struct> column
    Returns base ⋈ paths with columns of base + out_id (+ out_edges).

    Uniqueness mode: visited-edge arrays are carried only when the edge
    variable is referenced (``out_edges``) or the expansion is unbounded
    (termination). For bounded anonymous expansions this matches the
    reference's own relaxation — unreferenced relationships skip the
    uniqueness check (``docs/known_limitations.md:3-24``) — and the
    expansion becomes a pure join chain with no per-path state.
    """
    track = out_edges is not None
    unbounded = max_hops is None
    need_uniq = track or unbounded
    if edge_struct is None:
        edge_struct = F.struct(*[F.col(c) for c in edges.columns
                                 if not c.startswith("__")])
    if max_hops is not None and min_hops > max_hops:
        # empty hop interval (*2..1, *1..0, *..0) matches nothing
        # (openCypher Match5 [11]-[13]; the reference @skips these)
        out = base.filter(F.lit(False)) \
            .withColumn(out_id, F.lit(None).cast("long"))
        if track:
            elem_t = edges.select(edge_struct.alias("__e")) \
                .schema[0].dataType
            out = out.withColumn(
                out_edges, F.lit(None).cast(T.ArrayType(elem_t)))
        return out
    # Pre-project the edge side once: traversal key + edge id (+ struct).
    e = slim_projection(edges, from_col, to_col, need_uniq, track,
                        edge_struct)
    cached = ckpt_cache.get(cache_key) if ckpt_cache is not None \
        and cache_key is not None else None
    if cached is not None:
        e = cached
    elif max_hops is None or max_hops > 1:
        # materialize the slim oriented-edge projection once; every hop
        # (and the final union) then reuses it instead of re-reading and
        # re-unioning the relation tables (measured 2× on 2-hop sf0.1).
        # The caller may pass a graph-scoped cache so REPEATED var-len
        # queries share one materialization (the reference's
        # variable_length_filter KPI is exactly this repetition).
        e = e.localCheckpoint(eager=True)
        if ckpt_cache is not None and cache_key is not None:
            ckpt_cache[cache_key] = e

    cur_cols = [F.col(c) for c in base.columns]
    state = [start_id.cast("long").alias("__vl_cur")]
    if need_uniq:
        state.append(F.array().cast("array<long>").alias("__vl_eids"))
    if track:
        # cast with the DataType object — a DDL string round-trip
        # breaks on property names that need quoting
        path_t = T.ArrayType(
            edges.select(edge_struct.alias("x")).schema[0].dataType)
        state.append(F.array().cast(path_t).alias("__vl_path"))
    frontier = base.select(*cur_cols, *state)

    if not need_uniq:
        # bounded anonymous expansion: single join cascade with
        # absorbing stop-states instead of a union of per-hop prefix
        # chains (which re-evaluates every shorter chain — hop 1's join
        # appears once per longer hop in the union plan). None = stop
        # encoding unavailable (negative ids); fall through to the
        # prefix-union plan below.
        cascade = _cascade_expand(base, frontier, e, min_hops, max_hops,
                                  out_id, from_col, ckpt_cache,
                                  cache_key, start_rows, avg_degree)
        if cascade is not None:
            return cascade

    results: list[DataFrame] = []
    if min_hops == 0:
        results.append(frontier)

    hop = 0
    if unbounded:
        # MAX_UNBOUNDED_HOPS config: -1 = iterate to frontier
        # exhaustion (edge-uniqueness guarantees termination, like the
        # reference's uncapped DFS all_paths.h:31-63)
        if hop_cap is None:
            hop_cap = MAX_UNBOUNDED_HOPS
        cap = float("inf") if hop_cap == -1 else hop_cap
    else:
        cap = max_hops
    truncated = False
    while hop < cap:
        hop += 1
        probe = _gate_broadcast(frontier, hop, need_uniq,
                                start_rows, avg_degree)
        joined = probe.join(e, frontier["__vl_cur"] == e[from_col], "inner")
        keep = [F.col(c) for c in base.columns]
        nxt_cols = [F.col("__vl_next").alias("__vl_cur")]
        if need_uniq:
            joined = joined.filter(~F.array_contains(
                F.col("__vl_eids"), F.col("__vl_eid")))
            nxt_cols.append(F.array_append(
                F.col("__vl_eids"), F.col("__vl_eid")).alias("__vl_eids"))
        if track:
            nxt_cols.append(F.array_append(
                F.col("__vl_path"),
                F.col("__vl_estruct")).alias("__vl_path"))
        nxt = joined.select(*keep, *nxt_cols)
        if unbounded:
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
        frontier = nxt
        if hop >= min_hops:
            results.append(frontier)
    else:
        truncated = unbounded
    if truncated:
        import warnings
        warnings.warn(
            f"unbounded [*] expansion stopped at MAX_UNBOUNDED_HOPS="
            f"{hop_cap} with a live frontier; paths longer than "
            f"{hop_cap} hops are not enumerated (set graph config "
            "MAX_UNBOUNDED_HOPS to -1 to iterate to exhaustion)",
            RuntimeWarning, stacklevel=2)

    if not results:
        # empty result with correct schema
        results = [frontier.limit(0)]
    # every accumulated frontier shares the same column set (base
    # columns + the state columns chosen once above)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    final = [F.col(c) for c in base.columns] + \
        [F.col("__vl_cur").alias(out_id)]
    if track:
        final.append(F.col("__vl_path").alias(out_edges))
    return out.select(final)
