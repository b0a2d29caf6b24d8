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


def hash_sample(df: DataFrame, id_col: str, rates: dict[str, float],
                stratum_col: str, default_rate: float = 0.0,
                seed: str = "s0") -> DataFrame:
    """Deterministic stratified sampling: keep a row iff the md5 of
    `seed:id` falls under its stratum's rate. The standard mixture
    re-weighting op (up-/down-sample languages or sources to a target
    mix) — hash-based instead of RNG so the sample is reproducible
    across runs, engines, and partitionings, and a re-run on an
    appended corpus keeps previously-kept rows stable.

    Rates are quantized to 1/65536 granularity: a row is kept when the
    first 4 hex chars of md5('<seed>:' || id) read as an int are
    < rate * 65536. Identical arithmetic runs in the DuckDB oracle.

    Scale shape: pure per-row map fused into the scan (the rate lookup
    is a CASE over a handful of strata) — no shuffle, no state.
    """
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + ":"),
                       F.col(id_col).cast("string"))), 1, 4),
        16, 10).cast("long")
    thresh = None
    for stratum, rate in sorted(rates.items()):
        cut = int(rate * 65536)
        cond = F.when(F.col(stratum_col) == stratum, F.lit(cut))
        thresh = cond if thresh is None else thresh.when(
            F.col(stratum_col) == stratum, F.lit(cut))
    thresh = (thresh.otherwise(F.lit(int(default_rate * 65536)))
              if thresh is not None
              else F.lit(int(default_rate * 65536)))
    return df.filter(bucket < thresh)


def pack_sequences(docs: DataFrame, window_tokens: int,
                   token_col: str, shard_col: str,
                   id_col: str = "doc_id") -> DataFrame:
    """Assign each document its position in a concat-and-chunk training
    stream: docs are concatenated in (shard, id) order and split into
    fixed `window_tokens` context windows; each doc gets the chunk
    index and offset where it starts.

    Packing is inherently sequential, so at scale it runs PER SHARD
    (`shard_col` — a source, a date bucket, a hash bucket): the running
    token total is a window cumulative sum partitioned by shard, which
    Spark executes as one shuffle + per-partition scan. A global
    single-stream pack would serialize the whole corpus through one
    task — that is the anti-pattern this signature forbids (pass a
    constant shard column explicitly if you truly want it).

    Output: (id, shard, n_tokens, chunk, chunk_offset) where `chunk` =
    floor(preceding_tokens / window) within the shard and
    `chunk_offset` = preceding_tokens % window.
    """
    w = Window.partitionBy(shard_col).orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return docs.select(
        F.col(id_col), F.col(shard_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.floor(prev / window_tokens).cast("long").alias("chunk"),
        (prev % window_tokens).cast("long").alias("chunk_offset"))


def temperature_sample(df: DataFrame, id_col: str, stratum_col: str,
                       alpha: float = 0.7, base_rate: float = 0.5,
                       seed: str = "s0") -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual
    up-/down-sampling rule of mBERT/mT5): the output mix follows
    share^alpha renormalized, so alpha<1 flattens the head strata and
    boosts the tail. Per-row keep rate r_i ∝ share_i^(alpha-1), scaled
    so the largest rate equals `base_rate`; the keep decision is the
    same deterministic md5-threshold as `hash_sample`, so the sample is
    reproducible and append-stable.

    Rates are rounded to a 1e-9 grid before quantizing to the 16-bit
    cut so both engines (libm pow on IEEE doubles) land on the same
    integer threshold.

    Output: kept rows as (id, stratum, cut) — `cut` carries the
    stratum's quantized threshold so results are value-checkable.

    Scale shape: one tiny groupBy for the histogram (strata count ~
    languages/sources), a broadcast join of the rates, and a fused
    per-row filter. The corpus never shuffles.
    """
    counts = df.groupBy(stratum_col) \
        .agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("__t"))
    w = F.pow(F.col("__n") / F.col("__t"), F.lit(alpha - 1.0))
    rates = counts.crossJoin(F.broadcast(total)) \
        .withColumn("__w", w) \
        .withColumn("__wmax", F.max("__w").over(
            Window.partitionBy(F.lit(1)))) \
        .select(stratum_col,
                F.floor(F.round(F.lit(base_rate) * F.col("__w")
                                / F.col("__wmax") * 65536 * 1e9) / 1e9)
                .cast("long").alias("cut"))
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + ":"),
                       F.col(id_col).cast("string"))), 1, 4),
        16, 10).cast("long")
    return df.join(F.broadcast(rates), stratum_col) \
        .filter(bucket < F.col("cut")) \
        .select(F.col(id_col), F.col(stratum_col), F.col("cut"))


def quality_bins(df: DataFrame, score_col: str, n_bins: int = 10,
                 group_col: str | None = None,
                 id_col: str = "doc_id") -> DataFrame:
    """Percentile quality binning — the step before curriculum or
    rejection sampling: rank rows by `score_col` (ties broken by id so
    the binning is total and engine-deterministic) and deal them into
    `n_bins` equal-depth bins, per `group_col` when given (each source
    gets its own decile boundaries, the usual way quality cutoffs are
    applied so one clean source doesn't absorb the whole top bin).

    Output: input id/group columns + (score, bin) with bin in 1..n_bins.

    Scale shape: one window (ntile) partitioned by group — per-group
    sort, no global single-task order when grouped; pass
    group_col=None only for corpus sizes where one sorted partition is
    acceptable or let the caller pre-bucket.
    """
    from pyspark.sql import Window
    part = Window.partitionBy(group_col) if group_col else \
        Window.partitionBy(F.lit(1))
    w = part.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    cols = [id_col] + ([group_col] if group_col else [])
    return df.withColumn("bin", F.ntile(n_bins).over(w)) \
        .select(*cols, F.col(score_col).alias("score"), "bin")


def train_split(df: DataFrame, id_col: str,
                fractions: dict[str, float] | None = None,
                seed: str = "s0") -> DataFrame:
    """Deterministic train/validation/test assignment by hash — the
    split every training pipeline needs before anything touches the
    data. A row's split is a pure function of (seed, id): the first 4
    hex chars of md5('<seed>:' || id) read as an int in [0, 65536)
    land in consecutive cumulative-fraction intervals (same 1/65536
    quantization as `hash_sample`, so the DuckDB oracle replays the
    identical arithmetic). Hash-based, not RNG-based, so the split is
    reproducible across runs, engines and partitionings, documents
    appended later never reshuffle earlier assignments, and the same
    doc always lands in the same split — the property that prevents
    train/test leakage across pipeline re-runs.

    `fractions` maps split name → fraction; they must sum to ≤ 1.0
    (any remainder falls into the LAST split in insertion order, which
    also absorbs quantization residue). Default 90/5/5.

    Scale shape: per-row map fused into the scan — no shuffle, no
    state, no collect. Returns the input + a `split` column.
    """
    fractions = fractions or {"train": 0.90, "val": 0.05, "test": 0.05}
    if not fractions or any(v < 0 for v in fractions.values()):
        raise ValueError("train_split: fractions must be non-negative")
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("train_split: fractions sum above 1.0")
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + ":"),
                       F.col(id_col).cast("string"))), 1, 4),
        16, 10).cast("long")
    names = list(fractions)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < F.lit(int(round(cum * 65536)))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
