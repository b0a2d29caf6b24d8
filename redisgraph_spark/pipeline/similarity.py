"""Similarity search over embedding columns.

- `cosine_topk`: exact brute-force top-k (the correctness baseline) —
  cross join + per-query top-k via window rank. O(n·q) but fully
  distributed; right for small query sets / reranking.
- `cosine_topk_lsh`: random-hyperplane LSH bucketing — the 100 TB path:
  queries only compare against same-bucket candidates (multi-probe via
  several tables), turning the cross join into an equi-join on
  (table, bucket).

Dot products use `F.zip_with` + `F.aggregate` — JVM higher-order
functions, no Python UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import spread


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "vec_id", q_vec_col: str = "embedding"
                ) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank), excluding self-matches.
    The corpus side stays distributed; the (small) query side is
    broadcast, so the scan is one pass over the corpus.
    """
    q = queries.select(F.col(q_id_col).alias("query_id"),
                       F.col(q_vec_col).alias("qv"))
    c = spread(emb).select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("query_id").isNotNull()
                    & (F.col("neighbor_id") != F.col("query_id")), "inner") \
        .withColumn("cosine", cosine_sim(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id") \
        .orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("query_id", "neighbor_id", "cosine", "rank")


def knn_classify(emb: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """k-NN majority-vote classification over an embedding corpus:
    each query gets the modal `label_col` of its exact top-k cosine
    neighbors (ties → max count, then smallest label — deterministic).
    Returns (query_id, pred_label, votes).

    Composition: exact top-k (corpus never shuffles, queries
    broadcast) → broadcast label join on the k·|queries| neighbor rows
    → one grouped aggregate. At 100 TB the only large-side pass is the
    top-k scan itself."""
    nn = cosine_topk(emb, queries, k, id_col, vec_col)
    labels = emb.select(F.col(id_col).alias("neighbor_id"),
                        F.col(label_col).alias("__lbl"))
    votes = nn.join(labels, "neighbor_id") \
        .groupBy("query_id", "__lbl") \
        .agg(F.count(F.lit(1)).alias("votes"))
    # deterministic mode: min over (−votes, label)
    top = votes.groupBy("query_id").agg(F.min(F.struct(
        (-F.col("votes")).alias("nv"), F.col("__lbl").alias("l"))).alias("t"))
    return top.select(
        F.col("query_id"),
        F.col("t.l").alias("pred_label"),
        (-F.col("t.nv")).alias("votes"))


def _rh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · plane_i)."""
    bits = []
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec,
                       F.array(*[F.lit(float(x)) for x in p]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj >= 0,
                           F.lit(1 << i).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def _planes(dim: int, nbits: int, seed: int) -> list[list[float]]:
    # deterministic pseudo-random hyperplanes (LCG; no numpy dependency
    # at plan time keeps this serializable-trivial)
    state = seed * 6364136223846793005 + 1442695040888963407
    planes = []
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def centroid_means(assign: DataFrame, keys: list[str], vec_col: str,
                   round_grid: float | None = None) -> DataFrame:
    """Per-key mean vector for Lloyd re-estimation, keyed by
    (keys…, dimension-index) via posexplode — the plan is O(1) in
    vector dimension. (The previous shape built one agg column per
    dimension: at production embedding dims (768–1536) × nlist that
    explodes plan/codegen size — round-7 advice.) Output columns:
    *keys, ``center`` (array<double>, dimension order restored by an
    array_sort on the index)."""
    mean = F.avg(F.col("__x"))
    if round_grid:
        mean = F.round(mean * round_grid) / round_grid
    per_dim = assign.select(
        *keys, F.posexplode(F.col(vec_col)).alias("__d", "__x")) \
        .groupBy(*keys, "__d").agg(mean.alias("__m"))
    return per_dim.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("__d"),
                                                 F.col("__m")))),
            lambda s: s.getField("__m")).alias("center"))


def ivf_build(emb: DataFrame, nlist: int = 16, iters: int = 3,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: Lloyd iterations over DataFrames.

    Centroid init = lowest-id vectors (deterministic). Assignment is a
    broadcast join against the (tiny) centroid table + window argmax;
    re-estimation is one groupBy. Returns (centroids(list_id, center),
    assignments(id, list_id)).
    """
    spark = emb.sparkSession
    emb = spread(emb)   # per-row HOF cosine math must not run one-task
    init = [r[vec_col] for r in
            emb.orderBy(id_col).limit(nlist).collect()]
    from redisgraph_spark.session import inline_df
    if not init:
        # empty corpus: empty quantizer + assignments (downstream
        # top-k then yields zero rows) instead of an IndexError
        empty_c = inline_df(
            spark, [], [("list_id", "bigint"),
                        ("center", "array<double>")])
        empty_a = emb.select(
            F.col(id_col),
            F.lit(0).cast("bigint").alias("list_id")).limit(0)
        return empty_c, empty_a
    centroids = inline_df(
        spark,
        [(i, [float(x) for x in v]) for i, v in enumerate(init)],
        [("list_id", "bigint"), ("center", "array<double>")])
    for _ in range(iters):
        scored = emb.crossJoin(F.broadcast(centroids)) \
            .withColumn("__sim", cosine_sim(F.col(vec_col),
                                            F.col("center")))
        w = Window.partitionBy(id_col).orderBy(
            F.col("__sim").desc(), F.col("list_id").asc())
        assign = scored.withColumn("__rk", F.row_number().over(w)) \
            .filter(F.col("__rk") == 1).select(id_col, "list_id", vec_col)
        centroids = centroid_means(assign, ["list_id"], vec_col) \
            .localCheckpoint(eager=True)
    scored = emb.crossJoin(F.broadcast(centroids)) \
        .withColumn("__sim", cosine_sim(F.col(vec_col), F.col("center")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("list_id").asc())
    assign = scored.withColumn("__rk", F.row_number().over(w)) \
        .filter(F.col("__rk") == 1).select(id_col, "list_id")
    return centroids, assign


def cosine_topk_ivf(emb: DataFrame, queries: DataFrame, k: int = 5,
                    nlist: int = 16, nprobe: int = 4, iters: int = 3,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """IVF ANN: queries probe their nprobe closest inverted lists and
    rerank exactly within them. The candidate join is an equi-join on
    list_id — at 100 TB each query touches nprobe/nlist of the corpus.
    """
    centroids, assign = ivf_build(emb, nlist, iters, id_col, vec_col)
    corpus = emb.join(assign, id_col).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_v"),
        "list_id")
    qs = queries.crossJoin(F.broadcast(centroids)) \
        .withColumn("__sim", cosine_sim(F.col(vec_col), F.col("center")))
    wq = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("list_id").asc())
    probes = qs.withColumn("__rk", F.row_number().over(wq)) \
        .filter(F.col("__rk") <= nprobe) \
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_v"),
                "list_id")
    cand = corpus.join(probes, "list_id") \
        .filter(F.col("n_id") != F.col("q_id"))
    scored = cand.withColumn("cosine",
                             cosine_sim(F.col("q_v"), F.col("n_v")))
    w = Window.partitionBy("q_id") \
        .orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select(F.col("q_id").alias("query_id"),
                F.col("n_id").alias("neighbor_id"), "cosine", "rank")


def _l2sq(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double")))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _normalized(vec: Column) -> Column:
    n = norm(vec)
    return F.transform(vec, lambda x: x.cast("double") / n)


def pq_build(emb: DataFrame, m: int = 8, ksub: int = 16, iters: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding"
             ) -> tuple[DataFrame, DataFrame]:
    """Product quantizer (Jégou et al., TPAMI'11): vectors are
    L2-normalized (so L2 order ≡ cosine order), split into `m`
    subspaces, and each subspace gets a `ksub`-centroid k-means
    codebook. Returns (codebook(sub, code, center), codes(id,
    codes array<int>)).

    All `m` subspace k-means run in ONE DataFrame pipeline per Lloyd
    iteration (explode to (id, sub, subvector) rows; assignment is a
    broadcast join + window argmin; re-estimation one groupBy) — the
    iteration cost is a single key-partitioned shuffle regardless of
    m. Centroid init is the lowest-id vectors' subvectors
    (deterministic). Empty codes keep their previous center.
    """
    from redisgraph_spark.session import inline_df
    spark = emb.sparkSession
    first = emb.filter(F.col(vec_col).isNotNull()) \
        .select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"]) if first is not None else 0
    if dim <= 0 or dim % m:
        raise ValueError(f"pq_build: dim {dim} not divisible by m={m}")
    dsub = dim // m
    nv = _normalized(F.col(vec_col))
    subs = spread(emb).select(
        F.col(id_col).alias("__pid"),
        F.posexplode(F.array(*[
            F.slice(nv, s * dsub + 1, dsub) for s in range(m)]))
        .alias("__sub", "__sv"))
    seed_rows = emb.orderBy(id_col).limit(ksub) \
        .select(nv.alias("__nv")).collect()
    cent_rows = []
    for code, r in enumerate(seed_rows):
        v = r["__nv"]
        for s in range(m):
            cent_rows.append((s, code, [float(x) for x in
                                        v[s * dsub:(s + 1) * dsub]]))
    centroids = inline_df(
        spark, cent_rows,
        [("__sub", "int"), ("__code", "int"),
         ("__center", "array<double>")])
    wa = Window.partitionBy("__pid", "__sub").orderBy(
        F.col("__d").asc(), F.col("__code").asc())

    def assign(cents):
        return subs.join(F.broadcast(cents), "__sub") \
            .withColumn("__d", _l2sq(F.col("__sv"), F.col("__center"))) \
            .withColumn("__rk", F.row_number().over(wa)) \
            .filter(F.col("__rk") == 1) \
            .select("__pid", "__sub", "__code", "__sv")

    for _ in range(iters):
        a = assign(centroids)
        new_c = centroid_means(a, ["__sub", "__code"], "__sv") \
            .withColumnRenamed("center", "__newc")
        centroids = centroids.join(new_c, ["__sub", "__code"], "left") \
            .select("__sub", "__code",
                    F.coalesce(F.col("__newc"), F.col("__center"))
                    .alias("__center")) \
            .localCheckpoint(eager=True)
    codes = assign(centroids).groupBy(F.col("__pid").alias(id_col)).agg(
        F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("__sub"), F.col("__code")))),
            lambda st: st.getField("__code")).alias("codes"))
    return centroids, codes.localCheckpoint(eager=True)


def cosine_topk_pq(emb: DataFrame, queries: DataFrame, k: int = 5,
                   m: int = 8, ksub: int = 16, iters: int = 3,
                   shortlist: int = 128,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   prebuilt: tuple[DataFrame, DataFrame] | None = None
                   ) -> DataFrame:
    """PQ ANN with asymmetric distance + exact rerank: corpus vectors
    live as m-byte code words; each query computes an m×ksub lookup
    table of subspace distances once, scores every code word with m
    array lookups (no vector arithmetic on the corpus side), keeps a
    `shortlist`, and reranks the shortlist with exact cosine.

    100 TB shape: the scored pass touches only the code table (m bytes
    per vector — 32× smaller than the float corpus at m=8/dim=64);
    full vectors are read only for the shortlist join. Recall is
    governed by `shortlist` (pytest measures the recall curve; the
    contract entry runs at measured recall-1.0 settings).
    """
    centroids, codes = prebuilt if prebuilt is not None \
        else pq_build(emb, m, ksub, iters, id_col, vec_col)
    nv = _normalized(F.col(vec_col))
    qsubs = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(F.array(*[
            F.slice(nv, s * (F.size(nv) / m).cast("int") + 1,
                    (F.size(nv) / m).cast("int"))
            for s in range(m)])).alias("__sub", "__qv"))
    lut = qsubs.join(F.broadcast(centroids), "__sub") \
        .withColumn("__d", _l2sq(F.col("__qv"), F.col("__center"))) \
        .groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("__sub"), F.col("__code"), F.col("__d")))),
                lambda st: st.getField("__d")).alias("__lut"))
    scored = codes.crossJoin(F.broadcast(lut)) \
        .filter(F.col(id_col) != F.col("query_id")) \
        .withColumn("__approx", F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
            lambda acc, s: acc + F.element_at(
                "__lut", (s * ksub
                          + F.element_at("codes", s + 1) + 1)
                .cast("int"))))
    ws = Window.partitionBy("query_id").orderBy(
        F.col("__approx").asc(), F.col(id_col).asc())
    short = scored.withColumn("__rk", F.row_number().over(ws)) \
        .filter(F.col("__rk") <= shortlist) \
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    nvec = emb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__nv"))
    qvec = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__qfull"))
    rer = short.join(nvec, "neighbor_id") \
        .join(F.broadcast(qvec), "query_id") \
        .withColumn("cosine", cosine_sim(F.col("__qfull"),
                                         F.col("__nv")))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return rer.withColumn("rank", F.row_number().over(wr)) \
        .filter(F.col("rank") <= k) \
        .select("query_id", "neighbor_id", "cosine", "rank")


def cosine_topk_np(emb: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   q_id_col: str = "vec_id", q_vec_col: str = "embedding"
                   ) -> DataFrame:
    """Exact top-k via an Arrow-vectorized matrix multiply.

    Same answer as `cosine_topk`, different physical strategy: the
    (small) query set collects to a numpy matrix broadcast into every
    task; the corpus streams through `mapInPandas` in Arrow batches and
    each batch does ONE normalized `corpus_batch @ queries.T` BLAS
    call, emitting per-batch partial top-k. A final window rank merges
    partials. Catalyst higher-order-function lambdas run interpreted
    per element (~25 ns/step); the BLAS path is 50-100× faster per
    pair and is the right brute-force shape when q is small and the
    corpus is 100 TB — the corpus never shuffles, Python sees only
    Arrow batches."""
    import numpy as np

    # id columns keep their source types (cosine_topk supports any id
    # type — hardcoding long would Arrow-fail on string ids)
    q_id_t = dict(queries.dtypes)[q_id_col]
    n_id_t = dict(emb.dtypes)[id_col]
    partial_schema = (f"query_id {q_id_t}, neighbor_id {n_id_t}, "
                      "cosine double")
    q_rows = queries.select(F.col(q_id_col).alias("qid"),
                            F.col(q_vec_col).alias("qv")).collect()
    if not q_rows:
        return emb.sparkSession.createDataFrame(
            [], partial_schema + ", rank int")
    q_ids = np.array([r["qid"] for r in q_rows])
    qm = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sc = emb.sparkSession
    bq = sc.sparkContext.broadcast((q_ids, qm))

    def score(batches):
        import pandas as pd
        ids, qmat = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(list(pdf[vec_col]), dtype=np.float64)
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qmat.T                    # (batch, n_queries)
            nid = pdf[id_col].to_numpy()
            out = []
            for j in range(len(ids)):
                col = sims[:, j]
                mask = nid != ids[j]              # exclude self
                cand_i = np.nonzero(mask)[0]
                if not len(cand_i):
                    continue
                # tie-break by neighbor_id ASC, matching the final
                # window rank — batch-position tie-breaking would drop
                # a tied neighbor the exact path keeps (lexsort's LAST
                # key is primary)
                order = np.lexsort((nid[cand_i], -col[cand_i]))
                top = cand_i[order[:k]]
                out.append(pd.DataFrame({
                    "query_id": ids[j], "neighbor_id": nid[top],
                    "cosine": col[top]}))
            if out:
                yield pd.concat(out)

    # no spread() here: the BLAS batch is ~µs per row, so a one-partition
    # small corpus is fine single-task, and the repartition shuffle it
    # would add (~0.2 s) exceeds the gain; at real scale the scan is
    # already wide and spread would be a no-op anyway.
    # explicit select before the opaque function: Spark cannot see
    # which columns `score` touches, so without it EVERY column of the
    # corpus is read and shipped through Arrow (guide §4 — column
    # pruning stops at mapInPandas)
    partial = emb.select(id_col, vec_col).mapInPandas(
        score, schema=partial_schema)
    w = Window.partitionBy("query_id") \
        .orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return partial.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select("query_id", "neighbor_id", "cosine", "rank")


def cosine_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 5,
                    nbits: int = 8, ntables: int = 4, dim: int | None = None,
                    probe_hamming: int = 0,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    Candidates = vectors sharing a bucket with the query in any table;
    exact cosine + rank on candidates only. At scale the bucket join
    shuffles on (table, bucket) — no cross join anywhere; the corpus is
    bucketized once and never explodes.

    `probe_hamming` enables multi-probe LSH (Lv et al., VLDB'07): each
    QUERY additionally probes every bucket within that Hamming distance
    of its own signature — recall of many extra tables at the memory
    cost of none. Only the (small) query side fans out (×Σ C(nbits,i));
    the corpus-side index is untouched.

    `dim` defaults to the length of the first corpus vector.
    """
    if dim is None:
        # infer from a NON-NULL vector: size(NULL) = -1 would produce
        # zero planes → every row hashes to bucket 0 (degenerate
        # cross join)
        first = emb.filter(F.col(vec_col).isNotNull()) \
            .select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first is not None else 0
    if dim <= 0:
        raise ValueError(
            f"cosine_topk_lsh: cannot infer dim from {vec_col!r} "
            "(empty or all-null column); pass dim= explicitly")
    tables = []
    for t in range(ntables):
        planes = _planes(dim, nbits, seed=1000 + t)
        tables.append((t, planes))
    # combinatorial enumeration (not a 2**nbits scan — O(1M+) driver
    # work at nbits 20+ even when probe_hamming=0)
    import itertools
    probe_masks = [0]
    for d in range(1, min(probe_hamming, nbits) + 1):
        for bits in itertools.combinations(range(nbits), d):
            probe_masks.append(sum(1 << b for b in bits))

    def bucketize(df: DataFrame, idc: str, vcol: str, side: str
                  ) -> DataFrame:
        parts = []
        for t, planes in tables:
            base = df.select(
                F.col(idc).alias(f"{side}_id"),
                F.col(vcol).alias(f"{side}_v"),
                F.lit(t).alias("tbl"),
                _rh_bucket(F.col(vcol), planes).alias("bucket"))
            if side == "q" and len(probe_masks) > 1:
                base = base.select(
                    f"{side}_id", f"{side}_v", "tbl",
                    F.explode(F.array(*[
                        F.col("bucket").bitwiseXOR(F.lit(m))
                        for m in probe_masks])).alias("bucket"))
            parts.append(base)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    cb = bucketize(spread(emb), id_col, vec_col, "n")
    qb = bucketize(queries, id_col, vec_col, "q")
    cand = cb.join(qb, ["tbl", "bucket"]) \
        .filter(F.col("n_id") != F.col("q_id")) \
        .dropDuplicates(["q_id", "n_id"])
    scored = cand.withColumn("cosine",
                             cosine_sim(F.col("q_v"), F.col("n_v")))
    w = Window.partitionBy("q_id") \
        .orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k) \
        .select(F.col("q_id").alias("query_id"),
                F.col("n_id").alias("neighbor_id"), "cosine", "rank")


def embedding_outliers(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label",
                       z: float = 2.0, grid: float = 1e6) -> DataFrame:
    """Per-class embedding outlier screening — the standard
    mislabeled/corrupt-vector detector in an embedding pipeline: each
    vector's euclidean distance to its class centroid, z-scored
    against the class's own distance distribution; rows whose z-score
    exceeds ``z`` flag as outliers (candidate label errors or junk
    embeddings worth auditing before training).

    Determinism: centroids are grid-rounded (1e-9) before distances,
    distances and z-scores to ``grid`` (1e-6) before the threshold
    compare — the value_anomalies grid-before-compare pattern, so the
    flag boundary is engine-exact.

    Scale shape: one posexplode keyed (label, dim) aggregation for
    centroids (output is classes × dims — broadcast-sized at any
    corpus size), one keyed distance aggregation per vector, one
    class-sized stats aggregation. No pairwise terms, no collect.

    Returns (id_col, label_col, dist, zscore, outlier); zscore is null
    (outlier false) for single-member / zero-variance classes.
    """
    pe = spread(emb).select(
        F.col(id_col), F.col(label_col),
        F.posexplode(F.col(vec_col)).alias("__pos", "__v"))
    cent = pe.groupBy(label_col, "__pos").agg(
        (F.round(F.avg("__v") * 1e9) / 1e9).alias("__c"))
    dist = pe.join(F.broadcast(cent), [label_col, "__pos"]) \
        .groupBy(id_col, label_col).agg(
            (F.round(F.sqrt(F.sum((F.col("__v") - F.col("__c"))
                                  * (F.col("__v") - F.col("__c"))))
                     * grid) / grid).alias("dist"))
    stats = dist.groupBy(label_col).agg(
        F.avg("dist").alias("__mu"),
        F.stddev_pop("dist").alias("__sd"))
    # zero-variance classes get a NULL z (0/0 is NaN, which Spark
    # comparisons rank ABOVE every double — it would flag everything)
    zc = F.when(F.col("__sd") > 0,
                (F.col("dist") - F.col("__mu")) / F.col("__sd"))
    return dist.join(F.broadcast(stats), label_col).select(
        F.col(id_col), F.col(label_col), F.col("dist"),
        (F.round(zc * grid) / grid).alias("zscore"),
        F.coalesce(F.round(zc * grid) / grid > F.lit(z), F.lit(False))
        .alias("outlier"))
