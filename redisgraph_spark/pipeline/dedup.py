"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (JVM-side, codegen-
friendly; no Python UDFs), designed so every stage is a key-partitioned
shuffle that scales linearly:

- exact:          hash-groupBy on content
- n-gram Jaccard: shingle explode → pair join on shingle → count ratio
- MinHash + LSH:  shingle → k minhashes → band buckets → bucket join
- SimHash:        token bit-votes → 64-bit signature → pigeonhole-block
                  join → Hamming filter

At 100 TB: the shingle/bucket joins shuffle on (shingle|bucket) keys —
hot shingles are the skew risk, mitigated by dropping top-frequency
shingles (`max_shingle_freq`) exactly like stopword removal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import spread


# --------------------------------------------------------------- exact
def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text. Returns (doc_id, n_dups)."""
    return docs.groupBy(text_col).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_dups"),
    ).select(id_col, "n_dups")


# ------------------------------------------------------------- shingles
def char_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id",
                  dedup: bool = True) -> DataFrame:
    """Distinct character n-grams per document: (id, shingle).

    `sequence+transform` keeps generation JVM-side; `explode` then
    `distinct` gives the shingle set. ``dedup=False`` skips the
    distinct — a whole shuffle of the exploded shingles — for
    consumers whose aggregate is duplicate-insensitive (MinHash min).
    """
    idx = F.sequence(F.lit(1), F.greatest(
        F.length(F.col(text_col)) - (n - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.col(text_col).substr(i, F.lit(n)))
    out = spread(docs).select(F.col(id_col),
                              F.explode(sh).alias("shingle")) \
        .filter(F.length("shingle") == n)
    return out.distinct() if dedup else out


def word_shingles(docs: DataFrame, n: int = 2, text_col: str = "text",
                  id_col: str = "doc_id",
                  dedup: bool = True) -> DataFrame:
    """Distinct word n-grams per document.

    Grams are built with O(1) ``element_at`` lookups per position
    (``slice`` would copy O(tokens) per position → quadratic per doc;
    measured 5s → <1s on 5k docs at sf0.1).
    """
    with_toks = spread(docs).select(
        F.col(id_col), F.split(F.col(text_col), r"\s+").alias("__toks"))
    toks = F.col("__toks")
    idx = F.sequence(F.lit(0), F.greatest(
        F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, (i + k + 1).cast("int"))
               for k in range(n)]))
    out = with_toks.select(F.col(id_col),
                           F.explode(grams).alias("shingle"))
    return out.distinct() if dedup else out


# -------------------------------------------------------- n-gram Jaccard
def jaccard_pairs(docs: DataFrame, threshold: float = 0.8, n: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_shingle_freq: int | None = 10_000) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (a < b, sim ≥ threshold).

    Pair generation joins on the shingle key; |A∩B| is a count over the
    join, |A∪B| = |A|+|B|−|A∩B|. Returns (doc_a, doc_b, jaccard).

    `max_shingle_freq` (default 10k, pass None to disable) drops
    stop-shingles appearing in more than that many docs before the
    pair join — on a skewed 100 TB corpus one hot shingle otherwise
    produces a quadratic join blow-up; shingles that common carry no
    dedup signal. Results on corpora below the cutoff are exact.
    """
    sh = char_shingles(docs, n, text_col, id_col)
    if max_shingle_freq is not None:
        hot = sh.groupBy("shingle").count() \
            .filter(F.col("count") > max_shingle_freq).select("shingle")
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = a.join(b, "shingle") \
        .filter(F.col("doc_a") < F.col("doc_b")) \
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("szb"))
    return inter.join(sa, "doc_a").join(sb, "doc_b") \
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.col("sza") + F.col("szb") - F.col("inter"))) \
        .filter(F.col("jaccard") >= threshold) \
        .select("doc_a", "doc_b", "jaccard")


# ------------------------------------------------------- portable hash
def portable_hash60(col, seed: int | None = None):
    """60-bit hash replicable in any engine with md5(): the first 15
    hex chars of md5('<seed>:' || value) as an integer. ~3× slower than
    xxhash64 (hex round trip), so the default pipelines keep xxhash64;
    the `hash_fn="md5"` variants exist so the DuckDB oracle can verify
    MinHash/SimHash results value-for-value."""
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


# --------------------------------------------------------- MinHash + LSH
def minhash_signatures(docs: DataFrame, num_hashes: int = 32, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       shingle: str = "word",
                       hash_fn: str = "xxhash64") -> DataFrame:
    """k-permutation MinHash via hash(shingle, seed): (id, sig array).

    Word n-grams by default (w-shingling): character shingles over
    low-entropy corpora collide so heavily that LSH buckets approach
    all-pairs — word shingles keep bucket sizes bounded.
    """
    # min() is duplicate-insensitive — skip the shingle-set distinct
    # (a full shuffle of the exploded shingles); the signature agg's
    # map-side partial min is then the ONLY shuffle in this stage
    if shingle == "word":
        sh = word_shingles(docs, n, text_col, id_col, dedup=False)
    else:
        sh = char_shingles(docs, n, text_col, id_col, dedup=False)
    # single-string SQL expressions: one py4j round trip per aggregate
    # instead of four (min+hash+lit+alias) — measured ~1s of driver-side
    # plan-construction saved per call at 32 hashes
    if hash_fn == "md5":
        aggs = [F.expr(
            f"min(cast(conv(substring(md5(concat('{i}:', shingle)), "
            f"1, 15), 16, 10) as bigint))").alias(f"h{i}")
            for i in range(num_hashes)]
    else:
        aggs = [F.expr(f"min(xxhash64(shingle, {i}))").alias(f"h{i}")
                for i in range(num_hashes)]
    sig = sh.groupBy(id_col).agg(*aggs)
    arr = ", ".join(f"h{i}" for i in range(num_hashes))
    return sig.select(F.col(id_col), F.expr(f"array({arr})").alias("sig"))


def _banded(sig: DataFrame, id_col: str, bands: int, rows: int
            ) -> DataFrame:
    """(id, bb) rows, one per band: bb = (band index, xxhash64 of the
    band's `rows` signature slots). Hot buckets shuffle ids only."""
    band_structs = ", ".join(
        "named_struct('band', {b}, 'bucket', xxhash64({cols}))".format(
            b=bi, cols=", ".join(f"sig[{bi * rows + ri}]"
                                 for ri in range(rows)))
        for bi in range(bands))
    return sig.select(
        id_col, F.expr(f"explode(array({band_structs}))").alias("bb"))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 32, bands: int = 8,
                      n: int = 3, threshold: float | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      shingle: str = "word",
                      hash_fn: str = "xxhash64",
                      sig: DataFrame | None = None) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    bands=8 × rows=4 over 32 hashes ⇒ collision prob ≈ 1-(1-s^4)^8
    (s = true Jaccard). With `threshold`, candidates are verified by
    estimated similarity (fraction of matching minhashes ≥ threshold).
    Returns (doc_a, doc_b, est_jaccard).

    Scale shape: the bucket join carries only (id, band, bucket) — the
    32-hash signatures rejoin *after* pair dedup, so hot buckets shuffle
    ids, not arrays.
    """
    rows = num_hashes // bands
    if sig is None:
        sig = minhash_signatures(docs, num_hashes, n, text_col, id_col,
                                 shingle, hash_fn)
        # sig feeds the banding AND both post-dedup signature rejoins —
        # materialize once instead of recomputing the shingle+minhash
        # pipeline three times (signatures are tiny: ids + 32 longs).
        # Callers that reuse a corpus can pass a pre-checkpointed `sig`
        # (build-once index, like the reference building its relation
        # matrices at graph load) and skip this materialization.
        sig = sig.localCheckpoint(eager=True)
    left = _banded(sig, id_col, bands, rows) \
        .select(F.col(id_col).alias("doc_a"), "bb")
    right = _banded(sig, id_col, bands, rows) \
        .select(F.col(id_col).alias("doc_b"), "bb")
    cand = left.join(right, ["bb"]) \
        .filter(F.col("doc_a") < F.col("doc_b")) \
        .select("doc_a", "doc_b").dropDuplicates()
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    out = cand.join(sa, "doc_a").join(sb, "doc_b")
    est = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
        lambda m: m)) / F.size("sig_a")
    out = out.withColumn("est_jaccard", est)
    if threshold is not None:
        out = out.filter(F.col("est_jaccard") >= threshold)
    return out.select("doc_a", "doc_b", "est_jaccard")


def minhash_lsh_incremental(new_docs: DataFrame, corpus_sig: DataFrame,
                            num_hashes: int = 32, bands: int = 8,
                            n: int = 3, threshold: float | None = None,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            shingle: str = "word",
                            hash_fn: str = "xxhash64",
                            new_sig: DataFrame | None = None
                            ) -> DataFrame:
    """Incremental corpus dedup — the daily-crawl pattern at 100 TB:
    dedupe a NEW batch against an already-deduped corpus WITHOUT
    re-banding the corpus. `corpus_sig` is the persisted signature
    index (`minhash_signatures` output, the same artifact
    `minhash_lsh_pairs` accepts as `sig`); only the new batch pays
    shingling. Returns candidate pairs (doc_a, doc_b, est_jaccard)
    where at least one side is new — new×corpus and new×new, never
    corpus×corpus (those were found when the corpus was built).

    Scale shape: the bucket join probes new-batch bands (small) against
    corpus bands — with the corpus side bucketed/partitioned on the
    band hash, the probe is a co-located join touching only matching
    buckets; the corpus is never re-shuffled per increment.
    """
    rows = num_hashes // bands
    if new_sig is None:
        new_sig = minhash_signatures(new_docs, num_hashes, n, text_col,
                                     id_col, shingle, hash_fn) \
            .localCheckpoint(eager=True)
    all_sig = corpus_sig.unionByName(new_sig)
    probe = _banded(new_sig, id_col, bands, rows) \
        .select(F.col(id_col).alias("__pa"), "bb")
    build = _banded(all_sig, id_col, bands, rows) \
        .select(F.col(id_col).alias("__pb"), "bb")
    # canonicalize (min, max) — a new×new pair arrives in both
    # orientations, new×corpus in one; self-pairs drop on the <
    cand = probe.join(build, ["bb"]) \
        .select(F.least("__pa", "__pb").alias("doc_a"),
                F.greatest("__pa", "__pb").alias("doc_b")) \
        .filter(F.col("doc_a") < F.col("doc_b")).dropDuplicates()
    sa = all_sig.select(F.col(id_col).alias("doc_a"),
                        F.col("sig").alias("sig_a"))
    sb = all_sig.select(F.col(id_col).alias("doc_b"),
                        F.col("sig").alias("sig_b"))
    out = cand.join(sa, "doc_a").join(sb, "doc_b") \
        .withColumn("est_jaccard", F.size(F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m)) / F.size("sig_a"))
    if threshold is not None:
        out = out.filter(F.col("est_jaccard") >= threshold)
    return out.select("doc_a", "doc_b", "est_jaccard")


def jaccard_verify(docs: DataFrame, pairs: DataFrame,
                   threshold: float = 0.5, n: int = 3,
                   text_col: str = "text", id_col: str = "doc_id",
                   shingle: str = "word") -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (the standard
    second stage after MinHash-LSH / SimHash candidate generation).

    Computes the TRUE n-gram Jaccard only for the candidate pairs —
    candidates ≪ corpus², so at 100 TB this is two equi-joins of the
    (small) pair set against the shingle table plus one count, never an
    all-pairs pass. Returns (doc_a, doc_b, jaccard) with jaccard ≥
    threshold.

    This also makes hash-based candidate generators oracle-checkable:
    as long as the generator's recall at `threshold` is 1.0 (true on
    corpora whose near-dups sit far above the threshold — measured
    min Jaccard 0.9 on the test corpus), verified output equals the
    exact-Jaccard pair set regardless of which hash produced the
    candidates."""
    if shingle == "word":
        sh = word_shingles(docs, n, text_col, id_col)
    else:
        sh = char_shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # dedupe: duplicate candidate rows would multiply the intersection
    # count (jaccard > 1); generators in this repo emit deduped pairs,
    # but the function takes arbitrary pair frames
    cand = pairs.select("doc_a", "doc_b").dropDuplicates()
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = cand.join(a, "doc_a").join(b, ["doc_b", "shingle"]) \
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("inter"))
    sa = sizes.select(F.col(id_col).alias("doc_a"),
                      F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("doc_b"),
                      F.col("sz").alias("szb"))
    return inter.join(sa, "doc_a").join(sb, "doc_b") \
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.col("sza") + F.col("szb") - F.col("inter"))) \
        .filter(F.col("jaccard") >= threshold) \
        .select("doc_a", "doc_b", "jaccard")


def exact_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        shingle: str = "word") -> DataFrame:
    """ALL pairs with exact n-gram Jaccard ≥ threshold, hash-free:
    candidate pairs are docs sharing ≥1 shingle (an equi-join on the
    shingle key — any pair with Jaccard > 0 shares one, so recall is
    exactly 1.0 by construction), then jaccard_verify. The ground-truth
    generator the recall assertions in __spark_entry__ compare the
    hash-based pipelines against; at corpus scale the shingle join is
    the expensive exact path — production uses the MinHash/SimHash
    stages this function exists to audit."""
    if shingle == "word":
        sh = word_shingles(docs, n, text_col, id_col)
    else:
        sh = char_shingles(docs, n, text_col, id_col)
    sh = sh.dropDuplicates([id_col, "shingle"])
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    cand = a.join(b, "shingle") \
        .filter(F.col("doc_a") < F.col("doc_b")) \
        .select("doc_a", "doc_b").dropDuplicates()
    return jaccard_verify(docs, cand, threshold, n, text_col,
                          id_col, shingle)


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   star_threshold: int | None = 100_000) -> DataFrame:
    """Near-dup pairs → duplicate clusters → canonical representative.

    The step a training pipeline runs after candidate generation: the
    pair graph unions into connected components
    (``algorithms/components.py``) and the minimum id in each cluster
    is kept as canonical. Returns ``(id, cluster, is_canonical)`` for
    EVERY input doc — docs outside any pair are their own singleton
    cluster.

    Scale: component iteration touches only the PAIR graph (pairs ≪
    corpus); the corpus itself is touched once by the final left join,
    broadcastable when the pair set is small. Above ``star_threshold``
    pairs the solver auto-switches from min-label propagation (one
    shuffle round per diameter hop — fine for small blob-shaped dup
    clusters, fatal for 100 TB crawl-dup CHAINS) to large-star/
    small-star contraction (Kiveris et al., SoCC'14 — O(log² n) rounds
    independent of diameter). Pass ``star_threshold=0`` to force the
    star solver, ``None`` to force propagation."""
    from redisgraph_spark.algorithms.components import (
        weakly_connected_components, weakly_connected_components_star)
    ids = pairs.select(F.col("doc_a").alias("_id")) \
        .union(pairs.select(F.col("doc_b").alias("_id"))).distinct()
    edges = pairs.select(F.col("doc_a").alias("_src"),
                         F.col("doc_b").alias("_dst"))
    use_star = star_threshold is not None \
        and pairs.limit(star_threshold + 1).count() > star_threshold
    wcc = weakly_connected_components_star if use_star \
        else weakly_connected_components
    comp = wcc(ids, edges)
    return docs.join(
        comp.select(F.col("node").alias(id_col), "component"),
        id_col, "left") \
        .withColumn("cluster",
                    F.coalesce(F.col("component"), F.col(id_col))) \
        .withColumn("is_canonical", F.col("cluster") == F.col(id_col)) \
        .select(id_col, "cluster", "is_canonical")


# -------------------------------------------------------- decontamination
def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 8, min_overlap: int = 1,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag training docs sharing ≥
    ``min_overlap`` distinct word n-grams with any benchmark/eval
    document (the standard n-gram-collision test run before training —
    e.g. GPT-3 appendix C / PaLM use 8-13-gram overlap).

    Returns ``(id, n_collisions)`` for contaminated docs only. The
    benchmark n-gram set is typically tiny next to the corpus — the
    join broadcasts it, so the corpus is touched in ONE pass with no
    shuffle of the big side. Distinct-gram counting means repeated
    hits of one gram count once."""
    bench_grams = word_shingles(
        benchmark.select(F.col(bench_text_col).alias("text"))
        .withColumn("_bid", F.monotonically_increasing_id()),
        n, "text", "_bid").select("shingle").distinct()
    doc_grams = word_shingles(docs, n, text_col, id_col)
    hits = doc_grams.join(F.broadcast(bench_grams), "shingle")
    return hits.groupBy(id_col) \
        .agg(F.count(F.lit(1)).alias("n_collisions")) \
        .filter(F.col("n_collisions") >= min_overlap)


# --------------------------------------------------- paragraph-level dedup
def paragraph_dedup(docs: DataFrame, min_len: int = 1,
                    text_col: str = "text", id_col: str = "doc_id",
                    sep: str = r"\n") -> DataFrame:
    """C4-style line/paragraph dedup: split each document on ``sep``,
    keep each distinct paragraph only in the document with the lowest
    id that contains it, and reassemble the surviving paragraphs in
    their original order. Returns ``(id, text)`` with deduped text;
    documents whose every paragraph is owned elsewhere drop out of the
    result.

    One explode + one groupBy on the paragraph key + one re-group by
    doc — three linear shuffles, no pairwise comparison anywhere, so
    it scales to any corpus the cluster can shuffle.

    Skew shape: boilerplate paragraphs ("Introduction", license
    headers) are massive hot keys at corpus scale, so nothing ever
    shuffles on the raw paragraph: ownership groups on a 128-bit
    paragraph fingerprint (two independent xxhash64 lanes — collision
    odds ~2^-128·n², nil at any corpus size), the min() aggregate
    combines map-side, and the ownership join keys on
    (fingerprint, doc_id) — a hot paragraph's rows carry distinct doc
    ids, so they spread across reducers instead of piling onto the
    fingerprint's partition."""
    parts = spread(docs).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep))
        .alias("_pos", "_para")) \
        .filter(F.length("_para") >= min_len) \
        .withColumn("_pk1", F.xxhash64("_para")) \
        .withColumn("_pk2", F.xxhash64(F.lit(1), F.col("_para")))
    owner = parts.groupBy("_pk1", "_pk2") \
        .agg(F.min(id_col).alias(id_col))
    kept = parts.join(owner, ["_pk1", "_pk2", id_col])
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("_pos"), F.col("_para")))),
                lambda s: s.getField("_para")),
            "\n").alias(text_col))


# --------------------------------------------------------------- SimHash
def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over whitespace tokens: (id, simhash bigint).
    (60-bit with the portable md5 hash.)

    Per token: one bit-vote per bit (+1/−1 by hash bit); signature bit
    b is the sign of the vote sum. Pure higher-order-function pipeline.
    """
    bits = 60 if hash_fn == "md5" else 64
    toks = spread(docs).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")) \
        .filter(F.col("tok") != "")
    if hash_fn == "md5":
        h = toks.withColumn("th", portable_hash60(F.col("tok")))
    else:
        h = toks.withColumn("th", F.xxhash64("tok"))
    # one ±1 vote column per bit (static shifts; stays in codegen),
    # summed map-side by the partial aggregation
    vote_aggs = [
        F.sum(F.when(F.shiftright(F.col("th"), b)
                     .bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
              ).alias(f"v{b}")
        for b in range(bits)]
    summed = h.groupBy(id_col).agg(*vote_aggs)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"v{b}") > 0,
                   F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return summed.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  hash_fn: str = "xxhash64") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking: split 64 bits into (max_hamming+1) blocks — any
    pair within distance k agrees on ≥1 block, so the candidate join is
    an equi-join on (block_idx, block_value), never a cross join.
    Returns (doc_a, doc_b, hamming).
    """
    nblocks = max_hamming + 1
    width = (60 if hash_fn == "md5" else 64) // nblocks
    # both sides of the candidate self-join derive from sig —
    # materialize the (expensive) token-vote aggregation once
    sig = simhash_signatures(docs, text_col, id_col, hash_fn) \
        .localCheckpoint(eager=True)
    blocks = sig.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("blk"),
                F.shiftrightunsigned(
                    F.col("simhash"), bi * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("val"))
            for bi in range(nblocks)])).alias("bb"))
    left = blocks.select(F.col(id_col).alias("doc_a"),
                         F.col("simhash").alias("sh_a"), "bb")
    right = blocks.select(F.col(id_col).alias("doc_b"),
                          F.col("simhash").alias("sh_b"), "bb")
    cand = left.join(right, ["bb"]) \
        .filter(F.col("doc_a") < F.col("doc_b")) \
        .dropDuplicates(["doc_a", "doc_b"])
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", ham) \
        .filter(F.col("hamming") <= max_hamming) \
        .select("doc_a", "doc_b", "hamming")


# ------------------------------------------- embedding cosine near-dup
def embedding_dup_pairs(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        max_bruteforce_rows: int | None = 100_000,
                        dim: int | None = None) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold.

    Exact O(n²) cross-join baseline up to `max_bruteforce_rows` rows;
    above that the corpus routes to the LSH-bucketed candidate path
    (`embedding_dup_pairs_lsh`) — at 100 TB an all-pairs cross join is
    never the right plan. Pass max_bruteforce_rows=None to force the
    exact baseline regardless of size."""
    from redisgraph_spark.pipeline.similarity import cosine_sim
    if max_bruteforce_rows is not None \
            and emb.count() > max_bruteforce_rows:
        import warnings
        warnings.warn(
            f"embedding_dup_pairs: corpus exceeds {max_bruteforce_rows} "
            "rows — routing to the LSH-bucketed candidate path "
            "(approximate recall; pass max_bruteforce_rows=None to "
            "force exact all-pairs)", RuntimeWarning, stacklevel=2)
        return embedding_dup_pairs_lsh(emb, threshold, id_col, vec_col,
                                       dim=dim)
    emb = spread(emb)   # per-pair HOF cosine math must not run one-task
    a = emb.select(F.col(id_col).alias("doc_a"),
                   F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("doc_b"),
                   F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    return pairs.withColumn("cosine", cosine_sim(F.col("va"), F.col("vb"))) \
        .filter(F.col("cosine") >= threshold) \
        .select("doc_a", "doc_b", "cosine")


def embedding_dup_pairs_lsh(emb: DataFrame, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            nbits: int = 8, ntables: int = 4,
                            dim: int | None = None) -> DataFrame:
    """LSH-bucketed near-dup pairs: random-hyperplane buckets generate
    candidates (equi-join on (table, bucket) — no cross join), exact
    cosine verifies. Multi-table union keeps recall high for
    threshold-similar pairs; the bucket join shuffles on the bucket
    key only.

    `dim` defaults to the length of the first vector — a mismatched
    hardcoded dim would null-pad every hyperplane projection and hash
    everything into one bucket (degenerating into the cross join this
    path exists to avoid)."""
    from redisgraph_spark.pipeline.similarity import (
        _planes, _rh_bucket, cosine_sim)
    if dim is None:
        # infer from a NON-NULL vector: size(NULL) = -1 would produce
        # zero planes → every row hashes to one bucket (the degenerate
        # cross join this path exists to avoid)
        first = emb.filter(F.col(vec_col).isNotNull()) \
            .select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first is not None else 0
    if dim <= 0:
        raise ValueError(
            f"embedding_dup_pairs_lsh: cannot infer dim from {vec_col!r} "
            "(empty or all-null column); pass dim= explicitly")
    emb = spread(emb)
    parts = []
    for t in range(ntables):
        planes = _planes(dim, nbits, seed=2000 + t)
        parts.append(emb.select(
            F.col(id_col).alias("_eid"), F.col(vec_col).alias("_ev"),
            F.lit(t).alias("tbl"),
            _rh_bucket(F.col(vec_col), planes).alias("bucket")))
    bucketed = parts[0]
    for p in parts[1:]:
        bucketed = bucketed.unionByName(p)
    left = bucketed.select(F.col("_eid").alias("doc_a"),
                           F.col("_ev").alias("va"), "tbl", "bucket")
    right = bucketed.select(F.col("_eid").alias("doc_b"),
                            F.col("_ev").alias("vb"), "tbl", "bucket")
    cand = left.join(right, ["tbl", "bucket"]) \
        .filter(F.col("doc_a") < F.col("doc_b")) \
        .dropDuplicates(["doc_a", "doc_b"])
    return cand.withColumn("cosine", cosine_sim(F.col("va"), F.col("vb"))) \
        .filter(F.col("cosine") >= threshold) \
        .select("doc_a", "doc_b", "cosine")


def semdedup(emb: DataFrame, threshold: float = 0.45, nlist: int = 8,
             iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", grid: float = 1e6) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by k-means
    clustering the embedding space, then dropping any document whose
    cosine to a LOWER-ID document in the SAME cluster exceeds
    `threshold`. Clustering bounds the quadratic pairwise term to
    within-cluster — the whole point of the algorithm and exactly the
    shape that survives 100 TB: the pairwise join is an equi-join on
    list_id, so each cluster's O(c^2) runs independently and nlist
    scales with the corpus to hold c constant.

    Determinism contract (what makes this oracle-verifiable): centroid
    init = the nlist lowest-id vectors; assignment = max cosine with
    list_id tie-break; after every Lloyd averaging step each centroid
    component is rounded to the 1/grid grid, which absorbs float
    summation-order noise (~1e-12) so any engine replaying the same
    arithmetic — e.g. the DuckDB oracle's CTE chain — lands on bitwise
    identical centroids and identical assignments.

    Returns (id, list_id, kept) for every input row.
    """
    from .similarity import cosine_sim
    from redisgraph_spark.session import inline_df
    from pyspark.sql import Window
    spark = emb.sparkSession
    vecs = spread(emb).select(
        F.col(id_col),
        F.transform(F.col(vec_col),
                    lambda x: x.cast("double")).alias("__v"))
    seed_rows = vecs.orderBy(id_col).limit(nlist).collect()
    if not seed_rows:
        return vecs.select(F.col(id_col),
                           F.lit(0).cast("bigint").alias("list_id"),
                           F.lit(True).alias("kept")).limit(0)
    centroids = inline_df(
        spark,
        [(i, [float(x) for x in r["__v"]])
         for i, r in enumerate(seed_rows)],
        [("list_id", "bigint"), ("center", "array<double>")])
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("list_id").asc())
    # assignment similarities round to a 1e-9 grid before the argmax so
    # last-ulp summation differences between engines cannot flip it
    sim9 = lambda a, b: F.round(cosine_sim(a, b) * 1e9) / 1e9  # noqa: E731
    for _ in range(iters):
        assign = vecs.crossJoin(F.broadcast(centroids)) \
            .withColumn("__sim", sim9(F.col("__v"),
                                      F.col("center"))) \
            .withColumn("__rk", F.row_number().over(w)) \
            .filter(F.col("__rk") == 1).select(id_col, "list_id", "__v")
        from redisgraph_spark.pipeline.similarity import centroid_means
        centroids = centroid_means(assign, ["list_id"], "__v",
                                   round_grid=grid) \
            .localCheckpoint(eager=True)
    clustered = vecs.crossJoin(F.broadcast(centroids)) \
        .withColumn("__sim", sim9(F.col("__v"), F.col("center"))) \
        .withColumn("__rk", F.row_number().over(w)) \
        .filter(F.col("__rk") == 1).select(id_col, "list_id", "__v")
    a = clustered.select(F.col(id_col).alias("__a"),
                         F.col("__v").alias("__va"), "list_id")
    b = clustered.select(F.col(id_col).alias("__b"),
                         F.col("__v").alias("__vb"), "list_id")
    dropped = a.join(b, "list_id") \
        .filter(F.col("__b") < F.col("__a")) \
        .withColumn("__cos",
                    F.round(cosine_sim(F.col("__va"), F.col("__vb"))
                            * grid) / grid) \
        .filter(F.col("__cos") > threshold) \
        .select(F.col("__a").alias(id_col)).distinct() \
        .withColumn("__dropped", F.lit(True))
    return clustered.join(dropped, id_col, "left") \
        .select(F.col(id_col), F.col("list_id"),
                F.coalesce(~F.col("__dropped"), F.lit(True))
                .alias("kept"))


def keep_best(docs: DataFrame, pairs: DataFrame, quality_col: str,
              id_col: str = "doc_id",
              star_threshold: int | None = 100_000) -> DataFrame:
    """Quality-aware canonical selection: like `dedup_clusters`, but
    the kept representative of each duplicate cluster is the HIGHEST
    `quality_col` member (id ascending as tiebreak) instead of the
    minimum id. The standard refinement once a pipeline has quality
    scores — near-dup groups keep the cleanest copy, not the one that
    happened to crawl first.

    Output: (id, cluster, is_kept) for every input doc.

    Scale shape: identical to `dedup_clusters` (components over the
    pair graph only) plus one row_number window partitioned by cluster
    — clusters are small by construction (they are near-dup groups), so
    the window never sees a hot key larger than the biggest dup group.
    """
    from pyspark.sql import Window
    clustered = dedup_clusters(docs, pairs, id_col=id_col,
                               star_threshold=star_threshold) \
        .select(id_col, "cluster") \
        .join(docs.select(id_col, quality_col), id_col)
    w = Window.partitionBy("cluster").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc())
    return clustered.withColumn("__rk", F.row_number().over(w)) \
        .select(F.col(id_col), F.col("cluster"),
                (F.col("__rk") == 1).alias("is_kept"))


def containment_pairs(docs: DataFrame, threshold: float = 0.8,
                      n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id",
                      grid: float = 1e6) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT
    (Broder 1997's other resemblance measure): C(A→B) = |S(A)∩S(B)| /
    |S(A)| — doc A is (near-)contained in doc B. Jaccard misses the
    quote/subsumption case (a paragraph fully copied into a much
    larger page scores low Jaccard but containment ≈ 1), which is why
    dedup pipelines run both. Candidates are docs sharing ≥1 word
    n-shingle (equi-join — any pair with containment > 0 shares one,
    so recall is 1.0 by construction); ORDERED pairs, both directions
    evaluated, kept where containment ≥ threshold.

    Scale note: like `exact_jaccard_pairs` this is the exact path —
    the shingle join is quadratic-ish against hot shingles; production
    corpora route through MinHash candidates (`jaccard_verify`-style)
    with this as the per-pair verifier. The containment value rounds
    to a grid before the threshold compare (engine-exact boundary).

    Returns (doc_a, doc_b, containment): doc_a contained in doc_b.
    """
    sh = word_shingles(docs, n, text_col, id_col) \
        .dropDuplicates([id_col, "shingle"])
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = a.join(b, "shingle") \
        .filter(F.col("doc_a") != F.col("doc_b")) \
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("__i"))
    cont = (F.round(F.col("__i") / F.col("__sz") * grid) / grid)
    return inter.join(sizes.withColumnRenamed(id_col, "doc_a"),
                      "doc_a") \
        .select("doc_a", "doc_b", cont.alias("containment")) \
        .filter(F.col("containment") >= threshold)
