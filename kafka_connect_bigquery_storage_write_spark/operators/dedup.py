"""Deduplication operators (SURVEY.md E14): exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design:
- exact dedup is a single hash-shuffle on the dedup key (or its md5 to
  keep long texts off the wire);
- MinHash/LSH never materializes the O(n^2) pair space: docs meet only
  inside LSH band buckets, and exact Jaccard verification joins only the
  candidate pairs;
- all hashing is JVM-side xxhash64/md5 — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation

from kafka_connect_bigquery_storage_write_spark.operators.observe import observed_metrics
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ensure_compute_parallelism


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row per key — the one with the smallest id.

    Deterministic alternative to dropDuplicates (whose survivor choice is
    partition-order dependent and would break replay/oracle comparison).
    Single shuffle on the key; survivor selection is a min-aggregation,
    not a window sort, so it map-side combines.
    """
    keeper = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keeper, on=key_cols + [id_col], how="left_semi")


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column, as array<string>.

    Extracted in ONE regex pass: a token-boundary anchor plus a capturing
    lookahead yields every overlapping n-gram without building token
    arrays. Measured ~5x faster than the sequence/element_at/concat_ws
    higher-order form, whose lambdas evaluate interpreted per element.
    Tokens are \\S+ runs (equivalent to single-space splitting on
    normalized text, which is what the fixtures and the SQL oracles use).
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    pattern = r"(?:^|(?<= ))(?=(" + r"\S+ " * (n - 1) + r"\S+))"
    return F.array_distinct(F.regexp_extract_all(col, F.lit(pattern), 1))


def _exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """One row per (doc, distinct shingle), shingle as a 64-bit hash.

    Joining/shuffling on the xxhash64 of the shingle instead of the
    string keeps the exchange at 8 bytes/key regardless of shingle
    length (collision odds at corpus scale: ~n_distinct^2 / 2^65).
    """
    hashed = F.transform(word_shingles(text_col, n), lambda s: F.xxhash64(s))
    # the shingling regex is the CPU hot spot — don't let a single-split
    # scan serialize it
    return ensure_compute_parallelism(df).select(id_col, F.explode(hashed).alias("shingle"))


def _cap_df(sh: DataFrame, max_df: int | None) -> DataFrame:
    """Drop shingles appearing in more than max_df docs (stop-shingles).

    The pair join's cost is Σ_s df(s)^2 — a handful of corpus-common
    shingles can dominate the entire join at scale. Capping df bounds the
    worst bucket at max_df^2 while barely moving Jaccard scores for real
    near-dups (their evidence lives in their rarer shingles). None keeps
    exact semantics (the oracle-checked configuration).
    """
    if max_df is None:
        return sh
    rare = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df")).filter(F.col("_df") <= max_df).select("shingle")
    return sh.join(rare, "shingle", "left_semi")


def jaccard_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all overlapping pairs.

    pairs(a,b) meet through a shuffle join on shingle value, so only pairs
    sharing at least one shingle are ever scored — the non-overlapping
    (and overwhelmingly dominant) part of the n^2 space costs nothing.
    Columns: id_a, id_b, jaccard.

    The exploded shingle relation feeds three consumers (both join sides
    and the per-doc counts), so it is persisted for the operator's
    lifetime; Spark's ContextCleaner unpersists it once unreferenced.
    The count() is a deliberate materialization BARRIER, not bookkeeping:
    Spark submits broadcast/AQE subquery jobs concurrently, and
    concurrent first consumers of a lazily-cached relation race its
    cache fill, each recomputing the shingling regex (measured 3-5x
    duplicated work on this exact DAG). Filling the cache once,
    sequentially, makes every downstream job a cache read.
    ``max_df`` trades exactness for a bound on the join's hot buckets —
    see _cap_df.
    """
    sh = _cap_df(_exploded_shingles(df, id_col, text_col, n), max_df).localCheckpoint(eager=True)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Per-doc MinHash signature: array<long> of length num_hashes.

    h_j(s) = xxhash64(j, s); the signature is the per-j minimum over the
    doc's shingles. One explode + one groupBy — signature size is constant
    per doc regardless of text length.
    """
    sh = _exploded_shingles(df, id_col, text_col, n)
    mins = [F.min(F.xxhash64(F.lit(j), F.col("shingle"))).alias(f"h{j}") for j in range(num_hashes)]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"h{j}" for j in range(num_hashes)]).alias("minhash"))


def _minhash_band_buckets(sh: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bucket) from a (id, shingle-hash) relation: MinHash the
    shingle set per doc, cut the signature into bands, hash each band's
    slice (salted with the band index). Shared by the one-shot and the
    incremental LSH paths — the band layout must never diverge between
    them, or an increment probes the wrong buckets of a stored index.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")
    mins = [F.min(F.xxhash64(F.lit(j), F.col("shingle"))).alias(f"h{j}") for j in range(num_hashes)]
    sig = sh.groupBy(id_col).agg(*mins).select(
        id_col, F.array(*[f"h{j}" for j in range(num_hashes)]).alias("minhash")
    )
    band_arr = F.array(
        *[
            F.xxhash64(F.lit(b), *[F.element_at("minhash", b * rows_per_band + r + 1) for r in range(rows_per_band)])
            for b in range(bands)
        ]
    )
    return sig.select(id_col, F.posexplode(band_arr).alias("band", "bucket"))


def minhash_lsh_incremental(
    corpus: DataFrame,
    increment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Cross-corpus near-dup pairs between an INCREMENT and the existing
    corpus via MinHash-LSH — the production shape of continuous corpus
    ingestion: the corpus's (id, band, bucket) relation is an INDEX
    ARTIFACT (persist it; band layout is a pure function of text and the
    num_hashes/bands config, so appends compose exactly like q65's
    fingerprints and ivf_assign's frozen centroids), and each new batch
    only (a) signs its own documents and (b) joins its buckets against
    the stored index — the corpus is never re-shingled per batch.

    Returns (corpus_id, inc_id, jaccard) for cross pairs with exact
    n-gram Jaccard >= threshold; candidates come from shared band
    buckets, then the exact verify join runs on candidate documents
    only. Increment-internal duplicates are NOT this operator's job —
    run the one-shot path (or q30's exact dedup) inside the batch first.

    Scale: the increment side is batch-sized — its bucket relation
    broadcasts; the index join is on (band, bucket) 16-byte keys; the
    verify stage's shingle join is restricted to candidate docs on BOTH
    sides before any shuffle.
    """
    # eager checkpoint, not persist: feeds index build + verify join; blocks
    # release with the result (the relational.py:1324 leak rule, ADVICE r9)
    corpus_sh = _cap_df(_exploded_shingles(corpus, id_col, text_col, n), max_df).localCheckpoint(eager=True)
    inc_sh = _cap_df(_exploded_shingles(increment, id_col, text_col, n), max_df).localCheckpoint(eager=True)
    corpus_idx = _minhash_band_buckets(corpus_sh, id_col, num_hashes, bands).withColumnsRenamed(
        {id_col: "corpus_id"}
    )
    inc_buckets = _minhash_band_buckets(inc_sh, id_col, num_hashes, bands).withColumnsRenamed({id_col: "inc_id"})
    candidates = (
        corpus_idx.join(F.broadcast(inc_buckets), ["band", "bucket"])
        .select("corpus_id", "inc_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # exact verify: restrict each side's shingles to its candidate docs
    ca = corpus_sh.join(
        F.broadcast(candidates.select(F.col("corpus_id").alias(id_col)).distinct()), id_col, "left_semi"
    ).select(F.col(id_col).alias("corpus_id"), "shingle")
    cb = inc_sh.join(
        F.broadcast(candidates.select(F.col("inc_id").alias(id_col)).distinct()), id_col, "left_semi"
    ).select(F.col(id_col).alias("inc_id"), "shingle")
    inter = (
        ca.join(cb, "shingle")
        .join(F.broadcast(candidates), ["corpus_id", "inc_id"], "left_semi")
        .groupBy("corpus_id", "inc_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = corpus_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_a")).withColumnsRenamed({id_col: "corpus_id"})
    nb = inc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_b")).withColumnsRenamed({id_col: "inc_id"})
    return (
        inter.join(na, "corpus_id")
        .join(nb, "inc_id")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("corpus_id", "inc_id", "jaccard")
    )


def minhash_lsh_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """MinHash + banded LSH candidate generation + exact Jaccard verify.

    Signature is cut into ``bands`` bands of num_hashes/bands rows; docs
    sharing any band hash become candidates (bucket self-join), then exact
    n-gram Jaccard filters false positives. With 32 hashes / 8 bands the
    candidate-recall curve crosses ~50% at J≈0.7 and >96% at J≥0.85 —
    right for a 0.8 threshold.

    Scale: the only joins are (a) bucket self-join — bounded by bucket
    skew, which the band hash randomizes — and (b) the verify join on
    candidate pairs only. Never O(n^2).
    """
    # materialization barrier: the shingle relation feeds the signature
    # chain, both bucket-join branches, and the verify stage; without an
    # eager cache fill, the concurrently-submitted broadcast/AQE jobs
    # race to compute it and duplicate the shingling work (see
    # jaccard_near_dup_pairs docstring — measured on this DAG).
    sh = _cap_df(_exploded_shingles(df, id_col, text_col, n), max_df).localCheckpoint(eager=True)
    buckets = _minhash_band_buckets(sh, id_col, num_hashes, bands)
    l = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    r = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    # second barrier: candidates is broadcast twice below (pair semi-join
    # and doc semi-join); materializing it here runs the whole candidate
    # generation exactly once instead of once per broadcast job.
    candidates = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # exact verify on candidates only. The pair semi-join alone cannot be
    # pushed below the shingle self-join, so first restrict the shingle
    # relation to candidate DOCS — only their shingles enter the
    # intersection join, keeping its cost Σ df^2 over candidate docs
    # instead of the whole corpus (the exact path's bill).
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # broadcast the (small) candidate sides so the semi-joins prune the
    # shingle relation map-side instead of shuffling it
    vsh = sh.join(F.broadcast(cand_ids), id_col, "left_semi").localCheckpoint(eager=True)
    counts = vsh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = vsh.select(F.col(id_col).alias("id_a"), "shingle")
    b = vsh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(F.broadcast(candidates), ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprint from unigram token hashes.

    Each token votes ±1 per bit (weighted by occurrence count); the
    fingerprint takes the sign. Hashing stays JVM-side (xxhash64, one
    projection); the 64-bit vote fold runs as a vectorized numpy kernel
    over Arrow batches — the pure-expression form (64 conditional
    aggregates per row) evaluated interpreted and measured ~4x slower at
    1M tokens.

    State is bounded for pathological documents: the numpy kernel runs
    mapInPandas over the raw (doc, hash) token stream — no per-doc
    grouping, no collect_list — folding each Arrow batch into PARTIAL
    vote vectors (64 counters + token count) per doc-id seen in the
    batch; a JVM-side aggregation then sums the partials and takes the
    sign. Peak kernel state is one Arrow batch (~10k rows) regardless of
    document length, where the old per-doc collect_list held every hash
    of a document in one aggregation cell (fine for web pages, not for
    book-length docs). The fingerprint is bit-identical to the
    single-pass fold because vote addition is associative.
    """
    if bits != 64:
        raise ValueError("simhash is fixed at 64 bits (int64 fingerprint)")
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # tokenize + hash + the numpy vote kernel all run on the input's
    # partitioning (mapInPandas is narrow) — widen a single-split scan
    df = ensure_compute_parallelism(df)
    toks = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")).filter(F.col("tok") != "")
    hashed = toks.select(id_col, F.xxhash64("tok").alias("h"))

    partial_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType, False)]
        + [T.StructField(f"_o{j}", T.LongType(), False) for j in range(64)]
        + [T.StructField("_n", T.LongType(), False)]
    )

    def partial_votes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(64, dtype=np.int64)
        for pdf in batches:
            h = pdf["h"].to_numpy()
            ids = pdf[id_col].to_numpy()
            # arithmetic >> then &1 == logical bit extraction for all 64 bits
            bit_mat = (h[:, None] >> shifts) & 1
            uids, inv = np.unique(ids, return_inverse=True)
            # segment-sum via sort + reduceat (np.add.at is an unbuffered
            # scatter — measured ~3s slower on 1M tokens)
            order = np.argsort(inv, kind="stable")
            bounds = np.searchsorted(inv[order], np.arange(len(uids)))
            ones = np.add.reduceat(bit_mat[order], bounds, axis=0)
            out = {id_col: uids}
            for j in range(64):
                out[f"_o{j}"] = ones[:, j]
            out["_n"] = np.bincount(inv).astype(np.int64)
            yield pd.DataFrame(out)

    partials = hashed.mapInPandas(partial_votes, schema=partial_schema)
    sums = partials.groupBy(id_col).agg(
        *[F.sum(f"_o{j}").alias(f"_o{j}") for j in range(64)],
        F.sum("_n").alias("_n"),
    )
    # sign per bit: set iff 2*ones_j > n (votes > 0). Bit 63 is the int64
    # sign bit: two's complement makes its contribution -2^63.
    fp = F.lit(0).cast("long")
    for j in range(64):
        contrib = -(1 << 63) if j == 63 else (1 << j)
        fp = fp + F.when(F.col(f"_o{j}") * 2 > F.col("_n"), F.lit(contrib).cast("long")).otherwise(F.lit(0).cast("long"))
    return sums.select(id_col, fp.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via chunk-bucket LSH + exact Hamming verify.

    Pigeonhole: two fingerprints within Hamming distance d < chunks must
    agree on at least one chunk, so candidate pairs come from chunk-bucket
    joins, then popcount verifies exactly. ``chunks`` must exceed
    ``max_hamming`` for exactness; wider chunks = fewer bucket collisions,
    so use the smallest chunk count the distance budget allows.
    """
    if max_hamming >= chunks:
        raise ValueError(f"pigeonhole requires chunks > max_hamming ({chunks} <= {max_hamming})")
    if 64 % chunks != 0:
        raise ValueError("chunks must divide 64")
    # barrier: both sides of the chunk-bucket self-join consume the
    # fingerprint relation; without an eager cache fill the whole
    # tokenize -> numpy-vote pipeline runs once per branch. The cached
    # relation is tiny (one int64 per doc).
    fp = simhash(df, id_col, text_col).localCheckpoint(eager=True)
    width = 64 // chunks
    chunk_arr = F.array(
        *[
            (F.shiftrightunsigned("simhash", c * width).bitwiseAND(F.lit((1 << width) - 1))).alias(f"c{c}")
            for c in range(chunks)
        ]
    )
    buckets = fp.select(id_col, "simhash", F.posexplode(chunk_arr).alias("chunk", "val"))
    l = buckets.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "val")
    r = buckets.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "val")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # verify (bit_count intrinsic) BEFORE dedup: a pair can surface from up
    # to `chunks` buckets, and deduplicating millions of candidate rows
    # costs far more than popcounting them — survivors are few
    return (
        l.join(r, ["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    strategy: str = "min_label",
    info: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair relation — the step
    that turns near-dup PAIRS into dedup CLUSTERS (pick one keeper per
    component, drop the rest).

    Two selectable strategies, identical output contract:

    - ``min_label`` (default): label propagation — each round a vertex
      adopts the smallest label among itself and its neighbors; converged
      when no label changes. Round 1 is fused into initialization, so
      cliques — the dedup shape — arrive converged and pay only the
      verification round. Rounds needed = component DIAMETER; right for
      dedup graphs (near-dup components are dense and shallow).
    - ``star``: alternating large-star/small-star (Kiveris et al. 2014,
      "Connected Components in MapReduce and Beyond", Algorithm 2) —
      converges in O(log^2 n) rounds regardless of diameter; right for
      adversarial graphs (long chains) where min-label's round count is
      unbounded.

    Raises RuntimeError if ``max_iterations`` rounds pass without
    convergence: the labels at that point are NOT component minima and
    returning them silently would hand the caller wrong clusters. Retry
    with ``strategy='star'`` (diameter-independent) or more iterations.

    Each round is shuffle joins on 8-byte ids — the text never enters the
    graph. Every generation is eagerly localCheckpointed: iterative
    DataFrame loops that only persist accumulate a nested plan that AQE
    re-optimizes on every action (measured 12-30s/round on a 477-vertex
    graph before truncation, ~1s/round after), and eager materialization
    makes release safe — once a round's blocks exist, its predecessor's
    blocks are freed immediately (nothing recomputes through a
    checkpoint).

    ``info``, if supplied, receives {'rounds': N, 'strategy': ...}.

    ``pairs`` must have a DETERMINISTIC lineage (no sampling, no
    unstable limits): the star strategy re-evaluates it once more at
    label assembly after the edge set was checkpointed at seed time
    (ADVICE r14) — a nondeterministic caller should
    ``localCheckpoint(eager=True)`` its pairs first.

    Returns one row per vertex that appears in ``pairs``:
    (vertex, cluster_id) with cluster_id = min vertex id of the component.
    """
    if strategy == "star":
        return _cc_star(pairs, id_a, id_b, max_iterations, info)
    if strategy != "min_label":
        raise ValueError(f"unknown strategy {strategy!r}; use 'min_label' or 'star'")
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # loop-invariant relation partitioned ONCE by the per-round join
        # key (round 15, the Batch-7 pagerank shape applied to CC): each
        # round's neighbor join builds its hash table on the O(V) labels
        # side while edges stream from cache with partitioning intact —
        # no O(E) exchange, no sort, per round. The persist fills on the
        # seed aggregate's scan, so the old persist+count warm-up action
        # is gone (one action saved per call).
        .repartition(F.col("dst"))
        .persist()
    )
    # seed with propagation round 1 fused into initialization: label(v) =
    # min(v, direct neighbors) in the same groupBy that enumerates the
    # vertex set — one aggregate instead of distinct + a full loop round.
    # Cliques (the dedup shape) arrive CONVERGED; the loop then only pays
    # its verification round. Grouped by dst (symmetric relation: min src
    # over dst-groups == min neighbor) so the seed REUSES the dst
    # partitioning — no exchange.
    labels = (
        edges.groupBy("dst")
        .agg(F.min("src").alias("nmin"))
        .select(F.col("dst").alias("vertex"), F.least("dst", "nmin").alias("label"))
    )
    # every generation is EAGERLY localCheckpointed, not persisted: with
    # persist-only lineage each round's action re-plans (AQE) through the
    # whole accumulated join tree — the same blowup measured at
    # 12-30s/round in the star strategy (see _cc_star). Eager checkpoints
    # bound the plan at one round and make release immediate: once round
    # i+1's blocks exist, nothing can recompute through round i (its
    # lineage is gone), so its blocks are freed right away.
    cached = labels.localCheckpoint(eager=True)
    labels = cached
    converged = False
    rounds = 0
    for i in range(max_iterations):
        rounds = i + 1
        neighbor_min = (
            # hash table on the O(V) labels side; edges stream from cache
            # with their dst partitioning intact (no exchange, no sort)
            edges.join(labels.hint("shuffle_hash"), edges.dst == labels.vertex)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
            .select(F.col("src").alias("vertex"), "nmin")
        )
        # the convergence probe RIDES the materializing checkpoint as an
        # observed metric — the checkpoint job already streams every row,
        # so the changed-label count costs no extra pass (was: a separate
        # count action re-scanning the checkpointed relation each round)
        obs = Observation(f"cc_min_label_round_{i}")
        stepped = (
            labels.join(neighbor_min, "vertex", "left")
            .select("vertex", F.least("label", "nmin").alias("_new"), "label")
            .observe(obs, F.sum(F.when(F.col("_new") != F.col("label"), 1).otherwise(0)).alias("changed"))
        )
        stepped = stepped.localCheckpoint(eager=True)  # materializes NOW
        # release request for the predecessor generation; on a
        # localCheckpointed frame unpersist() is a CacheManager no-op, so
        # the actual block free is deferred to the ContextCleaner on GC —
        # peak memory can briefly hold a couple of O(V) generations
        cached.unpersist()
        cached = stepped
        # bounded wait + explicit-probe fallback (ADVICE r14): a Spark
        # that stops delivering metrics on checkpoint degrades to one
        # extra aggregate action instead of hanging in Observation.get
        changed = (
            observed_metrics(
                obs,
                stepped,
                F.sum(F.when(F.col("_new") != F.col("label"), 1).otherwise(0)).alias("changed"),
            )["changed"]
            or 0
        )  # None on an empty vertex set
        labels = stepped.select("vertex", F.col("_new").alias("label"))
        if changed == 0:
            converged = True
            break
    if info is not None:
        info.update({"rounds": rounds, "strategy": "min_label"})
    if not converged:
        cached.unpersist()
        edges.unpersist()
        raise RuntimeError(
            f"connected_components(min_label) did not converge in {max_iterations} "
            "rounds (component diameter exceeds the budget); use strategy='star' "
            "(diameter-independent, O(log^2 n) rounds) or raise max_iterations"
        )
    final = labels.select(F.col("vertex"), F.col("label").alias("cluster_id")).localCheckpoint(eager=True)
    cached.unpersist()
    edges.unpersist()
    return final


def _cc_star(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iterations: int,
    info: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al. 2014). Diameter-independent: O(log^2 n) rounds on any graph.

    Edge set is kept in canonical orientation (u > v, no self-loops):

    - large-star: for each node u with neighborhood G(u) (symmetrized),
      m = min(G(u) ∪ {u}); emit (v, m) for every neighbor v > u. Hooks
      every larger neighbor directly onto the local minimum.
    - small-star: for each node u over its SMALLER neighbors N(u) (the
      canonical relation itself), m = min(N(u)); emit (u, m) and (v, m)
      for v in N(u), dropping self-loops. Flattens chains of parent
      pointers.

    Both preserve connectivity; the fixpoint is a star forest where every
    non-root points straight at its component minimum. Convergence is
    detected as an unchanged (count, xor-hash) signature of the canonical
    edge set, observed on the checkpoint job itself (no extra action).

    Every round's output is EAGERLY localCheckpointed, not persisted:
    a star round nests a union, a self-join and two distincts, and with
    persist-only lineage each subsequent action re-plans (AQE) through
    the whole accumulated tree — measured 12-30s/round on a 477-vertex
    graph, vs 0.9s/round once each generation is truncated to its
    checkpoint blocks. Eager checkpointing also makes release safe and
    immediate: the moment round i+1's checkpoint has materialized,
    round i's blocks can be freed (nothing ever recomputes THROUGH a
    checkpoint — its lineage is gone; its blocks are read only while
    building round i+1).
    """
    # the (count, xor-hash) convergence signature RIDES each generation's
    # materializing checkpoint as an observed metric — the checkpoint job
    # already streams every edge, so the signature costs no extra pass
    # (was: a separate aggregate action per round). XOR-fold, not sum:
    # order-independent like sum but cannot overflow under ANSI
    # arithmetic; duplicate cancellation is moot (set is distinct), and
    # the count guards the all-zero corner.
    def _observed_checkpoint(e: DataFrame, name: str) -> tuple[DataFrame, tuple[int, int]]:
        obs = Observation(name)
        ck = e.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).localCheckpoint(eager=True)
        # bounded wait + explicit-probe fallback (ADVICE r14, see
        # operators/observe.py): never block forever on delivery
        m = observed_metrics(
            obs, ck, F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
        )
        return ck, (m["n"], m["h"] if m["h"] is not None else 0)

    edges, sig = _observed_checkpoint(
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        "cc_star_seed",
    )
    # vertex universe from the ORIGINAL pairs (roots drop out of the edge
    # relation's left side as stars form; they re-enter at label assembly)
    # — consumed exactly once, at label assembly, so it stays LAZY: a
    # persist+count here was one extra action for a relation never reread.
    # DETERMINISM ASSUMPTION (ADVICE r14): the edge set above was
    # checkpointed from ``pairs`` at seed time, while this vertex relation
    # re-evaluates ``pairs`` at label assembly — callers must pass a
    # deterministic ``pairs`` lineage (no sampling / unstable limits), or
    # the recomputed vertex universe can diverge from the edge set and
    # yield spurious or missing singleton roots. Every in-repo caller is
    # deterministic; a nondeterministic caller should localCheckpoint its
    # pairs first (the same rule merge_rows_pruned documents for updates).
    vertices = (
        pairs.select(F.col(id_a).alias("vertex"))
        .union(pairs.select(F.col(id_b).alias("vertex")))
        .distinct()
    )

    cur = edges
    converged = False
    rounds = 0
    for i in range(max_iterations):
        rounds = i + 1
        # -- large-star over the symmetrized neighborhood ------------------
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("nmin"))
            .select("u", F.least("u", "nmin").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star over the canonical (parent-pointer) relation ------
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # materializes NOW; the signature rides the same job (see above)
        small, new_sig = _observed_checkpoint(small, f"cc_star_round_{i}")
        # release request only — see _cc min-label note: localCheckpoint
        # blocks are actually freed by the ContextCleaner on GC, so peak
        # memory can briefly hold a couple of O(V) generations
        cur.unpersist()
        cur = small
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if info is not None:
        info.update({"rounds": rounds, "strategy": "star"})
    if not converged:
        cur.unpersist()
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iterations} rounds; "
            "O(log^2 n) bound implies max_iterations is far too small for this input"
        )
    # at the fixpoint every edge is (non-root vertex, component min)
    non_roots = cur.select(F.col("u").alias("vertex"), F.col("v").alias("cluster_id"))
    roots = vertices.join(non_roots.select("vertex"), "vertex", "left_anti").select(
        "vertex", F.col("vertex").alias("cluster_id")
    )
    final = non_roots.union(roots).localCheckpoint(eager=True)
    cur.unpersist()
    return final


def decontaminate(
    train: DataFrame,
    held: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Cross-corpus n-gram contamination check: (train_id, heldout_id,
    n_shared) for every pair sharing >= min_shared distinct n-gram
    shingles — the eval-decontamination pass a training corpus runs
    against its benchmark suites before release.

    The two corpora meet ONLY through the 8-byte shingle-hash shuffle
    (never doc x doc); the held side is typically benchmark-sized, so its
    shingle relation broadcasts under AQE. ``max_df`` (applied to the
    TRAIN side, where corpus-common shingles live) bounds the join's hot
    buckets exactly like the Jaccard family; dedup the train corpus first
    (q30/q65) — exact dup cliques multiply every df and square the join
    work, as the 10x probe in BASELINE.md measures.
    """
    tr = _cap_df(_exploded_shingles(train, id_col, text_col, n), max_df).withColumnRenamed(id_col, "train_id")
    he = _exploded_shingles(held, id_col, text_col, n).withColumnRenamed(id_col, "heldout_id")
    return (
        tr.join(he, "shingle")
        .groupBy("train_id", "heldout_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def build_fingerprint_bloom(
    corpus: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 8,
):
    """Build a Bloom filter over the corpus's normalized-text
    fingerprints, distributed: each Arrow batch ORs its fingerprints'
    bit positions into a local m_bits/8-byte bitmap, partials OR-reduce
    in one single-group applyInPandas, and only the FINAL bitmap (e.g.
    128 KB at m=2^20) reaches the driver — a bounded artifact like the
    IVF centroids, persistable and broadcastable.

    Bit positions are k independent JVM-side xxhash64(fp, seed) values
    mod m — computed in Catalyst so the probe side can reproduce them
    without Python hashing. Returns (bitmap uint8 array, m_bits, k).

    Why a bloom at 100 TB: the exact corpus fingerprint SET is
    ~32 bytes/doc (TBs at web scale — a TABLE you must join against);
    the bloom is m/8 bytes TOTAL at a chosen FP rate (~1.2 MB per 1M
    docs at 1%), small enough to broadcast to every executor and probe
    at memory speed, turning incremental dedup's anti-join into a
    local filter + a small verify join (see bloom_prefilter_new_docs).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from kafka_connect_bigquery_storage_write_spark.operators.text import fingerprint

    fp = fingerprint(text_col)
    positions = F.array(*[F.pmod(F.xxhash64(fp, F.lit(i)), F.lit(m_bits)) for i in range(k)])
    pos_df = ensure_compute_parallelism(corpus.select(positions.alias("_pos")))

    part_schema = T.StructType([T.StructField("bm", T.BinaryType(), False)])

    def partial(batches):
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if not len(pdf):
                continue
            touched = True
            p = np.concatenate(pdf["_pos"].to_numpy()).astype(np.int64)
            np.bitwise_or.at(bm, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
        if touched:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    def orreduce(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for b in pdf["bm"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"bm": [acc.tobytes()]})

    partials = pos_df.mapInPandas(partial, schema=part_schema).withColumn("_g", F.lit(0))
    final = partials.groupBy("_g").applyInPandas(lambda pdf: orreduce(pdf), schema=part_schema)
    rows = final.collect()  # exactly one row, m_bits/8 bytes — bounded artifact
    bitmap = np.frombuffer(rows[0]["bm"], dtype=np.uint8).copy() if rows else np.zeros(m_bits // 8, dtype=np.uint8)
    return bitmap, m_bits, k


def bloom_prefilter_new_docs(
    corpus: DataFrame,
    increment: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 8,
) -> DataFrame:
    """Incremental exact dedup with a Bloom prefilter — q65's production
    evolution: the corpus fingerprint set becomes a broadcastable
    m_bits/8-byte bitmap; increment rows whose k bits are not all set
    are DEFINITIVELY new (a Bloom has no false negatives), and only the
    Bloom-positive minority (true dups + ~FP-rate of the new docs) pays
    the exact anti-join against the corpus fingerprint relation.

    The OUTPUT is exactly q65's: the increment rows whose fingerprint
    does not appear in the corpus — bit-for-bit, because every Bloom
    positive is exactly verified. That is what keeps this oracle-checkable
    while the approximate structure does the scale work: the anti-join's
    probe side shrinks from |increment| to |dups| + FPR*|new|.
    """
    import numpy as np
    import pandas as pd

    from kafka_connect_bigquery_storage_write_spark.operators.text import fingerprint

    bitmap, m, kk = build_fingerprint_bloom(corpus, text_col=text_col, m_bits=m_bits, k=k)
    b_bm = corpus.sparkSession.sparkContext.broadcast(bitmap)

    # no type hints: under `from __future__ import annotations` the
    # pd.Series hints are unresolvable strings for pandas_udf's inspector
    def _might_contain(pos):
        bm = b_bm.value
        out = np.ones(len(pos), dtype=bool)
        for j, arr in enumerate(pos):
            p = np.asarray(arr, dtype=np.int64)
            out[j] = bool(np.all((bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1))
        return pd.Series(out)

    might_contain = F.pandas_udf(_might_contain, "boolean")

    fp = fingerprint(text_col)
    positions = F.array(*[F.pmod(F.xxhash64(F.col("fp"), F.lit(i)), F.lit(m)) for i in range(kk)])
    inc = (
        ensure_compute_parallelism(increment)
        .select(id_col, fp.alias("fp"))
        .withColumn("_hit", might_contain(positions))
    )
    definitely_new = inc.filter(~F.col("_hit")).select(id_col, "fp")
    corpus_fps = corpus.select(fingerprint(text_col).alias("fp")).distinct()
    verified_new = (
        inc.filter(F.col("_hit")).select(id_col, "fp").join(corpus_fps, "fp", "left_anti").select(id_col, "fp")
    )
    return definitely_new.union(verified_new)


def contamination_scores(
    train: DataFrame,
    held: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-train-document contamination SCORE: the fraction of each train
    doc's distinct n-gram shingles that appear anywhere in the held-out
    corpus — the ranking/thresholding companion to ``decontaminate``
    (which emits pair evidence). Scoring against the benchmark shingle
    UNIVERSE is what release pipelines actually gate on (e.g. "drop train
    docs with >X% benchmark overlap").

    Scale: the held side collapses to its DISTINCT shingle-hash set
    (benchmark-sized — broadcasts under AQE) and membership is a
    left-semi join, so no train-doc x held-doc pair space ever exists;
    the only wide exchange is the doc-grain count aggregation the corpus
    partitioning already serves. The train shingle relation is persisted
    with an eager barrier because the hit and total aggregations both
    consume it.
    """
    # barrier: hit + total aggregations share the shingle pass (eager
    # checkpoint releases with the result; persist leaked, ADVICE r9)
    tr = _exploded_shingles(train, id_col, text_col, n).localCheckpoint(eager=True)
    held_set = _exploded_shingles(held, id_col, text_col, n).select("shingle").distinct()
    hits = (
        tr.join(held_set, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    totals = tr.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / F.col("n_shingles"), 6).alias("contamination"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Directional n-gram containment: containment(src -> dst) =
    |shingles(src) ∩ shingles(dst)| / |shingles(src)|.

    The asymmetric member of the near-dup family (Broder 1997's
    "containment", alongside "resemblance"/Jaccard): a short document
    quoted wholesale inside a much longer one scores containment ~1.0
    while its Jaccard stays low (the union is dominated by the long
    side), so q31's symmetric filter never sees it. Corpus curation uses
    this to drop subsumed documents — keep the superset, drop the quote.

    Same scale contract as jaccard_near_dup_pairs: pairs meet through the
    8-byte shingle-hash shuffle (Σ df² join cost, max_df caps the hot
    buckets), the text itself never moves, and the output is directional
    rows (src_id, dst_id, containment) with src_id != dst_id — both
    directions can appear, each scored by its own denominator.
    """
    sh = _cap_df(_exploded_shingles(df, id_col, text_col, n), max_df).localCheckpoint(eager=True)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("src_id"), "shingle")
    b = sh.select(F.col(id_col).alias("dst_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("src_id") != F.col("dst_id"))
        .groupBy("src_id", "dst_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    csrc = counts.select(F.col(id_col).alias("src_id"), F.col("n_sh").alias("n_src"))
    return (
        inter.join(csrc, "src_id")
        .withColumn("containment", F.round(F.col("n_inter") / F.col("n_src"), 6))
        .filter(F.col("containment") >= threshold)
        .select("src_id", "dst_id", "containment")
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs at ``threshold`` via prefix filtering —
    the AllPairs/PPJoin candidate economics (Bayardo et al. WWW'07; Xiao
    et al. WWW'08) without MinHash's false-negative risk.

    Principle: order every doc's shingles by ascending document frequency
    (rarest first, (df, shingle) as the global total order). If
    J(A,B) >= t then, since any qualifying partner has size >= ceil(t*|A|),
    the required overlap is >= ceil(t*|A|) — so A and B must share a
    shingle within their first ``|x| - ceil(t*|x|) + 1`` tokens. Joining
    PREFIXES (a ~(1-t) fraction of each doc, made of its RAREST shingles)
    instead of whole shingle sets collapses the candidate join's
    Sum df^2 cost: the corpus-common shingles that dominate q31's join
    fall in suffixes and never generate candidates. A symmetric length
    filter (t*|A| <= |B| <= |A|/t) prunes further. Candidates are then
    verified EXACTLY (full intersection count), so output == q31's
    byte-for-byte; the candidate-count economics are pinned in
    tests/test_dedup_similarity.py.

    Scale: prefix length and df ordering are per-doc decisions off a
    distinct-shingle df relation — no global rank, no window; the only
    exchanges are the df join (by shingle), the prefix self-join (by rare
    shingle), and the verify joins (by candidate doc id).
    """
    sh = _exploded_shingles(df, id_col, text_col, n).localCheckpoint(eager=True)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_s"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df_s", "shingle"))).alias("toks"))
        .withColumn("n_sh", F.size("toks"))
        .withColumn(
            "p",
            F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")).cast("int") + F.lit(1),
        )
    )
    prefixes = per_doc.select(
        id_col,
        "n_sh",
        F.explode(F.expr("transform(slice(toks, 1, p), t -> t.shingle)")).alias("shingle"),
    )
    a = prefixes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    b = prefixes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )
    sha = sh.select(F.col(id_col).alias("id_a"), "shingle")
    shb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cand.join(sha, "id_a")
        .join(shb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_join_candidate_count(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3, threshold: float = 0.8
) -> tuple[int, int]:
    """(prefix-filtered candidate pairs, full shingle-join candidate pairs)
    — the economics probe the tests pin. Not part of the query surface."""
    sh = _exploded_shingles(df, id_col, text_col, n).localCheckpoint(eager=True)
    full = (
        sh.select(F.col(id_col).alias("id_a"), "shingle")
        .join(sh.select(F.col(id_col).alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_s"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df_s", "shingle"))).alias("toks"))
        .withColumn("n_sh", F.size("toks"))
        .withColumn("p", F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")).cast("int") + F.lit(1))
    )
    prefixes = per_doc.select(
        id_col, "n_sh",
        F.explode(F.expr("transform(slice(toks, 1, p), t -> t.shingle)")).alias("shingle"),
    )
    a = prefixes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    b = prefixes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    pref = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
        )
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    return pref, full


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
) -> DataFrame:
    """Paragraph-grain repeated-substring dedup (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" surface,
    at aligned-window grain): tile every document into aligned
    ``window``-token chunks, find chunks whose text recurs ANYWHERE in
    the corpus, and keep only the globally FIRST occurrence of each
    (order = (doc id, position)); every later occurrence is cut from its
    document. The ragged tail (< window tokens) is always kept. Returns
    one row per input document:

        id_col, n_chunks, n_removed, n_tokens_kept, clean_text

    where ``clean_text`` is the document with its removed spans cut out
    (kept chunks + tail rejoined with single spaces).

    Exact at chunk-text grain — no sketching — so the whole operator
    carries a DuckDB oracle. Chunking is a projection pipeline (sequence
    + explode, no join); global first-occurrence election is ONE window
    (row_number over the chunk's xxhash64, ordered by (doc, pos)) — a
    hash-partitioned exchange whose key space is the distinct-chunk set,
    the same key the q137 detection aggregate shuffles on; reassembly is
    a per-doc sort_array over kept (pos, chunk) structs. Hash-collision
    odds at corpus scale ~n^2/2^65, the accepted shingle-join bound.

    Scale note (suffix-array parity): Lee et al.'s ExactSubstr finds
    UNALIGNED repeats >= 50 tokens with a corpus suffix array; the
    aligned-window form trades recall at window boundaries for a
    shuffle-only plan with no global index — the standard map-reduce
    restatement (CCNet/RefinedWeb dedup these grains the same way).
    """
    from pyspark.sql import Window

    d = ensure_compute_parallelism(
        df.select(
            id_col,
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias("_t"),
        )
    ).withColumn("_n", F.size("_t"))
    starts = F.when(
        F.col("_n") >= window, F.sequence(F.lit(0), F.col("_n") - window, F.lit(window))
    ).otherwise(F.expr("array()").cast("array<int>"))
    chunks = d.select(id_col, "_t", "_n", F.explode(starts).alias("s")).select(
        id_col,
        "_n",
        "s",
        F.array_join(F.slice("_t", F.col("s") + 1, window), " ").alias("chunk"),
    )
    w = Window.partitionBy(F.xxhash64("chunk")).orderBy(id_col, "s")
    ranked = chunks.withColumn("_rn", F.row_number().over(w))
    per_doc = ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("_rn") > 1).cast("long")).alias("n_removed"),
        F.sort_array(
            F.collect_list(F.when(F.col("_rn") == 1, F.struct("s", "chunk")))
        ).alias("_kept"),
    )
    tail = F.array_join(
        F.slice("_t", F.col("_n") - F.pmod("_n", F.lit(window)) + 1, F.pmod("_n", F.lit(window))),
        " ",
    )
    base = d.select(
        id_col,
        "_n",
        F.when(F.pmod("_n", F.lit(window)) > 0, tail).otherwise(F.lit("")).alias("_tail"),
    )
    out = base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        (
            F.coalesce(F.size(F.filter("_kept", lambda x: x.isNotNull())), F.lit(0)) * window
            + F.pmod("_n", F.lit(window))
        ).alias("n_tokens_kept"),
        F.concat_ws(
            " ",
            F.array_join(
                F.transform(F.coalesce("_kept", F.expr("array()")), lambda x: x["chunk"]), " "
            ),
            F.col("_tail"),
        ).alias("clean_text"),
    )
    # concat_ws skips NULLs but not empty strings: trim the seam when one
    # side is empty so the join below is byte-stable
    return out.withColumn("clean_text", F.trim("clean_text"))


def repeated_span_token_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    stride: int = 1,
) -> DataFrame:
    """UNALIGNED repeated-span removal at token coverage grain — the
    full-strength Lee et al. 2022 ExactSubstr semantic that
    ``remove_repeated_spans``' aligned tiling approximates: windows of
    ``window`` tokens slide at ``stride`` (1 = every offset), every
    window whose text occurred EARLIER anywhere in the corpus (global
    order = (doc id, start)) marks its token span as duplicate, and a
    document keeps exactly the tokens covered by no such later
    occurrence. A boilerplate block SHIFTED by one token — invisible to
    aligned tiling — is caught at stride 1. Returns one row per input
    document:

        id_col, n_tokens, n_removed_tokens, clean_text

    Exact at window-text grain (no sketching): carries a full DuckDB
    oracle. Scale shape: window generation is a projection pipeline
    (sequence + explode — ~n_tokens/stride windows of w tokens each,
    the documented w/stride blow-up of unaligned matching); the
    first-occurrence election is ONE row_number window keyed on
    xxhash64(window text); coverage expansion emits (doc, pos) pairs
    only for DUPLICATE windows (output-sensitive: cost follows how much
    boilerplate exists, not corpus size); the kept-token reassembly is
    a per-doc sort over surviving positions. Nothing pairs docs
    against docs. A true suffix-array ExactSubstr finds arbitrary-
    length repeats; fixed-window-at-stride-1 is its bounded map-reduce
    restatement (windows >= w match exactly).
    """
    d, dup_wins = _unaligned_dup_windows(df, id_col, text_col, window, stride)
    covered = dup_wins.select(
        id_col, F.explode(F.sequence(F.col("s"), F.col("s") + window - 1)).alias("p")
    ).distinct()
    toks = d.select(id_col, "_n", F.posexplode("_t").alias("p", "tok"))
    kept = toks.join(covered, [id_col, "p"], "left_anti")
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list(F.struct("p", "tok"))), lambda x: x["tok"]),
            " ",
        ).alias("clean_text"),
    )
    return (
        d.select(id_col, "_n")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("_n").alias("n_tokens"),
            (F.col("_n") - F.coalesce("_n_kept", F.lit(0))).alias("n_removed_tokens"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def _unaligned_dup_windows(
    df: DataFrame, id_col: str, text_col: str, window: int, stride: int
) -> tuple[DataFrame, DataFrame]:
    """Shared election for the unaligned span family: tokenize once
    (eager barrier — the corpus feeds several subtrees downstream, the
    q221 multi-consumer rule), slide ``window``-token windows at
    ``stride``, and keep every window whose text occurred EARLIER in the
    corpus (global order = (doc id, start); first occurrence elected by
    ONE row_number window keyed on xxhash64 of the window text — 8-byte
    hashes shuffle, never the text). Returns (tokenized docs with
    ``_t``/``_n``, duplicate windows as (id_col, s))."""
    d = _tokenized(df, id_col, text_col)
    return d, _dup_windows_from_tokens(d, id_col, window, stride)


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """ONE tokenization for the whole span family (shared by the
    single-grain election and the multi-grain sweep so the split regex
    and empty-token filter can never diverge between them): whitespace
    tokens as ``_t`` with length ``_n``, eagerly checkpointed — the
    corpus feeds several consumers downstream (the q221 rule)."""
    d = (
        ensure_compute_parallelism(
            df.select(
                id_col,
                F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "").alias("_t"),
            )
        )
        .withColumn("_n", F.size("_t"))
        .localCheckpoint(eager=True)
    )
    return d


def _dup_windows_from_tokens(d: DataFrame, id_col: str, window: int, stride: int) -> DataFrame:
    """Election half of ``_unaligned_dup_windows`` over an already
    tokenized relation (``_t``/``_n`` columns) — split out so multi-grain
    sweeps (q231) tokenize ONCE and run one election per window size."""
    from pyspark.sql import Window

    starts = F.when(
        F.col("_n") >= window, F.sequence(F.lit(0), F.col("_n") - window, F.lit(stride))
    ).otherwise(F.expr("array()").cast("array<int>"))
    wins = d.select(id_col, F.explode(starts).alias("s"), "_t").select(
        id_col, "s", F.xxhash64(F.array_join(F.slice("_t", F.col("s") + 1, window), " ")).alias("h")
    )
    w = Window.partitionBy("h").orderBy(id_col, "s")
    return wins.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") > 1)


def multi_grain_span_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    windows: tuple[int, ...] = (20, 10),
    stride: int = 1,
) -> DataFrame:
    """Duplicate-token coverage at MULTIPLE window grains in one pass
    (VERDICT r12 #3 — the w-floor blind spot): the unaligned
    first-occurrence election (``_unaligned_dup_windows``) is exact only
    for repeats of at least ``window`` tokens, so a single w=20 run is
    blind to 10–19-token boilerplate (chat headers, footers). This
    operator tokenizes the corpus ONCE and runs one independent election
    per grain, returning one row per document:

        id_col, n_tokens, dup_tokens_w{w}... , dup_permille_w{w}...

    where ``dup_tokens_w{w}`` is the union coverage of duplicate
    ``w``-token windows (== ``repeated_span_token_dedup(window=w)``'s
    ``n_removed_tokens``) and ``dup_permille_w{w}`` the integer per-mille
    fraction (Spark ``div`` == DuckDB ``//``, no float seam). A
    curation pipeline reads the GAP between grains: a doc with high
    w10 coverage but low w20 coverage is full of short repeated
    fragments that the coarse grain certifies clean.

    Scale shape: tokenization is shared (one eager barrier — multiple
    elections consume it, the q221 multi-consumer rule); each election
    is the documented ~n_tokens/stride window blow-up, compute-side,
    with only 8-byte hashes shuffling; coverage expansion emits rows
    for DUPLICATE windows only (output-sensitive) — at w=10 the window
    COUNT is the same ~n per doc as w=20 and each window hashes half
    the text, so the sweep prices ~2x one election, not 2x the corpus.
    Smaller windows elect MORE duplicates (any 10-token phrase recurring
    anywhere), which is the statistic's point — the operator reports
    coverage, it does not rewrite text at the finer grain.
    """
    d = _tokenized(df, id_col, text_col)
    out = d.select(id_col, F.col("_n").alias("n_tokens"))
    for w in windows:
        dup_wins = _dup_windows_from_tokens(d, id_col, w, stride)
        covered = (
            dup_wins.select(
                id_col, F.explode(F.sequence(F.col("s"), F.col("s") + w - 1)).alias("p")
            )
            .distinct()
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias(f"dup_tokens_w{w}"))
        )
        out = out.join(covered, id_col, "left").withColumn(
            f"dup_tokens_w{w}", F.coalesce(f"dup_tokens_w{w}", F.lit(0))
        )
    for w in windows:
        out = out.withColumn(
            f"dup_permille_w{w}", F.expr(f"(1000 * dup_tokens_w{w}) div n_tokens")
        )
    return out


def repeated_span_extents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    stride: int = 1,
) -> DataFrame:
    """MAXIMAL duplicate-span extents (VERDICT r11 #4 — the survivorship
    statistic of Lee et al. 2022 §4): the same unaligned first-occurrence
    election as ``repeated_span_token_dedup``, but instead of rewriting
    documents, overlapping-or-adjacent duplicate windows merge into
    maximal (start, end) spans per document — what a curation pipeline
    inspects to set survivorship thresholds ("drop docs > X‰
    duplicated") and to excise spans server-side, without materializing
    cleaned text. One row per maximal span:

        id_col, span_start, span_end, span_tokens, n_tokens,
        doc_dup_tokens, dup_permille

    Positions are 0-based inclusive token offsets; ``doc_dup_tokens`` is
    the union coverage of the doc's spans (== the token dedup operator's
    ``n_removed_tokens`` — pytest-pinned invariant) and ``dup_permille``
    = (1000 * doc_dup_tokens) div n_tokens in INTEGER arithmetic (Spark
    ``div`` == DuckDB ``//`` for positives — no float-rounding seam).

    Exact at window-text grain, so the whole operator carries a DuckDB
    oracle: the interval merge is the standard gaps-and-islands idiom
    (a span breaks where the next duplicate window starts past the
    running max end + 1), SQL-expressible verbatim. Scale shape:
    inherits the w/stride window blow-up (compute-side; hashes
    shuffle); the merge itself is one per-doc window function over
    DUPLICATE windows only — output-sensitive, cost follows boilerplate
    volume, not corpus size; no doc-vs-doc pairing anywhere.
    """
    from pyspark.sql import Window

    d, dup_wins = _unaligned_dup_windows(df, id_col, text_col, window, stride)
    iv = dup_wins.select(id_col, "s", (F.col("s") + window - 1).alias("e"))
    w_ord = Window.partitionBy(id_col).orderBy("s")
    prev_e = F.max("e").over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
    spans = (
        iv.withColumn(
            "_brk", F.when(prev_e.isNull() | (F.col("s") > prev_e + 1), 1).otherwise(0)
        )
        .withColumn("_g", F.sum("_brk").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(id_col, "_g")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start") + 1)
    )
    per_doc = spans.groupBy(id_col).agg(F.sum("span_tokens").alias("doc_dup_tokens"))
    return (
        spans.join(per_doc, id_col)
        .join(d.select(id_col, F.col("_n").alias("n_tokens")), id_col)
        .select(
            id_col,
            "span_start",
            "span_end",
            "span_tokens",
            "n_tokens",
            "doc_dup_tokens",
            F.expr("(1000 * doc_dup_tokens) div n_tokens").alias("dup_permille"),
        )
    )
