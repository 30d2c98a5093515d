"""Similarity search over embedding columns (SURVEY.md E15).

Two paths:
- ``cosine_topk``: brute-force exact top-k — the baseline and the oracle.
  Dot products run as JVM higher-order functions (zip_with + aggregate),
  queries broadcast, so the fact side streams through one stage with no
  shuffle until the per-query top-k.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path. Docs
  only meet queries sharing a signature band, turning O(N*Q) into
  O(candidates). Exactness is traded for recall; the tests measure
  recall against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ensure_compute_parallelism
from kafka_connect_bigquery_storage_write_spark.sources.tables import local_rows_df


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i in double precision, JVM-side."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Scale: broadcast(queries) x corpus — no shuffle of the corpus; the
    only exchange is the per-query top-k (rank window on query_id, a key
    with |Q| values; skew-free because every query sees every partition).
    Excludes self-matches when ids collide. Ties break on neighbor id.
    """
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    # the corpus side streams through the broadcast join doing a fold per
    # (row, query) — CPU-bound, so don't inherit a bytes-sized scan layout
    c = ensure_compute_parallelism(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6))
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _band_hashes(sig_col: str, n_planes: int, bands: int) -> Column:
    """array of per-band bucket hashes over a 0/1 signature column.

    Band b hashes its slice of the signature (salted with b so equal
    slices in different bands cannot share buckets when a caller joins on
    bucket alone). Shared by every banded-LSH path — the band layout must
    never diverge between them.
    """
    rows_per_band = n_planes // bands
    if rows_per_band * bands != n_planes:
        raise ValueError("n_planes must be divisible by bands")
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.concat_ws(
                    ",",
                    F.transform(F.slice(sig_col, b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")),
                ),
            )
            for b in range(bands)
        ]
    )


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit j = sign(vec · plane_j).

    The plane matrix enters the plan as ONE nested-array literal and the
    signature is a transform over it — building per-plane CreateArray
    expressions per row instead was measured ~10x slower (the literal was
    reconstructed for every row inside codegen).
    """
    planes_lit = F.lit(planes)
    return F.transform(planes_lit, lambda p: F.when(dot(p, vec_col) >= 0, F.lit(1)).otherwise(F.lit(0)))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH band buckets -> exact rescore.

    Corpus vectors are signed once (one narrow pass), bucketed by band;
    a query probes only its own buckets, so the candidate set — not the
    corpus — is rescored. Recall tunes with n_planes/bands.
    """
    planes = _hyperplanes(dim, n_planes, seed)

    def banded(df: DataFrame, ident: str) -> DataFrame:
        # compute the signature once per row, then band-hash slices of it
        sigged = df.select(F.col(ident), F.col(vec_col), lsh_signature(F.col(vec_col), planes).alias("_sig"))
        return sigged.select(
            F.col(ident), F.col(vec_col), F.posexplode(_band_hashes("_sig", n_planes, bands)).alias("band", "bucket")
        )

    cb = banded(
        ensure_compute_parallelism(corpus.select(F.col(id_col).alias("neighbor_id"), vec_col)), "neighbor_id"
    ).withColumnRenamed(vec_col, "_cvec")
    qb = banded(queries.select(query_id_col, vec_col), query_id_col).withColumnRenamed(vec_col, "_qvec")
    cand = cb.join(F.broadcast(qb), ["band", "bucket"]).filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    # score BEFORE deduplicating (same rationale as ivf_topk): a pair
    # sharing b bands costs b cosine folds this way, but the dedup
    # exchange then moves 24-byte (query, neighbor, cosine) rows instead
    # of rows carrying both d-dim vectors — the fold is cheap codegen'd
    # CPU, the wide shuffle is not; duplicates carry identical cosines so
    # arbitrary-keep is sound.
    scored = cand.withColumn("cosine", F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6)).select(
        query_id_col, "neighbor_id", "cosine"
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.dropDuplicates([query_id_col, "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def ivf_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_mode: str = "prefix",  # prefix | hash
) -> "np.ndarray":
    """Train the IVF coarse quantizer: spherical k-means on a bounded
    driver sample. The trained object is n_lists x dim regardless of
    corpus size — persist it (e.g. parquet/npy) and hand it to
    ``ivf_assign`` incrementally as the corpus grows; retrain only when
    the embedding distribution drifts.
    """
    if sample_mode == "hash":
        # unbiased deterministic sample: the sample_size lowest id-hashes
        # (TakeOrdered — no full sort materializes). Costs a scan of
        # (id, vec); use when ingestion order correlates with embedding
        # content and a prefix sample would train a skewed quantizer.
        sample = corpus.select(vec_col).orderBy(F.xxhash64(F.col(id_col))).limit(sample_size).collect()
    elif sample_mode == "prefix":
        sample = corpus.select(vec_col).limit(sample_size).collect()
    else:
        raise ValueError(f"sample_mode must be prefix|hash, got {sample_mode!r}")
    x = np.array([r[0] for r in sample], dtype=np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / np.linalg.norm(v)
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_top: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """Assign vectors to their n_top nearest IVF lists (broadcast matmul
    in Arrow batches). Columns: _id, list_id, _vec (the NORMALIZED vector,
    so a later rescore dot product equals cosine directly).

    This is the INCREMENTAL maintenance path: new vectors are assigned
    against the frozen centroids and appended to the stored assignment
    table — the corpus is never rescanned (the ANN analogue of q65's
    incremental dedup). Assignment is a pure function of (vector,
    centroids), so increment + append is bit-identical to full
    reassignment (pinned in tests).

    ``normalize=False`` keeps the RAW vector in ``_vec`` (assignment still
    uses the normalized form internally) — the exact-rescore path needs
    the originals so its cosine fold reproduces ``cosine_topk``'s float
    semantics bit-for-bit.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    b_cents = df.sparkSession.sparkContext.broadcast(centroids)
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("list_id", T.IntegerType(), False),
            T.StructField("_vec", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_cents.value
        for pdf in batches:
            v = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            sims = vn @ c.T
            top = np.argsort(-sims, axis=1)[:, :n_top]
            n = len(pdf)
            keep = vn if normalize else v
            yield pd.DataFrame(
                {
                    "_id": np.repeat(pdf.iloc[:, 0].to_numpy(), n_top),
                    "list_id": top.reshape(-1).astype(np.int32),
                    "_vec": [keep[i].tolist() for i in np.repeat(np.arange(n), n_top)],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kern, schema=out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_lists: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_mode: str = "prefix",  # prefix | hash
    exact_rescore: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse k-means quantizer ->
    probe the n_probe nearest lists -> exact rescore on candidates.

    Training runs on a bounded driver sample (numpy k-means,
    deterministic seed) — at any corpus scale the trained object stays
    n_lists x dim. ``sample_mode`` picks the sample:
    - "prefix" (default): ``limit(sample_size)`` — reads only the corpus
      head, cheapest possible, but biased if ingestion order correlates
      with embedding content;
    - "hash": the ``sample_size`` LOWEST xxhash64(id) rows (TakeOrdered —
      no full sort materializes) — order-independent and deterministic,
      at the cost of one narrow (id, vec) scan. Assignment and probing are broadcast matmuls in
    Arrow batches; the corpus is touched in exactly one narrow pass, and
    each query rescales only ~n_probe/n_lists of it. Recall tunes with
    n_probe (= n_lists reproduces brute force).

    ``exact_rescore=True`` carries the RAW vectors through assignment and
    scores candidates with the same serial cosine fold as ``cosine_topk``
    — so ``n_probe=n_lists`` reproduces the brute-force result
    bit-for-bit (value-hash oracle-able against q35's SQL). The default
    scores the numpy-normalized vectors with a plain dot (cheaper; last-
    ulp float divergence from the fold form, fine for the approximate
    production config).
    """
    cents = ivf_train(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_lists=n_lists,
        sample_size=sample_size,
        seed=seed,
        kmeans_iters=kmeans_iters,
        sample_mode=sample_mode,
    )
    corpus_lists = ivf_assign(
        ensure_compute_parallelism(corpus), cents, id_col=id_col, vec_col=vec_col, n_top=1, normalize=not exact_rescore
    ).withColumnsRenamed({"_id": "neighbor_id", "_vec": "_cvec"})
    return _probe_and_rank(
        corpus_lists, cents, queries, k, query_id_col, vec_col, n_probe, exact_rescore=exact_rescore
    )


def cosine_near_dup_pairs_blocked(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    micro_units: bool = False,
) -> DataFrame:
    """All pairs with cosine >= threshold, BLAS-vectorized (the fast path).

    The expression-tree form (cosine_near_dup_pairs) evaluates higher-
    order-function folds per pair — measured ~90ns/element, ~14s for 2M
    pairs. Here the corpus is hashed into ``n_blocks`` row blocks, every
    row is replicated to the block *pairs* containing its block (broadcast
    join against an n_blocks*(n_blocks+1)/2-row pair relation), and each
    group multiplies its two blocks in one numpy matmul; only surviving
    pairs materialize. Every unordered row pair meets in exactly one block
    pair, so no dedup pass is needed.

    Scale: nothing is collected to the driver. Per-task state is two
    blocks (~2N/n_blocks vectors); the price is an n_blocks-fold shuffle
    replication of the corpus — the standard all-pairs trade
    (communication vs per-task memory). Size n_blocks so a block fits an
    executor: n_blocks ≈ N*dim*8B / (target block bytes); at fixture
    scale the default 8 gives 36 parallel groups.

    ``micro_units=True`` switches the kernel to EXACT arithmetic for
    cross-engine value-hash parity (q93's trick at pair granularity):
    components are fixed to integer micro-units (floor(x*1e6 + 0.5),
    int64), dot products become exact integer matmuls (order-independent,
    unlike float matmul whose blocked reduction order differs from a
    serial SQL fold in the last ulp), norms are sqrt of exact integer
    sums, and the final divide/round is one IEEE op each — a DuckDB
    oracle doing the same integer fold produces identical doubles. All
    magnitudes stay < 2^53 for unit-scale embeddings (64 dims: dot <=
    64 * (|x|*1e6)^2). The float path remains the production default.
    """
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    df = ensure_compute_parallelism(df)
    blocks = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    pair_rows = [(a, b) for a in range(n_blocks) for b in range(a, n_blocks)]
    pairs = local_rows_df(spark, pair_rows, "pa int, pb int")
    rep = blocks.join(F.broadcast(pairs), (F.col("_blk") == F.col("pa")) | (F.col("_blk") == F.col("pb")))

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )
    empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")})

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pa, pb = int(pdf["pa"].iloc[0]), int(pdf["pb"].iloc[0])
        ids = pdf["_id"].to_numpy()
        mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        if micro_units:
            m = np.floor(mat * 1e6 + 0.5).astype(np.int64)

            def sim_block(x, y):
                d = (x @ y.T).astype(np.float64)  # int64 matmul: exact, order-free
                nx = np.sqrt(np.einsum("ij,ij->i", x, x).astype(np.float64))
                ny = np.sqrt(np.einsum("ij,ij->i", y, y).astype(np.float64))
                # portable half-up 6dp: floor(x*1e6 + 0.5)/1e6 is the same
                # IEEE op sequence DuckDB runs — no library round() involved
                return np.floor(d * 1e6 / np.outer(nx, ny) + 0.5) / 1e6

        else:
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            m = mat

            def sim_block(x, y):
                return np.round(x @ y.T, 6)  # round before threshold, like the fold path

        if pa == pb:
            sims = sim_block(m, m)
            ai, bi = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
            return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi], "cosine": sims[ai, bi]})
        amask = pdf["_blk"].to_numpy() == pa
        if not amask.any() or amask.all():
            return empty
        a_ids, b_ids = ids[amask], ids[~amask]
        sims = sim_block(m[amask], m[~amask])
        ai, bi = np.nonzero(sims >= threshold)
        ida, idb = a_ids[ai], b_ids[bi]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ida, idb),
                "id_b": np.maximum(ida, idb),
                "cosine": sims[ai, bi],
            }
        )

    from kafka_connect_bigquery_storage_write_spark.operators.partitioning import repartition_for_grouped_map

    # each block-pair group is one CPU-heavy matmul — pin the fan-out
    rep = repartition_for_grouped_map(rep, "pa", "pb", n_groups=len(pair_rows))
    return rep.groupBy("pa", "pb").applyInPandas(kernel, schema=out_schema)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 24,
    bands: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """LSH candidate stage, exposed for selectivity measurement: returns
    (candidate (id_a, id_b) pairs sharing >=1 band bucket, the persisted
    signature relation carrying (id, vec, _n) for exact rescoring).

    Vectors stay OUT of the pair space: the bucket self-join and the
    candidate dedup move only (id, band, bucket) — 24 bytes/row — and
    the vectors join back once per surviving candidate side. Carrying
    vector payloads through the pair dedup is what must not happen at
    1e9 vectors (pair-space rows would be ~50x wider).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    base = ensure_compute_parallelism(df.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_n")))
    sigged = base.select(id_col, vec_col, "_n", lsh_signature(F.col(vec_col), planes).alias("_sig"))
    band_hash = _band_hashes("_sig", n_planes, bands)
    # barrier: bucket pass + both rescore joins share the signature relation
    # (eager checkpoint, not persist — blocks release with the result)
    sigged = sigged.localCheckpoint(eager=True)
    buckets = sigged.select(id_col, F.posexplode(band_hash).alias("band", "bucket"))
    l = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    r = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    candidates = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return candidates, sigged


def cosine_near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 24,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine >= threshold via hyperplane-LSH candidates +
    exact rescore — the subquadratic member of the near-dup family.

    Role in the trio: cosine_near_dup_pairs (crossJoin) is the O(n^2)
    oracle baseline; cosine_near_dup_pairs_blocked is exact with an
    n_blocks-fold replication (still touches every pair, in matmul form);
    THIS path touches only pairs sharing an LSH band bucket — candidate
    count scales with bucket occupancy, not n^2, which is the only shape
    that survives a billion-vector corpus. The price is recall < 1:
    a true pair is missed iff it disagrees on every band
    (p_miss = (1 - p_agree^(planes/bands))^bands with
    p_agree = 1 - angle/pi; tune n_planes/bands to the threshold).
    Verified pairs are exact — precision is 1 by construction (pinned in
    tests together with measured recall).

    Regime note: hyperplane LSH separates well when near-dups are truly
    near (cosine >= ~0.8, p_agree >= 0.8 vs 0.5 for random pairs) — the
    real embedding-dedup setting. At LOW thresholds (the fixture's 0.35,
    barely above random) the recall-preserving config is necessarily
    permissive and pruning is weak; the operator stays correct but its
    advantage over the exact block-pair path shrinks. Benchmarks on the
    fixture reflect that regime, not the production one.

    Plan: one signature pass, band-bucket self-join, dedup candidates,
    exact cosine only on candidates. The signature relation is persisted
    with an eager cache-fill barrier (same rationale and lifecycle as the
    dedup operators: concurrent downstream jobs would race a lazy fill;
    Spark's ContextCleaner unpersists it once the result DataFrame is
    unreferenced, and bench/test harnesses clearCache between queries).
    """
    candidates, sigged = lsh_candidate_pairs(
        df, id_col=id_col, vec_col=vec_col, dim=dim, n_planes=n_planes, bands=bands, seed=seed
    )
    with_vec = sigged.select(id_col, vec_col, "_n")
    va = with_vec.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_n").alias("_na"))
    vb = with_vec.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_n").alias("_nb"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Exact all-pairs — quadratic, intended for fixture-scale verification
    and as the verify stage after LSH candidate generation at scale.

    Perf note: norms are carried as SCALAR columns and divided into the
    dot product at pair level. Normalizing the arrays instead
    (transform(v, x -> x/norm(v))) looks equivalent but costs O(d^2) per
    evaluation, and Catalyst's projection collapse can inline it into the
    pair loop — measured 10x slower at 2M pairs.
    """
    with_norm = df.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_n"))
    # cartesian parallelism = left parts x right parts; a 1-partition scan
    # would run the whole O(n^2) fold on ONE task. Widen only the left side
    # (n x m tasks with m=input layout keeps task count bounded).
    a = ensure_compute_parallelism(
        with_norm.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_n").alias("_na"))
    )
    b = with_norm.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_n").alias("_nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization (absmax scaling) with exact
    reconstruction-error accounting — the storage/bandwidth move every
    embedding corpus makes before ANN serving (4x smaller than float32).

    Quantized value = floor(x/scale + 0.5) with scale = absmax/127 —
    floor(+0.5) instead of round() because both engines' floor and IEEE
    division are correctly rounded, making the int codes bit-identical
    across engines (round() half-case semantics are not portable).
    Pure Catalyst array transforms; no shuffle, no Python.

    Columns: id, scale, codes (array<int>), plus serial-fold mse of the
    dequantized reconstruction.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    absmax = F.array_max(F.transform(x, F.abs))
    scale = F.when(absmax == 0.0, F.lit(1.0)).otherwise(absmax / F.lit(127.0))
    codes = F.transform(x, lambda v: F.floor(v / F.col("_scale") + F.lit(0.5)).cast("int"))
    # residuals squared by explicit multiply: pow(x, 2) (Java Math.pow /
    # DuckDB power) is not guaranteed correctly rounded; x*x is
    resid = F.zip_with(x, F.col("codes"), lambda v, q: v - q.cast("double") * F.col("_scale"))
    sq_err = F.aggregate(
        F.zip_with(resid, resid, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return (
        df.withColumn("_scale", scale)
        .withColumn("codes", codes)
        .select(
            id_col,
            F.round("_scale", 9).alias("scale"),
            "codes",
            F.round(sq_err / F.size(F.col(vec_col)), 12).alias("mse"),
        )
    )


def ivf_assign_int8(
    df: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SERVING form of the IVF assignment table: each vector stored as
    (_id, list_id, scale, codes binary) — int8 absmax quantization of the
    NORMALIZED vector packed into one byte per dimension, composing q39's
    inverted lists with q76's quantization (VERDICT r3 next-round #3).

    This is what a 1e9-vector corpus actually serves from: candidate
    memory is dim bytes/vector vs 4*dim (float32) or 8*dim (the float64
    arrays ``ivf_assign`` carries) — a 4-8x reduction measured in
    BASELINE.md. Assignment and quantization happen in ONE Arrow pass over
    the corpus; like ``ivf_assign``, it is a pure function of (vector,
    centroids), so incremental append against frozen centroids is
    bit-identical to full reassignment.

    Quantization matches ``quantize_embeddings`` semantics (scale =
    absmax/127, q = floor(x/scale + 0.5)) applied to the normalized
    vector, so dequantized dot products approximate cosine directly.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    b_cents = df.sparkSession.sparkContext.broadcast(centroids)
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("list_id", T.IntegerType(), False),
            T.StructField("scale", T.DoubleType(), False),
            T.StructField("codes", T.BinaryType(), False),
        ]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_cents.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            lists = np.argmax(vn @ c.T, axis=1).astype(np.int32)
            absmax = np.abs(vn).max(axis=1)
            scale = np.where(absmax == 0.0, 1.0, absmax / 127.0)
            q = np.floor(vn / scale[:, None] + 0.5).astype(np.int8)
            yield pd.DataFrame(
                {
                    "_id": pdf.iloc[:, 0].to_numpy(),
                    "list_id": lists,
                    "scale": scale,
                    "codes": [q[i].tobytes() for i in range(len(pdf))],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kern, schema=out_schema)


def ivf_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_lists: int = 16,
    n_probe: int = 4,
    rescore_factor: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_mode: str = "prefix",
) -> DataFrame:
    """Memory-bounded ANN serving: IVF lists + int8 candidate scoring +
    exact float rescore of only the top k*rescore_factor.

    The three-stage funnel a production vector index runs:
    1. probe the n_probe nearest lists (broadcast matmul, as q39);
    2. score EVERY candidate from its int8 codes (one byte/dim in memory —
       the 4-8x cheaper representation is the only one the hot path
       touches), keeping the top k*rescore_factor per query;
    3. exact-rescore those few from the float vectors (an id-keyed join
       that moves k*rescore_factor rows per query, not the corpus).

    Recall vs the float IVF path is pinned >=0.95 @ k=5 in pytest; the
    int8 approximation only has to order the TOP of each list correctly
    enough that the true top-k survives the rescore_factor cut.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    cents = ivf_train(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_lists=n_lists,
        sample_size=sample_size,
        seed=seed,
        kmeans_iters=kmeans_iters,
        sample_mode=sample_mode,
    )
    codes_table = ivf_assign_int8(
        ensure_compute_parallelism(corpus), cents, id_col=id_col, vec_col=vec_col
    ).withColumnRenamed("_id", "neighbor_id")
    query_lists = ivf_assign(queries, cents, id_col=query_id_col, vec_col=vec_col, n_top=n_probe).withColumnsRenamed(
        {"_id": query_id_col, "_vec": "_qvec"}
    )
    # no dedup pass (same proof as ivf_topk): ivf_assign_int8 stores each
    # corpus vector in exactly ONE list, so the list-probe join emits
    # every (query, neighbor) pair at most once — the dropDuplicates this
    # used to run exchanged rows still carrying the codes blob + the
    # query vector to deduplicate nothing.
    cand = codes_table.join(F.broadcast(query_lists), "list_id").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )

    approx_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("approx", T.DoubleType(), False),
        ]
    )

    def rescore_int8(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["_qvec"].to_numpy()).astype(np.float64)
            c8 = np.stack([np.frombuffer(b, dtype=np.int8) for b in pdf["codes"]]).astype(np.float64)
            approx = (c8 * q).sum(axis=1) * pdf["scale"].to_numpy()
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "approx": approx,
                }
            )

    approx = cand.select(query_id_col, "neighbor_id", "scale", "codes", "_qvec").mapInPandas(
        rescore_int8, schema=approx_schema
    )
    w_a = W.partitionBy(query_id_col).orderBy(F.col("approx").desc(), F.col("neighbor_id"))
    shortlist = approx.withColumn("_arank", F.row_number().over(w_a)).filter(
        F.col("_arank") <= k * rescore_factor
    )
    # exact rescore: only k*rescore_factor rows per query reach the floats
    floats = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    qvecs = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        shortlist.join(floats, "neighbor_id")
        .join(F.broadcast(qvecs), query_id_col)
        .withColumn("cosine", F.round(cosine(F.col("_qv"), F.col("_cvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _cluster_block_groups(
    assign: DataFrame, max_cluster_rows: int
) -> tuple[DataFrame, int]:
    """Decompose each IVF list into block-pair groups with per-group row
    counts bounded by ~2*max_cluster_rows, preserving EXACT intra-list
    pair coverage (every unordered pair within a list meets in exactly
    one group).

    Lists no larger than ``max_cluster_rows`` become one group.  A hot
    list of size c splits into nb = ceil(c / max_cluster_rows) hash
    blocks replicated to its nb*(nb+1)/2 block pairs — the same
    communication-for-memory trade as ``cosine_near_dup_pairs_blocked``,
    applied only where the skew is.  Returns (replicated relation with
    grouping keys (list_id, pa, pb) and block column _blk, total group
    count).  The per-list count collect is n_lists rows — bounded by the
    quantizer size, not the corpus.
    """
    spark = assign.sparkSession
    counts = {r["list_id"]: r["cnt"] for r in assign.groupBy("list_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    if all(int(cnt) <= max_cluster_rows for cnt in counts.values()):
        # fast path — no list exceeds the cap, so every list is one group;
        # skip the nb/pair broadcast joins entirely (they cost ~2s of plan
        # and job overhead at fixture scale for provably nothing)
        rep = assign.withColumn("pa", F.lit(0)).withColumn("pb", F.lit(0)).withColumn("_blk", F.lit(0))
        return rep, len(counts)
    pair_rows = []
    nb_rows = []
    for lid, cnt in sorted(counts.items()):
        nb = max(1, -(-int(cnt) // max_cluster_rows))
        nb_rows.append((lid, nb))
        pair_rows.extend((lid, a, b) for a in range(nb) for b in range(a, nb))
    nb_df = local_rows_df(spark, nb_rows, "list_id int, _nb int")
    pairs_df = local_rows_df(spark, pair_rows, "list_id int, pa int, pb int")
    rep = (
        assign.join(F.broadcast(nb_df), "list_id")
        .withColumn("_blk", F.pmod(F.xxhash64(F.col("_id")), F.col("_nb")).cast("int"))
        .join(F.broadcast(pairs_df), "list_id")
        .filter((F.col("_blk") == F.col("pa")) | (F.col("_blk") == F.col("pb")))
    )
    return rep, len(pair_rows)


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.97,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_mode: str = "prefix",
    chunk_rows: int = 4096,
    max_cluster_rows: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means partition the embedding corpus, find
    near-duplicate pairs only WITHIN each cluster, connect them into
    components, keep the minimum id of every component.

    The scale contract is the SemDeDup design point: pairwise work drops
    from O(N^2) to O(sum_c |c|^2) ~ O(N^2 / k), per-task state is capped
    BY CONSTRUCTION at ~2*``max_cluster_rows`` vectors (a k-means-hot
    cluster exceeding the cap splits into hash block pairs — exact pair
    coverage preserved, see _cluster_block_groups — so an executor OOM
    cannot depend on parameter discipline or data skew), and the kernel
    chunks its similarity matmul (``chunk_rows``-row tiles) so task
    memory never holds a full |c|^2 float matrix.
    Cluster assignment reuses the frozen-centroid IVF path (pure function
    of vector and centroids — incremental append composes exactly like
    q65's incremental dedup); components reuse connected_components (the
    same pairs->clusters machinery as q73), so the whole operator is a
    composition of already-verified pieces.

    Cross-cluster near-dups are invisible by design (the documented
    SemDeDup trade); with n_clusters=1 the operator degrades to exact
    all-pairs dedup, which pytest pins against the blocked-BLAS baseline.

    Returns one row per input vector: (id, keeper_id, is_dup) where
    keeper_id is the component minimum (= id itself for non-duplicates).
    """
    import pandas as pd
    from pyspark.sql import types as T

    from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components
    from kafka_connect_bigquery_storage_write_spark.operators.partitioning import repartition_for_grouped_map

    cents = ivf_train(
        df,
        id_col=id_col,
        vec_col=vec_col,
        n_lists=n_clusters,
        sample_size=sample_size,
        seed=seed,
        kmeans_iters=kmeans_iters,
        sample_mode=sample_mode,
    )
    # materialized once: _cluster_block_groups' per-list count pass and
    # the pair kernel both consume this relation — without it the Arrow
    # assignment (and its normalization) runs twice. localCheckpoint
    # rather than persist so the blocks are ContextCleaner-released when
    # the result is dropped (a bare persist here leaks a CacheManager
    # entry per invocation — the q90 advisory class).
    assign = ivf_assign(ensure_compute_parallelism(df), cents, id_col=id_col, vec_col=vec_col).localCheckpoint(
        eager=True
    )

    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
        ]
    )

    _empty = {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}

    def intra_cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pa, pb = int(pdf["pa"].iloc[0]), int(pdf["pb"].iloc[0])
        ids = pdf["_id"].to_numpy()
        mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)  # already normalized
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        if pa == pb:
            # one (sub-)block: chunked strict upper triangle by position
            for lo in range(0, len(ids), chunk_rows):
                hi = min(lo + chunk_rows, len(ids))
                sims = np.round(mat[lo:hi] @ mat[lo:].T, 6)
                ai, bi = np.nonzero(sims >= threshold)
                keep = (bi + lo) > (ai + lo)
                ida, idb = ids[ai[keep] + lo], ids[bi[keep] + lo]
                out_a.append(np.minimum(ida, idb))
                out_b.append(np.maximum(ida, idb))
        else:
            # block pair of a split hot cluster: full cross between the
            # two blocks, chunked on the a-side
            amask = pdf["_blk"].to_numpy() == pa
            if not amask.any() or amask.all():
                return pd.DataFrame(_empty)
            a_ids, b_ids = ids[amask], ids[~amask]
            a_mat, b_mat = mat[amask], mat[~amask]
            for lo in range(0, len(a_ids), chunk_rows):
                hi = min(lo + chunk_rows, len(a_ids))
                sims = np.round(a_mat[lo:hi] @ b_mat.T, 6)
                ai, bi = np.nonzero(sims >= threshold)
                ida, idb = a_ids[ai + lo], b_ids[bi]
                out_a.append(np.minimum(ida, idb))
                out_b.append(np.maximum(ida, idb))
        if not out_a:
            return pd.DataFrame(_empty)
        return pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})

    rep, n_groups = _cluster_block_groups(assign, max_cluster_rows)
    grouped = repartition_for_grouped_map(rep, "list_id", "pa", "pb", n_groups=n_groups)
    # no distinct here: each unordered pair is emitted at most once (one
    # cluster, strict triangle on the diagonal / exactly one block pair
    # off it) and connected_components dedupes its edge relation anyway —
    # a distinct would just add a shuffle
    pairs = grouped.groupBy("list_id", "pa", "pb").applyInPandas(intra_cluster_pairs, schema=pair_schema)
    comps = connected_components(pairs, "id_a", "id_b")
    ids = df.select(F.col(id_col).cast("long").alias(id_col))
    return (
        ids.join(comps, ids[id_col] == comps.vertex, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("keeper_id"),
            (F.coalesce(F.col("cluster_id"), F.col(id_col)) != F.col(id_col)).alias("is_dup"),
        )
    )


def gram_matrix_micro(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Partial gram/scatter matrix of the embedding corpus in EXACT
    micro-unit arithmetic: per Arrow batch, quantize components to int64
    micro-units and accumulate one d x d integer matmul, emitting the
    upper triangle as (pos_i, pos_j, s, cnt) partials. Summing the
    partials (as decimal so a 1e9-vector corpus cannot overflow a long)
    yields the exact corpus gram matrix — the input to PCA/whitening/
    covariance without ever shuffling a vector: the only exchange is
    d*(d+1)/2 rows PER BATCH, and the per-(i,j) hash aggregation is the
    map-side-combine shape (a 64-dim corpus moves 2080 partial rows per
    batch regardless of corpus size).

    Integer sums are order-independent, so the result is bit-identical
    across partitionings and engines (q93's trick at matrix scale);
    positions are 1-based to match SQL generate_subscripts.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("pos_i", T.IntegerType(), False),
            T.StructField("pos_j", T.IntegerType(), False),
            T.StructField("s", T.LongType(), False),
            T.StructField("cnt", T.LongType(), False),
        ]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf.iloc[:, 0].to_numpy()).astype(np.float64)
            m = np.floor(v * 1e6 + 0.5).astype(np.int64)
            g = m.T @ m  # d x d int64 matmul: exact for unit-scale data
            iu = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "pos_i": (iu[0] + 1).astype(np.int32),
                    "pos_j": (iu[1] + 1).astype(np.int32),
                    "s": g[iu],
                    "cnt": np.full(len(iu[0]), len(v), dtype=np.int64),
                }
            )

    partials = ensure_compute_parallelism(df.select(vec_col)).mapInPandas(kern, schema=out_schema)
    return partials.groupBy("pos_i", "pos_j").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s_total"),
    )


def save_ivf_index(spark, centroids: "np.ndarray", path: str) -> None:
    """Persist the trained IVF coarse quantizer as a parquet relation
    (list_id, centroid array<double>) — the artifact an incremental
    pipeline reuses across runs so ``ivf_assign`` of tomorrow's vectors
    is bit-identical to today's (frozen centroids are THE invariant the
    incremental-append contract rests on; retrain only on drift).

    Parquet doubles round-trip exactly, so save -> load -> assign equals
    assigning with the in-memory array (pinned in tests).
    """
    rows = [(i, [float(v) for v in centroids[i]]) for i in range(len(centroids))]
    # one-slice local relation: a coalesce(1) over a 32-slice python
    # parallelize ran the worker round trips serially (5-7 s measured,
    # r14 opt — see local_rows_df)
    local_rows_df(spark, rows, "list_id int, centroid array<double>").write.mode(
        "overwrite"
    ).parquet(path)


def load_ivf_index(spark, path: str) -> "np.ndarray":
    """Load a quantizer persisted by save_ivf_index, in list_id order."""
    rows = spark.read.parquet(path).orderBy("list_id").collect()
    return np.array([r.centroid for r in rows], dtype=np.float64)


def _probe_and_rank(
    corpus_lists: DataFrame,
    cents: "np.ndarray",
    queries: DataFrame,
    k: int,
    query_id_col: str,
    vec_col: str,
    n_probe: int,
    exact_rescore: bool,
) -> DataFrame:
    """Shared query path: assign queries to n_probe lists, join the
    stored corpus assignment on list_id, score candidates, rank top-k.
    Used by ``ivf_topk`` (fresh build) and ``IvfIndex.topk`` (persisted
    index) so both paths are one implementation."""
    query_lists = ivf_assign(
        queries, cents, id_col=query_id_col, vec_col=vec_col, n_top=n_probe, normalize=not exact_rescore
    ).withColumnsRenamed({"_id": query_id_col, "_vec": "_qvec"})
    cand = corpus_lists.join(F.broadcast(query_lists), "list_id").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    score = cosine(F.col("_qvec"), F.col("_cvec")) if exact_rescore else dot(F.col("_qvec"), F.col("_cvec"))
    # no dedup pass: the corpus side is assigned with n_top=1, so a
    # (query, neighbor) pair matches the list-probe join at most once
    # (the corpus row's single list either is or is not among the query's
    # n_probe DISTINCT lists). The projection to (query, neighbor, cosine)
    # keeps the one remaining exchange (the per-query rank window) at
    # 24 bytes/row instead of carrying both d-dim vectors.
    scored = cand.withColumn("cosine", F.round(score, 6)).select(query_id_col, "neighbor_id", "cosine")
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


class IvfIndex:
    """Persistable IVF index: the ANN SERVING artifact (build once, save,
    load anywhere, query many — the corpus is never rescanned at query
    time). Storage layout under ``path``:

        <path>/centroids/   (list_id int, centroid array<double>) parquet
        <path>/lists/       (neighbor_id, list_id, _cvec) parquet
        <path>/_meta.json   {"raw_vectors": bool, "n_lists": int}

    ``raw_vectors`` records whether ``lists._cvec`` holds raw (exact-
    rescore cosine fold) or pre-normalized vectors (cheap dot scoring) —
    the query path must score the same way the index was built.
    The index grows incrementally via ``append`` (assignment against the
    FROZEN centroids is a pure function, so append == rebuild — the ANN
    analogue of q65's incremental dedup).
    """

    def __init__(self, centroids: "np.ndarray", lists: DataFrame, raw_vectors: bool):
        self.centroids = centroids
        self.lists = lists
        self.raw_vectors = raw_vectors

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_lists: int = 16,
        sample_size: int = 2048,
        seed: int = 42,
        kmeans_iters: int = 10,
        sample_mode: str = "prefix",
        exact_rescore: bool = False,
    ) -> "IvfIndex":
        cents = ivf_train(
            corpus, id_col=id_col, vec_col=vec_col, n_lists=n_lists, sample_size=sample_size,
            seed=seed, kmeans_iters=kmeans_iters, sample_mode=sample_mode,
        )
        lists = ivf_assign(
            ensure_compute_parallelism(corpus), cents, id_col=id_col, vec_col=vec_col,
            n_top=1, normalize=not exact_rescore,
        ).withColumnsRenamed({"_id": "neighbor_id", "_vec": "_cvec"})
        return cls(cents, lists, raw_vectors=exact_rescore)

    def append(self, new_vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> "IvfIndex":
        add = ivf_assign(
            new_vectors, self.centroids, id_col=id_col, vec_col=vec_col, n_top=1, normalize=not self.raw_vectors
        ).withColumnsRenamed({"_id": "neighbor_id", "_vec": "_cvec"})
        return IvfIndex(self.centroids, self.lists.unionByName(add), self.raw_vectors)

    def save(self, path: str) -> None:
        import json
        import os

        spark = self.lists.sparkSession
        local_rows_df(
            spark, [(i, c.tolist()) for i, c in enumerate(self.centroids)], "list_id int, centroid array<double>"
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        self.lists.write.mode("overwrite").parquet(os.path.join(path, "lists"))
        with open(os.path.join(path, "_meta.json"), "w") as f:
            json.dump({"raw_vectors": self.raw_vectors, "n_lists": int(len(self.centroids))}, f)

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        import json
        import os

        with open(os.path.join(path, "_meta.json")) as f:
            meta = json.load(f)
        rows = spark.read.parquet(os.path.join(path, "centroids")).orderBy("list_id").collect()
        cents = np.array([r["centroid"] for r in rows], dtype=np.float64)
        lists = spark.read.parquet(os.path.join(path, "lists"))
        return cls(cents, lists, raw_vectors=bool(meta["raw_vectors"]))

    def topk(
        self, queries: DataFrame, k: int = 5, query_id_col: str = "query_id",
        vec_col: str = "embedding", n_probe: int = 4,
    ) -> DataFrame:
        return _probe_and_rank(
            self.lists, self.centroids, queries, k, query_id_col, vec_col, n_probe,
            exact_rescore=self.raw_vectors,
        )

    # -- drift maintenance (VERDICT r6 #9) --------------------------------
    def drift(self) -> dict:
        """Measured staleness of the frozen centroids vs the CURRENT list
        members: per list, ``1 - cos(centroid, normalized member mean)``
        — exactly how far one spherical-k-means step would move that
        centroid, so 0 means the quantizer still sits at its members'
        center and growth means appended vectors have pulled the true
        center away from the frozen one (recall decays because probes
        ring the wrong centers).

        Returns {"per_list": [{list_id, n_members, drift}...],
        "weighted_mean_drift": member-weighted mean} — the scalar a
        pipeline alarms/gates on (see ``rebuild_if``).

        Cost shape: one posexplode pass over the assignment relation
        (dim x rows — a maintenance-cadence scan, not a query-path one),
        component sums reduce to n_lists x dim rows, collected bounded
        like the centroid broadcast. Threshold guidance (probed in
        test_dedup_similarity.py): a CONVERGED fresh build measures ~0
        (centroid == normalized member mean at the fixed point), and
        because appended vectors land in their best-matching Voronoi
        cell, even a maximally foreign same-size population (every
        vector reflected) only raises the weighted mean to ~0.03-0.05 —
        drift accumulates in SMALL numbers. Alert low: ~0.02 absolute
        is already "half the corpus no longer matches the quantizer"
        territory; rebuild_if(0.02) is the probed default.
        """
        # the row norm is hoisted into its own column instead of living
        # inside the transform() lambda: Catalyst does not common-
        # subexpression-eliminate a lambda-invariant aggregate() out of
        # the per-element closure, so the inline form folds the 64-element
        # norm once PER COMPONENT (dim² work per row) — measured 2x slower
        # at fixture scale (guide §1.2 per-task work; OPTIMIZATION_r14.md)
        comp = (
            self.lists.withColumn(
                "_nrm", F.sqrt(F.expr("aggregate(_cvec, 0D, (a, x) -> a + x * x)"))
            )
            .select("list_id", "_nrm", F.posexplode("_cvec").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.sum(F.col("val") / F.col("_nrm")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_list: dict[int, dict] = {}
        for r in comp:
            d = by_list.setdefault(int(r["list_id"]), {"sum": {}, "n": int(r["n"])})
            d["sum"][int(r["pos"])] = float(r["s"])
        per_list = []
        total_members = 0
        weighted = 0.0
        for lid in sorted(by_list):
            d = by_list[lid]
            vec = np.array([d["sum"][p] for p in sorted(d["sum"])], dtype=np.float64)
            n = d["n"]
            norm = np.linalg.norm(vec)
            if norm == 0.0:
                drift = 1.0  # members cancel out: the centroid says nothing
            else:
                # clamp: a fully converged list measures 0 up to float
                # noise, which can land at -1e-16
                drift = max(0.0, float(1.0 - (vec / norm) @ self.centroids[lid]))
            per_list.append({"list_id": lid, "n_members": n, "drift": drift})
            total_members += n
            weighted += drift * n
        return {
            "per_list": per_list,
            "weighted_mean_drift": (weighted / total_members) if total_members else 0.0,
        }

    def rebuild(self, n_lists: int | None = None, sample_size: int = 2048,
                seed: int = 42, kmeans_iters: int = 10) -> "IvfIndex":
        """Retrain the quantizer on the CURRENTLY stored vectors (hash
        sample: order-independent) and reassign every stored vector —
        the full relayout ``append`` avoids; run it when ``drift`` says
        the frozen centroids have decayed."""
        corpus = self.lists.select(
            F.col("neighbor_id").alias("vec_id"), F.col("_cvec").alias("embedding")
        ).dropDuplicates(["vec_id"])
        return IvfIndex.build(
            corpus, id_col="vec_id", vec_col="embedding",
            n_lists=n_lists or len(self.centroids), sample_size=sample_size,
            seed=seed, kmeans_iters=kmeans_iters, sample_mode="hash",
            exact_rescore=self.raw_vectors,
        )

    def rebuild_if(
        self, threshold: float, measured: float | None = None, **rebuild_kwargs
    ) -> tuple["IvfIndex", bool]:
        """Gate: rebuild when weighted mean drift exceeds ``threshold``;
        otherwise keep serving the frozen index. Returns (index, rebuilt).
        The production cadence: call on a maintenance schedule, swap the
        served index only when the gate fires (save() the new one).

        ``measured`` lets a caller that already ran ``drift()`` this
        maintenance cycle pass the weighted mean in instead of paying the
        posexplode aggregate a second time (drift is a pure function of
        the stored lists, which cannot change between the two calls)."""
        d = self.drift()["weighted_mean_drift"] if measured is None else measured
        if d > threshold:
            return self.rebuild(**rebuild_kwargs), True
        return self, False


# -- product quantization (round 7): the classic memory-bounded ANN code --


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 8,
    n_codes: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_mode: str = "prefix",
    memorize: bool = False,
) -> "np.ndarray":
    """Train per-subspace PQ codebooks (Jégou et al.: split the vector
    into ``n_subspaces`` blocks, k-means each block independently) on a
    bounded driver sample of NORMALIZED vectors — (m, k, d/m), tiny and
    persistable regardless of corpus size, the same train-once contract
    as ``ivf_train``.

    ``memorize=True`` builds the lossless oracle configuration instead:
    each subspace codebook is the corpus's own distinct sub-vectors
    (capped at 4096 — it exists for exactness pins, not production), so
    encode→decode is the identity and the PQ path must reproduce brute
    force exactly. The production path keeps k=16: one BYTE per
    subspace, an 8-byte code for a 64-dim vector — 64x smaller than the
    float rows, the representation a 1e9-vector corpus actually scans.
    """
    if memorize:
        rows = corpus.select(vec_col).collect()
        x = np.stack([np.array(r[0], dtype=np.float64) for r in rows])
        # normalized like every other path: pq_encode(normalize=True) must
        # find each normalized subvector verbatim for losslessness
    elif sample_mode == "hash":
        rows = corpus.select(vec_col).orderBy(F.xxhash64(F.col(id_col))).limit(sample_size).collect()
        x = np.array([r[0] for r in rows], dtype=np.float64)
    elif sample_mode == "prefix":
        rows = corpus.select(vec_col).limit(sample_size).collect()
        x = np.array([r[0] for r in rows], dtype=np.float64)
    else:
        raise ValueError(f"sample_mode must be prefix|hash, got {sample_mode!r}")
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    d = x.shape[1]
    if d % n_subspaces != 0:
        raise ValueError(f"dim {d} not divisible by n_subspaces {n_subspaces}")
    sub = d // n_subspaces
    books = []
    rng = np.random.default_rng(seed)
    for m in range(n_subspaces):
        xm = x[:, m * sub : (m + 1) * sub]
        if memorize:
            cb = np.unique(xm, axis=0)
            if len(cb) > 4096:
                raise ValueError(f"memorize codebook for subspace {m} exceeds 4096 entries ({len(cb)})")
        else:
            cb = xm[rng.choice(len(xm), size=min(n_codes, len(xm)), replace=False)].copy()
            for _ in range(kmeans_iters):
                d2 = ((xm[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for c in range(len(cb)):
                    members = xm[assign == c]
                    if len(members):
                        cb[c] = members.mean(axis=0)
        books.append(cb)
    # ragged memorize books pad by repeating entry 0 (an exact duplicate
    # can tie in argmin but reconstructs identically, so padding is inert)
    kmax = max(len(b) for b in books)
    out = np.zeros((n_subspaces, kmax, sub), dtype=np.float64)
    for m, b in enumerate(books):
        out[m, : len(b)] = b
        if len(b) < kmax:
            out[m, len(b):] = b[0]
    return out


def _code_dtype(codebooks: "np.ndarray"):
    """uint8 for production-sized codebooks (k <= 256, one byte per
    subspace); uint16 only for the oversized memorize/oracle books."""
    return np.uint8 if codebooks.shape[1] <= 256 else np.uint16


def pq_encode(
    df: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the L2-nearest codeword
    index, packed little as one uint8 per subspace into a ``codes``
    binary — the m-byte row a PQ scan reads instead of the float vector.
    Assignment is a pure function of (vector, codebooks): incremental
    append == full re-encode, the same frozen-quantizer contract as
    ``ivf_assign`` (codes are comparable only under the codebooks that
    produced them).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    b_books = df.sparkSession.sparkContext.broadcast(codebooks)
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("codes", T.BinaryType(), False),
        ]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = b_books.value
        dt = _code_dtype(books)
        n_sub, _k, sub = books.shape
        for pdf in batches:
            v = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            if normalize:
                v = v / np.linalg.norm(v, axis=1, keepdims=True)
            codes = np.zeros((len(v), n_sub), dtype=dt)
            for m in range(n_sub):
                xm = v[:, m * sub : (m + 1) * sub]
                d2 = ((xm[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = np.argmin(d2, axis=1).astype(dt)
            yield pd.DataFrame({"_id": pdf.iloc[:, 0].to_numpy(), "codes": [c.tobytes() for c in codes]})

    return df.select(id_col, vec_col).mapInPandas(kern, schema=out_schema)


def pq_decode(codes_df: DataFrame, codebooks: "np.ndarray") -> DataFrame:
    """Reconstruct vectors from codes (codeword concatenation) — the
    lossy inverse (lossless under a memorize codebook, pinned)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    b_books = codes_df.sparkSession.sparkContext.broadcast(codebooks)
    out_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("_vec", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = b_books.value
        dt = _code_dtype(books)
        n_sub = books.shape[0]
        for pdf in batches:
            codes = np.stack([np.frombuffer(b, dtype=dt) for b in pdf["codes"]])
            parts = [books[m][codes[:, m]] for m in range(n_sub)]
            vecs = np.concatenate(parts, axis=1)
            yield pd.DataFrame({"_id": pdf["_id"].to_numpy(), "_vec": [v.tolist() for v in vecs]})

    return codes_df.select("_id", "codes").mapInPandas(kern, schema=out_schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_subspaces: int = 8,
    n_codes: int = 16,
    rescore_factor: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_mode: str = "prefix",
    codebooks: "np.ndarray | None" = None,
) -> DataFrame:
    """PQ ANN serving: asymmetric-distance scan over m-byte codes + exact
    float rescore of the top k*rescore_factor (Jégou et al.'s ADC).

    1. train codebooks (driver sample) unless supplied;
    2. encode the corpus — ONE narrow pass, m bytes/vector retained;
    3. per query, precompute the (m x k) lookup table of subspace dot
       products ON THE DRIVER (Q x m x k doubles — broadcast, tiny) and
       scan the codes: score = sum of m table gathers, no float vectors
       touched;
    4. shortlist per query, then the id-keyed float join rescores only
       k*rescore_factor rows — identical tail to ``ivf_topk_int8``.

    Memory story at 1e9 vectors: the scanned relation is m bytes + id
    per row (8 bytes of codes for d=64) vs 512 bytes of floats — the
    64x reduction IS the operator; recall tunes with n_codes/n_subspaces
    and the rescore factor (pinned in pytest; memorize codebooks + full
    rescore reproduce brute force exactly).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    if codebooks is None:
        codebooks = pq_train(
            corpus, id_col=id_col, vec_col=vec_col, n_subspaces=n_subspaces, n_codes=n_codes,
            sample_size=sample_size, seed=seed, kmeans_iters=kmeans_iters, sample_mode=sample_mode,
        )
    codes_table = pq_encode(
        ensure_compute_parallelism(corpus), codebooks, id_col=id_col, vec_col=vec_col
    ).withColumnRenamed("_id", "neighbor_id")

    # per-query ADC lookup tables, built driver-side from the (tiny)
    # query relation: LUT[q][m, c] = dot(q_m, codebook[m][c])
    qrows = queries.select(query_id_col, vec_col).collect()
    n_sub, _kc, sub = codebooks.shape
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qv = np.stack([np.array(r[1], dtype=np.float64) for r in qrows])
    qn = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    luts = np.stack(
        [
            np.stack([codebooks[m] @ qn[i, m * sub : (m + 1) * sub] for m in range(n_sub)])
            for i in range(len(qids))
        ]
    )  # (Q, m, k)
    b_lut = corpus.sparkSession.sparkContext.broadcast((qids, luts))

    approx_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("approx", T.DoubleType(), False),
        ]
    )

    dt = _code_dtype(codebooks)

    shortlist_n = k * rescore_factor

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # map-side combine for the top-k: each Arrow batch emits only its
        # own per-query shortlist (argpartition heap), so the rank-window
        # exchange moves batches x Q x (k*rescore_factor) rows instead of
        # N x Q — the same partial-top-k shape Spark's TakeOrdered uses,
        # and the global cut downstream is unchanged because a global
        # top-s row is necessarily a batch top-s row.
        ids, tables = b_lut.value
        nq = len(ids)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([np.frombuffer(b, dtype=dt) for b in pdf["codes"]])  # (n, m)
            n = len(codes)
            nb = pdf["neighbor_id"].to_numpy()
            out_q, out_nb, out_s = [], [], []
            for qi in range(nq):
                t = tables[qi]  # (m, k)
                s = np.zeros(n, dtype=np.float64)
                for m in range(codes.shape[1]):
                    s += t[m][codes[:, m]]
                # self-match excluded BEFORE the heap cut — a self row in
                # the batch must not consume a shortlist slot, or the
                # batch would under-supply the global top-s by one
                mask = nb != ids[qi]
                s_m, nb_m = s[mask], nb[mask]
                keep_n = min(shortlist_n, len(s_m))
                if keep_n == 0:
                    continue
                top = np.argpartition(-s_m, keep_n - 1)[:keep_n] if keep_n < len(s_m) else np.arange(len(s_m))
                out_q.append(np.full(keep_n, ids[qi], dtype=np.int64))
                out_nb.append(nb_m[top])
                out_s.append(s_m[top])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_nb),
                    "approx": np.concatenate(out_s),
                }
            )

    approx = codes_table.mapInPandas(scan, schema=approx_schema).filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    w_a = W.partitionBy(query_id_col).orderBy(F.col("approx").desc(), F.col("neighbor_id"))
    shortlist = approx.withColumn("_arank", F.row_number().over(w_a)).filter(
        F.col("_arank") <= k * rescore_factor
    )
    floats = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    qvecs = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        shortlist.join(floats, "neighbor_id")
        .join(F.broadcast(qvecs), query_id_col)
        .withColumn("cosine", F.round(cosine(F.col("_qv"), F.col("_cvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _ivfpq_encode_assign(
    corpus: DataFrame,
    centroids: "np.ndarray",
    codebooks: "np.ndarray",
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One fused corpus pass: assign each vector to its nearest inverted
    list AND PQ-encode it — the stored relation is (neighbor_id,
    list_id, m-byte codes), never an id-keyed corpus self-join. Pure
    function of (vector, centroids, codebooks): incremental append ==
    full re-encode, the frozen-quantizer contract ``ivf_assign`` and
    ``pq_encode`` each document."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    sc = corpus.sparkSession.sparkContext
    b_cent = sc.broadcast(centroids)
    b_books = sc.broadcast(codebooks)
    coded_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("list_id", T.IntegerType(), False),
            T.StructField("codes", T.BinaryType(), False),
        ]
    )

    def encode_assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = b_cent.value
        books = b_books.value
        dt = _code_dtype(books)
        n_sub, _kc, sub = books.shape
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            lists = np.argmax(vn @ cents.T, axis=1).astype(np.int32)
            codes = np.zeros((len(vn), n_sub), dtype=dt)
            for m in range(n_sub):
                xm = vn[:, m * sub : (m + 1) * sub]
                d2 = ((xm[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = np.argmin(d2, axis=1).astype(dt)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf.iloc[:, 0].to_numpy(),
                    "list_id": lists,
                    "codes": [c.tobytes() for c in codes],
                }
            )

    return ensure_compute_parallelism(corpus).select(id_col, vec_col).mapInPandas(
        encode_assign, schema=coded_schema
    )


def _ivfpq_query(
    coded: DataFrame,
    centroids: "np.ndarray",
    codebooks: "np.ndarray",
    floats: DataFrame,
    queries: DataFrame,
    k: int,
    query_id_col: str,
    vec_col: str,
    n_probe: int,
    rescore_factor: int,
) -> DataFrame:
    """Shared IVF-PQ query path (fresh build and persisted index): per
    query, probe ``n_probe`` lists and ADC-scan only those lists' codes
    with a per-batch map-side shortlist, then exact-rescore the
    shortlist against the float base table (``floats``:
    (neighbor_id, _cvec) — only k*rescore_factor rows per query ever
    touch it, the PQ memory story)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    sc = coded.sparkSession.sparkContext
    qrows = queries.select(query_id_col, vec_col).collect()
    n_sub, _kc, sub = codebooks.shape
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qv = np.stack([np.array(r[1], dtype=np.float64) for r in qrows])
    qn = qv / np.linalg.norm(qv, axis=1, keepdims=True)
    sims = qn @ centroids.T  # (Q, n_lists)
    order = np.argsort(-sims, axis=1)[:, : min(n_probe, len(centroids))].astype(np.int32)
    luts = np.stack(
        [
            np.stack([codebooks[m] @ qn[i, m * sub : (m + 1) * sub] for m in range(n_sub)])
            for i in range(len(qids))
        ]
    )
    b_q = sc.broadcast((qids, order, luts))

    approx_schema = T.StructType(
        [
            T.StructField(query_id_col, T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("approx", T.DoubleType(), False),
        ]
    )
    dt = _code_dtype(codebooks)
    shortlist_n = k * rescore_factor

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, probed, tables = b_q.value
        nq = len(ids)
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack([np.frombuffer(b, dtype=dt) for b in pdf["codes"]])
            nb = pdf["neighbor_id"].to_numpy()
            lid = pdf["list_id"].to_numpy()
            out_q, out_nb, out_s = [], [], []
            for qi in range(nq):
                # the IVF restriction: this query touches only its probed
                # lists' codes (plus the usual self-match exclusion)
                mask = np.isin(lid, probed[qi]) & (nb != ids[qi])
                if not mask.any():
                    continue
                cm = codes[mask]
                t = tables[qi]
                s = np.zeros(len(cm), dtype=np.float64)
                for m in range(cm.shape[1]):
                    s += t[m][cm[:, m]]
                nb_m = nb[mask]
                keep_n = min(shortlist_n, len(s))
                top = np.argpartition(-s, keep_n - 1)[:keep_n] if keep_n < len(s) else np.arange(len(s))
                out_q.append(np.full(keep_n, ids[qi], dtype=np.int64))
                out_nb.append(nb_m[top])
                out_s.append(s[top])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_nb),
                    "approx": np.concatenate(out_s),
                }
            )

    approx = coded.mapInPandas(scan, schema=approx_schema)
    w_a = W.partitionBy(query_id_col).orderBy(F.col("approx").desc(), F.col("neighbor_id"))
    shortlist = approx.withColumn("_arank", F.row_number().over(w_a)).filter(
        F.col("_arank") <= shortlist_n
    )
    qvecs = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
    w = W.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        shortlist.join(floats, "neighbor_id")
        .join(F.broadcast(qvecs), query_id_col)
        .withColumn("cosine", F.round(cosine(F.col("_qv"), F.col("_cvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_lists: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    rescore_factor: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 10,
    sample_mode: str = "prefix",
    centroids: "np.ndarray | None" = None,
    codebooks: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF-PQ serving — the FAISS IndexIVFPQ architecture, completing the
    ANN ladder (float q35 → int8 q88 → PQ q145 → IVF-restricted PQ):
    a coarse quantizer routes each vector to an inverted list AND the
    vector is PQ-coded, so a query ADC-scans only the codes of its
    ``n_probe`` probed lists instead of the whole code table.

    The two memory/computation bounds COMPOSE: the scanned relation per
    query is (n_probe / n_lists) of the corpus (IVF) at m bytes + id +
    4-byte list id per row (PQ) — at 1e9 x d=64 with 1024 lists / 8
    probes that is ~1/128 of the rows at 1/64 of the bytes each. The
    scan kernel keeps pq_topk's map-side shortlist (per-batch
    argpartition heap), the tail is the identical shortlist-window +
    exact float rescore (only k*rescore_factor rows per query touch the
    float base table).

    Deterministic exact configuration (the q100/q151 rule): with
    ``n_probe == n_lists`` and ``rescore_factor`` covering the corpus,
    every candidate reaches the exact cosine fold and the result equals
    brute force bit-for-bit regardless of quantizer or codebook quality
    — the oracle-able face of the machinery (q174); the production
    config is recall-pinned in pytest (q175 rows-only). The persisted
    serving artifact is ``IvfPqIndex``.
    """
    if centroids is None:
        centroids = ivf_train(
            corpus, id_col=id_col, vec_col=vec_col, n_lists=n_lists, sample_size=sample_size,
            seed=seed, kmeans_iters=kmeans_iters, sample_mode=sample_mode,
        )
    if codebooks is None:
        codebooks = pq_train(
            corpus, id_col=id_col, vec_col=vec_col, n_subspaces=n_subspaces, n_codes=n_codes,
            sample_size=sample_size, seed=seed, kmeans_iters=kmeans_iters, sample_mode=sample_mode,
        )
    coded = _ivfpq_encode_assign(corpus, centroids, codebooks, id_col, vec_col)
    floats = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    return _ivfpq_query(
        coded, centroids, codebooks, floats, queries, k, query_id_col, vec_col, n_probe, rescore_factor
    )


class IvfPqIndex:
    """Persistable IVF-PQ index — the composed serving artifact (build
    once, save, load anywhere, query many; the corpus floats are scanned
    NEVER at query time, only the shortlist rows are fetched). Storage
    layout under ``path``:

        <path>/centroids/   (list_id int, centroid array<double>) parquet
        <path>/codebooks/   (m int, c int, codeword array<double>) parquet
        <path>/coded/       (neighbor_id, list_id, codes binary) parquet
        <path>/floats/      (neighbor_id, _cvec array<double>) parquet —
                            the id-keyed rescore base; at warehouse scale
                            this is the base TABLE itself, stored once
                            (pass ``floats_df`` to save() as a pointer
                            substitute when the base table already
                            exists; the default materializes it here so
                            the artifact is self-contained)
        <path>/_meta.json   {"n_lists", "n_subspaces", "n_codes"}

    ``append`` assigns + encodes new vectors against the FROZEN
    centroids/codebooks (pure function — the same incremental contract
    as ``IvfIndex.append``); quantizer decay is the same phenomenon
    IvfIndex.drift() measures, so the maintenance cadence is: monitor an
    IvfIndex over the same corpus or rebuild on a schedule.
    """

    def __init__(self, centroids: "np.ndarray", codebooks: "np.ndarray", coded: DataFrame, floats: DataFrame):
        self.centroids = centroids
        self.codebooks = codebooks
        self.coded = coded
        self.floats = floats

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_lists: int = 16,
        n_subspaces: int = 8,
        n_codes: int = 16,
        sample_size: int = 2048,
        seed: int = 42,
        kmeans_iters: int = 10,
        sample_mode: str = "prefix",
    ) -> "IvfPqIndex":
        cents = ivf_train(
            corpus, id_col=id_col, vec_col=vec_col, n_lists=n_lists, sample_size=sample_size,
            seed=seed, kmeans_iters=kmeans_iters, sample_mode=sample_mode,
        )
        books = pq_train(
            corpus, id_col=id_col, vec_col=vec_col, n_subspaces=n_subspaces, n_codes=n_codes,
            sample_size=sample_size, seed=seed, kmeans_iters=kmeans_iters, sample_mode=sample_mode,
        )
        coded = _ivfpq_encode_assign(corpus, cents, books, id_col, vec_col)
        floats = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
        return cls(cents, books, coded, floats)

    def append(self, new_vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> "IvfPqIndex":
        add = _ivfpq_encode_assign(new_vectors, self.centroids, self.codebooks, id_col, vec_col)
        addf = new_vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
        return IvfPqIndex(
            self.centroids, self.codebooks, self.coded.unionByName(add), self.floats.unionByName(addf)
        )

    def save(self, path: str) -> None:
        import json
        import os

        spark = self.coded.sparkSession
        local_rows_df(
            spark, [(i, c.tolist()) for i, c in enumerate(self.centroids)], "list_id int, centroid array<double>"
        ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
        n_sub, kc, _subd = self.codebooks.shape
        local_rows_df(
            spark,
            [(m, c, self.codebooks[m, c].tolist()) for m in range(n_sub) for c in range(kc)],
            "m int, c int, codeword array<double>",
        ).write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
        self.coded.write.mode("overwrite").parquet(os.path.join(path, "coded"))
        self.floats.write.mode("overwrite").parquet(os.path.join(path, "floats"))
        with open(os.path.join(path, "_meta.json"), "w") as f:
            json.dump(
                {"n_lists": int(len(self.centroids)), "n_subspaces": int(n_sub), "n_codes": int(kc)}, f
            )

    @classmethod
    def load(cls, spark, path: str) -> "IvfPqIndex":
        import json
        import os

        with open(os.path.join(path, "_meta.json")) as f:
            meta = json.load(f)
        crows = spark.read.parquet(os.path.join(path, "centroids")).orderBy("list_id").collect()
        cents = np.array([r["centroid"] for r in crows], dtype=np.float64)
        brows = spark.read.parquet(os.path.join(path, "codebooks")).orderBy("m", "c").collect()
        n_sub, kc = meta["n_subspaces"], meta["n_codes"]
        subd = len(brows[0]["codeword"])
        books = np.zeros((n_sub, kc, subd), dtype=np.float64)
        for r in brows:
            books[r["m"], r["c"]] = r["codeword"]
        coded = spark.read.parquet(os.path.join(path, "coded"))
        floats = spark.read.parquet(os.path.join(path, "floats"))
        return cls(cents, books, coded, floats)

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        query_id_col: str = "query_id",
        vec_col: str = "embedding",
        n_probe: int = 4,
        rescore_factor: int = 4,
    ) -> DataFrame:
        return _ivfpq_query(
            self.coded, self.centroids, self.codebooks, self.floats, queries, k,
            query_id_col, vec_col, n_probe, rescore_factor,
        )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# ---------------------------------------------------------------------------

def rademacher_matrix(in_dim: int, out_dim: int) -> list[list[float]]:
    """Deterministic ±1 projection matrix seeded by md5("j:k") — the
    Achlioptas database-friendly JL construction (signs instead of
    Gaussians; the JL guarantee holds with the same distortion bound).
    md5 is the one hash Spark, DuckDB, and Python compute identically,
    so an oracle can re-derive the exact matrix in SQL."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[0], 16) < 8 else -1.0
            for j in range(in_dim)
        ]
        for k in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    prefix: str = "p",
    ndigits: int | None = 6,
) -> DataFrame:
    """Project ``vec_col`` (array<float|double>, length ``in_dim``) onto
    ``out_dim`` Rademacher directions scaled by 1/sqrt(out_dim) (the JL
    normalization: E[||x'||^2] = ||x||^2, so distances carry over
    unbiased), emitting scalar columns ``{prefix}0..{prefix}{out_dim-1}``.

    Scale: one narrow map pass — zip_with + aggregate higher-order folds
    per output dim, all JVM-side inside whole-stage codegen; no shuffle,
    no UDF, no driver traffic beyond the baked sign literals (in_dim ×
    out_dim doubles). This is the standard pre-reduction before ANN on
    wide embeddings: distances are preserved within (1±eps) while scanned
    bytes drop by in_dim/out_dim.
    """
    import math

    mat = rademacher_matrix(in_dim, out_dim)
    scale = 1.0 / math.sqrt(out_dim)
    vec = F.col(vec_col).cast("array<double>")
    outs = []
    for k in range(out_dim):
        signs = F.array(*[F.lit(s) for s in mat[k]])
        acc = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda a, x: a + x,
        ) * F.lit(scale)
        outs.append(
            (F.round(acc, ndigits) if ndigits is not None else acc).alias(f"{prefix}{k}")
        )
    return df.select("*", *outs)


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hardest-negative / hardest-positive mining for contrastive training.

    For each anchor: the highest-cosine candidate with a DIFFERENT label
    (the hard negative a triplet/InfoNCE batch builder wants) and the
    highest-cosine candidate with the SAME label, plus the margin between
    them (negative margin = the anchor's neighborhood is dominated by
    another class — a label-noise signal).

    Scale: broadcast(anchors) x corpus like cosine_topk, but the per-anchor
    argmax is ONE hash aggregate, not a rank window — and it stays a
    whole-stage-codegen HashAggregate (a struct-typed max falls back to
    SortAggregate) because each candidate packs into a single BIGINT key:

        key = (round(cos*1e6) + 1e6) * 2^40 + (2^40 - 1 - id)

    Bias keeps the key non-negative; bigger cosine wins, ties prefer the
    smaller id via the complement; max is 2e6*2^40 ~ 2.2e18 < 2^63. The
    decode (div / pmod by 2^40) is exact integer arithmetic, so the
    reported cosine is micro/1e6 — bit-identical in any engine. Holds to
    id < 2^40 and nothing exchanges except |A| groups of 8-byte partials.
    At 1e9 corpus rows, swap the crossJoin for IVF/LSH candidate
    generation (IvfIndex.probe) and keep the reducer unchanged.
    """
    SHIFT = 1 << 40
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("_avec"),
    )
    c = ensure_compute_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("_nlabel"),
            F.col(vec_col).alias("_cvec"),
        )
    )
    cm = (F.round(cosine(F.col("_avec"), F.col("_cvec")) * 1000000.0).cast("long") + F.lit(1000000)).alias("_cm")
    key = (F.col("_cm") * F.lit(SHIFT) + (F.lit(SHIFT - 1) - F.col("neighbor_id"))).alias("_key")
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("neighbor_id") != F.col("anchor_id"))
        .select("anchor_id", "anchor_label", "_nlabel", "neighbor_id", cm)
        .select("anchor_id", "anchor_label", "_nlabel", key)
    )
    same = F.col("_nlabel") == F.col("anchor_label")
    agg = scored.groupBy("anchor_id", "anchor_label").agg(
        F.max(F.when(same, F.col("_key"))).alias("_pk"),
        F.max(F.when(~same, F.col("_key"))).alias("_nk"),
    )

    def unpack(k: str, id_name: str, cos_name: str) -> list:
        micro = F.expr(f"{k} div {SHIFT}") - F.lit(1000000)
        rid = F.lit(SHIFT - 1) - F.pmod(F.col(k), F.lit(SHIFT))
        return [rid.alias(id_name), (micro.cast("double") / 1000000.0).alias(cos_name)]

    return agg.select(
        "anchor_id",
        "anchor_label",
        *unpack("_pk", "pos_id", "pos_cos"),
        *unpack("_nk", "neg_id", "neg_cos"),
        (
            (F.expr(f"_pk div {SHIFT}") - F.expr(f"_nk div {SHIFT}")).cast("double") / 1000000.0
        ).alias("margin"),
    )
