"""Operator-level checks for E14/E15 beyond oracle parity: LSH recall
against the exact baseline, MinHash/exact consistency, SimHash sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.dedup import (
    exact_dedup,
    jaccard_near_dup_pairs,
    minhash_lsh_near_dups,
    simhash_near_dups,
)
from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, lsh_topk
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "x"), (5, "y")], "doc_id long, text string"
    )
    out = exact_dedup(df, ["text"], "doc_id").collect()
    assert sorted((r.text, r.doc_id) for r in out) == [("x", 1), ("y", 5)]


def test_minhash_lsh_matches_exact_at_high_threshold(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {(r.id_a, r.id_b) for r in jaccard_near_dup_pairs(docs, threshold=0.85).collect()}
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_near_dups(docs, threshold=0.85).collect()}
    assert lsh == exact  # at J>=0.85 with 8 bands of 4, recall is ~1
    assert len(exact) > 0  # the fixtures contain planted near-dups


def test_max_df_cap_keeps_planted_pairs(spark, sf_dir):
    """Stop-shingle capping must not lose the high-jaccard planted pairs
    (their evidence is in rare shingles), while bounding hot buckets."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {(r.id_a, r.id_b) for r in jaccard_near_dup_pairs(docs, threshold=0.9).collect()}
    capped = {(r.id_a, r.id_b) for r in jaccard_near_dup_pairs(docs, threshold=0.85, max_df=50).collect()}
    assert len(exact) > 0
    missing = exact - capped
    assert len(missing) <= len(exact) * 0.1, f"df cap lost too many planted pairs: {missing}"


def test_simhash_flags_planted_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    jacc = {(r.id_a, r.id_b) for r in jaccard_near_dup_pairs(docs, threshold=0.9).collect()}
    sim = {(r.id_a, r.id_b) for r in simhash_near_dups(docs, max_hamming=7, chunks=8).collect()}
    # measured: every planted J>=0.9 pair sits within hamming 7 of 64,
    # and 8x8-bit chunks make candidate generation pigeonhole-exact there
    assert jacc <= sim
    # and must not explode into the full pair space
    n = docs.count()
    assert len(sim) < n * 5


def test_blocked_cosine_pairs_match_exact_fold(spark, sf_dir):
    """The BLAS-vectorized all-pairs kernel must reproduce the expression-
    tree fold exactly: same pair set, cosines within float-reduction ulps."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_near_dup_pairs, cosine_near_dup_pairs_blocked

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b): r.cosine for r in cosine_near_dup_pairs(emb, threshold=0.35).collect()}
    fast = {(r.id_a, r.id_b): r.cosine for r in cosine_near_dup_pairs_blocked(emb, threshold=0.35).collect()}
    assert set(exact) == set(fast)
    assert len(exact) > 0
    for k in exact:
        assert abs(exact[k] - fast[k]) <= 1e-6


def test_blocked_micro_units_matches_float_kernel(spark, sf_dir):
    """Micro-unit mode (q101's exact-parity arithmetic) must agree with
    the float kernel up to the 1e-6 quantization it introduces: identical
    pair sets except within 2e-6 of the threshold boundary, and cosines
    within 2e-6 everywhere."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_near_dup_pairs_blocked

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") <= 2)
    flt = {(r.id_a, r.id_b): r.cosine for r in cosine_near_dup_pairs_blocked(emb, threshold=0.35).collect()}
    mic = {(r.id_a, r.id_b): r.cosine for r in cosine_near_dup_pairs_blocked(emb, threshold=0.35, micro_units=True).collect()}
    assert len(mic) > 0
    for p in set(flt) ^ set(mic):
        c = flt.get(p, mic.get(p))
        assert abs(c - 0.35) <= 2e-6, f"pair {p} ({c}) differs away from the boundary"
    for p in set(flt) & set(mic):
        assert abs(flt[p] - mic[p]) <= 2e-6


def test_blocked_cosine_pairs_invariant_to_block_count(spark, sf_dir):
    """Every unordered pair must meet in exactly one block pair regardless
    of n_blocks (covers diagonal, off-diagonal, and empty-side groups)."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_near_dup_pairs_blocked

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    results = [
        sorted((r.id_a, r.id_b, r.cosine) for r in cosine_near_dup_pairs_blocked(emb, threshold=0.35, n_blocks=n).collect())
        for n in (1, 3, 16)
    ]
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0


def test_ivf_ann_recall_against_brute_force(spark, sf_dir):
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx_rows = ivf_topk(emb, queries, k=5, n_lists=16, n_probe=6).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # full probing must reproduce brute force exactly (pair sets equal)
    full = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=5, n_lists=8, n_probe=8).collect()}
    assert full == exact
    # and with exact_rescore the whole ROW SET is bit-identical to brute
    # force (cosines from the same serial fold — q100's oracle premise)
    exact_rows = {tuple(r) for r in cosine_topk(emb, queries, k=5).collect()}
    full_exact = {tuple(r) for r in ivf_topk(emb, queries, k=5, n_lists=8, n_probe=8, exact_rescore=True).collect()}
    assert full_exact == exact_rows


def test_ivf_int8_serving_recall_vs_float_path(spark, sf_dir):
    """The int8 serving funnel must keep >=0.95 of the float IVF path's
    top-5 at identical (n_lists, n_probe): the quantized pass only ranks
    the shortlist, and the exact rescore must carry the true cosine."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_topk_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(F.col("vec_id").alias("query_id"), "embedding")
    flt = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=5, n_lists=16, n_probe=6).collect()}
    i8_rows = ivf_topk_int8(emb, queries, k=5, n_lists=16, n_probe=6, rescore_factor=4).collect()
    i8 = {(r.query_id, r.neighbor_id) for r in i8_rows}
    recall = len(flt & i8) / len(flt)
    assert recall >= 0.95, f"int8 serving recall vs float IVF: {recall}"
    # survivors carry the EXACT float cosine (rescore is not approximate)
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine for r in cosine_topk(emb, queries, k=50).collect()
    }
    for r in i8_rows:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(r.cosine - exact_scores[key]) < 1e-9


def test_ivf_int8_codes_memory_reduction(spark, sf_dir):
    """The serving table's candidate bytes (1/dim) must be ~4x smaller
    than float32 and ~8x smaller than the float64 assignment arrays."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import ivf_assign_int8, ivf_train

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train(emb, n_lists=8)
    codes = ivf_assign_int8(emb, cents)
    row = codes.agg(
        F.sum(F.length("codes")).alias("code_bytes"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    dim = len(emb.first().embedding)
    assert row.code_bytes == row.n * dim  # exactly one byte per dimension
    # vs float32 (4B/dim) and the float64 arrays ivf_assign ships (8B/dim)
    assert row.n * dim * 4 / row.code_bytes == 4.0
    assert row.n * dim * 8 / row.code_bytes == 8.0


def test_lsh_ann_recall_against_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # hyperplane LSH with 16 planes / 4 bands on random gaussian data:
    # recall is imperfect by design; assert it's usefully high
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # every approx hit must carry the exact cosine (rescoring is exact)
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert abs(r.cosine - exact_scores[(r.query_id, r.neighbor_id)]) < 1e-9


def test_lsh_pair_precision_exact_and_recall_high(spark, sf_dir):
    """cosine_near_dup_pairs_lsh: every emitted pair is exactly correct
    (precision 1 — same fold, same threshold), and recall vs the exact
    all-pairs set is high at near-dup thresholds."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_lsh,
    )
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b): r.cosine for r in cosine_near_dup_pairs(emb, threshold=0.4).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine for r in cosine_near_dup_pairs_lsh(emb, threshold=0.4).collect()}
    assert set(lsh) <= set(exact)  # precision 1: no false pairs
    for k, v in lsh.items():
        assert v == exact[k]  # identical fold arithmetic
    # deterministic (seeded planes, fixed data): measured 0.939
    assert len(lsh) >= 0.85 * len(exact) > 0


def test_ivf_hash_sample_mode_recall_and_determinism(spark, sf_dir):
    """hash sample_mode trains on an order-independent sample: recall
    stays comparable to brute force and two runs are identical."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, ivf_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    a = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4, sample_mode="hash").collect()
    b = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4, sample_mode="hash").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    got = {(r.query_id, r.neighbor_id) for r in a}
    assert len(got & exact) / len(exact) >= 0.6  # half the lists probed


def test_ivf_rejects_unknown_sample_mode(spark, sf_dir):
    import pytest

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import ivf_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="sample_mode"):
        ivf_topk(emb, q, sample_mode="random").count()


def test_lsh_pairs_prune_hard_in_the_high_sim_regime(spark):
    """The regime claim in cosine_near_dup_pairs_lsh's docstring, measured:
    with planted near-dups at cosine ~0.95 (the real embedding-dedup
    setting) a selective config (8 planes/band) finds every planted pair
    while examining a small fraction of the n^2 pair space."""
    import numpy as np

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_near_dup_pairs_lsh

    rng = np.random.default_rng(11)
    base = rng.standard_normal((400, 64))
    rows, planted = [], []
    for i, v in enumerate(base):
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # plant 40 near-dups: tiny perturbations of the first 40 vectors
    for j in range(40):
        v = base[j] + 0.18 * rng.standard_normal(64)
        rows.append((1000 + j, (v / np.linalg.norm(v)).tolist()))
        planted.append((j, 1000 + j))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_near_dup_pairs_lsh(df, threshold=0.9, n_planes=48, bands=6)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # analytic recall for this config at cos 0.95 is ~0.965
    # (p_agree=0.899, miss=(1-0.899^8)^6) — deterministic here (seeded)
    assert len(got & set(planted)) >= 38, f"missed: {set(planted) - got}"

    # candidate-count collapse, measured (VERDICT r2 #5): the selective
    # production config (8 planes/band) must examine >=5x fewer pairs than
    # the permissive low-threshold fixture config (3 planes/band), while
    # holding recall >= 0.95 on the planted pairs (asserted above: 38/40).
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import lsh_candidate_pairs

    permissive, sig_p = lsh_candidate_pairs(df, n_planes=24, bands=8)
    selective, sig_s = lsh_candidate_pairs(df, n_planes=48, bands=6)
    n_perm, n_sel = permissive.count(), selective.count()
    sig_p.unpersist()
    sig_s.unpersist()
    n_total = 440 * 439 // 2
    # measured (seeded, deterministic): ~34k permissive vs ~1.3k selective
    assert n_sel * 5 <= n_perm, f"no candidate collapse: {n_sel} vs {n_perm}"
    assert n_sel * 10 <= n_total, f"selective config not subquadratic: {n_sel}/{n_total}"
    # selectivity: the result space stayed tiny vs the 96k-pair space
    assert len(got) <= len(planted) + 10


def test_decontaminate_finds_planted_overlap_and_max_df_keeps_it(spark):
    """decontaminate: a held-out doc copied into the train side is found;
    max_df drops corpus-common stop-shingles without losing the planted
    pair (its evidence is the rare shared run, exactly like the Jaccard
    family's cap argument)."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import decontaminate

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rare = "zeta theta kappa lambda sigma omicron upsilon phi chi psi"
    train_rows = [(i, f"{boiler} filler{i} pad{i} more{i} text{i}") for i in range(20)]
    train_rows.append((99, f"{boiler} {rare}"))  # contaminated: copies the held doc's rare run
    held_rows = [(1000, f"{boiler} {rare}"), (1001, f"{boiler} unrelated words entirely here now")]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    held = spark.createDataFrame(held_rows, "doc_id long, text string")

    exact = {(r.train_id, r.heldout_id) for r in decontaminate(train, held, min_shared=5).collect()}
    assert (99, 1000) in exact
    # every train doc shares the >=5-shingle boilerplate with both held docs
    assert len(exact) > 2

    # cap df at 5: the 21-doc boilerplate shingles drop, the planted pair
    # survives on its rare-run shingles alone
    capped = {(r.train_id, r.heldout_id) for r in decontaminate(train, held, min_shared=5, max_df=5).collect()}
    assert capped == {(99, 1000)}, capped


def test_ivf_incremental_assign_equals_full_reassign(spark, sf_dir):
    """Index maintenance without corpus rescans: assigning only the NEW
    vectors against frozen centroids and appending must equal a full
    reassignment of the grown corpus — the ANN analogue of incremental
    dedup (q65). Also pins that ivf_topk's refactor onto
    ivf_train/ivf_assign preserved recall."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk, ivf_train

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    cents = ivf_train(old, n_lists=8, sample_mode="hash")

    full = ivf_assign(emb, cents).select("_id", "list_id")
    incr = ivf_assign(old, cents).select("_id", "list_id").union(
        ivf_assign(new, cents).select("_id", "list_id")
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, incr.collect()))

    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=5, n_lists=16, n_probe=6).collect()}
    assert len(exact & approx) / len(exact) >= 0.6


def test_connected_components_chain_and_clique(spark):
    """Multi-round convergence guard: a 10-vertex chain (diameter 9,
    needs the propagation LOOP, not just the fused first round) and a
    separate triangle must each collapse to their min-vertex label."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)] + [(20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    out = {r.vertex: r.cluster_id for r in connected_components(pairs).collect()}
    assert all(out[v] == 1 for v in range(1, 11))
    assert all(out[v] == 20 for v in (20, 21, 22))


def test_connected_components_star_equivalence(spark):
    """large-star/small-star must produce byte-identical labels to
    min-label on mixed shapes: a chain, a clique, an isolated edge, and a
    random multi-component graph (deterministic LCG edges)."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components

    state, rand_edges = 12345, []
    for _ in range(60):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = 100 + state % 40
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = 100 + state % 40
        if a != b:
            rand_edges.append((a, b))
    edges = [(i, i + 1) for i in range(1, 10)] + [(20, 21), (21, 22), (20, 22), (50, 51)] + rand_edges
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ml = {(r.vertex, r.cluster_id) for r in connected_components(pairs, strategy="min_label").collect()}
    st = {(r.vertex, r.cluster_id) for r in connected_components(pairs, strategy="star").collect()}
    assert ml == st


def test_connected_components_min_label_exhaustion_raises_star_converges(spark):
    """A 40-vertex path has diameter 39: min-label at max_iterations=10
    must RAISE (returning unconverged labels would hand the caller wrong
    clusters), while star converges on the same budget — the
    diameter-independence that motivates the strategy."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=10, strategy="min_label")
    info: dict = {}
    out = {r.vertex: r.cluster_id for r in connected_components(pairs, max_iterations=10, strategy="star", info=info).collect()}
    assert all(out[v] == 1 for v in range(1, 41))
    assert info["rounds"] <= 10


def test_connected_components_star_rounds_sublinear(spark):
    """O(log^2 n) round bound in practice: a 256-vertex path (diameter
    255) must converge in far fewer rounds than its diameter."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 256)], "id_a long, id_b long")
    info: dict = {}
    out = {r.vertex: r.cluster_id for r in connected_components(pairs, strategy="star", info=info).collect()}
    assert all(c == 1 for c in out.values()) and len(out) == 256
    assert info["rounds"] <= 12, f"star took {info['rounds']} rounds on a 256-path"


def test_semantic_dedup_single_cluster_equals_exact_pairs(spark, sf_dir):
    """With n_clusters=1 SemDeDup degrades to exact all-pairs dedup: its
    drop set must equal connected components over the blocked-BLAS exact
    pair relation at the same threshold."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
        cosine_near_dup_pairs_blocked,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    thr = 0.35  # fixture cosine mass tops out ~0.5; 271 pairs at 0.35
    sem = semantic_dedup(emb, threshold=thr, n_clusters=1).collect()
    sem_drop = {r.vec_id for r in sem if r.is_dup}
    sem_keep_map = {r.vec_id: r.keeper_id for r in sem}

    pairs = cosine_near_dup_pairs_blocked(emb, threshold=thr)
    comps = {r.vertex: r.cluster_id for r in connected_components(pairs, "id_a", "id_b").collect()}
    exact_drop = {v for v, c in comps.items() if v != c}
    assert len(sem_drop) > 0  # fixture must exercise the operator
    assert sem_drop == exact_drop
    # keepers agree too: every clustered vector maps to the component min
    for v, c in comps.items():
        assert sem_keep_map[v] == c
    # non-clustered vectors keep themselves
    n_rows = emb.count()
    assert len(sem) == n_rows
    for r in sem:
        if r.vec_id not in comps:
            assert r.keeper_id == r.vec_id and not r.is_dup


def test_semantic_dedup_clustered_is_subset_of_exact(spark, sf_dir):
    """With k>1 clusters SemDeDup may only MISS cross-cluster pairs —
    every drop it makes must be justified by a real above-threshold pair
    (no false positives), and keepers are component minima (keeper_id <=
    vec_id always)."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
        cosine_near_dup_pairs_blocked,
        semantic_dedup,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    thr = 0.35
    sem = semantic_dedup(emb, threshold=thr, n_clusters=16).collect()
    dropped = {r.vec_id for r in sem if r.is_dup}
    exact_pair_members = set()
    for r in cosine_near_dup_pairs_blocked(emb, threshold=thr).collect():
        exact_pair_members.add(r.id_a)
        exact_pair_members.add(r.id_b)
    assert dropped <= exact_pair_members
    for r in sem:
        assert r.keeper_id <= r.vec_id


def test_semantic_dedup_cluster_cap_bounds_groups_and_preserves_output(spark, sf_dir):
    """Per-task state must be capped by construction, not parameter
    discipline: a k-means-hot cluster splits into block pairs whose
    groups never exceed ~2*max_cluster_rows rows, and the split changes
    NOTHING about the dedup output (exact intra-cluster pair coverage)."""
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
        _cluster_block_groups,
        semantic_dedup,
    )

    # (1) directly feed a 90%-skewed assignment: one list holds 900 of
    # 1000 vectors — the executor-OOM shape from the round-4 verdict
    emb = load_table(spark, sf_dir, "embeddings")
    skewed = emb.select(
        F.col("vec_id").cast("long").alias("_id"),
        F.col("embedding").alias("_vec"),
        F.when(F.col("vec_id") % 10 < 9, F.lit(0)).otherwise(F.lit(1)).cast("int").alias("list_id"),
    )
    cap = 60
    rep, n_groups = _cluster_block_groups(skewed, max_cluster_rows=cap)
    sizes = {
        (r["list_id"], r["pa"], r["pb"]): r["n"]
        for r in rep.groupBy("list_id", "pa", "pb").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert n_groups == len(sizes)
    # bound is ~2*cap up to multinomial hash-block imbalance (O(sqrt) slack)
    assert max(sizes.values()) <= 2 * cap * 1.3
    # every row lands in exactly the groups containing its block: total
    # replicated rows = sum over lists of rows * nb (each row is in nb
    # of the nb*(nb+1)/2 pairs)
    hot_rows = skewed.filter("list_id = 0").count()
    nb_hot = -(-hot_rows // cap)
    assert sum(n for (lid, _, _), n in sizes.items() if lid == 0) == hot_rows * nb_hot

    # (2) splitting must not change the operator's result
    thr = 0.35
    base = sorted(tuple(r) for r in semantic_dedup(emb, threshold=thr, n_clusters=4).collect())
    split = sorted(
        tuple(r) for r in semantic_dedup(emb, threshold=thr, n_clusters=4, max_cluster_rows=cap).collect()
    )
    assert base == split
    assert any(r[2] for r in base)  # fixture exercises real dups


def test_ivf_index_roundtrip_is_bit_identical(spark, sf_dir, tmp_path):
    """save -> load must reproduce the centroid matrix exactly, and an
    assignment against the loaded index must equal the in-memory one —
    the frozen-centroid invariant an incremental pipeline persists on."""
    import numpy as np

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
        ivf_assign,
        ivf_train,
        load_ivf_index,
        save_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train(emb, n_lists=8)
    path = str(tmp_path / "ivf_index")
    save_ivf_index(spark, cents, path)
    loaded = load_ivf_index(spark, path)
    assert loaded.shape == cents.shape
    assert np.array_equal(loaded, cents)  # exact, not approx
    a = {(r._id, r.list_id) for r in ivf_assign(emb, cents).select("_id", "list_id").collect()}
    b = {(r._id, r.list_id) for r in ivf_assign(emb, loaded).select("_id", "list_id").collect()}
    assert a == b


def test_bloom_prefilter_exact_output_and_fpr(spark, sf_dir):
    """The bloom prefilter must (a) return EXACTLY the exact anti-join's
    new-doc set at any bitmap size — false positives are repaired by the
    verify join, false negatives cannot exist — and (b) keep its
    false-positive rate near the theoretical bound in an undersized-
    bitmap regime (m=1024, where FPs actually occur)."""
    import numpy as np
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.operators.dedup import (
        bloom_prefilter_new_docs,
        build_fingerprint_bloom,
    )
    from kafka_connect_bigquery_storage_write_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") <= 250)
    fresh = docs.filter(F.col("doc_id") > 250)
    exact = {
        r.doc_id
        for r in fresh.select("doc_id", fingerprint("text").alias("fp"))
        .join(corpus.select(fingerprint("text").alias("fp")).distinct(), "fp", "left_anti")
        .collect()
    }

    for m_bits, k in ((1 << 20, 8), (1024, 4)):
        got = {r.doc_id for r in bloom_prefilter_new_docs(corpus, fresh, m_bits=m_bits, k=k).collect()}
        assert got == exact, f"m={m_bits}: bloom path diverged from exact dedup"

    # FPR in the undersized regime: P(all k bits set) for a novel key
    m_bits, k = 1024, 4
    bitmap, m, kk = build_fingerprint_bloom(corpus, m_bits=m_bits, k=k)
    fill = np.unpackbits(bitmap).mean()
    expected_fpr = fill**kk
    pos = F.array(*[F.pmod(F.xxhash64(fingerprint("text"), F.lit(i)), F.lit(m)) for i in range(kk)])
    rows = fresh.select("doc_id", pos.alias("p")).collect()
    novel = [r for r in rows if r.doc_id in exact]
    fp_hits = sum(1 for r in novel if all((bitmap[p >> 3] >> (p & 7)) & 1 for p in r.p))
    measured = fp_hits / max(len(novel), 1)
    assert measured <= max(3 * expected_fpr, 0.02), f"FPR {measured} vs theoretical {expected_fpr}"


def test_ivf_index_save_load_query_identical(spark, sf_dir, tmp_path):
    """The persisted-index query path must reproduce the fresh-build
    ivf_topk exactly (same params, same seed), and at full probe with
    exact rescore it must equal brute force — index persistence cannot
    change a single score."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import IvfIndex, cosine_topk, ivf_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")

    fresh = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=8, exact_rescore=True)
    idx = IvfIndex.build(emb, n_lists=8, exact_rescore=True)
    idx.save(str(tmp_path / "ivf"))
    loaded = IvfIndex.load(spark, str(tmp_path / "ivf"))
    assert loaded.raw_vectors is True and len(loaded.centroids) == 8
    got = loaded.topk(queries, k=5, n_probe=8)

    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, fresh.collect()), key=lambda t: (t[0], t[3])
    )
    brute = cosine_topk(emb, queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))


def test_ivf_index_incremental_append_equals_rebuild(spark, sf_dir, tmp_path):
    """append() against frozen centroids == assignment of the full corpus
    (pure function of vector x centroids) — the never-rescan-the-corpus
    maintenance path."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import IvfIndex
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    base = IvfIndex.build(old, n_lists=8, exact_rescore=True)
    grown = base.append(new)
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    got = sorted(map(tuple, grown.topk(queries, k=5, n_probe=8).collect()))
    # true rebuild: one-shot assignment of the FULL corpus against the
    # same frozen centroids (not an append), then the same query
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import ivf_assign

    full_lists = ivf_assign(emb, base.centroids, n_top=1, normalize=not base.raw_vectors).withColumnsRenamed(
        {"_id": "neighbor_id", "_vec": "_cvec"}
    )
    rebuilt = IvfIndex(base.centroids, full_lists, base.raw_vectors)
    want = sorted(map(tuple, rebuilt.topk(queries, k=5, n_probe=8).collect()))
    assert got == want and len(got) > 0


def test_ivf_index_drift_and_rebuild_gate(spark, sf_dir):
    """Drift maintenance (VERDICT r6 #9): a fresh build measures the
    k-means residual (small); appending a SHIFTED distribution pulls the
    member means away from the frozen centroids and the weighted drift
    must rise materially; rebuild_if fires past the threshold and the
    retrained index's drift returns to the residual regime."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import IvfIndex
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = IvfIndex.build(emb, n_lists=8, exact_rescore=True)
    fresh = base.drift()
    assert len(fresh["per_list"]) == 8
    assert all(0.0 <= d["drift"] <= 2.0 for d in fresh["per_list"])
    baseline = fresh["weighted_mean_drift"]
    # converged spherical k-means: centroid == normalized member mean,
    # so a fresh build measures ~0 (the probe behind drift()'s guidance)
    assert baseline < 1e-9

    # a same-size appended population, every vector reflected through
    # the origin. Note the bound below is deliberately modest: appended
    # vectors land in their best-matching Voronoi cell, so even a
    # maximally foreign distribution pulls member means only partway —
    # which is exactly why the absolute alert threshold in drift()'s
    # docstring is ~0.02, not 0.5
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> -x)").alias("embedding"),
    )
    grown = base.append(shifted)
    decayed = grown.drift()["weighted_mean_drift"]
    assert decayed > 0.02, (baseline, decayed)

    # gate: below threshold keeps the same object, above rebuilds
    same, rebuilt_flag = base.rebuild_if(threshold=0.5)
    assert same is base and not rebuilt_flag
    newidx, rebuilt_flag = grown.rebuild_if(threshold=0.02)
    assert rebuilt_flag
    healed = newidx.drift()["weighted_mean_drift"]
    assert healed < decayed / 2, (decayed, healed)
    # the rebuilt index serves the grown corpus (same row population)
    assert newidx.lists.count() == grown.lists.count()


def test_pq_memorize_codebook_reproduces_brute_force(spark, sf_dir):
    """Lossless configuration: codebooks that memorize every distinct
    normalized subvector make encode->decode the identity, so the PQ
    path (ADC shortlist + exact rescore) must reproduce cosine_topk
    bit-for-bit — the q100-style exactness anchor for the PQ family."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
        cosine_topk,
        pq_decode,
        pq_encode,
        pq_topk,
        pq_train,
    )
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, n_subspaces=8, memorize=True)
    # encode -> decode identity on the normalized vectors
    import numpy as np

    codes = pq_encode(emb, books)
    dec = {r["_id"]: np.array(r["_vec"]) for r in pq_decode(codes, books).collect()}
    rows = emb.collect()
    # normalize with the SAME 2-D row reduction the kernels use — the 1-D
    # norm can differ in the last ulp (numpy pairwise-summation order)
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    orig = {r["vec_id"]: matn[i] for i, r in enumerate(rows)}
    assert set(dec) == set(orig)
    for vid, v in orig.items():
        assert np.array_equal(dec[vid], v), vid

    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    got = sorted(map(tuple, pq_topk(emb, queries, k=5, rescore_factor=4, codebooks=books).collect()))
    want = sorted(map(tuple, cosine_topk(emb, queries, k=5).collect()))
    assert got == want and len(got) == 50


def test_pq_production_config_recall(spark, sf_dir):
    """The q145 production config (8x64 codes + rescore_factor=8) must
    keep recall@5 high against brute force — measured on the fixture
    (near-random embeddings, PQ's worst case): 8x16/rf4 0.44,
    8x64/rf4 0.86, 8x64/rf8 0.94, 16x64/rf4 0.96. 8x64/rf8 keeps the
    8-byte-per-vector memory story."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, pq_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    approx = pq_topk(emb, queries, k=5, n_subspaces=8, n_codes=64, rescore_factor=8)
    exact = cosine_topk(emb, queries, k=5)
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.85, recall


def test_ivf_maintained_pipeline_decay_then_heal_through_persistence(spark, sf_dir, tmp_path):
    """The full maintenance loop VERDICT r7 #8 asked for, driven through
    the PERSISTED index path end to end: serve from disk -> append three
    drifting batches (each reloading the saved index, appending, saving —
    the nightly-ingest cadence) -> the drift gate fires past the probed
    0.02 threshold -> rebuild -> drift returns to the residual regime AND
    measured recall@5 against brute force is restored. Every step acts on
    an index loaded from disk, so the save/load layout carries the whole
    cycle, not just a single round trip."""
    import os

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import IvfIndex, cosine_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf")

    def recall(idx, corpus, queries, k=5, n_probe=2):
        got = idx.topk(queries, k=k, n_probe=n_probe).select("query_id", "neighbor_id").collect()
        truth = cosine_topk(corpus, queries, k=k).select("query_id", "neighbor_id").collect()
        g: dict = {}
        t: dict = {}
        for r in got:
            g.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for r in truth:
            t.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(g.get(q, set()) & t[q]) for q in t) / sum(len(t[q]) for q in t)

    IvfIndex.build(emb, n_lists=8, exact_rescore=True).save(path)
    # fresh index: gate must NOT fire at the probed threshold
    idx0, fired0 = IvfIndex.load(spark, path).rebuild_if(0.02)
    assert not fired0

    corpus = emb
    drifts = []
    for b in range(1, 4):
        # batch b: coordinate-rolled + sign-flipped re-embedding of the
        # base population — a model/version drift the frozen quantizer
        # was never trained on
        shift = emb.select(
            (F.col("vec_id") + 1_000_000 * b).alias("vec_id"),
            F.expr(
                f"transform(sequence(0, 63), j -> embedding[(j + {b * 17}) % 64]"
                f" * (CASE WHEN ((j + {b}) % 3) = 0 THEN -1.0 ELSE 1.0 END))"
            ).alias("embedding"),
        )
        corpus = corpus.unionByName(shift)
        idx = IvfIndex.load(spark, path).append(shift)
        idx.save(path + f".b{b}")  # unique dir: lists read lazily from the OLD path
        path = path + f".b{b}"
        drifts.append(IvfIndex.load(spark, path).drift()["weighted_mean_drift"])
    assert drifts[0] > 0.02, drifts  # decay crosses the probed alert threshold

    served = IvfIndex.load(spark, path)
    queries = (
        corpus.filter(F.col("vec_id") >= 3_000_000)
        .limit(20)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    r_frozen = recall(served, corpus, queries)
    healed, fired = served.rebuild_if(0.02)
    assert fired
    healed.save(str(tmp_path / "ivf-healed"))
    healed = IvfIndex.load(spark, str(tmp_path / "ivf-healed"))
    assert os.path.exists(os.path.join(str(tmp_path / "ivf-healed"), "_meta.json"))
    d_decayed = served.drift()["weighted_mean_drift"]
    d_healed = healed.drift()["weighted_mean_drift"]
    assert d_healed < d_decayed / 4, (d_decayed, d_healed)
    r_healed = recall(healed, corpus, queries)
    assert r_healed > r_frozen, (r_frozen, r_healed)  # recall restored
    # the healed index serves the same row population
    assert healed.lists.count() == served.lists.count() == 4 * emb.count()


def test_ivfpq_exact_config_equals_brute_force(spark, sf_dir):
    """n_probe spanning every list + rescore covering the corpus: the
    composed IVF-PQ machinery must reproduce cosine_topk bit-for-bit
    (the q100/q151 rule on the composed index — q174's pin)."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, ivfpq_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    got = ivfpq_topk(emb, queries, k=5, n_lists=8, n_probe=8, n_subspaces=8, n_codes=64, rescore_factor=10**9)
    brute = cosine_topk(emb, queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))


def test_ivfpq_production_recall(spark, sf_dir):
    """q175's production config (16 lists / 4 probes, 8x16 books, rf=8)
    on near-random fixture embeddings — coarse+product quantization's
    honest worst case. Measured 0.66 at sf0.001; pinned with margin."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, ivfpq_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    got = ivfpq_topk(emb, queries, k=5, n_lists=16, n_probe=4, n_subspaces=8, n_codes=16, rescore_factor=8)
    truth = cosine_topk(emb, queries, k=5)
    g: dict = {}
    t: dict = {}
    for r in got.collect():
        g.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in truth.collect():
        t.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(g.get(q, set()) & t[q]) for q in t) / sum(len(t[q]) for q in t)
    assert recall >= 0.6, recall
    # the probe restriction actually bites: fewer probes must not scan
    # everything (scan counts aren't observable here, but a 1-probe run
    # must return valid ranked rows and can only lose recall)
    one = ivfpq_topk(emb, queries, k=5, n_lists=16, n_probe=1, n_subspaces=8, n_codes=16, rescore_factor=8)
    rows = one.collect()
    assert all(1 <= r["rank"] <= 5 for r in rows) and len(rows) <= 50


def test_ivfpq_index_save_load_query_identical(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ artifact must reproduce the fresh-build path
    exactly (same params, same seeds) through save/load, and in the
    exact configuration equal brute force — persistence cannot change a
    single score. append() against the frozen artifacts == building on
    the full corpus (pure-function contract)."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import IvfPqIndex, cosine_topk, ivfpq_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")

    idx = IvfPqIndex.build(emb, n_lists=8, n_subspaces=8, n_codes=64)
    idx.save(str(tmp_path / "ivfpq"))
    loaded = IvfPqIndex.load(spark, str(tmp_path / "ivfpq"))
    assert len(loaded.centroids) == 8 and loaded.codebooks.shape[:2] == (8, 64)

    got = loaded.topk(queries, k=5, n_probe=8, rescore_factor=10**9)
    fresh = ivfpq_topk(emb, queries, k=5, n_lists=8, n_probe=8, n_subspaces=8, n_codes=64, rescore_factor=10**9)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, fresh.collect()))
    brute = cosine_topk(emb, queries, k=5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, brute.collect()))

    # incremental append == full build against the same frozen artifacts
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    base = IvfPqIndex.build(old, n_lists=8, n_subspaces=8, n_codes=64)
    grown = base.append(new)
    full = IvfPqIndex(base.centroids, base.codebooks,
                      __import__("kafka_connect_bigquery_storage_write_spark.operators.similarity", fromlist=["x"])._ivfpq_encode_assign(
                          emb, base.centroids, base.codebooks, "vec_id", "embedding"),
                      emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cvec")))
    g = sorted(map(tuple, grown.topk(queries, k=5, n_probe=8, rescore_factor=10**9).collect()))
    w = sorted(map(tuple, full.topk(queries, k=5, n_probe=8, rescore_factor=10**9).collect()))
    assert g == w and len(g) > 0


def test_jl_projection_preserves_distances_unbiased(spark, sf_dir):
    """JL pin for q182: under the 1/sqrt(out_dim) Rademacher projection,
    squared-distance ratios are unbiased (mean ~ 1) — the lemma's E[.]
    statement — and individually bounded on the fixture (8 dims is a
    deliberately loose sketch; the operator's contract is unbiasedness +
    an out_dim knob, not a fixed eps)."""
    import numpy as np

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import random_projection
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    proj = random_projection(emb, in_dim=64, out_dim=8, ndigits=None)
    rows = proj.orderBy("vec_id").collect()
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    P = np.array([[r[f"p{k}"] for k in range(8)] for r in rows])
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(rows), size=(1000, 2))
    ratios = []
    for a, b in idx:
        if a == b:
            continue
        d0 = float(np.sum((E[a] - E[b]) ** 2))
        if d0 > 0:
            ratios.append(float(np.sum((P[a] - P[b]) ** 2)) / d0)
    r = np.array(ratios)
    assert 0.8 < r.mean() < 1.2, r.mean()
    assert r.min() > 0.02 and r.max() < 10.0, (r.min(), r.max())


def test_ppjoin_matches_plain_jaccard_and_prunes_candidates(spark, sf_dir):
    """q184's two contracts: (a) EXACTNESS — prefix-filtered output equals
    the plain shingle-join output byte-for-byte (no false negatives,
    unlike MinHash); (b) ECONOMICS — the prefix join generates strictly
    fewer candidate pairs than the full shingle join on the fixture."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import (
        jaccard_near_dup_pairs,
        prefix_filtered_jaccard_pairs,
        prefix_join_candidate_count,
    )
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plain = sorted(map(tuple, jaccard_near_dup_pairs(docs, threshold=0.8).collect()))
    pp = sorted(map(tuple, prefix_filtered_jaccard_pairs(docs, threshold=0.8).collect()))
    assert pp == plain and len(pp) > 0

    n_pref, n_full = prefix_join_candidate_count(docs, threshold=0.8)
    assert n_pref < n_full, (n_pref, n_full)
    # every emitted pair was a candidate
    assert len(pp) <= n_pref


def test_in_query_recall_gates_fire_on_regression(spark, sf_dir):
    """VERDICT r10 #1: the rows-only ANN queries are self-verifying — the
    in-query gates must RAISE on a quality regression (so the official
    driver row errors) and pass the true result."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_near_dup_pairs, cosine_topk
    from kafka_connect_bigquery_storage_write_spark.queries.similarity import (
        _gate_pair_recall,
        _gate_topk_recall,
    )
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, queries, k=5)
    # the exact result passes at the strictest bar
    _gate_topk_recall(exact, emb, queries, 5, 0.99, "gate-test")
    # a regressed result (neighbors shifted out of the corpus) raises
    broken = exact.withColumn("neighbor_id", F.col("neighbor_id") + 10_000_000)
    with _pytest.raises(AssertionError, match="recall@5"):
        _gate_topk_recall(broken, emb, queries, 5, 0.5, "gate-test")

    sl = emb.filter(F.col("label") <= 2)
    pairs = cosine_near_dup_pairs(sl, threshold=0.35)
    _gate_pair_recall(pairs, sl, 0.35, 0.99, "gate-test")
    # losing pairs -> recall failure
    with _pytest.raises(AssertionError, match="pair recall"):
        _gate_pair_recall(pairs.limit(1), sl, 0.35, 0.99, "gate-test")
    # inventing pairs -> precision (subset) failure
    fake = pairs.unionByName(
        sl.select(F.col("vec_id").alias("id_a")).limit(1).crossJoin(
            sl.select(F.col("vec_id").alias("id_b")).orderBy(F.col("id_b").desc()).limit(1)
        ).withColumn("cosine", F.lit(-1.0))
    )
    with _pytest.raises(AssertionError, match="precision"):
        _gate_pair_recall(fake, sl, 0.35, 0.0, "gate-test")


def test_remove_repeated_spans_cuts_later_occurrences_only(spark):
    """Planted duplicates: the globally FIRST occurrence of a repeated
    aligned chunk survives, every later one is cut; tails always stay."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import remove_repeated_spans

    w = 4  # small window so the fixture stays readable
    banner = "aa bb cc dd"  # one full chunk
    docs = spark.createDataFrame(
        [
            (0, f"{banner} u0 u1 u2 u3 tail0"),        # first occurrence: kept
            (1, f"{banner} v0 v1 v2 v3"),              # banner cut (2nd occurrence)
            (2, f"w0 w1 w2 w3 {banner} t2"),           # banner aligned at s=4: cut
            (3, "short tail only"),                    # < window: tail only
            (4, f"{banner} {banner}"),                 # both are later occurrences of doc 0's
            (5, "zz yy xx ww zz yy xx ww"),            # self-repeat: second cut
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_repeated_spans(docs, window=w).collect()}
    assert out[0]["clean_text"] == f"{banner} u0 u1 u2 u3 tail0"
    assert (out[0]["n_chunks"], out[0]["n_removed"], out[0]["n_tokens_kept"]) == (2, 0, 9)
    assert out[1]["clean_text"] == "v0 v1 v2 v3"
    assert (out[1]["n_chunks"], out[1]["n_removed"]) == (2, 1)
    assert out[2]["clean_text"] == "w0 w1 w2 w3 t2"
    assert (out[2]["n_chunks"], out[2]["n_removed"], out[2]["n_tokens_kept"]) == (2, 1, 5)
    assert out[3]["clean_text"] == "short tail only"
    assert (out[3]["n_chunks"], out[3]["n_removed"], out[3]["n_tokens_kept"]) == (0, 0, 3)
    assert out[4]["clean_text"] == ""  # every chunk is a later occurrence of doc 0's
    assert (out[4]["n_chunks"], out[4]["n_removed"], out[4]["n_tokens_kept"]) == (2, 2, 0)
    assert out[5]["clean_text"] == "zz yy xx ww"  # within-doc repeat: first kept
    assert (out[5]["n_chunks"], out[5]["n_removed"], out[5]["n_tokens_kept"]) == (2, 1, 4)


def test_unaligned_span_dedup_catches_shifted_boilerplate(spark):
    """The recall pin that separates stride-1 token coverage from aligned
    tiling: a banner SHIFTED off the chunk boundary is invisible to
    remove_repeated_spans but fully removed by repeated_span_token_dedup."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_span_token_dedup,
    )

    w = 4
    banner = "aa bb cc dd"
    docs = spark.createDataFrame(
        [
            (0, f"{banner} u0 u1 u2 u3"),       # banner at offset 0 (first occurrence)
            (1, f"xx {banner} v0 v1 v2"),       # banner SHIFTED one token
        ],
        "doc_id long, text string",
    )
    aligned = {r["doc_id"]: r for r in remove_repeated_spans(docs, window=w).collect()}
    assert aligned[1]["n_removed"] == 0  # aligned tiling misses the shift
    un = {r["doc_id"]: r for r in repeated_span_token_dedup(docs, window=w, stride=1).collect()}
    assert un[0]["n_removed_tokens"] == 0
    assert un[1]["n_removed_tokens"] == 4
    assert un[1]["clean_text"] == "xx v0 v1 v2"
    # short doc (< window): all tokens kept
    short = spark.createDataFrame([(9, "just three tokens")], "doc_id long, text string")
    s = repeated_span_token_dedup(short, window=w).collect()[0]
    assert (s["n_tokens"], s["n_removed_tokens"], s["clean_text"]) == (3, 0, "just three tokens")


def test_span_extents_merge_and_fraction(spark):
    """repeated_span_extents (VERDICT r11 #4): overlapping AND adjacent
    duplicate windows merge into one maximal (start, end) span, boundary
    offsets are exact, and the per-doc duplicate fraction is integer
    per-mille (engine-portable div)."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import repeated_span_extents

    w = 4
    banner = "aa bb cc dd"
    docs = spark.createDataFrame(
        [
            (0, f"{banner} u0 u1 u2 u3"),                 # first occurrence: no spans
            (1, f"xx {banner} v0 v1 v2"),                 # one shifted copy -> [1,4]
            (2, f"{banner} {banner} t0 t1"),              # adjacent copies -> one [0,7] span
            (3, f"{banner} m0 m1 m2 m3 m4 m5 {banner}"),  # two separated copies -> two spans
        ],
        "doc_id long, text string",
    )
    rows = repeated_span_extents(docs, window=w, stride=1).orderBy("doc_id", "span_start").collect()
    got = [(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in rows]
    assert got == [(1, 1, 4, 4), (2, 0, 7, 8), (3, 0, 3, 4), (3, 10, 13, 4)]
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[2]["doc_dup_tokens"] == 8 and by_doc[2]["n_tokens"] == 10
    assert by_doc[2]["dup_permille"] == 800
    assert by_doc[3]["doc_dup_tokens"] == 8 and by_doc[3]["n_tokens"] == 14
    assert by_doc[3]["dup_permille"] == (1000 * 8) // 14


def test_span_extents_coverage_equals_token_dedup(spark, sf_dir):
    """Invariant: the union coverage of merged extents equals the token
    dedup operator's n_removed_tokens for every document (same election,
    two output shapes)."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import (
        repeated_span_extents,
        repeated_span_token_dedup,
    )
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("z " * 6), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    ).limit(200)
    ext = (
        repeated_span_extents(docs, window=6, stride=1)
        .groupBy("doc_id")
        .agg(F.first("doc_dup_tokens").alias("cov"))
    )
    td = repeated_span_token_dedup(docs, window=6, stride=1).select("doc_id", "n_removed_tokens")
    joined = td.join(ext, "doc_id", "left").select(
        "doc_id", "n_removed_tokens", F.coalesce("cov", F.lit(0)).alias("cov")
    )
    mismatches = joined.filter(F.col("n_removed_tokens") != F.col("cov")).count()
    assert mismatches == 0


def test_multi_grain_span_coverage_matches_single_grain_removals(spark):
    """q231's kernel: per-grain coverage must equal the corresponding
    single-grain token dedup's n_removed_tokens, and a 12-token header
    (below the w=20 floor) must be visible ONLY at w=10."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import (
        multi_grain_span_coverage,
        repeated_span_token_dedup,
    )

    header = "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10 h11 h12"  # 12 tokens
    banner = " ".join(f"b{i}" for i in range(20))  # 20 tokens
    rows = []
    for i in range(6):
        body = " ".join(f"doc{i}w{j}" for j in range(30))  # unique per doc
        text = f"{header} {body}" if i % 2 == 0 else f"{banner} {body}"
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cov = {r["doc_id"]: r for r in multi_grain_span_coverage(docs, windows=(20, 10)).collect()}
    for w in (20, 10):
        removed = {
            r["doc_id"]: r["n_removed_tokens"]
            for r in repeated_span_token_dedup(docs, window=w, stride=1).collect()
        }
        for did, r in cov.items():
            assert r[f"dup_tokens_w{w}"] == removed[did], (w, did)

    # header docs (even ids > 0): the 12-token repeat is invisible at w=20,
    # fully covered at w=10 (first occurrence doc 0 keeps it)
    for did in (2, 4):
        assert cov[did]["dup_tokens_w20"] == 0
        assert cov[did]["dup_tokens_w10"] == 12
    # banner docs (odd ids > 1): caught at both grains
    for did in (3, 5):
        assert cov[did]["dup_tokens_w20"] == 20
        assert cov[did]["dup_tokens_w10"] == 20
    # first occurrences keep their text at every grain
    assert cov[0]["dup_tokens_w10"] == 0 and cov[1]["dup_tokens_w20"] == 0
    # integer per-mille: 12 dup of 42 tokens = 285 permille exactly
    assert cov[2]["dup_permille_w10"] == (1000 * 12) // 42
