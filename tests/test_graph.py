"""coactivity_edges hot-bucket cap (VERDICT r5 #4): deterministic
md5-rank member sampling bounds the self-join blowup; a cap above every
bucket's size is a no-op (the registered q122 configuration)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_connect_bigquery_storage_write_spark.operators.graph import coactivity_edges


def _members(spark, spec):
    # spec: {bucket: n_members}; members are "<bucket>_m<i>"
    rows = [(b, f"{b}_m{i}") for b, n in spec.items() for i in range(n)]
    return spark.createDataFrame(rows, "h string, u string")


def test_cap_bounds_hot_bucket_edges(spark):
    hu = _members(spark, {"hot": 50, "cold": 4})
    edges = coactivity_edges(hu, max_bucket_members=10)
    per_src = edges.groupBy().count().collect()[0][0]
    # hot contributes 10*9 directed pairs, cold (under cap) all 4*3
    assert per_src == 10 * 9 + 4 * 3


def test_cap_above_bucket_size_is_identity(spark):
    hu = _members(spark, {"a": 7, "b": 3})
    capped = set(map(tuple, coactivity_edges(hu, max_bucket_members=2000).collect()))
    uncapped = set(map(tuple, coactivity_edges(hu).collect()))
    assert capped == uncapped and len(uncapped) == 7 * 6 + 3 * 2


def test_cap_sample_is_deterministic_across_partitionings(spark):
    hu = _members(spark, {"hot": 40})
    e1 = set(map(tuple, coactivity_edges(hu.repartition(1), max_bucket_members=8).collect()))
    e2 = set(map(tuple, coactivity_edges(hu.repartition(16), max_bucket_members=8).collect()))
    assert e1 == e2 and len(e1) == 8 * 7


def test_q122_fixture_ranks_unchanged_by_cap(spark, sf_dir):
    """The registered cap (2000) sits far above the fixture's max bucket
    membership, so q122's top-50 must be byte-identical to the uncapped
    build."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import pagerank_integer
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(F.date_trunc("hour", "ts").alias("h"), F.col("user_id").alias("u")).distinct()

    def top50(edges):
        r = pagerank_integer(edges.localCheckpoint(eager=True), iterations=2)
        return [
            (row["vertex"], row["rank_micro"])
            for row in r.orderBy(F.col("rank_micro").desc(), "vertex").limit(50).collect()
        ]

    assert top50(coactivity_edges(hu, max_bucket_members=2000)) == top50(coactivity_edges(hu))


def _sym(spark, pairs):
    rows = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_symmetric_flag_parity(spark):
    """symmetric=True (r14: vertex set from src alone, edge relation
    persisted partitioned by src) must be row-identical to the default
    union(src, dst) path on a symmetric edge relation — including a
    vertex whose only appearance is via its mirror edge."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import pagerank_integer

    edges = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)])
    a = {(r["vertex"], r["rank_micro"]) for r in pagerank_integer(edges, iterations=3).collect()}
    b = {
        (r["vertex"], r["rank_micro"])
        for r in pagerank_integer(edges, iterations=3, symmetric=True).collect()
    }
    assert a == b and len(a) == 5


def test_triangle_counts_known_graphs(spark):
    """Hand-checkable graphs: K4 (every vertex in C(3,2)=3 triangles),
    a triangle with a pendant vertex, and a square (no triangles)."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import triangle_counts

    k4 = _sym(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    got = {r["vertex"]: (r["degree"], r["n_triangles"]) for r in triangle_counts(k4).collect()}
    assert got == {v: (3, 3) for v in range(4)}

    tri_pendant = _sym(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    got = {r["vertex"]: (r["degree"], r["n_triangles"]) for r in triangle_counts(tri_pendant).collect()}
    assert got == {0: (2, 1), 1: (2, 1), 2: (3, 1)}  # pendant 3 has none -> absent

    square = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert triangle_counts(square).count() == 0


def test_triangle_counts_match_brute_force_on_random_graph(spark):
    """Degree-ordered wedge counting == brute-force triple enumeration on
    a random graph (the orientation must count each triangle exactly
    once, ties included)."""
    import itertools
    import random

    from kafka_connect_bigquery_storage_write_spark.operators.graph import triangle_counts

    rng = random.Random(13)
    n = 24
    und = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.25}
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    got = {r["vertex"]: r["n_triangles"] for r in triangle_counts(_sym(spark, und)).collect()}
    assert got == want and sum(want.values()) > 0


def test_bfs_distances_chain_and_bound(spark):
    """Path graph 0-1-2-3-4-5 seeded at 0: distances are the chain
    positions, the max_hops bound truncates the far tail, and a second
    seed merges waves by MINIMUM distance."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import bfs_distances

    chain = _sym(spark, [(i, i + 1) for i in range(5)])
    seeds = spark.createDataFrame([(0,)], "vertex long")
    got = {r["vertex"]: r["dist"] for r in bfs_distances(chain, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5 beyond the bound
    # two seeds: min-distance wins where waves meet
    seeds2 = spark.createDataFrame([(0,), (5,)], "vertex long")
    got2 = {r["vertex"]: r["dist"] for r in bfs_distances(chain, seeds2, max_hops=3).collect()}
    assert got2 == {0: 0, 5: 0, 1: 1, 4: 1, 2: 2, 3: 2}
    # seed not in the graph contributes nothing
    ghost = spark.createDataFrame([(99,)], "vertex long")
    assert bfs_distances(chain, ghost, max_hops=3).count() == 0
    # graph exhausts BEFORE the budget: the observed frontier count (r14:
    # the emptiness probe rides the checkpoint job) must stop the loop at
    # the empty wave, with the full chain reached
    got3 = {r["vertex"]: r["dist"] for r in bfs_distances(chain, seeds, max_hops=50).collect()}
    assert got3 == {i: i for i in range(6)}


def test_kcore_peel_planted_structure(spark):
    """Planted graph: a 5-clique (degree 4 inside) plus a 3-chain of
    pendants hanging off vertex 0. With k=3 the pendants peel in
    cascade order (leaf first) and the clique survives; the trace rows
    pin each wave exactly."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import kcore_peel

    clique = [(a, b) for a in range(5) for b in range(5) if a != b]
    # chain 0-10, 10-11, 11-12
    chain = [(0, 10), (10, 0), (10, 11), (11, 10), (11, 12), (12, 11)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")

    # k=2: the chain peels in CASCADE order (leaf 12 first — 11 still has
    # two alive neighbors that round — then 11, then 10); clique survives
    trace, k, n_rounds = kcore_peel(edges, k=2)
    rows = [tuple(r) for r in trace.orderBy("round").collect()]
    assert k == 2 and n_rounds == 3
    assert rows == [
        (1, 1, 12, 12, 12),
        (2, 1, 11, 11, 11),
        (3, 1, 10, 10, 10),
    ]

    # k=3: all three chain vertices fall below k AT ONCE (simultaneous
    # peel semantics — the standard round definition, and what the
    # unrolled oracle computes)
    trace3, k3, r3 = kcore_peel(edges, k=3)
    assert k3 == 3 and r3 == 1
    assert [tuple(r) for r in trace3.collect()] == [(1, 3, 33, 10, 12)]

    # derived k on the clique alone: max degree 4 -> k=2, nothing peels
    edges2 = spark.createDataFrame(clique, "src long, dst long")
    trace2, k2, r2 = kcore_peel(edges2)
    assert k2 == 2 and r2 == 0 and trace2.count() == 0


def test_kcore_peel_empty_graph(spark):
    """Derived k on an EMPTY edge relation (the sf0.001 typed-minute
    graph has no co-active pairs) must yield an empty trace, not a
    NoneType crash — parity with the oracle's NULL-k no-op rounds."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame([], "src long, dst long")
    trace, k, n_rounds = kcore_peel(edges)
    assert k == 0 and n_rounds == 0 and trace.count() == 0


def test_kcore_chain_graph_local_finish_and_guard(spark):
    """VERDICT r8 #3: a path graph at k=2 is the O(n)-rounds adversarial
    case (two endpoints peel per round). The local finish absorbs it in
    one collect with EXACT wave semantics; with the finish disabled the
    max_rounds guard raises loudly instead of looping for days."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.operators.graph import kcore_peel

    n = 10_000
    fwd = spark.range(n - 1).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    trace, k, n_rounds = kcore_peel(edges, k=2)  # 19,998 directed edges -> local
    rows = trace.orderBy("round").collect()
    assert k == 2 and n_rounds == n // 2 == len(rows)
    # wave r removes exactly the two current endpoints: r-1 and n-r
    for r in rows[:5] + rows[-2:]:
        i = r["round"]
        lo, hi = i - 1, n - i
        if lo == hi:  # odd-length tail would merge; n even -> last wave is a pair
            assert (r["n_removed"], r["min_id"], r["max_id"]) == (1, lo, lo)
        else:
            assert (r["n_removed"], r["sum_ids"], r["min_id"], r["max_id"]) == (2, lo + hi, lo, hi)

    with _pytest.raises(RuntimeError, match="max_rounds"):
        kcore_peel(edges, k=2, max_rounds=10, local_finish_max_edges=None)


def test_kcore_local_finish_waves_equal_distributed(spark):
    """The local finish is execution detail, not semantics: on a random
    graph the trace is row-identical whether the peel runs distributed
    end-to-end or collects immediately."""
    import random

    from kafka_connect_bigquery_storage_write_spark.operators.graph import kcore_peel

    rng = random.Random(9)
    pairs = {(rng.randrange(60), rng.randrange(60)) for _ in range(160)}
    sym = sorted({(a, b) for a, b in pairs if a != b} | {(b, a) for a, b in pairs if a != b})
    edges = spark.createDataFrame(sym, "src long, dst long").localCheckpoint(eager=True)

    dist, k1, r1 = kcore_peel(edges, local_finish_max_edges=None)
    loc, k2, r2 = kcore_peel(edges, local_finish_max_edges=10**9)
    assert k1 == k2 and r1 == r2
    assert [tuple(r) for r in dist.orderBy("round").collect()] == [
        tuple(r) for r in loc.orderBy("round").collect()
    ]


def test_bounded_sssp_revisits_vertices_for_weight_shorter_paths(spark):
    """The property that separates weighted SSSP from BFS: a 2-hop path
    of weight 2 must beat the 1-hop edge of weight 10 — which requires
    round 2 to RE-RELAX a vertex already reached in round 1."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import bounded_sssp

    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 1), (1, 3, 1)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(0,)], "v long")
    d1 = {r["v"]: r["dist"] for r in bounded_sssp(edges, seeds, rounds=1).collect()}
    assert d1 == {0: 0, 1: 10, 2: 1}  # hop-1 truth: direct edges only
    d2 = {r["v"]: r["dist"] for r in bounded_sssp(edges, seeds, rounds=2).collect()}
    assert d2 == {0: 0, 1: 2, 2: 1, 3: 11}  # vertex 1 re-relaxed via 2
    d3 = {r["v"]: r["dist"] for r in bounded_sssp(edges, seeds, rounds=3).collect()}
    assert d3 == {0: 0, 1: 2, 2: 1, 3: 3}


def test_observed_metrics_bounded_wait_and_fallback(spark):
    """ADVICE r14: the checkpoint-riding convergence probes must never
    hang if Spark stops delivering Observation metrics — the accessor
    waits a bounded time, then recomputes via one explicit aggregate."""
    from pyspark.sql import Observation

    from kafka_connect_bigquery_storage_write_spark.operators.observe import observed_metrics

    # delivered: the observed value comes back (no probe action needed)
    obs = Observation("om_delivered")
    ck = spark.range(7).observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    assert observed_metrics(obs, ck, F.count(F.lit(1)).alias("n"))["n"] == 7

    # never attached (the no-delivery world, degenerate form): falls back
    # to the explicit probe instead of raising/hanging
    never = Observation("om_never_attached")
    df = spark.range(5).localCheckpoint(eager=True)
    assert observed_metrics(never, df, F.count(F.lit(1)).alias("n"), timeout_s=0.2)["n"] == 5

    # attached but no action ever delivered metrics: bounded wait, then probe
    stuck = Observation("om_stuck")
    lazy = spark.range(9).observe(stuck, F.count(F.lit(1)).alias("n"))  # no action
    probe_src = spark.range(9).localCheckpoint(eager=True)
    assert observed_metrics(stuck, probe_src, F.count(F.lit(1)).alias("n"), timeout_s=0.2)["n"] == 9
    del lazy
