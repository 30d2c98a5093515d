"""Graph analytics beyond connected components (operators/dedup.py):
integer-exact PageRank.

Public method: PageRank (Brin & Page 1998) with the damping update
r' = (1-d) + d * Σ_in r(u)/deg(u), run a FIXED number of iterations in
INTEGER micro-units so the result is bit-identical across engines,
partitionings and replays:

- ranks are int64 micro-units (1.0 == 1_000_000);
- each contribution is an exact integer floor-division r // deg
  (Spark's `div` == DuckDB's `//` for non-negative operands);
- the damped update is 150_000 + (85 * Σcontrib) // 100 — all integers.

Floating PageRank differs across engines in the last ulp per iteration
and the error compounds; the integer form loses ~1e-6 of mass per hop
(the floor), which is noise for ranking purposes and buys exact
replayability — the same trade every exact-parity operator here makes
(q93 centroids, q107 gram matrix, q111 Gini).

Scale shape per iteration: one join of the rank relation (8-byte ids +
8-byte ranks) against the edge relation, one hash aggregation on dst —
the canonical iterate-join-aggregate loop, so the round-4 rule applies:
EAGER localCheckpoint every generation (see SCALING.md) or AQE re-plans
the accumulated tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F
from kafka_connect_bigquery_storage_write_spark.operators.observe import observed_metrics
from kafka_connect_bigquery_storage_write_spark.sources.tables import local_rows_df

MICRO = 1_000_000


def coactivity_edges(
    memberships: DataFrame,
    bucket: str = "h",
    member: str = "u",
    max_bucket_members: int | None = None,
) -> DataFrame:
    """Symmetric co-membership edges: members sharing a bucket get both
    (src,dst) and (dst,src). The self-join squares per-bucket membership
    (cost Σ_b |B_b|² — the same economics as the shingle df² joins), so
    ``max_bucket_members`` bounds the blowup: each bucket keeps at most
    K members, chosen by deterministic md5 rank over (bucket, member) —
    a content-keyed sample, stable across runs, partitionings, and
    cluster sizes (q44's split trick; the bucket analogue of _cap_df's
    stop-shingles) — capping any bucket's join contribution at K².
    A 10x hot-bucket probe of the uncapped build measured 108.5s vs
    15.3s (SCALING.md round-5); the cap turns that cliff into a knob.
    ``None`` keeps exact semantics (the oracle-checked configuration at
    fixture scale uses a cap far above the fixture's max bucket).
    """
    # materialize the membership relation ONCE: both self-join branches
    # consume it, and without a barrier the whole upstream pipeline (scan,
    # distinct, cap) executes once PER BRANCH — the r14 profile showed the
    # events scan + two-exchange distinct + sort/window duplicated under
    # the join (self-joins get no subplan reuse above the exchange)
    memberships = memberships.localCheckpoint(eager=True)
    if max_bucket_members is not None:
        # the cap is a guardrail: pay the md5-rank window (a full
        # sort-by-(bucket, md5) pass) only when some bucket actually
        # exceeds it — one per-bucket count aggregate over the
        # checkpointed relation decides. Kept rows are IDENTICAL either
        # way: row_number trims nothing in a bucket at or under the cap,
        # and an oversized bucket's md5 rank order is local to the bucket.
        oversized = (
            memberships.groupBy(bucket)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_members)
        )
        if not oversized.isEmpty():
            w = Window.partitionBy(bucket).orderBy(
                F.md5(F.concat_ws("|", F.col(bucket).cast("string"), F.col(member).cast("string"))),
                F.col(member),
            )
            memberships = (
                memberships.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= max_bucket_members)
                .drop("_rk")
                .localCheckpoint(eager=True)
            )
    a = memberships.select(bucket, F.col(member).alias("src"))
    b = memberships.select(bucket, F.col(member).alias("dst"))
    return a.join(b, bucket).filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    symmetric: bool = False,
) -> DataFrame:
    """Integer-exact PageRank over a DIRECTED edge relation (symmetrize
    first for undirected graphs). Returns (vertex, rank_micro) with
    rank_micro an int64; every vertex appearing in ``edges`` is scored.

    ``damping_pct`` is the damping factor in percent (85 == 0.85) so the
    update stays in integer arithmetic end to end. ``symmetric=True``
    promises every (a,b) has its (b,a) twin (coactivity graphs), letting
    the vertex enumeration read src alone instead of union(src, dst).
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be 0..100")
    base = MICRO * (100 - damping_pct) // 100
    # degree is loop-invariant: join it onto the edge relation ONCE,
    # PARTITIONED BY src, and persist — the per-iteration join then
    # requires only ClusteredDistribution(src), which the cached layout
    # already satisfies, so each round shuffles O(V) ranks while the
    # O(E) edge relation never moves (guide §2: remove shuffles where
    # the data is already partitioned). A localCheckpoint here (the old
    # form) erased the partitioning from the optimizer's view, so every
    # round re-sorted and re-exchanged all E edges into a sort-merge
    # join against 8-byte ranks.
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    edeg = edges.repartition(F.col(src)).join(deg.hint("shuffle_hash"), src).persist()
    vertices = (
        edges.select(F.col(src).alias("vertex"))
        if symmetric
        else edges.select(F.col(src).alias("vertex")).union(edges.select(F.col(dst).alias("vertex")))
    )
    vertices = vertices.distinct().localCheckpoint(eager=True)  # reused every round
    # the seed ranks stay LAZY: a pure projection over the checkpointed
    # vertices, read exactly once (round 1's contrib join) — its own eager
    # checkpoint was one extra O(V) copy job per pagerank call
    ranks = vertices.withColumn("rank_micro", F.lit(MICRO).cast("long"))
    for _ in range(iterations):
        contrib = (
            # build the hash table on the O(V) ranks side; edeg streams
            # from cache with its partitioning intact (no exchange, no sort)
            edeg.join(ranks.hint("shuffle_hash"), edeg[src] == ranks.vertex)
            .select(F.col(dst).alias("vertex"), F.expr("rank_micro div _deg").alias("_c"))
            .groupBy("vertex")
            .agg(F.sum("_c").alias("_in"))
        )
        stepped = vertices.join(contrib, "vertex", "left").select(
            "vertex",
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * coalesce(_in, 0L) div 100")
            ).cast("long").alias("rank_micro"),
        )
        stepped = stepped.localCheckpoint(eager=True)  # round-4 rule: truncate EVERY generation
        ranks.unpersist()  # release request; actual free deferred to the ContextCleaner
        ranks = stepped
    edeg.unpersist()  # the last generation is materialized; the cache is done
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact per-vertex triangle counts by degree-ordered edge
    orientation (the classic m^1.5 algorithm): orient every symmetric
    edge from its lower-(degree, id) endpoint to the higher one — each
    triangle then exists as exactly ONE wedge u->v, v->w closed by u->w,
    so no triangle is counted twice and, decisively for scale, the wedge
    join's cost is sum(out_degree²) where degree orientation bounds
    out-degree by O(sqrt(m)) — a hub with a million neighbors generates
    no million² wedge blowup because its edges all point INTO it.
    Returns (vertex, degree, n_triangles); degree is the symmetric
    neighbor count. Input must be the symmetric distinct edge relation
    (both directions present, no self-loops) — coactivity_edges' output
    shape.

    Scale shape: three joins over 16-byte edge rows (ids only), one
    explode to attribute each triangle to its three corners, one hash
    aggregation at vertex grain.
    """
    # deg is consumed three times (both orientation sides + the final
    # degree join) and oriented three times (both wedge sides + the
    # closing join) — materialize each once or the upstream edge build
    # re-executes per reference (the eager multi-consumer rule,
    # SCALING.md; q122 does the same for its edge relation)
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_d")).localCheckpoint(eager=True)
    e = (
        edges.join(deg.withColumnRenamed("_d", "_ds"), src)
        .join(
            deg.select(F.col(src).alias(dst), F.col("_d").alias("_dd")),
            dst,
        )
    )
    oriented = (
        e.filter(
            (F.col("_ds") < F.col("_dd")) | ((F.col("_ds") == F.col("_dd")) & (F.col(src) < F.col(dst)))
        )
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .localCheckpoint(eager=True)
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("u"), F.col("e1.b").alias("v"), F.col("e2.b").alias("w"))
    )
    tri = wedges.join(
        oriented.select(F.col("a").alias("u"), F.col("b").alias("w")), ["u", "w"]
    )
    per_vertex = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_vertex.join(
        deg.select(F.col(src).alias("vertex"), F.col("_d").alias("degree")), "vertex"
    ).select("vertex", "degree", "n_triangles")


def bfs_distances(edges: DataFrame, seeds: DataFrame, max_hops: int) -> DataFrame:
    """Exact minimum-hop distance from a seed set, bounded at
    ``max_hops`` — the iterative frontier expansion every lineage /
    blast-radius / k-hop-neighborhood question runs. Returns
    (vertex, dist) for every vertex reached within the bound; pure
    integer set algebra, so the result is engine- and replay-exact.

    Scale shape per hop: one join of the CURRENT FRONTIER (not the
    visited set) against the 16-byte edge relation + one left-anti join
    against visited — cost tracks the frontier wave, not the graph; the
    loop localCheckpoints every generation (the round-4 iterate-loop
    rule: otherwise AQE re-plans the accumulated tree and lineage grows
    quadratically).
    """
    # loop-invariant edge relation: persist PARTITIONED BY src so each
    # hop's frontier join only shuffles the O(frontier) side — the edge
    # relation never moves (guide §2; the localCheckpoint form hid the
    # partitioning from the optimizer and re-exchanged all E per hop)
    edges = edges.repartition(F.col("src")).persist()
    verts = edges.select(F.col("src").alias("vertex")).distinct()
    visited = seeds.select("vertex").distinct().join(verts, "vertex").withColumn(
        "dist", F.lit(0)
    ).localCheckpoint(eager=True)
    frontier = visited.select("vertex")
    for hop in range(1, max_hops + 1):
        # the emptiness probe rides the materializing checkpoint as an
        # observed metric — no separate isEmpty() action per hop
        obs = Observation(f"bfs_hop_{hop}")
        nxt = (
            frontier.hint("shuffle_hash").join(edges, frontier.vertex == edges.src)
            .select(F.col("dst").alias("vertex"))
            .distinct()
            .join(visited.select("vertex"), "vertex", "left_anti")
            .withColumn("dist", F.lit(hop))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        # bounded wait + explicit-probe fallback (ADVICE r14, see
        # operators/observe.py): never block forever on delivery
        if observed_metrics(obs, nxt, F.count(F.lit(1)).alias("n"))["n"] == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("vertex")
    edges.unpersist()
    return visited


def kcore_peel(
    edges: DataFrame,
    k: int | None = None,
    max_rounds: int = 300,
    local_finish_max_edges: int | None = 100_000,
) -> tuple[DataFrame, int, int]:
    """k-core peeling — the dense-community extraction primitive (spam
    rings, coordinated accounts, collaboration cores): iteratively
    remove every vertex whose degree WITHIN THE SURVIVING SUBGRAPH is
    below k until none qualifies. Returns (trace, k, n_rounds) where
    trace has one row per peel round: (round, n_removed, sum_ids,
    min_id, max_id) — exact wave membership, the q172 pinning style.
    ``k=None`` derives k = max_degree // 2 from the input (scale-free
    across fixture densities).

    Scale shape per round: two left-semi joins restrict edges to the
    alive set (16-byte pairs), one degree aggregate, one anti-join to
    shrink alive — cost tracks surviving edges, which only shrinks; the
    alive relation localCheckpoints every round (the round-4
    iterate-loop rule). The driver holds 4 scalars per round, never
    vertices (until/unless the local finish below engages).

    ADVERSARIAL WORST CASE (VERDICT r8 #3): peeling removes only
    currently-sub-k vertices per round, so a path graph at k=2 sheds
    two ENDPOINTS per round — Θ(n) driver-coordinated rounds, the same
    cliff class min-label CC had before its star escape hatch. Real
    graphs cascade (fixture convergence: 3 rounds; SCALING.md k-core
    probes), but the operator no longer trusts that:

    * ``local_finish_max_edges`` — once the surviving subgraph fits the
      bound (known exactly from the round's degree aggregate, no extra
      job), the remaining edges collect to the driver and the peel
      finishes locally with IDENTICAL wave semantics (the waves are
      algorithm-defined, not execution-defined, so the trace is
      bit-equal either way — pytest-pinned). A chain that starts under
      the bound never pays a distributed round; one that starts above
      it pays shrinking distributed rounds only until it fits. The
      default (100k directed edges ≈ 1.6 MB of pairs) keeps the
      collect a bounded artifact, not a hot path; None disables for a
      pure-distributed trace.
    * ``max_rounds`` — hard guard for graphs that stay above the local
      bound AND refuse to cascade (adversarial at 100 TB): raises
      loudly naming both knobs instead of looping for days.

    The degeneracy-ordering alternative (exact core numbers via
    distributed h-index iteration, Lü et al. 2016) converges in
    O(iterations-to-fixpoint) rounds independent of peel depth but
    computes ALL core numbers — heavier per round and a different
    output contract (per-vertex coreness, not per-round waves), so it
    is documented here as the escalation path rather than implemented
    under this trace-producing API.
    """
    # loop-invariant edge relation partitioned by src once: the per-round
    # src-side semi join then never exchanges edges — only the shrinking
    # alive relation (and the surviving-edge stream for the dst-side semi)
    # moves (guide §2); shuffle_hash builds on the O(V) alive side instead
    # of sort-merge-sorting the O(E) side each round
    edges = edges.repartition(F.col("src")).persist()
    deg0 = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    if k is None:
        mx = deg0.agg(F.max("_d")).first()[0]
        # empty graph: no vertices, nothing to peel (k=0 keeps the loop a
        # no-op and the trace empty — matching the SQL oracle, whose NULL
        # k makes every round's removal predicate NULL/false)
        k = (mx or 0) // 2
    alive = deg0.select(F.col("src").alias("v")).localCheckpoint(eager=True)
    rows: list[tuple] = []
    rnd = 0
    while True:
        rnd += 1
        if rnd > max_rounds:
            raise RuntimeError(
                f"kcore_peel exceeded max_rounds={max_rounds} (chain-shaped graph? "
                "raise max_rounds or lower local_finish_max_edges)"
            )
        e2 = edges.join(alive.select(F.col("v").alias("src")).hint("shuffle_hash"), "src", "left_semi").join(
            alive.select(F.col("v").alias("dst")).hint("shuffle_hash"), "dst", "left_semi"
        )
        # the surviving-edge total rides the degree relation's checkpoint
        # as an observed metric — no separate sum action per round
        obs = Observation(f"kcore_round_{rnd}")
        d = (
            e2.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .observe(obs, F.sum("_d").alias("m"))
            .localCheckpoint(eager=True)
        )
        n_surviving_edges = observed_metrics(obs, d, F.sum("_d").alias("m"))["m"] or 0
        if local_finish_max_edges is not None and n_surviving_edges <= local_finish_max_edges:
            rows.extend(_kcore_peel_local(e2, alive, k, first_round=rnd))
            rnd = len(rows) + 1  # n_rounds below reports total waves + 0
            break
        rm = (
            alive.join(d.select(F.col("src").alias("v"), "_d"), "v", "left")
            .filter(F.coalesce(F.col("_d"), F.lit(0)) < F.lit(k))
            .select("v")
        )
        stats = rm.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ).first()
        if stats["n"] == 0:
            break
        rows.append((rnd, int(stats["n"]), int(stats["s"]), int(stats["mn"]), int(stats["mx"])))
        alive = alive.join(rm, "v", "left_anti").localCheckpoint(eager=True)
    edges.unpersist()
    spark = edges.sparkSession
    trace = local_rows_df(
        spark, rows, "round int, n_removed long, sum_ids long, min_id long, max_id long"
    )
    return trace, k, rnd - 1


def _kcore_peel_local(e2: DataFrame, alive: DataFrame, k: int, first_round: int) -> list[tuple]:
    """Driver-local continuation of kcore_peel once the surviving subgraph
    fits ``local_finish_max_edges``: same round/wave semantics in O(V + E)
    total — each round\'s wave candidates are only the vertices whose degree
    CHANGED last round (plus everyone, once, in the first), so a Θ(n)-round
    chain costs a linear scan here instead of Θ(n) Spark jobs. Isolated
    alive vertices (degree 0) peel in the first local wave exactly as the
    distributed left-join/coalesce(0) does."""
    deg: dict[int, int] = {int(r["v"]): 0 for r in alive.collect()}
    adj: dict[int, list[int]] = {}
    for r in e2.select("src", "dst").collect():
        s, t = int(r["src"]), int(r["dst"])
        adj.setdefault(s, []).append(t)
        deg[s] = deg.get(s, 0) + 1
    rows: list[tuple] = []
    rnd = first_round
    candidates = set(deg)
    while True:
        wave = [v for v in candidates if v in deg and deg[v] < k]
        if not wave:
            break
        rows.append((rnd, len(wave), sum(wave), min(wave), max(wave)))
        for v in wave:
            del deg[v]
        candidates = set()
        for v in wave:
            for t in adj.pop(v, ()):  # directed pairs both ways: each
                if t in deg:  # removal decrements its mirror\'s degree
                    deg[t] -= 1
                    candidates.add(t)
        rnd += 1
    return rows


def bounded_sssp(
    edges: DataFrame,
    source_df: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Single-source shortest paths over INTEGER edge weights, bounded at
    ``rounds`` relaxation rounds (Bellman-Ford; hop-bounded, so the
    result is exact for all paths of <= rounds edges and engine-exact —
    integer additions only, no float accumulation). ``source_df`` is a
    one-column relation ``v`` of source vertices (distance 0). Returns
    (v, dist) for every vertex reachable within the bound.

    Scale shape per round: one join of the frontier-bearing distance
    relation (8-byte id + 8-byte dist) against the edge relation, one
    min-aggregate on dst, one min-merge with the previous generation —
    the canonical iterate-join-aggregate loop, eager-checkpointed each
    generation (the round-4 rule). Unlike BFS (q172) the relaxation
    must revisit vertices (a longer-hop path may be shorter by weight),
    so the loop carries the FULL distance relation, not a frontier;
    the round bound is the termination contract, matching the oracle's
    recursion depth exactly.
    """
    # loop-invariant edge relation partitioned by the join key once; each
    # relaxation round shuffles only the O(V) distance relation and builds
    # its hash table on it (guide §2 — same shape as pagerank_integer)
    edges = edges.repartition(F.col(src)).persist()
    dist = source_df.select(F.col("v"), F.lit(0).cast("long").alias("dist")).localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            edges.join(dist.hint("shuffle_hash"), edges[src] == dist.v)
            .select(F.col(dst).alias("v"), (F.col("dist") + F.col(weight)).cast("long").alias("dist"))
        )
        stepped = (
            dist.unionByName(relaxed)
            .groupBy("v")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist.unpersist()
        dist = stepped
    edges.unpersist()
    return dist
