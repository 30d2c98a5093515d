"""Graph query entries: integer-exact PageRank over the user
co-activity graph (operators/graph.py; connected components live with
the dedup family in operators/dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.queries import query
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

_ITERS = 3


def _pagerank_oracle() -> str:
    head = """
    WITH hu AS (SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS h, user_id AS u FROM events),
    edges AS (SELECT DISTINCT a.u AS src, b.u AS dst FROM hu a JOIN hu b ON a.h = b.h AND a.u <> b.u),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
    r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM verts)"""
    its = []
    for i in range(_ITERS):
        its.append(f""",
    r{i + 1} AS (
      SELECT verts.v,
             CAST(150000 + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS r
      FROM verts LEFT JOIN (
        SELECT e.dst AS v, sum(r{i}.r // deg.d) AS s
        FROM edges e JOIN r{i} ON r{i}.v = e.src JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) c ON c.v = verts.v)"""
        )
    tail = f"""
    SELECT v AS user_id, r AS rank_micro
    FROM r{_ITERS}
    ORDER BY rank_micro DESC, user_id
    LIMIT 50"""
    return head + "".join(its) + tail


@query("q122_pagerank_coactivity", oracle=_pagerank_oracle())
def q122_pagerank_coactivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most central users by PageRank over the co-activity graph
    (users active in the same hour share an edge) — the influence/
    centrality member of the graph family next to connected components
    (q73/q87): CC answers "which rows are the same entity", PageRank
    answers "which entities matter".

    Integer micro-unit arithmetic makes a 3-iteration run BIT-IDENTICAL
    across engines (operators/graph.py; the oracle unrolls the same
    integer update — floor-division contributions, damped 85/100 update
    — into chained CTEs). Scale shape: the edge build is the df²-style
    hour-bucket self-join (same economics as the shingle joins — a hot
    hour is a hot bucket), so it runs through coactivity_edges with
    max_bucket_members=2000 (VERDICT r5 #4): deterministic md5-rank
    sampling bounds any bucket's join contribution at 2000² while the
    fixture's buckets (max 166 members at sf0.1) sit far below the cap,
    keeping the oracle exact; each iteration is one join + one dst-grain
    aggregation over 8-byte ids, eager-checkpointed per the round-4
    loop rule.
    """
    from kafka_connect_bigquery_storage_write_spark.operators.graph import coactivity_edges, pagerank_integer

    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(F.date_trunc("hour", "ts").alias("h"), F.col("user_id").alias("u")).distinct()
    edges = coactivity_edges(hu, max_bucket_members=2000)
    edges = edges.localCheckpoint(eager=True)  # the loop reuses this relation every round
    ranks = pagerank_integer(edges, iterations=_ITERS, symmetric=True)  # co-activity edges carry both directions
    return (
        ranks.select(F.col("vertex").alias("user_id"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "user_id")
        .limit(50)
    )


@query(
    "q168_triangle_count",
    oracle="""
    WITH hu AS (SELECT DISTINCT time_bucket(INTERVAL '1 minute', ts) AS h, user_id AS u FROM events),
    edges AS (SELECT DISTINCT a.u AS src, b.u AS dst FROM hu a JOIN hu b ON a.h = b.h AND a.u <> b.u),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    ori AS (SELECT e.src, e.dst FROM edges e JOIN deg a ON a.src = e.src JOIN deg b ON b.src = e.dst
            WHERE (a.d < b.d) OR (a.d = b.d AND e.src < e.dst)),
    tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
            FROM ori e1 JOIN ori e2 ON e1.dst = e2.src
                        JOIN ori e3 ON e3.src = e1.src AND e3.dst = e2.dst),
    pv AS (SELECT u AS vertex FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
    SELECT p.vertex                    AS user_id,
           CAST(d.d AS BIGINT)         AS degree,
           CAST(count(*) AS BIGINT)    AS n_triangles
    FROM pv p JOIN deg d ON d.src = p.vertex
    GROUP BY p.vertex, d.d
    ORDER BY n_triangles DESC, user_id
    LIMIT 20
    """,
)
def q168_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by exact triangle participation in the MINUTE-grain
    co-activity graph (q172's substrate: the hour-grain graph q122 ranks
    is near-COMPLETE at sf0.1 — 1500 users sharing hours — and exact
    triangle enumeration on a near-clique is cubic no matter the
    algorithm, so the operator runs where triangles are informative) — the local-clustering/community-density member of the graph
    family (CC: same entity; PageRank: influence; triangles: how tightly
    knit a vertex's neighborhood is — the basis of clustering
    coefficients and spam-ring detection).

    Exactness: pure integer counting, no arithmetic to drift — the
    oracle runs the SAME degree-ordered orientation in SQL. Scale shape
    (operators/graph.triangle_counts): orientation by (degree, id) makes
    each triangle ONE closed wedge and bounds wedge-join cost at
    sum(out_deg²) with out_deg = O(sqrt(m)) — the hub-explosion guard —
    and every join moves 16-byte id pairs, never payloads; the edge
    build reuses coactivity_edges' md5-rank bucket cap (fixture buckets
    sit far below it, keeping the oracle exact).
    """
    from kafka_connect_bigquery_storage_write_spark.operators.graph import coactivity_edges, triangle_counts

    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(F.date_trunc("minute", "ts").alias("h"), F.col("user_id").alias("u")).distinct()
    edges = coactivity_edges(hu, max_bucket_members=2000)
    return (
        triangle_counts(edges)
        .select(F.col("vertex").alias("user_id"), "degree", "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "user_id")
        .limit(20)
    )


@query(
    "q172_reachability_bfs",
    oracle="""
    WITH hu AS (SELECT DISTINCT time_bucket(INTERVAL '1 minute', ts) AS h, user_id AS u FROM events),
    edges AS (SELECT DISTINCT a.u AS src, b.u AS dst FROM hu a JOIN hu b ON a.h = b.h AND a.u <> b.u),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    d0 AS (SELECT v FROM verts WHERE v % 50 = 0),
    d1 AS (SELECT DISTINCT e.dst AS v FROM edges e JOIN d0 ON d0.v = e.src
           WHERE e.dst NOT IN (SELECT v FROM d0)),
    d2 AS (SELECT DISTINCT e.dst AS v FROM edges e JOIN d1 ON d1.v = e.src
           WHERE e.dst NOT IN (SELECT v FROM d0 UNION ALL SELECT v FROM d1)),
    d3 AS (SELECT DISTINCT e.dst AS v FROM edges e JOIN d2 ON d2.v = e.src
           WHERE e.dst NOT IN (SELECT v FROM d0 UNION ALL SELECT v FROM d1 UNION ALL SELECT v FROM d2)),
    reach AS (SELECT v, 0 AS dist FROM d0 UNION ALL SELECT v, 1 FROM d1
              UNION ALL SELECT v, 2 FROM d2 UNION ALL SELECT v, 3 FROM d3)
    SELECT CAST(dist AS INT)          AS dist,
           CAST(count(*) AS BIGINT)   AS n_users,
           CAST(sum(v) AS BIGINT)     AS sum_user_ids,
           CAST(min(v) AS BIGINT)     AS min_user,
           CAST(max(v) AS BIGINT)     AS max_user
    FROM reach
    GROUP BY dist
    ORDER BY dist
    """,
)
def q172_reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS over the MINUTE-grain co-activity graph (sparser than
    q122/q168's hour grain, so the waves have real depth — the sf0.01
    fixture populates all four distances): minimum hop distance (<=3)
    from the seed set (user_id % 50 == 0, restricted to graph vertices)
    — the k-hop-neighborhood / blast-radius primitive beside CC (q73),
    PageRank (q122) and triangles (q168), and the engine's canonical
    ITERATIVE frontier loop made oracle-visible: each hop is one
    frontier-vs-edges join plus an anti-join against visited,
    eager-checkpointed per generation (SCALING.md round-4 rule). The
    oracle unrolls the same three expansions as chained CTEs; exactness
    is pure integer set algebra. Per-distance aggregates (count, sum,
    min, max of user ids) pin exact WAVE membership — a hop that leaks a
    visited vertex or misses a frontier edge shifts the sums.
    """
    from kafka_connect_bigquery_storage_write_spark.operators.graph import bfs_distances, coactivity_edges

    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(F.date_trunc("minute", "ts").alias("h"), F.col("user_id").alias("u")).distinct()
    edges = coactivity_edges(hu, max_bucket_members=2000).localCheckpoint(eager=True)
    seeds = edges.select(F.col("src").alias("vertex")).distinct().filter(F.col("vertex") % 50 == 0)
    reach = bfs_distances(edges, seeds, max_hops=3)
    return (
        reach.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("vertex").alias("sum_user_ids"),
            F.min("vertex").alias("min_user"),
            F.max("vertex").alias("max_user"),
        )
        .select(F.col("dist").cast("int").alias("dist"), "n_users", "sum_user_ids", "min_user", "max_user")
        .orderBy("dist")
    )


def _kcore_oracle(rounds: int = 8) -> str:
    """Unrolled peel rounds (generated, constant at import): the Spark
    side iterates to fixpoint; the fixture converges in 3 rounds at both
    sf0.01 and sf0.1 (probed), so 8 unrolled rounds carry >2x margin —
    extra rounds peel nothing and emit no trace row. Every CTE is
    MATERIALIZED: a{i} references a{i-1} several times, and DuckDB
    re-inlines plain CTEs per reference, which makes the unrolled tree
    (and its parquet opens) exponential in the round count."""
    parts = [
        """
    WITH hu AS MATERIALIZED (SELECT DISTINCT time_bucket(INTERVAL '1 minute', ts) AS h,
                                event_type AS t, user_id AS u FROM events),
    edges AS MATERIALIZED (SELECT DISTINCT a.u AS src, b.u AS dst
              FROM hu a JOIN hu b ON a.h = b.h AND a.t = b.t AND a.u <> b.u),
    deg0 AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM edges GROUP BY src),
    kk AS MATERIALIZED (SELECT max(d) // 2 AS k FROM deg0),
    a0 AS MATERIALIZED (SELECT v FROM deg0)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(f""",
    d{i} AS MATERIALIZED (SELECT e.src AS v, count(*) AS d FROM edges e
             JOIN a{i-1} s ON s.v = e.src JOIN a{i-1} t2 ON t2.v = e.dst
             GROUP BY e.src),
    rm{i} AS MATERIALIZED (SELECT a.v FROM a{i-1} a LEFT JOIN d{i} dd USING (v) CROSS JOIN kk
              WHERE coalesce(dd.d, 0) < kk.k),
    a{i} AS MATERIALIZED (SELECT v FROM a{i-1} EXCEPT SELECT v FROM rm{i}),
    tr{i} AS (SELECT {i} AS round, count(*) AS n, sum(v) AS s, min(v) AS mn, max(v) AS mx FROM rm{i})""")
    union = "\n      UNION ALL ".join(f"SELECT * FROM tr{i}" for i in range(1, rounds + 1))
    parts.append(f"""
    SELECT CAST(round AS INT)  AS round,
           CAST(n AS BIGINT)   AS n_removed,
           CAST(s AS BIGINT)   AS sum_ids,
           CAST(mn AS BIGINT)  AS min_id,
           CAST(mx AS BIGINT)  AS max_id
    FROM ({union})
    WHERE n > 0
    ORDER BY round""")
    return "".join(parts)


@query("q201_kcore_peel_trace", oracle=_kcore_oracle())
def q201_kcore_peel_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition trace on the TYPED-minute co-activity graph
    (same minute AND same event type — sparser than q168/q172's
    substrate, so peeling has real structure at both fixture scales):
    vertices below k = max_degree // 2 are removed round by round until
    the k-core (possibly empty) remains — the dense-community
    extraction behind spam-ring and coordinated-activity mining, and
    the engine's canonical DATA-DEPENDENT fixpoint loop (q172's BFS is
    bounded by a constant; peeling terminates only when a round removes
    nothing). Each trace row pins exact wave membership
    (count/sum/min/max of removed ids); the oracle unrolls 8 rounds —
    probed fixture convergence is 3 at both SFs (>2x margin), and a
    formula change that slows convergence past 8 shows up as a row the
    oracle lacks, not a silent pass.

    Scale shape per round (operators/graph.kcore_peel): two left-semi
    joins + one degree aggregate over SURVIVING edges (shrinks
    monotonically), localCheckpoint per round; the driver holds 4
    scalars per round. Edge build reuses coactivity_edges' capped
    bucket economics.
    """
    from kafka_connect_bigquery_storage_write_spark.operators.graph import coactivity_edges, kcore_peel

    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(
        F.concat_ws("|", F.date_trunc("minute", "ts").cast("string"), "event_type").alias("h"),
        F.col("user_id").alias("u"),
    ).distinct()
    edges = coactivity_edges(hu, max_bucket_members=2000).localCheckpoint(eager=True)
    trace, _k, _rounds = kcore_peel(edges)
    return trace.orderBy("round")


@query(
    "q210_weighted_sssp",
    oracle="""
    WITH RECURSIVE verts AS (SELECT DISTINCT user_id AS v FROM events),
    fwd AS (
      SELECT a.v AS src, b.v AS dst FROM verts a JOIN verts b ON b.v = a.v + 1
      UNION ALL
      SELECT a.v AS src, b.v AS dst FROM verts a JOIN verts b ON b.v = a.v + 7
    ),
    edges AS (
      SELECT src, dst, 1 + (src + dst) % 5 AS w FROM fwd
      UNION ALL
      SELECT dst AS src, src AS dst, 1 + (src + dst) % 5 AS w FROM fwd
    ),
    seeds AS (SELECT v FROM verts WHERE v % 100 = 0),
    walk(v, d, hops) AS (
      SELECT v, CAST(0 AS BIGINT), 0 FROM seeds
      UNION ALL
      SELECT e.dst, walk.d + e.w, walk.hops + 1
      FROM walk JOIN edges e ON e.src = walk.v
      WHERE walk.hops < 4
    ),
    best AS (SELECT v, min(d) AS dist FROM walk GROUP BY v)
    SELECT CAST(dist AS BIGINT)        AS dist,
           CAST(count(*) AS BIGINT)    AS n_vertices,
           CAST(sum(v) AS BIGINT)      AS sum_ids,
           CAST(min(v) AS BIGINT)      AS min_id,
           CAST(max(v) AS BIGINT)      AS max_id
    FROM best
    GROUP BY dist
    ORDER BY dist
    """,
)
def q210_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED single-source shortest paths, hop-bounded (round 9; the
    missing algorithm class between q172's unweighted BFS and q122's
    fixpoint PageRank): a sparse deterministic lattice over the user-id
    space (u -> u+1 and u -> u+7 where both users exist, symmetric,
    integer weight 1 + (src+dst) % 5) is relaxed 4 Bellman-Ford rounds
    from the seed set (user_id % 100 == 0) — exact for every path of
    <= 4 edges, and engine-exact because distances are pure integer
    sums. Unlike BFS the loop must REVISIT vertices (a longer-hop path
    can be weight-shorter: the u+7 shortcut of weight w can lose to
    seven u+1 steps), so each round carries the full distance relation
    through a join + min-aggregate + min-merge; the oracle walks the
    same graph by bounded recursive CTE and takes min(d) per vertex.
    Per-distance wave aggregates pin exact membership.

    Scale shape (operators/graph.bounded_sssp): per round one
    frontier-relation join against edges + two hash aggregates over
    8-byte pairs, eager-checkpointed per generation; degree <= 4 by
    construction bounds the oracle's path enumeration, and on the
    engine side the relation never exceeds |V| rows.
    """
    from kafka_connect_bigquery_storage_write_spark.operators.graph import bounded_sssp

    ev = load_table(spark, sf_dir, "events")
    verts = ev.select(F.col("user_id").alias("v")).distinct().localCheckpoint(eager=True)
    fwd = None
    for step in (1, 7):
        part = (
            verts.select((F.col("v") + step).alias("dst"), F.col("v").alias("src"))
            .join(verts.select(F.col("v").alias("dst")), "dst")
        )
        fwd = part if fwd is None else fwd.unionByName(part)
    edges = (
        fwd.select("src", "dst")
        .unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .withColumn("w", (F.lit(1) + (F.col("src") + F.col("dst")) % 5).cast("long"))
        .localCheckpoint(eager=True)
    )
    seeds = verts.filter(F.col("v") % 100 == 0)
    dist = bounded_sssp(edges, seeds, rounds=4)
    return (
        dist.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("v").alias("sum_ids"),
            F.min("v").alias("min_id"),
            F.max("v").alias("max_id"),
        )
        .orderBy("dist")
    )
