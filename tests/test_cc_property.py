"""Property-based check for connected_components: on ARBITRARY random
graphs — including the chain/tree shapes the fixture dedup corpus never
produces — both strategies must agree with a plain union-find reference.

This is the pin the oracle can't provide: q73/q87's recursive-closure
oracle only sees the fixture's clique-shaped pair relation; hypothesis
drives edge lists with long paths, stars, disconnected singletons and
merged components, where the min-label round count and the star
reattachment logic actually get exercised.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components


def union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = component minimum (the operator's contract)
    out: dict[int, int] = {}
    comp_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    for v in parent:
        out[v] = comp_min[find(v)]
    return out


# chains appear naturally: ids are drawn from a small range, so sampled
# pairs frequently link into long paths rather than cliques
edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=40)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_lists)
def test_both_strategies_match_union_find(spark, edges):
    expected = union_find_labels(edges)
    # self-loop-only inputs still register the vertex (it appears in pairs)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    for strategy in ("min_label", "star"):
        got = {
            r.vertex: r.cluster_id
            for r in connected_components(pairs, "id_a", "id_b", strategy=strategy, max_iterations=60).collect()
        }
        assert got == expected, f"{strategy}: {got} != {expected} for edges {edges}"


def test_empty_pairs_converge_immediately(spark):
    """Empty pair relation: the observed convergence probe sees a NULL
    aggregate (sum/bit_xor over zero rows) — both strategies must treat
    that as converged-empty, not loop to the iteration guard (r14: the
    probe rides the checkpoint job as an observed metric)."""
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    for strategy in ("min_label", "star"):
        info: dict = {}
        got = connected_components(pairs, "id_a", "id_b", strategy=strategy, max_iterations=3, info=info).collect()
        assert got == []
        assert info["rounds"] == 1, f"{strategy} must converge on the first probe"


def test_explicit_chain_exercises_multiple_rounds(spark):
    """A 24-vertex path: min-label needs many rounds (diameter-bound),
    star stays O(log^2 n); both must produce one component labeled 0."""
    edges = [(i, i + 1) for i in range(23)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    for strategy in ("min_label", "star"):
        info: dict = {}
        got = {
            r.vertex: r.cluster_id
            for r in connected_components(pairs, "id_a", "id_b", strategy=strategy, max_iterations=60, info=info).collect()
        }
        assert got == {v: 0 for v in range(24)}
        assert info["rounds"] >= 2  # neither converges instantly on a chain
