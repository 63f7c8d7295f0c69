"""Property-based check of connected_components against a union-find
reference: on arbitrary small graphs the distributed min-label
propagation must produce exactly the same (node -> min reachable id)
map as a sequential union-find."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        for n in (u, v):
            parent.setdefault(n, n)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # fully compress so every node points at its root
    return {n: find(n) for n in parent}


edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_components_match_union_find(spark, edges):
    from aqueducts_spark.operators.cluster import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    assert got == _union_find_components(edges)
