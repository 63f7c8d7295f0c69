"""Connected components + cluster dedup (operators/cluster.py)."""

import pytest

from aqueducts_spark.operators.cluster import cluster_dedup, connected_components


@pytest.fixture()
def edges(spark):
    # two components: {1,2,3,4} (a chain) and {10,11}; 20-21-22 triangle
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def test_components_resolve_transitively(spark, edges):
    got = {
        (r.node, r.component) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_long_chain_converges(spark):
    n = 12  # diameter > a couple of propagation rounds
    chain = spark.createDataFrame([(i, i + 1) for i in range(n)], ["id_a", "id_b"])
    labels = connected_components(chain).collect()
    assert {r.component for r in labels} == {0}
    assert len(labels) == n + 1


def test_cluster_dedup_keeps_canonical(spark, edges):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in [1, 2, 3, 4, 10, 11, 20, 21, 22, 99]],
        ["doc_id", "text"],
    )
    kept = sorted(r.doc_id for r in cluster_dedup(docs, edges).collect())
    # one representative (min id) per cluster + untouched isolated doc 99
    assert kept == [1, 10, 20, 99]


def test_connected_components_raises_on_non_convergence(spark):
    from aqueducts_spark.operators.cluster import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="max_iter"):
        connected_components(chain, max_iter=2)
    ok = connected_components(chain, max_iter=30)
    assert ok.select("component").distinct().count() == 1
