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


def test_fuzzy_dedup_end_to_end(spark):
    from aqueducts_spark.operators.dedup import fuzzy_dedup

    # 40 shared tokens -> J(1,3) ~ 0.97: high enough that the fixed-seed
    # 16-hash/4-band sketch catches the pair deterministically
    base = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, base + " tail"),  # near dup of 1/2 (shares most shingles)
            (4, "completely different words about spark pipelines at scale"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(r.doc_id for r in fuzzy_dedup(docs).collect())
    # cluster {1,2,3} keeps min id 1; isolated 4 passes through
    assert kept == [1, 4]


def test_fuzzy_dedup_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    spark.createDataFrame(
        [(1, base), (2, base), (7, "unrelated text entirely")],
        ["doc_id", "text"],
    ).createOrReplaceTempView("fuzzy_docs")
    out = run_operator(
        spark, {"type": "fuzzy_dedup", "input": "fuzzy_docs", "options": {}}
    )
    assert sorted(r.doc_id for r in out.collect()) == [1, 7]
    spark.catalog.dropTempView("fuzzy_docs")


def test_connected_components_raises_on_non_convergence(spark):
    from aqueducts_spark.operators.cluster import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    # driver_edges=0 forces the distributed propagation loop — the
    # max_iter contract is a loop-path property (union-find has no
    # diameter limit)
    with pytest.raises(RuntimeError, match="max_iter"):
        connected_components(chain, max_iter=2, driver_edges=0)
    ok = connected_components(chain, max_iter=30, driver_edges=0)
    assert ok.select("component").distinct().count() == 1
    # the default bounded path resolves the same chain with no
    # iteration limit at all
    uf = connected_components(chain, max_iter=2)
    assert uf.select("component").distinct().count() == 1


def test_cluster_dedup_keep_by_quality(spark):
    """keep_by keeps the best-scored member per duplicate cluster
    instead of the minimum id; NULL scores lose to scored members;
    exact ties break to the minimum id."""
    from aqueducts_spark.operators.cluster import cluster_dedup

    df = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.9),      # cluster {1,2,3}: 2 wins (tie 2/3 -> min id)
            (4, None), (5, 0.1),               # cluster {4,5}: 5 wins (NULL last)
            (6, 0.5),                          # singleton passes through
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id
        for r in cluster_dedup(df, pairs, keep_by="quality").collect()
    )
    assert kept == [2, 5, 6]
    # ascending keeps the LOWEST score
    low = sorted(
        r.doc_id
        for r in cluster_dedup(
            df, pairs, keep_by="quality", descending=False
        ).collect()
    )
    assert low == [1, 5, 6]  # NULL still sorts last even ascending
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_by"):
        cluster_dedup(df, pairs, keep_by="nope")


def test_fuzzy_dedup_keep_by_passthrough(spark):
    from aqueducts_spark.operators.dedup import fuzzy_dedup

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", 0.1),
            (2, "the quick brown fox jumps over the lazy dog today", 0.9),
            (3, "completely different text about engines and pipelines", 0.5),
        ],
        "doc_id long, text string, quality double",
    )
    kept = sorted(
        r.doc_id for r in fuzzy_dedup(df, keep_by="quality").collect()
    )
    assert kept == [2, 3]
    default = sorted(r.doc_id for r in fuzzy_dedup(df).collect())
    assert default == [1, 3]


def test_cluster_dedup_keep_by_tolerates_duplicate_ids(spark):
    """An id with duplicate rows must rank once per cluster (by its
    best score) — not once per row, which would push the winner's own
    second row into the drop set and delete the whole cluster."""
    from aqueducts_spark.operators.cluster import cluster_dedup

    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.9), (2, 0.1)], "doc_id long, quality double"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    kept = sorted(
        r.doc_id for r in cluster_dedup(df, pairs, keep_by="quality").collect()
    )
    assert kept == [1, 1]  # both rows of the winning id survive
    # validation raises BEFORE any component computation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_by"):
        cluster_dedup(df, pairs, keep_by="qualty")


def test_temperature_weights_cardinality_guard(spark):
    from aqueducts_spark.operators.mixing import temperature_weights

    df = spark.createDataFrame(
        [(f"g{i}", i) for i in range(30)], "source string, doc_id long"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct"):
        temperature_weights(df, "source", max_groups=10)
    assert len(temperature_weights(df, "source", max_groups=30)) == 30


def test_cluster_dedup_keeps_survivor_when_canonical_filtered_out(spark):
    """pairs built BEFORE an upstream filter removed the cluster's
    min-id member: one representative must still survive (previously
    the whole cluster vanished)."""
    from aqueducts_spark.operators.cluster import cluster_dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    df = spark.createDataFrame(  # doc 1 was quality-filtered upstream
        [(2, "b"), (3, "c"), (9, "solo")], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in cluster_dedup(df, pairs).collect())
    assert kept == [2, 9]  # min PRESENT member of {2,3} plus the solo


def test_connected_components_converges_at_exact_diameter(spark):
    """A chain whose diameter equals max_iter converges in exactly
    max_iter changing rounds; the confirmation round must accept it
    instead of raising."""
    from aqueducts_spark.operators.cluster import connected_components

    # chain 0-1-2-3: label 0 reaches node 3 in 3 rounds (diameter 3)
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    labels = {
        r.node: r.component
        for r in connected_components(pairs, max_iter=3, driver_edges=0).collect()
    }
    assert set(labels.values()) == {0}


def test_union_find_path_matches_propagation_loop(spark):
    """r11: the bounded driver-side union-find must emit exactly the
    propagation loop's (node, min reachable id) rows — cliques, chains,
    isolated pairs, self-loops, and string ids."""
    from aqueducts_spark.operators.cluster import connected_components

    cases = [
        ([(1, 2), (2, 3), (10, 11), (7, 7)], "id_a long, id_b long"),
        ([("b", "a"), ("c", "b"), ("z", "z"), ("é", "e")],
         "id_a string, id_b string"),
    ]
    for rows, schema in cases:
        edges = spark.createDataFrame(rows, schema)
        uf = sorted(
            (r.node, r.component)
            for r in connected_components(edges).collect()
        )
        loop = sorted(
            (r.node, r.component)
            for r in connected_components(edges, driver_edges=0).collect()
        )
        assert uf == loop and uf
