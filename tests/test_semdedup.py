"""SemDeDup (Abbas et al. 2023): semantic dedup via embedding clusters
(operators/dedup.py::semantic_dedup)."""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.dedup import semantic_dedup

# two well-separated directions with near-duplicate groups around each,
# plus singletons: the clusterer must separate the directions and the
# within-cluster threshold must merge only the near-identical vectors
VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.999, 0.01, 0.0, 0.0]),     # near-dup of 1
    (3, [0.998, 0.02, 0.0, 0.0]),     # near-dup of 1/2
    (4, [0.0, 0.0, 1.0, 0.0]),
    (5, [0.0, 0.01, 0.999, 0.0]),     # near-dup of 4
    (6, [0.7, 0.7, 0.0, 0.0]),        # same half-space as 1, not a dup
    (7, [0.0, 0.0, 0.7, 0.7]),        # same half-space as 4, not a dup
]
SCHEMA = "vec_id long, embedding array<double>"


def _dedup(spark, rows=VECS, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    kw.setdefault("n_clusters", 2)
    kw.setdefault("threshold", 0.99)
    return semantic_dedup(df, **kw)


def test_semantic_dedup_collapses_near_dup_groups(spark):
    kept = sorted(r.vec_id for r in _dedup(spark).collect())
    # one survivor per near-dup group; singletons untouched
    assert len(kept) == 4
    assert 6 in kept and 7 in kept
    assert len({1, 2, 3} & set(kept)) == 1
    assert len({4, 5} & set(kept)) == 1


def test_semantic_dedup_keeps_lowest_centroid_similarity(spark):
    """The paper keeps the group member FARTHEST from its centroid
    (lowest cosine) — the diversity-preserving representative."""
    import numpy as np

    from aqueducts_spark.operators.similarity import train_ivf_centroids

    spark_df = spark.createDataFrame(VECS, SCHEMA)
    cents = np.array(
        train_ivf_centroids(spark_df, "embedding", n_centroids=2, seed=42)
    )
    kept = {r.vec_id for r in _dedup(spark).collect()}
    by_id = {i: np.array(v) for i, v in VECS}
    for group in ({1, 2, 3}, {4, 5}):
        def ccos(i):
            v = by_id[i] / np.linalg.norm(by_id[i])
            return max(float(v @ c) for c in cents)
        farthest = min(sorted(group), key=lambda i: (ccos(i), i))
        assert group & kept == {farthest}


def test_semantic_dedup_quantized_pair_join_agrees_with_float(spark):
    """VERDICT r5 next-steps #5: quantize=True runs the within-cluster
    pair join on int8 payloads (~8x smaller shuffle).  On the synthetic
    groups AND the real embeddings table the kept set must match the
    float pairing exactly — int8 cosine error (<= scale/2 per
    component) is far below the gap between near-dup (>0.99) and
    non-dup (<0.8) similarities, the same accuracy argument
    quantized_topk pins with its recall bar."""
    kept_f = sorted(r.vec_id for r in _dedup(spark).collect())
    kept_q = sorted(r.vec_id for r in _dedup(spark, quantize=True).collect())
    assert kept_f == kept_q
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    f = sorted(
        r.vec_id
        for r in semantic_dedup(df, n_clusters=8, threshold=0.999).collect()
    )
    q = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, n_clusters=8, threshold=0.999, quantize=True
        ).collect()
    )
    assert f == q


def test_semantic_dedup_quantized_handles_zero_and_null_vectors(spark):
    rows = VECS + [(8, [0.0, 0.0, 0.0, 0.0]), (9, None)]
    kept = sorted(
        r.vec_id for r in _dedup(spark, rows=rows, quantize=True).collect()
    )
    # zero vector quantizes to zeros (scale 0), cosine guard keeps it;
    # NULL embedding passes through untouched
    assert 8 in kept and 9 in kept


def test_semantic_dedup_deterministic(spark):
    a = sorted(r.vec_id for r in _dedup(spark).collect())
    b = sorted(r.vec_id for r in _dedup(spark).collect())
    assert a == b


def test_semantic_dedup_null_embeddings_pass_through(spark):
    rows = VECS + [(99, None)]
    kept = sorted(
        r.vec_id for r in _dedup(spark, rows=rows).collect()
    )
    assert 99 in kept


def test_semantic_dedup_no_dups_returns_everything(spark):
    rows = [(i, v) for i, v in VECS if i in (1, 4, 6, 7)]
    kept = sorted(r.vec_id for r in _dedup(spark, rows=rows).collect())
    assert kept == [1, 4, 6, 7]


def test_semantic_dedup_threshold_validated(spark):
    with pytest.raises(ValueError, match="threshold"):
        _dedup(spark, threshold=1.5)


def test_semantic_dedup_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(VECS, SCHEMA).createOrReplaceTempView("sem_vecs")
    out = run_operator(
        spark,
        {
            "type": "semantic_dedup",
            "input": "sem_vecs",
            "options": {"n_clusters": 2, "threshold": 0.99},
        },
    )
    assert out.count() == 4
    assert set(out.columns) == {"vec_id", "embedding"}
    spark.catalog.dropTempView("sem_vecs")


def test_semantic_dedup_on_real_embeddings_table(spark):
    """Smoke at testdata scale: output is a subset, deduped count is
    sane, and re-running is stable."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(df, n_clusters=8, threshold=0.999)
    n_in, n_out = df.count(), out.count()
    assert 0 < n_out <= n_in
    assert out.count() == n_out  # deterministic re-execution

def test_semantic_dedup_default_n_clusters_scales_sqrt_n(spark):
    """Leaving n_clusters unset derives ~sqrt(N) clusters instead of a
    fixed small count (the quadratic-join footgun at corpus scale) and
    still dedups correctly on a small frame."""
    df = spark.createDataFrame(VECS, SCHEMA)
    kept = sorted(
        r.vec_id for r in semantic_dedup(df, threshold=0.99).collect()
    )
    # with ~sqrt(7)+1=3 clusters the near-dup groups still collapse
    assert len({1, 2, 3} & set(kept)) == 1
    assert len({4, 5} & set(kept)) == 1


def test_semantic_dedup_max_cluster_size_caps_pairing(spark):
    """Clusters above the cap contribute no pairs: their members all
    survive (recall-only trade-off, mirroring the LSH bucket cap)."""
    df = spark.createDataFrame(VECS, SCHEMA)
    # cap of 1 disables every within-cluster pair -> nothing dropped
    kept = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, n_clusters=2, threshold=0.99, max_cluster_size=1
        ).collect()
    )
    assert kept == [1, 2, 3, 4, 5, 6, 7]
    # explicit None disables the cap -> normal dedup
    kept2 = semantic_dedup(
        df, n_clusters=2, threshold=0.99, max_cluster_size=None
    ).count()
    assert kept2 == 4


def test_semantic_dedup_helper_names_collision_guarded(spark):
    """A frame already carrying __cid / __centroid columns must not
    fail analysis or lose its columns."""
    df = spark.createDataFrame(
        [(i, v, f"m{i}", i) for i, v in VECS],
        "vec_id long, embedding array<double>, __cid string, __centroid long",
    )
    out = semantic_dedup(df, n_clusters=2, threshold=0.99)
    assert set(out.columns) == {"vec_id", "embedding", "__cid", "__centroid"}
    kept = sorted(r.vec_id for r in out.collect())
    assert len(kept) == 4


def test_semantic_dedup_registry_cluster_options(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(VECS, SCHEMA).createOrReplaceTempView("sem_vecs2")
    # max_cluster_size: 1 -> pairing disabled, everything kept
    out = run_operator(
        spark,
        {
            "type": "semantic_dedup",
            "input": "sem_vecs2",
            "options": {
                "n_clusters": 2, "threshold": 0.99, "max_cluster_size": 1,
            },
        },
    )
    assert out.count() == len(VECS)
    # omitted n_clusters -> derived default still works through the stage
    out2 = run_operator(
        spark,
        {
            "type": "semantic_dedup",
            "input": "sem_vecs2",
            "options": {"threshold": 0.99},
        },
    )
    assert 0 < out2.count() <= len(VECS)
    spark.catalog.dropTempView("sem_vecs2")


def test_semantic_dedup_null_component_raises(spark):
    # a NULL *component* (vs a NULL vector, which passes through) is
    # data corruption for embedding geometry: before the guard it got
    # an arbitrary centroid (NaN dots -> argmax 0) and, under
    # quantize=True, became +127 (least/greatest skip NULLs) — now the
    # centroid scorer fails loudly in BOTH modes
    rows = VECS + [(42, [0.5, None, 0.0, 0.0])]
    for kw in ({}, {"quantize": True}):
        with pytest.raises(Exception) as exc:
            _dedup(spark, rows=rows, **kw).collect()
        assert "NULL/NaN components" in str(exc.value)
