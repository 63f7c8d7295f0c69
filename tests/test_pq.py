"""Product quantization ANN (operators/similarity.py::train_pq /
pq_encode / pq_topk).

Covers: encode bit-parity vs a pure-numpy reference, determinism,
partitioning independence of the top-k result, the pre-encoded
``code_col`` path, the exact re-rank tier (reranked cosines equal the
float cosines), recall vs brute force, dimension/parameter validation,
and plan shape (encode adds no shuffle or corpus exchange).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.similarity import (
    brute_force_topk,
    pq_encode,
    pq_topk,
    train_pq,
)


@pytest.fixture
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture
def books(emb):
    return train_pq(emb, n_subspaces=16, n_centroids=16)


@pytest.fixture
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_codebook_shape(books):
    assert len(books) == 16
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 4 for b in books for c in b)  # 64 / 16


def test_train_is_deterministic(emb):
    again = train_pq(emb, n_subspaces=16, n_centroids=16)
    assert again == train_pq(emb, n_subspaces=16, n_centroids=16)


def test_encode_matches_numpy_reference(emb, books):
    C = np.asarray(books, dtype=np.float64)
    M, _, dsub = C.shape
    cn2 = (C**2).sum(axis=2)
    rows = (
        pq_encode(emb, books)
        .select("vec_id", "embedding", "pq_code")
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    for r in rows:
        S = np.asarray(r["embedding"], dtype=np.float64).reshape(M, dsub)
        dots = np.einsum("md,mkd->mk", S, C)
        expect = (cn2 - 2.0 * dots).argmin(axis=1).tolist()
        assert r["pq_code"] == expect, r["vec_id"]


def test_codes_in_range_and_fixed_length(emb, books):
    out = pq_encode(emb, books).select("pq_code")
    bad = out.where(
        (F.size("pq_code") != 16)
        | F.exists("pq_code", lambda c: (c < 0) | (c >= 16))
    ).count()
    assert bad == 0


def test_topk_partitioning_independent(emb, queries, books):
    a = sorted(map(tuple, pq_topk(emb, queries, books, k=10).collect()))
    b = sorted(
        map(tuple, pq_topk(emb.repartition(13), queries, books, k=10).collect())
    )
    assert a == b


def test_code_col_path_matches_inline(emb, queries, books):
    coded = pq_encode(emb, books).select("vec_id", "pq_code")
    a = sorted(map(tuple, pq_topk(emb, queries, books, k=10).collect()))
    b = sorted(
        map(
            tuple,
            pq_topk(coded, queries, books, k=10, code_col="pq_code").collect(),
        )
    )
    assert a == b


def test_rerank_scores_are_exact_and_recall_high(emb, queries, books):
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    rer = pq_topk(emb, queries, books, k=10, rerank=100).collect()
    hits = [r for r in rer if (r["query_id"], r["neighbor_id"]) in exact]
    # reranked cosine IS the float cosine (same rounding as brute force)
    for r in hits:
        assert r["cosine"] == exact[(r["query_id"], r["neighbor_id"])]
    assert len(hits) / len(exact) >= 0.7


def test_pure_adc_recall_reasonable(emb, queries, books):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, queries, books, k=10).collect()
    }
    assert len(exact & adc) / len(exact) >= 0.3


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="divisible"):
        train_pq(emb, n_subspaces=7)


def test_rerank_lt_k_raises(emb, queries, books):
    with pytest.raises(ValueError, match="rerank"):
        pq_topk(emb, queries, books, k=10, rerank=5)


def test_rerank_without_floats_raises(emb, queries, books):
    coded = pq_encode(emb, books).select("vec_id", "pq_code")
    with pytest.raises(ValueError, match="float column"):
        pq_topk(coded, queries, books, k=10, code_col="pq_code", rerank=50)


def test_null_vectors_dropped(spark, books):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, None)],
        "vec_id long, embedding array<float>",
    )
    assert pq_encode(df, books).count() == 1


def test_encode_no_shuffle(emb, books):
    from aqueducts_spark.plans import inspect_plan

    info = inspect_plan(pq_encode(emb, books))
    assert info.exchanges == 0, f"{info.exchanges} exchanges\n{info.text[:1500]}"


def test_ivfpq_nprobe_all_equals_pure_pq(emb, queries, books):
    from aqueducts_spark.operators.similarity import ivfpq_topk

    # with nprobe == n_centroids the coarse quantizer prunes nothing,
    # so IVFPQ must equal the pure-PQ ADC scan exactly
    a = sorted(
        map(
            tuple,
            ivfpq_topk(
                emb, queries, k=10, n_centroids=8, nprobe=8, n_subspaces=16
            ).collect(),
        )
    )
    b = sorted(map(tuple, pq_topk(emb, queries, books, k=10).collect()))
    assert a == b


def test_ivfpq_partitioning_independent_and_recall(emb, queries):
    from aqueducts_spark.operators.similarity import ivfpq_topk

    res = ivfpq_topk(
        emb, queries, k=10, n_centroids=8, nprobe=4, n_subspaces=16, rerank=100
    )
    rows = res.collect()
    res2 = ivfpq_topk(
        emb.repartition(7),
        queries,
        k=10,
        n_centroids=8,
        nprobe=4,
        n_subspaces=16,
        rerank=100,
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, res2.collect()))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    # nprobe=4 of 8 clusters: same floor the sim_ivf_topk gate pins
    assert len(exact & got) / len(exact) >= 0.5


def test_pq_persist_roundtrip_equals_in_memory(emb, queries, tmp_path):
    from aqueducts_spark.operators.similarity import (
        ivfpq_topk,
        ivfpq_topk_persisted,
        pq_persist,
        train_ivf_centroids,
        train_pq,
    )

    spark = emb.sparkSession
    cents = train_ivf_centroids(emb, n_centroids=8)
    books = train_pq(emb, n_subspaces=16, n_centroids=16)
    pq_persist(emb, str(tmp_path / "idx"), centroids=cents, codebooks=books)
    for rer in (None, 50):
        per = ivfpq_topk_persisted(
            spark, str(tmp_path / "idx"), queries, k=10, nprobe=4, rerank=rer
        )
        inm = ivfpq_topk(
            emb,
            queries,
            k=10,
            n_centroids=8,
            nprobe=4,
            n_subspaces=16,
            rerank=rer,
            centroids=cents,
            codebooks=books,
        )
        assert sorted(map(tuple, per.collect())) == sorted(
            map(tuple, inm.collect())
        ), rer
    # the probe filter reaches the codes scan as a partition filter
    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan


def test_pq_persist_codes_only_rerank_raises(emb, queries, tmp_path):
    from aqueducts_spark.operators.similarity import (
        ivfpq_topk_persisted,
        pq_persist,
    )

    spark = emb.sparkSession
    pq_persist(
        emb,
        str(tmp_path / "idx2"),
        n_centroids=8,
        n_subspaces=16,
        store_floats=False,
    )
    with pytest.raises(ValueError, match="floats"):
        ivfpq_topk_persisted(
            spark, str(tmp_path / "idx2"), queries, k=10, rerank=50
        ).collect()


def test_ivfpq_prunes_scan(emb, queries):
    from aqueducts_spark.operators.similarity import (
        ivfpq_topk,
        train_ivf_centroids,
    )

    # nprobe=1 with identical queries: only the probed clusters' rows
    # can appear as neighbours
    cents = train_ivf_centroids(emb, n_centroids=8)
    one = ivfpq_topk(
        emb, queries, k=10, nprobe=1, n_subspaces=16, centroids=cents
    )
    from aqueducts_spark.operators.similarity import ivf_assign

    assigned = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(emb, cents, out_col="cid")
        .select("vec_id", "cid")
        .collect()
    }
    qprobe = {
        r["vec_id"]: assigned[r["vec_id"]]
        for r in queries.select(F.col("query_id").alias("vec_id")).collect()
    }
    for r in one.collect():
        assert assigned[r["neighbor_id"]] == qprobe[r["query_id"]]


def test_null_component_raises(spark):
    # None -> NaN under np.array: train_pq would poison every centroid
    # mean, pq_encode's argmin would return code 0 silently — all now
    # fail loudly instead
    from aqueducts_spark.operators.similarity import pq_encode, train_pq

    clean = spark.createDataFrame(
        [(i, [float(i), 1.0 - i, 0.5 * i, 2.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    small_books = train_pq(clean, n_subspaces=2, n_centroids=2)
    bad = spark.createDataFrame(
        [(1, [0.1, None, 0.2, 0.3]), (2, [0.4, 0.5, 0.6, 0.7])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        train_pq(bad, n_subspaces=2, n_centroids=2)
    with pytest.raises(Exception) as exc:
        pq_encode(bad, small_books).collect()
    assert "NULL/NaN" in str(exc.value)


def test_shared_sample_matches_own_draw(emb):
    # ivfpq_topk/pq_persist collect ONE hash-rank sample for both
    # quantizers; handing the trainers that shared matrix must give
    # bit-identical indexes to each trainer drawing for itself
    from aqueducts_spark.operators.similarity import (
        _hash_rank_sample,
        train_ivf_centroids,
        train_pq,
    )

    X = _hash_rank_sample(emb, "embedding", 4096, "test")
    assert train_ivf_centroids(emb, n_centroids=4) == train_ivf_centroids(
        emb, n_centroids=4, sample=X
    )
    assert train_pq(emb, n_subspaces=2, n_centroids=4) == train_pq(
        emb, n_subspaces=2, n_centroids=4, sample=X
    )


def test_encode_out_col_clash_rejected(emb, books):
    coded = pq_encode(emb, books, out_col="pq_code")
    with pytest.raises(ValueError, match="already exists"):
        pq_encode(coded, books, out_col="pq_code")
    # the internal '__pq' name used by pq_topk is covered by the same
    # guard: an input already carrying it raises instead of being
    # silently overwritten
    with pytest.raises(ValueError, match="already exists"):
        pq_encode(coded.withColumnRenamed("pq_code", "__pq"), books,
                  out_col="__pq")


# ---------------------------------------------------------------------------
# Residual PQ (by_residual=True, the FAISS IndexIVFPQ default)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered(spark):
    """Planted clustered corpus: strong coarse structure makes the
    residual-vs-raw recall gap visible (residuals are near-isotropic,
    raw vectors waste the code budget re-describing the centroid)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        v = centers[i % 8] + 0.15 * rng.normal(size=32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, qs


def _recall(spark, got, truth):
    t = {(r["query_id"], r["neighbor_id"]) for r in truth}
    g = {(r["query_id"], r["neighbor_id"]) for r in got}
    return len(t & g) / len(t)


def test_residual_encode_matches_numpy_reference(clustered):
    from aqueducts_spark.operators.similarity import (
        _coarse_residuals,
        ivf_assign,
        train_ivf_centroids,
        train_pq_residual,
    )

    emb, _ = clustered
    cents = train_ivf_centroids(emb, n_centroids=8, seed=3)
    books = train_pq_residual(emb, cents, n_subspaces=8, n_centroids=16, seed=3)
    assigned = ivf_assign(emb, cents, out_col="cid")
    coded = {
        r.vec_id: (r.cid, r.pq_code)
        for r in pq_encode(
            assigned, books, coarse_centroids=cents, cid_col="cid"
        ).collect()
    }
    X = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    assign_ref, R = _coarse_residuals(X, cents)
    C = np.asarray(books, dtype=np.float64)
    M, K, dsub = C.shape
    for i, vid in enumerate(sorted(coded)):
        cid, code = coded[vid]
        assert cid == assign_ref[i]
        S = R[i].reshape(M, dsub)
        want = [
            int(((C[m] - S[m]) ** 2).sum(axis=1).argmin()) for m in range(M)
        ]
        assert list(code) == want, vid


def test_residual_recall_geq_raw(clustered):
    from aqueducts_spark.operators.similarity import ivfpq_topk

    emb, qs = clustered
    truth = brute_force_topk(emb, qs, k=10).collect()
    kw = dict(
        k=10, n_centroids=8, nprobe=8, n_subspaces=8, n_pq_centroids=16, seed=3
    )
    raw = ivfpq_topk(emb, qs, by_residual=False, **kw).collect()
    res = ivfpq_topk(emb, qs, by_residual=True, **kw).collect()
    spark = emb.sparkSession
    r_raw = _recall(spark, raw, truth)
    r_res = _recall(spark, res, truth)
    assert r_res >= r_raw, (r_res, r_raw)
    assert r_res >= 0.6, r_res


def test_residual_persisted_roundtrip(clustered, tmp_path):
    from aqueducts_spark.operators.similarity import (
        ivfpq_topk,
        ivfpq_topk_persisted,
        pq_persist,
    )

    emb, qs = clustered
    path = str(tmp_path / "res_idx")
    cents, books = pq_persist(
        emb, path, n_centroids=8, n_subspaces=8, n_pq_centroids=16,
        seed=3, by_residual=True,
    )
    spark = emb.sparkSession
    per = ivfpq_topk_persisted(spark, path, qs, k=5, nprobe=3).collect()
    inm = ivfpq_topk(
        emb, qs, k=5, n_centroids=8, nprobe=3, centroids=cents,
        codebooks=books, by_residual=True,
    ).collect()
    assert sorted(map(tuple, per)) == sorted(map(tuple, inm))


def test_residual_mode_validation(emb, books, clustered):
    from aqueducts_spark.operators.similarity import train_ivf_centroids

    c_emb, _ = clustered
    cents = train_ivf_centroids(c_emb, n_centroids=8, seed=3)
    with pytest.raises(ValueError, match="together"):
        pq_encode(c_emb, books, coarse_centroids=cents)
    with pytest.raises(ValueError, match="cid_col"):
        pq_encode(c_emb, books, coarse_centroids=cents, cid_col="nope")


def test_persisted_meta_corruption_raises_instead_of_guessing(clustered, tmp_path):
    from aqueducts_spark.operators.similarity import (
        ivfpq_topk_persisted,
        pq_persist,
    )

    emb, qs = clustered
    spark = emb.sparkSession
    path = str(tmp_path / "res_idx2")
    pq_persist(
        emb, path, n_centroids=8, n_subspaces=8, n_pq_centroids=16,
        seed=3, by_residual=True,
    )
    # corrupt the meta: NULL flag must raise loudly, never guess raw
    spark.createDataFrame(
        [(None,)], "by_residual boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="corrupt index meta"):
        ivfpq_topk_persisted(spark, path, qs, k=5, nprobe=3).collect()
    # absent meta (legacy layout) still defaults to raw and runs
    import shutil

    shutil.rmtree(f"{path}/meta")
    got = ivfpq_topk_persisted(spark, path, qs, k=5, nprobe=3)
    assert got.count() > 0  # raw-mode scoring of a residual index is
    # wrong but LEGACY-COMPATIBLE by contract; the flag exists so new
    # indexes never hit this — absence is the one documented default


def test_residual_adc_scores_match_numpy_reconstruction(clustered):
    """The residual ADC cosine must equal cos(q, c + r̃) computed by
    straight numpy reconstruction — pins the three-table decomposition
    (q·c + LUT sums over |c|² + 2c·r̃ + |r̃|²), not just recall."""
    from aqueducts_spark.operators.similarity import (
        ivf_assign,
        ivfpq_topk,
        train_ivf_centroids,
        train_pq_residual,
    )

    emb, qs = clustered
    cents = train_ivf_centroids(emb, n_centroids=8, seed=3)
    books = train_pq_residual(emb, cents, n_subspaces=8, n_centroids=16, seed=3)
    got = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ivfpq_topk(
            emb, qs, k=10, n_centroids=8, nprobe=8,
            centroids=cents, codebooks=books, by_residual=True,
        ).collect()
    }
    # numpy reconstruction of every corpus vector from (cid, codes)
    C = np.asarray(books, dtype=np.float64)
    M, K, dsub = C.shape
    Co = np.asarray(cents, dtype=np.float64)
    assigned = {r.vec_id: r.cid for r in ivf_assign(emb, cents, out_col="cid").collect()}
    coded = {
        r.vec_id: r.pq_code
        for r in pq_encode(
            ivf_assign(emb, cents, out_col="cid"), books,
            coarse_centroids=cents, cid_col="cid",
        ).collect()
    }
    Q = {r.query_id: np.asarray(r.embedding) for r in qs.collect()}
    for (qid, nid), cos in got.items():
        code = np.asarray(coded[nid], dtype=np.int64)
        recon = Co[assigned[nid]] + np.concatenate(
            [C[m][code[m]] for m in range(M)]
        )
        q = Q[qid]
        want = float(q @ recon / (np.linalg.norm(q) * np.linalg.norm(recon)))
        # the operator rounds returned cosines to 4dp (_topk_per_query)
        assert abs(cos - want) < 5.1e-5, (qid, nid, cos, want)


def test_pq_topk_auto_rerank_scales_and_caps(spark):
    """rerank='auto' resolves to max(10k, frac*n) and raises past the
    cap with the ivfpq pointer instead of silently degrading recall."""
    import numpy as np
    import pytest as _pytest

    from aqueducts_spark.operators.similarity import pq_topk, train_pq

    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(16).round(4).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.limit(2).selectExpr("vec_id AS query_id", "embedding")
    books = train_pq(df, n_subspaces=4, n_centroids=8)
    # auto at n=400, k=5 -> max(50, ceil(0.05*400)=20) = 50
    out = pq_topk(df, queries, books, k=5, rerank="auto")
    assert out.groupBy("query_id").count().collect()[0]["count"] == 5
    with _pytest.raises(ValueError, match="ivfpq_topk"):
        pq_topk(df, queries, books, k=5, rerank="auto", max_rerank=40)
    with _pytest.raises(ValueError, match="rerank must be"):
        pq_topk(df, queries, books, k=5, rerank="lots")


def test_pq_topk_tolerates_preexisting_pq_column(emb, queries, books):
    """r8 (VERDICT #7): pq_topk/ivfpq_topk encode into a FRESH internal
    column, so an input already carrying '__pq' (e.g. a previously
    encoded corpus column the caller kept around) must not trip
    pq_encode's overwrite guard — and must not change results."""
    from aqueducts_spark.operators.similarity import ivfpq_topk, pq_topk

    tainted = emb.withColumn("__pq", F.lit("decoy")).withColumn(
        "__cid", F.lit(-1)
    )
    base = sorted(
        map(tuple, pq_topk(emb, queries, k=5, codebooks=books).collect())
    )
    got = sorted(
        map(tuple, pq_topk(tainted, queries, k=5, codebooks=books).collect())
    )
    assert got == base

    base2 = sorted(
        map(
            tuple,
            ivfpq_topk(
                emb, queries, k=5, n_centroids=8, nprobe=8, codebooks=books
            ).collect(),
        )
    )
    got2 = sorted(
        map(
            tuple,
            ivfpq_topk(
                tainted, queries, k=5, n_centroids=8, nprobe=8, codebooks=books
            ).collect(),
        )
    )
    assert got2 == base2
