"""Embedding operators (operators/embedding.py).

Covers: int8 quantization semantics (reconstruction error bound,
zero-vector, clamp range), centroid exactness vs a NumPy reference in
micro-units, parallelism invariance of both, and the declarative
registry stages.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.embedding import label_centroids, quantize_embeddings

VECS = [
    (1, [0.5, -1.0, 0.25, 0.0], 7),
    (2, [0.0, 0.0, 0.0, 0.0], 7),
    (3, [2.0, 1.0, -2.0, 0.125], 9),
    (4, [-0.3, 0.7, 0.9, -0.9], 9),
]


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>, label int"
    )


def test_quantize_reconstruction_and_range(spark, toy):
    rows = {r["vec_id"]: r for r in quantize_embeddings(toy).collect()}
    for vec_id, emb, _ in VECS:
        r = rows[vec_id]
        assert r["dim"] == len(emb)
        maxabs = max(abs(v) for v in emb)
        if maxabs == 0:
            assert r["scale"] == 0.0 and r["qvec"] == [0, 0, 0, 0]
            continue
        assert r["scale"] == pytest.approx(maxabs / 127.0)
        for orig, q in zip(emb, r["qvec"]):
            assert -127 <= q <= 127
            assert abs(q * r["scale"] - orig) <= r["scale"] / 2 + 1e-12
        # the max-magnitude component always hits full scale
        assert 127 in [abs(q) for q in r["qvec"]]


def test_centroids_match_numpy_micro_units(spark, toy):
    got = {
        (r["label"], r["dim"]): r
        for r in label_centroids(toy).collect()
    }
    by_label = {}
    for _, emb, label in VECS:
        by_label.setdefault(label, []).append(emb)
    for label, vecs in by_label.items():
        # the column is float32: truncate literals to float32 first,
        # then widen — exactly what the engine's cast chain does
        micro = np.floor(
            np.array(vecs, dtype=np.float32).astype(np.float64) * 1e6
        ).astype(np.int64)
        for d in range(micro.shape[1]):
            r = got[(label, d)]
            assert r["n_vectors"] == len(vecs)
            assert r["sum_micro"] == int(micro[:, d].sum())
            assert r["centroid"] == pytest.approx(
                micro[:, d].sum() / (len(vecs) * 1e6)
            )


def test_parallelism_invariance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for fn in (quantize_embeddings, label_centroids):
        one = sorted(map(tuple, fn(emb.coalesce(1)).collect()))
        many = sorted(map(tuple, fn(emb.repartition(7)).collect()))
        assert one == many, fn.__name__


def test_quantize_plan_has_no_shuffle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_registry_stages(spark, sf_dir, tmp_path):
    from aqueducts_spark import load_pipeline_str, run_pipeline

    yml = f"""
version: "v2"
sources:
  - type: file
    name: embeddings
    format: {{ type: parquet }}
    location: {sf_dir}/embeddings.parquet
stages:
  - - name: quantized
      operator:
        type: quantize_embeddings
        input: embeddings
  - - name: centroids
      operator:
        type: label_centroids
        input: embeddings
  - - name: summary
      query: >
        SELECT (SELECT COUNT(*) FROM quantized) AS n_q,
               (SELECT COUNT(DISTINCT label) FROM centroids) AS n_labels
destination:
  type: file
  name: out
  format: {{ type: parquet }}
  location: {tmp_path}/out
"""
    run_pipeline(spark, load_pipeline_str(yml))
    row = spark.read.parquet(f"{tmp_path}/out").collect()[0]
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert row["n_q"] == n_emb and row["n_labels"] >= 1


class TestLinearProbe:
    def test_exact_fixed_point_scoring(self, spark):
        from aqueducts_spark.operators.embedding import linear_probe_score

        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [0.5, -0.5])],
            "vec_id long, embedding array<double>",
        )
        out = {r.vec_id: r for r in linear_probe_score(
            df, weights=[0.5, 1.0], bias=0.25, threshold=1.0
        ).collect()}
        # row 1: 1000*500 + 2000*1000 + 250000 = 2_750_000 micro = 2.75
        assert out[1].score_micro == 2_750_000 and out[1].score == 2.75
        assert out[1].keep is True
        # row 2: 500*500 + (-500)*1000 + 250000 = 0.0
        assert out[2].score_micro == 0 and out[2].keep is False

    def test_null_components_contribute_zero(self, spark):
        from aqueducts_spark.operators.embedding import linear_probe_score

        df = spark.createDataFrame(
            [(1, [1.0, None, 3.0])], "vec_id long, embedding array<double>"
        )
        out = linear_probe_score(df, weights=[1.0, 100.0, 1.0]).collect()[0]
        assert out.score_micro == 1000 * 1000 + 3000 * 1000

    def test_short_vector_raises_dim_mismatch(self, spark):
        # r7 hardening: a shorter vector is a WRONG-MODEL error, not
        # missing evidence — a silent partial dot product would score a
        # 384-d corpus with a 768-d probe plausibly-but-meaninglessly
        from aqueducts_spark.operators.embedding import linear_probe_score

        df = spark.createDataFrame(
            [(1, [2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="vector dim"):
            linear_probe_score(df, weights=[1.0, 50.0]).collect()

    def test_empty_weights_rejected(self, spark):
        from aqueducts_spark.operators.embedding import linear_probe_score

        with pytest.raises(ValueError, match="non-empty"):
            linear_probe_score(spark.range(1), weights=[])

    def test_registry_stage(self, spark):
        from aqueducts_spark.operators.registry import OperatorError, run_operator

        spark.createDataFrame(
            [(1, [1.0, 1.0])], "vec_id long, embedding array<double>"
        ).createOrReplaceTempView("probe_in")
        out = run_operator(
            spark,
            {"type": "linear_probe", "input": "probe_in",
             "options": {"weights": [1.0, 2.0], "threshold": 2.9}},
        ).collect()[0]
        assert out.score == 3.0 and out.keep is True
        with pytest.raises(OperatorError, match="weights"):
            run_operator(spark, {"type": "linear_probe", "input": "probe_in"})
        spark.catalog.dropTempView("probe_in")

    def test_zero_shuffle_plan(self, spark):
        from aqueducts_spark.operators.embedding import linear_probe_score
        from aqueducts_spark.plans.inspect import inspect_plan

        df = spark.createDataFrame(
            [(1, [1.0, 1.0])], "vec_id long, embedding array<double>"
        )
        info = inspect_plan(linear_probe_score(df, weights=[1.0, 2.0]))
        assert info.exchanges == 0 and info.python_evals == 0


def test_linear_probe_dim_mismatch_raises(spark):
    from aqueducts_spark.operators.embedding import linear_probe_score

    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="vector dim"):
        linear_probe_score(df, weights=[1.0, 2.0, 3.0]).collect()
    # matching dim still scores
    ok = linear_probe_score(df, weights=[1.0, 2.0]).collect()
    assert len(ok) == 1
