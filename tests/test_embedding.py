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
