"""Johnson-Lindenstrauss ±1 random projection
(operators/embedding.py::random_projection)."""

import math

import pytest

from aqueducts_spark.operators.embedding import (
    projection_matrix,
    random_projection,
)


def _ref_project(vec, k, in_dim, seed="jl"):
    m = projection_matrix(k, in_dim, seed)
    return [
        sum(v * s for v, s in zip(vec[:in_dim], m[j])) / math.sqrt(k)
        for j in range(k)
    ]


def _vecs(n, d):
    return [
        (i, [float(((i * 31 + j * 17) % 13) - 6) for j in range(d)])
        for i in range(n)
    ]


def test_matrix_is_deterministic_signs(spark):
    m = projection_matrix(4, 8, "s")
    assert m == projection_matrix(4, 8, "s")
    assert all(v in (-1, 1) for row in m for v in row)
    assert m != projection_matrix(4, 8, "other-seed")


def test_projection_matches_python_reference(spark):
    data = _vecs(20, 16)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    rows = {r.vec_id: r.proj for r in random_projection(df, 4, 16).collect()}
    for i, vec in data:
        expect = _ref_project(vec, 4, 16)
        assert rows[i] == pytest.approx(expect, abs=1e-9), i


def test_norm_roughly_preserved(spark):
    # JL with k=32 over d=64: norms within a loose factor
    data = _vecs(30, 64)
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    rows = {r.vec_id: r.proj for r in random_projection(df, 32, 64).collect()}
    for i, vec in data:
        n_in = math.sqrt(sum(v * v for v in vec))
        n_out = math.sqrt(sum(v * v for v in rows[i]))
        if n_in > 0:
            assert 0.4 < n_out / n_in < 2.5, (i, n_in, n_out)


def test_short_vector_yields_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r.proj for r in random_projection(df, 2, 4).collect()}
    assert all(v is None for v in rows[1])
    assert all(v is not None for v in rows[2])


def test_long_vector_uses_prefix(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0, 99.0, 98.0])],
        "vec_id long, embedding array<double>",
    )
    got = random_projection(df, 2, 4).collect()[0].proj
    assert got == pytest.approx(_ref_project([1.0, 2.0, 3.0, 4.0], 2, 4))


def test_oversized_matrix_rejected(spark):
    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="65536"):
        random_projection(df, 1024, 128)
    with pytest.raises(ValueError, match=">= 1"):
        random_projection(df, 0, 4)


def test_plan_is_shuffle_free_and_python_free(spark):
    df = spark.createDataFrame(
        _vecs(5, 8), "vec_id long, embedding array<double>"
    )
    plan = (
        random_projection(df, 4, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registry_stage_on_float_vectors(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, [float(j) for j in range(8)])],
        "vec_id long, embedding array<float>",
    ).createOrReplaceTempView("rp_vecs")
    out = run_operator(
        spark,
        {
            "type": "random_projection",
            "input": "rp_vecs",
            "options": {"k": 4, "in_dim": 8},
        },
    )
    row = out.collect()[0]
    assert len(row.proj) == 4
    assert row.proj == pytest.approx(
        _ref_project([float(j) for j in range(8)], 4, 8)
    )
