"""int8-quantized cosine top-k (operators/similarity.py::quantized_topk)."""

import math

import pytest

from aqueducts_spark.operators.similarity import brute_force_topk, quantized_topk


def _vecs(n, d, scale=1.0):
    return [
        (
            i,
            [
                scale * math.sin(i * 0.7 + j * 1.3) * ((j % 5) + 1)
                for j in range(d)
            ],
        )
        for i in range(n)
    ]


def _ref_quantize(vec):
    m = max(abs(v) for v in vec)
    if m == 0:
        return [0] * len(vec)
    s = m / 127.0
    return [
        max(-127, min(127, math.floor(v / s + 0.5)))
        for v in vec
    ]


def _ref_cosine_q(a, b):
    qa, qb = _ref_quantize(a), _ref_quantize(b)
    na = sum(x * x for x in qa)
    nb = sum(x * x for x in qb)
    if na == 0 or nb == 0:
        return 0.0
    return sum(x * y for x, y in zip(qa, qb)) / math.sqrt(na * nb)


def test_scores_match_python_reference(spark):
    data = _vecs(12, 16)
    corpus = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, data[0][1]), (101, data[5][1])],
        "query_id long, embedding array<double>",
    )
    got = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in quantized_topk(corpus, queries, k=12).collect()
    }
    for qid, qvec in [(100, data[0][1]), (101, data[5][1])]:
        for nid, nvec in data:
            assert got[(qid, nid)] == pytest.approx(
                round(_ref_cosine_q(qvec, nvec), 4), abs=1e-9
            ), (qid, nid)


def test_self_similarity_is_one_and_rank_first(spark):
    data = _vecs(10, 16)
    corpus = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, data[3][1])], "query_id long, embedding array<double>"
    )
    top = quantized_topk(corpus, queries, k=1).collect()[0]
    assert top.neighbor_id == 3 and top.rank == 1
    assert top.cosine == pytest.approx(1.0)


def test_recall_vs_float_topk(spark):
    data = _vecs(60, 32)
    corpus = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(i, data[i][1]) for i in range(5)],
        "query_id long, embedding array<double>",
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(corpus, queries, k=10).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in quantized_topk(corpus, queries, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall


def test_zero_and_null_vectors(spark):
    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(9, [1.0, 0.5])], "query_id long, embedding array<double>"
    )
    rows = {
        r.neighbor_id: r.cosine
        for r in quantized_topk(corpus, queries, k=5).collect()
    }
    assert rows[1] == 0.0        # zero norm scores 0, never errors
    assert 3 not in rows         # NULL vectors excluded like brute force
    assert rows[2] > 0.9


def test_corpus_never_shuffles(spark):
    data = _vecs(10, 8)
    corpus = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, data[0][1])], "query_id long, embedding array<double>"
    )
    plan = (
        quantized_topk(corpus, queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the query side must BROADCAST (a shuffle-based or cartesian plan
    # would move the corpus); assert the exact join node, not a
    # disjunction that almost any plan satisfies
    assert "BroadcastNestedLoopJoin" in plan, plan
    # the only hash exchange is the final per-query top-k window
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    data = _vecs(8, 8)
    spark.createDataFrame(
        data, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("qt_corpus")
    spark.createDataFrame(
        [(0, data[2][1])], "query_id long, embedding array<double>"
    ).createOrReplaceTempView("qt_queries")
    out = run_operator(
        spark,
        {
            "type": "quantized_topk",
            "input": "qt_corpus",
            "options": {"queries": "qt_queries", "k": 3},
        },
    )
    rows = out.collect()
    assert len(rows) == 3 and rows[0].neighbor_id == 2
