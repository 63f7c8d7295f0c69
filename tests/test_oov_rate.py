"""Out-of-vocabulary rate (operators/text.py::oov_rate)."""

import pytest

from aqueducts_spark.operators.text import oov_rate


def _vocab(spark, words):
    return spark.createDataFrame([(w,) for w in words], "token string")


def test_rates_match_hand_computation(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),   # 6 tokens, vocab hits: the,cat,the
            (2, "unknown words only here"),  # 0 hits
            (3, "the the the"),              # all hits
        ],
        "doc_id long, text string",
    )
    v = _vocab(spark, ["the", "cat"])
    rows = {r.doc_id: r for r in oov_rate(df, v).collect()}
    assert rows[1].n_tokens == 6 and rows[1].n_in_vocab == 3
    assert rows[1].oov_rate == pytest.approx(0.5)
    assert rows[2].n_in_vocab == 0 and rows[2].oov_rate == 1.0
    assert rows[3].oov_rate == 0.0


def test_empty_and_null_text_rate_zero(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in oov_rate(df, _vocab(spark, ["x"])).collect()}
    for r in rows.values():
        assert r.n_tokens == 0 and r.n_in_vocab == 0 and r.oov_rate == 0.0


def test_vocab_duplicates_and_nulls_do_not_double_count(spark):
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    v = spark.createDataFrame(
        [("a",), ("a",), (None,)], "token string"
    )
    r = oov_rate(df, v).collect()[0]
    assert r.n_tokens == 3 and r.n_in_vocab == 2  # both 'a' occurrences


def test_matching_is_on_normalized_tokens(spark):
    df = spark.createDataFrame([(1, "The CAT")], "doc_id long, text string")
    r = oov_rate(df, _vocab(spark, ["the", "cat"])).collect()[0]
    assert r.n_in_vocab == 2  # document tokens lowercased by tokenizer


def test_plan_broadcast_join_one_corpus_shuffle(spark):
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    plan = (
        oov_rate(df, _vocab(spark, ["a"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one corpus shuffle: the per-doc count aggregation; the other hash
    # exchange is vocab-sized (under its BroadcastExchange)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_composes_with_vocabulary(spark):
    from aqueducts_spark.operators.text import vocabulary

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha rare")],
        "doc_id long, text string",
    )
    v = vocabulary(df, top_n=2)  # alpha (3), then one of beta/gamma/rare
    rows = {r.doc_id: r for r in oov_rate(df, v).collect()}
    assert rows[2].n_in_vocab >= 2  # the two alphas at least


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, "x y z")], "doc_id long, text string"
    ).createOrReplaceTempView("oov_docs")
    spark.createDataFrame([("x",)], "token string").createOrReplaceTempView(
        "oov_vocab"
    )
    out = run_operator(
        spark,
        {
            "type": "oov_rate",
            "input": "oov_docs",
            "options": {"vocab": "oov_vocab"},
        },
    )
    r = out.collect()[0]
    assert r.n_tokens == 3 and r.n_in_vocab == 1
