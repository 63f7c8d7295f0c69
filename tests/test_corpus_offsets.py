"""Global positions / token offsets (operators/mixing.py::corpus_offsets)
and soft-dedup weights (operators/dedup.py::dup_weights)."""

import pytest

from aqueducts_spark.operators.dedup import dup_weights
from aqueducts_spark.operators.mixing import corpus_offsets, shuffle_corpus


def _docs(spark, n=24):
    return spark.createDataFrame(
        [(i, f"doc {i}", (i * 7) % 11 + 1) for i in range(n)],
        "doc_id long, text string, n_tok long",
    )


# ---------------------------------------------------------------- offsets


def test_global_path_positions_and_offsets(spark):
    out = corpus_offsets(
        _docs(spark, 10), ["doc_id"], token_col="n_tok"
    ).orderBy("doc_id").collect()
    assert [r.global_pos for r in out] == list(range(10))
    run = 0
    for r in out:
        assert r.token_start == run
        run += r.n_tok


def test_sharded_path_matches_single_window_semantics(spark):
    sharded = shuffle_corpus(_docs(spark, 40), seed="co", n_shards=5)
    got = corpus_offsets(
        sharded,
        ["shuffle_key", "doc_id"],
        shard_col="shard_id",
        token_col="n_tok",
    ).collect()
    # reference: flat Python prefix sum in (shard, key, id) order
    ref = sorted(got, key=lambda r: (r.shard_id, r.shuffle_key, r.doc_id))
    run = 0
    for pos, r in enumerate(ref):
        assert r.global_pos == pos, (pos, r)
        assert r.token_start == run
        run += r.n_tok
    # contiguous 0..N-1 overall
    assert sorted(r.global_pos for r in got) == list(range(40))


def test_null_tokens_count_zero_and_null_shard_sorts_first(spark):
    df = spark.createDataFrame(
        [(1, None, 5), (2, 0, None), (3, 0, 7), (4, 1, 2)],
        "id long, shard int, tok long",
    )
    out = {
        r.id: (r.global_pos, r.token_start)
        for r in corpus_offsets(
            df, ["id"], shard_col="shard", token_col="tok"
        ).collect()
    }
    # NULL shard first: id=1 is position 0; NULL tok counts as 0
    assert out[1] == (0, 0)
    assert out[2] == (1, 5)
    assert out[3] == (2, 5)
    assert out[4] == (3, 12)


def test_pos_only_when_no_token_col(spark):
    out = corpus_offsets(_docs(spark, 6), ["doc_id"])
    assert "token_start" not in out.columns
    assert [r.global_pos for r in out.orderBy("doc_id").collect()] == list(range(6))


def test_offsets_validation(spark):
    df = _docs(spark, 5)
    with pytest.raises(ValueError, match="order_cols"):
        corpus_offsets(df, [])
    with pytest.raises(ValueError, match="already exist"):
        corpus_offsets(df.withColumnRenamed("text", "global_pos"), ["doc_id"])
    sharded = shuffle_corpus(df, seed="v", n_shards=4)
    with pytest.raises(ValueError, match="max_shards"):
        corpus_offsets(
            sharded, ["doc_id"], shard_col="shard_id", max_shards=2
        )
    # self-collision: identical output names would silently clobber
    with pytest.raises(ValueError, match="must differ"):
        corpus_offsets(df, ["doc_id"], token_col="n_tok",
                       pos_col="p", offset_col="p")


def test_sharded_plan_has_no_global_sort_or_python(spark):
    sharded = shuffle_corpus(_docs(spark, 20), seed="p", n_shards=4)
    plan = (
        corpus_offsets(
            sharded, ["shuffle_key", "doc_id"], shard_col="shard_id",
            token_col="n_tok",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # windows are per-shard: no global (true) sort downstream of the
    # shard exchange; the only rangepartitioning would be a global sort
    assert "rangepartitioning" not in plan, plan
    # the shard-totals pass and the window pass both key on shard_id —
    # broadcast join for the bases, never a shuffle join
    assert "BroadcastHashJoin" in plan, plan


# ------------------------------------------------------------ dup_weights


def test_dup_weights_exact_groups(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None), (6, None)],
        "id long, text string",
    )
    out = {r.id: (r.dup_count, r.dup_weight) for r in dup_weights(df, ["text"]).collect()}
    assert out[1] == (3, pytest.approx(1 / 3))
    assert out[4] == (1, 1.0)
    # NULLs form their own group (payload sentinel), distinct from "N"
    assert out[5] == (2, 0.5)
    total = sum(w for _, w in out.values())
    assert total == pytest.approx(3.0)  # three groups, alpha=1 → 1 each


def test_dup_weights_alpha_and_options(spark):
    df = spark.createDataFrame([(i, "x") for i in range(4)], "id long, text string")
    out = dup_weights(df, ["text"], alpha=0.5, count_col=None)
    assert "dup_count" not in out.columns
    assert all(r.dup_weight == pytest.approx(0.5) for r in out.collect())
    assert all(
        r.dup_weight == 1.0
        for r in dup_weights(df, ["text"], alpha=0.0, count_col=None).collect()
    )
    with pytest.raises(ValueError, match="alpha"):
        dup_weights(df, ["text"], alpha=-1)
    with pytest.raises(ValueError, match="already exist"):
        dup_weights(df.withColumnRenamed("id", "dup_weight"), ["text"])
    with pytest.raises(ValueError, match="must differ"):
        dup_weights(df, ["text"], weight_col="w", count_col="w")


def test_dup_weights_null_sentinel_distinct_from_literal_N(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "N")], "id long, text string"
    )
    out = {r.id: r.dup_count for r in dup_weights(df, ["text"]).collect()}
    assert out == {1: 1, 2: 1}


def test_dup_weights_xxhash64_matches_md5_groups(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, text string"
    )
    a = {r.id: r.dup_count for r in dup_weights(df, ["text"]).collect()}
    b = {r.id: r.dup_count for r in dup_weights(df, ["text"], hash_fn="xxhash64").collect()}
    assert a == b


def test_registry_stages(spark):
    from aqueducts_spark.operators.registry import run_operator

    _docs(spark, 12).createOrReplaceTempView("co_docs")
    out = run_operator(
        spark,
        {
            "type": "shuffle_corpus",
            "input": "co_docs",
            "options": {"seed": "r", "n_shards": 3},
        },
    )
    out.createOrReplaceTempView("co_sharded")
    idx = run_operator(
        spark,
        {
            "type": "corpus_offsets",
            "input": "co_sharded",
            "options": {
                "order_cols": "shuffle_key,doc_id",
                "shard_col": "shard_id",
                "token_col": "n_tok",
            },
        },
    )
    assert sorted(r.global_pos for r in idx.collect()) == list(range(12))
    dw = run_operator(
        spark,
        {
            "type": "dup_weights",
            "input": "co_docs",
            "options": {"columns": ["text"], "alpha": 1.0},
        },
    )
    assert all(r.dup_weight == 1.0 for r in dw.collect())
    spark.catalog.dropTempView("co_docs")
    spark.catalog.dropTempView("co_sharded")
