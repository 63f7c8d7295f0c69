"""Deterministic corpus reshuffle (operators/mixing.py::shuffle_corpus)."""

import hashlib

import pytest

from aqueducts_spark.operators.mixing import shuffle_corpus


def _key(seed, doc_id):
    return hashlib.md5(f"{seed}\x1f{doc_id}".encode()).hexdigest()


def _docs(spark, n=20):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )


def test_key_matches_python_md5_and_is_seed_dependent(spark):
    df = _docs(spark)
    out = {r.doc_id: r.shuffle_key for r in shuffle_corpus(df, seed="s1").collect()}
    assert out == {i: _key("s1", i) for i in range(20)}
    out2 = {r.doc_id: r.shuffle_key for r in shuffle_corpus(df, seed="s2").collect()}
    assert out != out2  # independent reshuffle per seed


def test_global_order_is_sorted_by_key(spark):
    rows = shuffle_corpus(_docs(spark), seed="g").collect()
    keys = [r.shuffle_key for r in rows]
    assert keys == sorted(keys)
    # and the order is NOT the input id order (the whole point)
    assert [r.doc_id for r in rows] != list(range(20))


def test_sharded_order_is_sorted_within_each_shard(spark):
    out = shuffle_corpus(_docs(spark, 40), seed="g", n_shards=4)
    assert set(out.columns) >= {"shuffle_key", "shard_id"}
    # collect per physical partition: each partition's rows must be
    # sorted by (shard, key) — the streamable-shard contract
    parts = out.rdd.glom().collect()
    seen = 0
    for part in parts:
        ks = [(r.shard_id, r.shuffle_key) for r in part]
        assert ks == sorted(ks), ks
        seen += len(part)
    assert seen == 40
    shards = {r.shard_id for p in parts for r in p}
    assert shards <= set(range(4)) and len(shards) > 1


def test_shard_assignment_is_deterministic_and_seed_salted(spark):
    df = _docs(spark, 30)
    a = {r.doc_id: r.shard_id for r in shuffle_corpus(df, seed="x", n_shards=8).collect()}
    b = {r.doc_id: r.shard_id for r in shuffle_corpus(df, seed="x", n_shards=8).collect()}
    c = {r.doc_id: r.shard_id for r in shuffle_corpus(df, seed="y", n_shards=8).collect()}
    assert a == b
    assert a != c  # different seed draws a different shard layout


def test_null_id_gets_stable_sentinel_key(spark):
    df = spark.createDataFrame([(None, "t"), (1, "u")], "doc_id long, text string")
    rows = shuffle_corpus(df, seed="n").collect()
    got = {r.doc_id: r.shuffle_key for r in rows}
    assert got[None] == _key("n", "\x00")
    assert got[1] == _key("n", "1")


def test_output_collision_and_bad_args_rejected(spark):
    df = _docs(spark, 5).withColumnRenamed("text", "shuffle_key")
    with pytest.raises(ValueError, match="already exist"):
        shuffle_corpus(df)
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_corpus(_docs(spark, 5), n_shards=0)
    with pytest.raises(ValueError, match="hash_fn"):
        shuffle_corpus(_docs(spark, 5), hash_fn="sha1")
    # key_col == shard_col would overwrite the shuffle key and emit an
    # UNshuffled corpus — rejected
    with pytest.raises(ValueError, match="must differ"):
        shuffle_corpus(_docs(spark, 5), n_shards=2, key_col="k", shard_col="k")


def test_xxhash64_fast_path_is_deterministic(spark):
    df = _docs(spark, 20)
    a = {r.doc_id: r.shuffle_key for r in shuffle_corpus(df, seed="f", hash_fn="xxhash64").collect()}
    b = {r.doc_id: r.shuffle_key for r in shuffle_corpus(df, seed="f", hash_fn="xxhash64").collect()}
    assert a == b
    assert all(isinstance(v, int) for v in a.values())


def test_plan_shapes(spark):
    df = _docs(spark, 20)
    # global path: one range-partitioned sort, no Python
    plan = (
        shuffle_corpus(df, seed="p")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # sharded path: hash repartition + within-partition sort, NO range
    # sampling pass and no global sort
    plan2 = (
        shuffle_corpus(df, seed="p", n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan2, plan2
    # physical Sort prints "Sort [...], <global>, 0" — false = within
    # partitions only (no global ordering pass)
    assert "], false, 0" in plan2 and "], true, 0" not in plan2, plan2


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    _docs(spark, 12).createOrReplaceTempView("shuf_docs")
    out = run_operator(
        spark,
        {
            "type": "shuffle_corpus",
            "input": "shuf_docs",
            "options": {"seed": "r", "n_shards": 3},
        },
    )
    assert out.count() == 12
    assert {"shuffle_key", "shard_id"} <= set(out.columns)
    spark.catalog.dropTempView("shuf_docs")
