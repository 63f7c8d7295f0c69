"""Training-mix composition (operators/mixing.py)."""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.mixing import pack_shards, weighted_mix


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["a", "b", "c"][i % 3], 100 + (i * 37) % 400) for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, grp string, toks long")


def test_integer_weights_exact(spark, docs):
    mixed = weighted_mix(docs, "grp", "doc_id", {"a": 2.0, "b": 0.0}, 1.0)
    counts = {r["grp"]: r["n"] for r in mixed.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 400  # 200 rows x2
    assert "b" not in counts  # weight 0 drops the group
    assert counts["c"] == 200


def test_fractional_weight_rate(spark, docs):
    mixed = weighted_mix(docs, "grp", "doc_id", {"a": 2.5, "c": 0.5})
    counts = {r["grp"]: r["n"] for r in mixed.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # hash-gated extras: expected 200*2.5=500 and 200*0.5=100, binomial spread
    assert 440 <= counts["a"] <= 560
    assert 70 <= counts["c"] <= 130
    assert counts["b"] == 200  # default weight 1.0


def test_copy_column_distinguishes_duplicates(spark, docs):
    mixed = weighted_mix(docs, "grp", "doc_id", {"a": 3.0})
    trip = mixed.where("grp = 'a'").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("mix_copy")).alias("copies")
    )
    assert all(r["copies"] == [1, 2, 3] for r in trip.collect())


def test_mix_deterministic(spark, docs):
    a = sorted(map(tuple, weighted_mix(docs, "grp", "doc_id", {"a": 1.3}).collect()))
    b = sorted(map(tuple, weighted_mix(docs, "grp", "doc_id", {"a": 1.3}).collect()))
    assert a == b


def test_negative_weight_rejected(spark, docs):
    with pytest.raises(ValueError):
        weighted_mix(docs, "grp", "doc_id", {"a": -1.0}).collect()


def test_pack_shards_budget(spark, docs):
    packed = pack_shards(docs, "toks", "doc_id", budget=1000, parts=4)
    assert packed.count() == 600  # every row assigned
    agg = packed.groupBy("pack_part", "shard_id").agg(
        F.sum("toks").alias("t"), F.count("*").alias("n")
    )
    rows = agg.collect()
    assert {r["pack_part"] for r in rows} == {0, 1, 2, 3}
    # start-offset binning: a shard holds rows whose start offset is in
    # [shard*budget, (shard+1)*budget) => chars < budget + max_row_toks
    assert all(r["t"] < 1000 + 500 for r in rows)
    # shards within a partition are contiguous 0..max
    for p in (0, 1, 2, 3):
        sids = sorted(r["shard_id"] for r in rows if r["pack_part"] == p)
        assert sids == list(range(len(sids)))


def test_pack_shards_order_respected(spark, docs):
    packed = pack_shards(docs, "toks", "doc_id", budget=800, parts=2)
    # within a partition, shard_id is monotone in doc_id order
    for p in (0, 1):
        part = (
            packed.where(F.col("pack_part") == p)
            .orderBy("doc_id")
            .select("shard_id")
            .collect()
        )
        sids = [r["shard_id"] for r in part]
        assert sids == sorted(sids)


def test_pack_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_shards(docs, "toks", "doc_id", budget=0)
    with pytest.raises(ValueError):
        pack_shards(docs, "toks", "doc_id", budget=10, parts=0)


def test_registry_stages(spark, sf_dir):
    from aqueducts_spark.operators.registry import run_operator

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "mix_docs"
    )
    mixed = run_operator(
        spark,
        {
            "type": "weighted_mix",
            "input": "mix_docs",
            "options": {
                "group_col": "lang",
                "id_col": "doc_id",
                "weights": {"en": 2.0},
            },
        },
    )
    assert "mix_copy" in mixed.columns
    packed = run_operator(
        spark,
        {
            "type": "pack_shards",
            "input": "mix_docs",
            "options": {"token_col": "n_chars", "order_col": "doc_id", "budget": 5000},
        },
    )
    assert {"pack_part", "shard_id"} <= set(packed.columns)
    spark.catalog.dropTempView("mix_docs")


def test_pack_shards_duplicate_order_keys_use_rows_frame(spark):
    """weighted_mix emits duplicate ids; the running sum must advance
    per ROW, not hand every peer the whole peer-group total."""
    from aqueducts_spark.operators.mixing import pack_shards

    df = spark.createDataFrame(
        [(7, 60, 0), (7, 60, 1), (7, 60, 2)], ["doc_id", "toks", "mix_copy"]
    )
    out = pack_shards(
        df, "toks", "doc_id", budget=100, parts=1, tiebreak_cols=["mix_copy"]
    ).collect()
    assert sorted(r.shard_id for r in out) == [0, 0, 1]


def test_temperature_weights_math_and_properties(spark):
    from aqueducts_spark.operators.mixing import temperature_weights

    rows = (
        [("big", i) for i in range(90)]
        + [("small", 100 + i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long")
    # alpha=1 -> natural proportions: every weight 1.0
    w1 = temperature_weights(df, "source", alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in w1.values()), w1
    # alpha=0 -> equalized: each group targets total/2 rows
    w0 = temperature_weights(df, "source", alpha=0.0)
    assert abs(w0["big"] * 90 - 50) < 1e-9
    assert abs(w0["small"] * 10 - 50) < 1e-9
    # intermediate alpha up-weights the small source, down-weights big
    w = temperature_weights(df, "source", alpha=0.3)
    assert w["small"] > 1.0 > w["big"]
    # expected output size is preserved
    assert abs(w["big"] * 90 + w["small"] * 10 - 100) < 1e-9
    # target_total scales everything
    w2 = temperature_weights(df, "source", alpha=0.3, target_total=200)
    assert abs(w2["big"] / w["big"] - 2.0) < 1e-12
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(df, "source", alpha=-1)


def test_temperature_mix_rebalances_and_is_deterministic(spark):
    from aqueducts_spark.operators.mixing import temperature_mix

    rows = (
        [("big", i) for i in range(400)]
        + [("small", 1000 + i) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = temperature_mix(df, "source", "doc_id", alpha=0.2)
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # small source up-weighted, big down-weighted, total ~preserved
    assert counts["small"] > 40 and counts["big"] < 400
    assert abs(sum(counts.values()) - 440) < 44  # within 10%
    again = temperature_mix(df, "source", "doc_id", alpha=0.2)
    assert sorted((r.source, r.doc_id, r.mix_copy) for r in out.collect()) == \
           sorted((r.source, r.doc_id, r.mix_copy) for r in again.collect())


def test_temperature_mix_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4)], "source string, doc_id long"
    ).createOrReplaceTempView("tm_docs")
    out = run_operator(
        spark,
        {"type": "temperature_mix", "input": "tm_docs",
         "options": {"alpha": 0.0}},
    )
    assert "mix_copy" in out.columns
    assert out.count() > 0
    spark.catalog.dropTempView("tm_docs")


def test_weighted_mix_xxhash64_fast_path(spark):
    """hash_fn='xxhash64' keeps multiplicity expectations and
    determinism (Spark-internal), like every other hash-keyed op."""
    df = spark.createDataFrame(
        [("a", i) for i in range(1000)], "source string, doc_id long"
    )
    out = weighted_mix(
        df, "source", "doc_id", {"a": 0.5}, hash_fn="xxhash64"
    )
    n1 = out.count()
    assert 400 < n1 < 600  # ~50% kept
    assert out.count() == n1  # deterministic
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "md5" not in plan


def test_shard_manifest_values_and_order_independence(spark):
    import hashlib

    from aqueducts_spark.operators.mixing import shard_manifest

    rows = [(i, i % 3, (i * 11) % 7 + 1) for i in range(20)] + [(None, 1, None)]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n long")
    got = {
        r.shard: (r.n_docs, r.n_tokens, r.content_hash, r.min_id, r.max_id)
        for r in shard_manifest(
            df, shard_col="shard", id_col="doc_id", token_col="n"
        ).collect()
    }

    def h(v):
        s = "manifest:" + ("\x00" if v is None else str(v))
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % (1 << 28)

    exp = {}
    for i, s, n in rows:
        d = exp.setdefault(s, [0, 0, 0, None, None])
        d[0] += 1
        d[1] += n or 0
        d[2] += h(i)
        ids = [x for x in (d[3], i) if x is not None]
        d[3] = min(ids) if ids else None
        ids = [x for x in (d[4], i) if x is not None]
        d[4] = max(ids) if ids else None
    assert got == {s: tuple(v) for s, v in exp.items()}
    # order independence: a different physical layout, same manifest
    reordered = shard_manifest(
        df.orderBy("n", "doc_id").repartition(7),
        shard_col="shard", id_col="doc_id", token_col="n",
    )
    assert {
        r.shard: (r.n_docs, r.n_tokens, r.content_hash, r.min_id, r.max_id)
        for r in reordered.collect()
    } == got
    # without token_col, no n_tokens column
    cols = shard_manifest(df, shard_col="shard", id_col="doc_id").columns
    assert "n_tokens" not in cols


def test_shard_manifest_detects_any_row_change(spark):
    from aqueducts_spark.operators.mixing import shard_manifest

    df = spark.createDataFrame(
        [(i, 0) for i in range(10)], "doc_id long, shard long"
    )
    base = shard_manifest(df, shard_col="shard").collect()[0]
    # drop one row: count AND content hash both move
    drop = shard_manifest(
        df.where("doc_id <> 7"), shard_col="shard"
    ).collect()[0]
    assert drop.n_docs == base.n_docs - 1
    assert drop.content_hash != base.content_hash
    # swap one row for another with the same count: hash still moves
    swap = shard_manifest(
        df.where("doc_id <> 7").union(
            spark.createDataFrame([(99, 0)], "doc_id long, shard long")
        ),
        shard_col="shard",
    ).collect()[0]
    assert swap.n_docs == base.n_docs and swap.content_hash != base.content_hash


def test_shard_manifest_registry_stage_and_xxhash(spark):
    from aqueducts_spark.operators.mixing import shard_manifest
    from aqueducts_spark.operators.registry import run_operator

    df = spark.createDataFrame(
        [(i, i % 2, 3) for i in range(8)], "doc_id long, shard_id long, n_tok long"
    )
    df.createOrReplaceTempView("sm_docs")
    out = run_operator(
        spark,
        {
            "type": "shard_manifest",
            "input": "sm_docs",
            "options": {"token_col": "n_tok"},
        },
    ).collect()
    assert {r.shard_id: r.n_tokens for r in out} == {0: 12, 1: 12}
    # xxhash64 fast path: deterministic within Spark
    a = shard_manifest(df, hash_fn="xxhash64").collect()
    b = shard_manifest(df, hash_fn="xxhash64").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    spark.catalog.dropTempView("sm_docs")


def test_pack_shards_null_tokens_pack_as_zero_and_clash_guard(spark):
    from aqueducts_spark.operators.mixing import pack_shards

    df = spark.createDataFrame(
        [(1, 50), (2, None), (3, 60)], "doc_id long, n_tok long"
    )
    out = pack_shards(df, "n_tok", "doc_id", budget=100, parts=1)
    shards = {r.doc_id: r.shard_id for r in out.collect()}
    # NULL counts pack as 0 tokens: the row gets a REAL shard (the old
    # NULL shard_id silently dropped it from a partitioned layout)
    assert shards[2] is not None
    assert len(shards) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exist"):
        pack_shards(out, "n_tok", "doc_id", budget=100)


def test_weighted_mix_copy_col_clash_rejected(spark):
    from aqueducts_spark.operators.mixing import weighted_mix

    df = spark.createDataFrame(
        [(1, "a", 2)], "doc_id long, src string, mix_copy int"
    )
    with pytest.raises(ValueError, match="already exists"):
        weighted_mix(df, "src", "doc_id", {"a": 2.0})


def test_temperature_weights_null_groups_dont_count_against_cap(spark):
    from aqueducts_spark.operators.mixing import temperature_weights

    rows = [(i, f"g{i}") for i in range(5)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    # exactly max_groups non-NULL groups + a NULL group: must fit
    w = temperature_weights(df, "src", max_groups=5)
    assert len(w) == 5 and None not in w


# ---------------------------------------------------------------------------
# token_budget_weights / token_budget_mix
# ---------------------------------------------------------------------------


def test_token_budget_weights_expectation(spark, docs):
    from aqueducts_spark.operators.mixing import token_budget_weights

    w = token_budget_weights(
        docs, "grp", "toks", budget=100_000,
        shares={"a": 0.5, "b": 0.5},
    )
    masses = {
        r["grp"]: r["t"]
        for r in docs.groupBy("grp").agg(F.sum("toks").alias("t")).collect()
    }
    assert set(w) == {"a", "b"}  # c has no share -> no entry
    assert w["a"] == pytest.approx(50_000 / masses["a"])
    assert w["b"] == pytest.approx(50_000 / masses["b"])


def test_token_budget_mix_achieves_budget(spark, docs):
    from aqueducts_spark.operators.mixing import token_budget_mix

    mixed = token_budget_mix(
        docs, "grp", "doc_id", "toks", budget=200_000,
        shares={"a": 0.75, "c": 0.25},
    )
    got = {
        r["grp"]: r["t"]
        for r in mixed.groupBy("grp").agg(F.sum("toks").alias("t")).collect()
    }
    # unshared group excluded entirely
    assert set(got) == {"a", "c"}
    # achieved token mass within the hash-gated binomial spread of the
    # target (rows carry ~100-500 tokens; 10% is generous)
    assert got["a"] == pytest.approx(150_000, rel=0.1)
    assert got["c"] == pytest.approx(50_000, rel=0.1)


def test_token_budget_mix_epochs_when_share_exceeds_mass(spark, docs):
    from aqueducts_spark.operators.mixing import token_budget_mix

    # group 'a' holds ~60k tokens; a 600k budget at share 1.0 needs
    # ~10 epochs — every row must appear multiple times
    mixed = token_budget_mix(
        docs, "grp", "doc_id", "toks", budget=600_000, shares={"a": 1.0}
    )
    per_doc = mixed.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert per_doc.agg(F.min("n")).collect()[0][0] >= 2


def test_token_budget_weights_validation(spark, docs):
    from aqueducts_spark.operators.mixing import token_budget_weights

    with pytest.raises(ValueError, match="budget must be > 0"):
        token_budget_weights(docs, "grp", "toks", 0, {"a": 1.0})
    with pytest.raises(ValueError, match="non-empty"):
        token_budget_weights(docs, "grp", "toks", 10, {})
    with pytest.raises(ValueError, match="negative share"):
        token_budget_weights(docs, "grp", "toks", 10, {"a": -0.1})
    with pytest.raises(ValueError, match="sum to > 0"):
        token_budget_weights(docs, "grp", "toks", 10, {"a": 0.0})
    # a share for a group with no observed tokens cannot be filled
    with pytest.raises(ValueError, match="no observed tokens"):
        token_budget_weights(docs, "grp", "toks", 10, {"nope": 1.0})
    with pytest.raises(ValueError, match="max_groups"):
        token_budget_weights(
            docs, "grp", "toks", 10,
            {f"g{i}": 1.0 for i in range(5)}, max_groups=3,
        )


def test_token_budget_weights_null_tokens_count_zero(spark):
    from aqueducts_spark.operators.mixing import token_budget_weights

    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", None), (3, "a", 300)],
        "doc_id long, grp string, toks long",
    )
    w = token_budget_weights(df, "grp", "toks", budget=800, shares={"a": 1.0})
    assert w["a"] == pytest.approx(800 / 400)


def test_token_budget_mix_yaml_stage(spark, docs):
    from aqueducts_spark.operators.registry import run_operator

    docs.createOrReplaceTempView("tbm_docs")
    out = run_operator(
        spark,
        {
            "type": "token_budget_mix",
            "input": "tbm_docs",
            "options": {
                "group_col": "grp", "id_col": "doc_id",
                "token_col": "toks", "budget": 100000,
                "shares": {"a": 1.0},
            },
        },
    )
    assert out.select("grp").distinct().collect()[0][0] == "a"
