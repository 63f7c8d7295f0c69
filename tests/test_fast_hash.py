"""hash_fn="xxhash64" fast path: every hash-bound operator accepts the
native-codegen hash and keeps its semantic guarantees (uniformity,
determinism within Spark, no false negatives, LSH sensitivity).  The
md5 default stays the cross-engine oracle contract — these tests assert
behavior, not specific hash values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=400):
    rows = []
    for i in range(n):
        rows.append((i, f"document number {i} with some shared words " * 3))
    # planted near-duplicate pair: 1000/1001 differ by one token
    rows.append((1000, "the quick brown fox jumps over the lazy dog " * 5))
    rows.append((1001, "the quick brown fox jumps over the lazy cat " * 5))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kmv_xxhash_estimates_within_bound(spark):
    from aqueducts_spark.operators.sketch import kmv_distinct

    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = kmv_distinct(df, ["g"], "v", k=256, hash_fn="xxhash64").collect()[0]
    assert abs(est.distinct_est - 5000) / 5000 < 0.15

    # below-k groups are exact regardless of hash
    small = spark.range(100).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    est2 = kmv_distinct(small, ["g"], "v", k=256, hash_fn="xxhash64").collect()[0]
    assert est2.distinct_est == 100.0


def test_cms_xxhash_never_underestimates(spark):
    from aqueducts_spark.operators.sketch import cms_estimate, cms_sketch

    rows = [("a",)] * 500 + [("b",)] * 50 + [(f"x{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    sketch = cms_sketch(df, [], "v", width=512, depth=3, hash_fn="xxhash64")
    items = spark.createDataFrame([("a",), ("b",)], "v string")
    est = {
        r.v: r.freq_est
        for r in cms_estimate(sketch, items, "v", width=512, depth=3, hash_fn="xxhash64").collect()
    }
    assert est["a"] >= 500 and est["a"] <= 500 + 250
    assert est["b"] >= 50 and est["b"] <= 50 + 250


def test_bloom_xxhash_no_false_negatives(spark):
    from aqueducts_spark.operators.sketch import bloom_filter, bloom_sketch

    build = spark.range(300).select((F.col("id") * 2).cast("string").alias("v"))
    probe = spark.range(2000).select(F.col("id").cast("string").alias("v"))
    bits = bloom_sketch(build, "v", num_bits=16384, num_hashes=4, hash_fn="xxhash64")
    kept = bloom_filter(
        probe, "v", bits, num_bits=16384, num_hashes=4, hash_fn="xxhash64"
    )
    kept_vals = {r.v for r in kept.collect()}
    members = {str(i * 2) for i in range(300) if i * 2 < 2000}
    assert members <= kept_vals  # zero false negatives
    assert len(kept_vals) < 2000  # and it actually filters


def test_bloom_hash_fn_mismatch_is_caught_or_filters_differently(spark):
    from aqueducts_spark.operators.sketch import bloom_filter, bloom_sketch

    build = spark.range(50).select(F.col("id").cast("string").alias("v"))
    bits_md5 = bloom_sketch(build, "v", num_bits=1024, num_hashes=2, hash_fn="md5")
    # probing an md5-built sketch with xxhash64 positions loses the
    # no-false-negative guarantee — the API can't detect it (positions
    # are just ints), so this documents the contract: same hash_fn on
    # both sides
    kept = bloom_filter(
        build, "v", bits_md5, num_bits=1024, num_hashes=2, hash_fn="xxhash64"
    )
    assert kept.count() <= 50


def test_hash_sample_xxhash_rate_and_determinism(spark):
    from aqueducts_spark.operators.sampling import hash_sample

    df = spark.range(20000).select(F.col("id").cast("string").alias("doc_id"))
    s1 = hash_sample(df, "doc_id", 0.25, hash_fn="xxhash64")
    s2 = hash_sample(df, "doc_id", 0.25, hash_fn="xxhash64")
    n = s1.count()
    assert abs(n / 20000 - 0.25) < 0.02
    assert n == s2.count()
    assert s1.exceptAll(s2).count() == 0  # identical draw

    # different salt -> effectively independent draw
    s3 = hash_sample(df, "doc_id", 0.25, salt="other", hash_fn="xxhash64")
    overlap = s1.join(s3, "doc_id").count()
    assert abs(overlap / 20000 - 0.0625) < 0.02


def test_split_xxhash_disjoint_exhaustive(spark):
    from aqueducts_spark.operators.sampling import deterministic_split

    df = spark.range(10000).select(F.col("id").cast("string").alias("doc_id"))
    out = deterministic_split(
        df, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, hash_fn="xxhash64"
    )
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 10000
    assert abs(counts["train"] / 10000 - 0.8) < 0.02
    assert abs(counts["valid"] / 10000 - 0.1) < 0.015


def test_stratified_fixed_n_xxhash_exact_budget(spark):
    from aqueducts_spark.operators.sampling import stratified_fixed_n

    df = spark.createDataFrame(
        [(str(i), "en" if i % 3 else "de") for i in range(300)],
        "doc_id string, lang string",
    )
    out = stratified_fixed_n(df, "doc_id", "lang", 20, hash_fn="xxhash64")
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 20, "de": 20}
    # deterministic
    again = stratified_fixed_n(df, "doc_id", "lang", 20, hash_fn="xxhash64")
    assert out.exceptAll(again).count() == 0


def test_minhash_xxhash_finds_planted_neardup(spark):
    from aqueducts_spark.operators.dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(
        _docs(spark), num_hashes=16, bands=8, shingle_n=3, hash_fn="xxhash64"
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1000, 1001) in got


def test_fuzzy_dedup_xxhash_keeps_one_of_pair(spark):
    from aqueducts_spark.operators.dedup import fuzzy_dedup

    kept = fuzzy_dedup(
        _docs(spark), num_hashes=16, bands=8, shingle_n=3, hash_fn="xxhash64"
    )
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 1000 in ids and 1001 not in ids  # min-id representative kept


def test_simhash_xxhash_hamming_close_for_neardups(spark):
    from aqueducts_spark.operators.dedup import simhash

    fp = {r.doc_id: r.simhash for r in simhash(_docs(spark), hash_fn="xxhash64").collect()}
    ham = bin(fp[1000] ^ fp[1001]).count("1")
    assert ham <= 12  # one-token difference stays close in hamming space
    far = bin(fp[1000] ^ fp[0]).count("1")
    assert far > ham


def test_unknown_hash_fn_rejected_everywhere(spark):
    from aqueducts_spark.operators.dedup import minhash_candidate_pairs, simhash
    from aqueducts_spark.operators.sampling import hash_sample
    from aqueducts_spark.operators.sketch import cms_sketch, kmv_distinct

    df = spark.createDataFrame([("1", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="hash_fn"):
        kmv_distinct(df, [], "doc_id", hash_fn="sha1")
    with pytest.raises(ValueError, match="hash_fn"):
        cms_sketch(df, [], "doc_id", hash_fn="sha1")
    with pytest.raises(ValueError, match="hash_fn"):
        hash_sample(df, "doc_id", 0.5, hash_fn="sha1")
    with pytest.raises(ValueError, match="hash_fn"):
        minhash_candidate_pairs(df, hash_fn="sha1").collect()
    with pytest.raises(ValueError, match="hash_fn"):
        simhash(df, hash_fn="sha1").collect()


def test_declarative_stage_accepts_hash_fn(spark):
    from aqueducts_spark.operators.registry import run_operator

    df = spark.range(1000).select(F.col("id").cast("string").alias("doc_id"))
    df.createOrReplaceTempView("fh_docs")
    out = run_operator(
        spark,
        {
            "type": "hash_sample",
            "input": "fh_docs",
            "options": {"id_col": "doc_id", "rate": 0.5, "hash_fn": "xxhash64"},
        },
    )
    n = out.count()
    assert abs(n / 1000 - 0.5) < 0.06
    spark.catalog.dropTempView("fh_docs")


def test_xxhash_plan_has_no_md5(spark):
    """The fast path must not smuggle an md5 back in: the optimized plan
    for an xxhash64 sample contains xxhash64 and no md5 call."""
    from aqueducts_spark.operators.sampling import hash_sample

    df = spark.range(10).select(F.col("id").cast("string").alias("doc_id"))
    plan = hash_sample(df, "doc_id", 0.5, hash_fn="xxhash64")._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan and "md5" not in plan


def test_exact_dedup_xxhash_same_survivors_as_md5(spark):
    from aqueducts_spark.operators.dedup import dedup_against, exact_dedup

    rows = [(i, f"text {i % 50}") for i in range(200)]  # 4 copies each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    md5_ids = sorted(r.doc_id for r in exact_dedup(df, "doc_id", ["text"]).collect())
    xx_ids = sorted(
        r.doc_id
        for r in exact_dedup(df, "doc_id", ["text"], hash_fn="xxhash64").collect()
    )
    # both keep the min-id representative of each payload group
    assert md5_ids == xx_ids == list(range(50))

    corpus = spark.createDataFrame([(f"text {i}",) for i in range(25)], "text string")
    survivors = dedup_against(df, corpus, ["text"], hash_fn="xxhash64")
    kept_texts = {r.text for r in survivors.collect()}
    assert kept_texts == {f"text {i}" for i in range(25, 50)}
    # shuffle key on the fast path is a fixed 8-byte bigint
    plan = exact_dedup(df, "doc_id", ["text"], hash_fn="xxhash64")._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan and "md5" not in plan


class TestDedupReviewRegressions:
    def test_payload_key_separator_injection_proof(self, spark):
        """('a\\x1fb','c') vs ('a','b\\x1fc') must be DIFFERENT dedup
        keys (the bare separator join merged them), and a value equal to
        the old NULL sentinel must differ from a real NULL."""
        from aqueducts_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(1, "a\x1fb", "c"), (2, "a", "b\x1fc"),
             (3, None, "z"), (4, "\x00<NULL>", "z")],
            "id long, c1 string, c2 string",
        )
        kept = sorted(r.id for r in exact_dedup(df, "id", ["c1", "c2"]).collect())
        assert kept == [1, 2, 3, 4]  # all four are distinct payloads

    def test_simhash_keeps_empty_and_null_docs(self, spark):
        from aqueducts_spark.operators.dedup import simhash

        df = spark.createDataFrame(
            [(1, "hello world"), (2, ""), (3, None)], "doc_id long, text string"
        )
        out = {r.doc_id: r.simhash for r in simhash(df).collect()}
        assert set(out) == {1, 2, 3}
        assert out[2] == 0 and out[3] == 0 and out[1] != 0

    def test_simhash_null_id_doc_with_tokens_keeps_fingerprint(self, spark):
        """eqNullSafe reinstatement join: a NULL-id document that HAS
        tokens must carry its computed fingerprint, not be coalesced to
        0 (a plain equi-join never matches NULL to NULL)."""
        from aqueducts_spark.operators.dedup import simhash

        df = spark.createDataFrame(
            [(None, "hello world"), (2, "hello world")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.simhash for r in simhash(df).collect()}
        assert out[None] == out[2] != 0

    def test_simhash_distinct_null_id_docs_keep_distinct_fingerprints(self, spark):
        """Two NULL-id docs with different texts must NOT merge into one
        aggregate (a NULL group key would fingerprint each over the
        union of both token sets)."""
        from aqueducts_spark.operators.dedup import simhash

        df = spark.createDataFrame(
            [(None, "hello world"), (None, "totally different words"),
             (3, "hello world"), (4, "totally different words")],
            "doc_id long, text string",
        )
        rows = simhash(df).collect()
        by_text_twin = {r.doc_id: r.simhash for r in rows if r.doc_id is not None}
        null_hashes = sorted(r.simhash for r in rows if r.doc_id is None)
        assert null_hashes == sorted(by_text_twin.values())
        assert by_text_twin[3] != by_text_twin[4]

    def test_simhash_bits_validated(self, spark):
        import pytest as _pytest

        from aqueducts_spark.operators.dedup import simhash

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="bits"):
            simhash(df, bits=64)

    def test_embedding_neardup_zero_vectors_dont_crash(self, spark):
        from aqueducts_spark.operators.dedup import (
            embedding_near_duplicates,
            embedding_near_duplicates_lsh,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0]), (4, [0.99, 0.1])],
            "vec_id long, embedding array<float>",
        )
        exact = embedding_near_duplicates(df, threshold=0.8).collect()
        assert {(r.id_a, r.id_b) for r in exact} == {(3, 4)}  # zeros match nothing
        lsh = embedding_near_duplicates_lsh(
            df, threshold=0.8, num_tables=8, bits_per_table=4
        ).collect()
        assert all({r.id_a, r.id_b} != {1, 2} for r in lsh)

    def test_drop_common_lines_regex_separator_and_null_ids(self, spark):
        from aqueducts_spark.operators.dedup import drop_common_lines

        df = spark.createDataFrame(
            [(1, "a|b|c"), (None, "x|y")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in drop_common_lines(df, sep="|", max_docs=5).collect()}
        assert out[1].cleaned == "a|b|c" and out[1].n_kept == 3
        # NULL-id doc keeps its content (plain equi-join erased it)
        assert out[None].cleaned == "x|y" and out[None].n_kept == 2

    def test_minhash_empty_docs_form_no_mega_bucket(self, spark):
        from aqueducts_spark.operators.dedup import minhash_candidate_pairs

        rows = [(i, "") for i in range(20)] + [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "the quick brown fox jumps over the lazy dog today"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_candidate_pairs(df).collect()
        ids = {i for r in pairs for i in (r.id_a, r.id_b)}
        assert ids == {100, 101}  # no pairs among the 20 empty docs
