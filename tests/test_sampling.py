"""Deterministic sampling operators (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.sampling import (
    deterministic_split,
    hash_bucket,
    hash_sample,
    stratified_sample,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


class TestHashSample:
    def test_deterministic_across_runs(self, docs):
        a = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.2).select("doc_id").collect())
        b = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.2).select("doc_id").collect())
        assert a == b and len(a) > 0

    def test_rate_bounds(self, docs):
        total = docs.count()
        assert hash_sample(docs, "doc_id", 0.0).count() == 0
        assert hash_sample(docs, "doc_id", 1.0).count() == total
        n = hash_sample(docs, "doc_id", 0.3).count()
        assert 0.15 * total < n < 0.45 * total  # md5 is uniform

    def test_salt_draws_independent_sample(self, docs):
        a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect()}
        b = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, salt="other").collect()}
        assert a != b

    def test_subset_property(self, docs):
        """A smaller rate selects a subset of a larger rate (same salt):
        nested training subsets stay consistent."""
        small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.1).collect()}
        large = {r.doc_id for r in hash_sample(docs, "doc_id", 0.4).collect()}
        assert small <= large

    def test_invalid_rate(self, docs):
        with pytest.raises(ValueError):
            hash_sample(docs, "doc_id", 1.5)

    def test_no_shuffle(self, docs):
        plan = hash_sample(docs, "doc_id", 0.5)._sc._jvm.PythonSQLUtils.explainString(
            hash_sample(docs, "doc_id", 0.5)._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestStratifiedSample:
    def test_rates_respected(self, docs):
        langs = [r.lang for r in docs.select("lang").distinct().collect()]
        keep_all, drop = langs[0], langs[1]
        out = stratified_sample(docs, "doc_id", "lang", {keep_all: 1.0, drop: 0.0})
        counts = dict(
            out.groupBy("lang").count().collect()
        )
        assert counts.get(keep_all) == docs.filter(F.col("lang") == keep_all).count()
        assert drop not in counts

    def test_default_rate_applies_to_unlisted(self, docs):
        out = stratified_sample(docs, "doc_id", "lang", {}, default_rate=1.0)
        assert out.count() == docs.count()


class TestDeterministicSplit:
    def test_disjoint_exhaustive_and_stable(self, docs):
        out = deterministic_split(docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
        assert out.count() == docs.count()  # every row labeled exactly once
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        total = docs.count()
        assert set(counts) <= {"train", "valid", "test"}
        assert counts["train"] > 0.6 * total
        again = deterministic_split(docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
        diff = (
            out.select("doc_id", "split")
            .exceptAll(again.select("doc_id", "split"))
            .count()
        )
        assert diff == 0

    def test_bucket_range(self, docs):
        vals = docs.select(hash_bucket(F.col("doc_id")).alias("b")).agg(
            F.min("b"), F.max("b")
        ).collect()[0]
        assert vals[0] >= 0 and vals[1] < 10_000


def test_stratified_fixed_n_exact_budget(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    from aqueducts_spark.operators.sampling import stratified_fixed_n

    out = stratified_fixed_n(df, "doc_id", "lang", 7).collect()
    per = {}
    for r in out:
        per[r.lang] = per.get(r.lang, 0) + 1
    assert per == {"a": 7, "b": 7}
    # deterministic: same selection on re-run; different salt re-draws
    again = {r.doc_id for r in stratified_fixed_n(df, "doc_id", "lang", 7).collect()}
    assert again == {r.doc_id for r in out}
    other = {r.doc_id for r in stratified_fixed_n(df, "doc_id", "lang", 7, salt="x").collect()}
    assert other != again


def test_stratified_fixed_n_small_stratum_keeps_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "rare")], ["doc_id", "lang"])
    from aqueducts_spark.operators.sampling import stratified_fixed_n

    out = stratified_fixed_n(df, "doc_id", "lang", 10).collect()
    assert len(out) == 3


def test_group_cap_keeps_top_n_per_group(spark):
    from aqueducts_spark.operators.sampling import group_cap

    rows = [(i, "s%d" % (i % 3), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    out = group_cap(df, ["source"], "score", 2, tiebreak_col="doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r.doc_id)
    # highest scores per group are the largest ids of that residue class
    assert sorted(per["s0"]) == [24, 27]
    assert sorted(per["s1"]) == [25, 28]
    assert sorted(per["s2"]) == [26, 29]
    asc = group_cap(df, ["source"], "score", 1, descending=False,
                    tiebreak_col="doc_id").collect()
    assert sorted(r.doc_id for r in asc) == [0, 1, 2]


def test_group_cap_plans_window_group_limit(spark):
    """The per-group cap must pre-trim map-side (WindowGroupLimit), so
    the shuffle carries quota-sized data — the property that makes a
    hot-domain cap viable at 100 TB."""
    from aqueducts_spark.operators.sampling import group_cap

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).alias("source"),
        F.col("id").cast("double").alias("score"),
    )
    plan = group_cap(df, ["source"], "score", 3, tiebreak_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_group_cap_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    rows = [(i, "s%d" % (i % 2), float(i)) for i in range(10)]
    spark.createDataFrame(rows, ["doc_id", "source", "score"]).createOrReplaceTempView(
        "gc_in"
    )
    out = run_operator(
        spark,
        {
            "type": "group_cap",
            "input": "gc_in",
            "options": {
                "group_cols": "source",
                "order_col": "score",
                "n": 1,
                "tiebreak_col": "doc_id",
            },
        },
    )
    assert sorted(r.doc_id for r in out.collect()) == [8, 9]


def test_hash_sample_keeps_null_ids(spark):
    """A NULL id hashes via a sentinel: rate-1.0 keeps everything and
    splits route NULL ids deterministically instead of NULL-dropping."""
    from aqueducts_spark.operators.sampling import deterministic_split, hash_sample

    df = spark.createDataFrame([(None,), ("a",), ("b",)], "doc_id string")
    assert hash_sample(df, "doc_id", 1.0).count() == 3
    split = deterministic_split(df, "doc_id", {"train": 0.5, "test": 0.5})
    assert split.count() == 3 and split.where("split IS NULL").count() == 0


class TestWeightedSample:
    """weighted_sample: per-row Bernoulli keep probability — the
    application step for dup_weights / importance weights."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, w double")

    def test_extremes_and_determinism(self, spark):
        from aqueducts_spark.operators.sampling import weighted_sample

        rows = [(i, 1.0) for i in range(50)] + [
            (i, 0.0) for i in range(50, 100)
        ]
        out = weighted_sample(self._df(spark, rows), "doc_id", "w")
        kept = sorted(r.doc_id for r in out.collect())
        assert kept == list(range(50))  # weight 1 always kept, 0 never
        assert kept == sorted(r.doc_id for r in out.collect())  # stable

    def test_rate_tracks_weight(self, spark):
        from aqueducts_spark.operators.sampling import weighted_sample

        rows = [(i, 0.3) for i in range(4000)]
        n = weighted_sample(self._df(spark, rows), "doc_id", "w").count()
        assert abs(n / 4000 - 0.3) < 0.03

    def test_salt_draws_independent_samples(self, spark):
        from aqueducts_spark.operators.sampling import weighted_sample

        rows = [(i, 0.5) for i in range(2000)]
        a = {r.doc_id for r in weighted_sample(self._df(spark, rows), "doc_id", "w").collect()}
        b = {r.doc_id for r in weighted_sample(self._df(spark, rows), "doc_id", "w", salt="2").collect()}
        assert a != b
        overlap = len(a & b) / 2000
        assert abs(overlap - 0.25) < 0.05  # independent 0.5 x 0.5

    def test_invalid_weights_raise(self, spark):
        import pytest

        from aqueducts_spark.operators.sampling import weighted_sample

        for bad in (None, -0.1, 1.5):
            df = self._df(spark, [(1, bad), (2, 0.5)])
            with pytest.raises(Exception) as exc:
                weighted_sample(df, "doc_id", "w").collect()
            assert "weighted_sample" in str(exc.value)

    def test_matches_soft_dedup_expectation(self, spark):
        # alpha=1 weights: a group of n duplicates keeps ~1 row in
        # expectation — the exact_dedup-equivalent mass
        from aqueducts_spark.operators.dedup import dup_weights
        from aqueducts_spark.operators.sampling import weighted_sample

        rows = [(i, f"dup-{i % 20}") for i in range(2000)]  # 20 groups of 100
        df = spark.createDataFrame(rows, "doc_id long, text string")
        w = dup_weights(df, ["text"], alpha=1.0)
        n = weighted_sample(w, "doc_id", "dup_weight").count()
        assert 5 <= n <= 45  # E=20, binomial spread

    def test_no_shuffle_plan(self, spark):
        from aqueducts_spark.operators.sampling import weighted_sample

        df = self._df(spark, [(1, 0.5)])
        plan = weighted_sample(df, "doc_id", "w")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_registry_stage(self, spark):
        from aqueducts_spark.operators.registry import run_operator

        self._df(spark, [(1, 1.0), (2, 0.0)]).createOrReplaceTempView("ws_in")
        out = run_operator(
            spark,
            {"type": "weighted_sample", "input": "ws_in", "options": {"weight_col": "w"}},
        )
        assert [r.doc_id for r in out.collect()] == [1]
        spark.catalog.dropTempView("ws_in")


def test_group_cap_ascending_nulls_last(spark):
    from aqueducts_spark.operators.sampling import group_cap

    rows = [(i, "d", float(i)) for i in range(5)] + [
        (10 + i, "d", None) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    kept = {
        r.doc_id
        for r in group_cap(
            df, ["grp"], "score", 3, descending=False, tiebreak_col="doc_id"
        ).collect()
    }
    # the 3 LOWEST scores win; NULL-score rows must not eat the quota
    assert kept == {0, 1, 2}


def test_deterministic_split_clash_rejected(spark):
    from aqueducts_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame([(1, "train")], "doc_id long, split string")
    with pytest.raises(ValueError, match="already"):
        deterministic_split(df, "doc_id", {"train": 0.8, "test": 0.2})
