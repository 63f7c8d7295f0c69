"""KMV distinct-count sketch (operators/sketch.py).

Covers: exact branch (group cardinality < k), estimate accuracy on a
large group, merge law (KMV(A ∪ B) == merge(KMV(A), KMV(B))), and the
declarative registry stage.
"""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.sketch import (
    kmv_distinct,
    kmv_estimate,
    kmv_sketch,
    merge_kmv_sketches,
)


@pytest.fixture(scope="module")
def toy(spark):
    # group "small": 10 distinct values (< k) repeated; group "big": 5000
    rows = [("small", v % 10) for v in range(100)] + [
        ("big", v) for v in range(5000)
    ]
    return spark.createDataFrame(rows, "grp string, v long")


def test_exact_below_k(spark, toy):
    out = {
        r["grp"]: r
        for r in kmv_distinct(toy, ["grp"], "v", k=64).collect()
    }
    assert out["small"]["sketch_size"] == 10
    assert out["small"]["distinct_est"] == 10.0


def test_estimate_accuracy(spark, toy):
    est = {
        r["grp"]: r["distinct_est"]
        for r in kmv_distinct(toy, ["grp"], "v", k=256).collect()
    }
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; allow 3 sigma
    assert est["big"] == pytest.approx(5000, rel=0.20)


def test_sketch_size_capped(spark, toy):
    sk = kmv_sketch(toy, ["grp"], "v", k=64)
    sizes = {
        r["grp"]: r["n"]
        for r in sk.groupBy("grp").agg(F.count("h").alias("n")).collect()
    }
    assert sizes["big"] == 64
    assert sizes["small"] == 10


def test_merge_equals_union(spark, toy):
    a = toy.where("v % 2 = 0")
    b = toy.where("v % 2 = 1")
    merged = merge_kmv_sketches(
        [kmv_sketch(a, ["grp"], "v", k=64), kmv_sketch(b, ["grp"], "v", k=64)],
        ["grp"],
        k=64,
    )
    direct = kmv_sketch(toy, ["grp"], "v", k=64)
    m = sorted(map(tuple, merged.select("grp", "h", "rank").collect()))
    d = sorted(map(tuple, direct.select("grp", "h", "rank").collect()))
    assert m == d
    # and the estimates from the merged sketch are identical too
    em = sorted(map(tuple, kmv_estimate(merged, ["grp"], k=64).collect()))
    ed = sorted(map(tuple, kmv_estimate(direct, ["grp"], k=64).collect()))
    assert em == ed


def test_bucket_count_does_not_change_result(spark, toy):
    # the bucketed top-k trim is an execution detail: any global top-k
    # hash is its own bucket's top-k, so B must not affect the sketch
    base = sorted(
        map(tuple, kmv_sketch(toy, ["grp"], "v", k=64, buckets=64).collect())
    )
    for b in (1, 7, 256):
        got = sorted(
            map(tuple, kmv_sketch(toy, ["grp"], "v", k=64, buckets=b).collect())
        )
        assert got == base, f"buckets={b} changed the sketch"


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2)], "grp string, v long"
    )
    row = kmv_distinct(df, ["grp"], "v", k=8).collect()[0]
    assert row["sketch_size"] == 2


def test_k_validation(spark, toy):
    with pytest.raises(ValueError):
        kmv_sketch(toy, ["grp"], "v", k=1)


def test_registry_stage(spark, sf_dir):
    from aqueducts_spark.operators.registry import run_operator

    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "kmv_orders"
    )
    out = run_operator(
        spark,
        {
            "type": "kmv_distinct",
            "input": "kmv_orders",
            "options": {
                "group_cols": ["o_orderpriority"],
                "value_col": "o_custkey",
                "k": 32,
            },
        },
    )
    rows = out.collect()
    assert set(out.columns) == {"o_orderpriority", "sketch_size", "distinct_est"}
    assert all(r["sketch_size"] <= 32 for r in rows)
    assert len(rows) == 5
    spark.catalog.dropTempView("kmv_orders")


def test_bloom_filter_rejects_mismatched_num_bits(spark):
    from aqueducts_spark.operators.sketch import bloom_filter, bloom_sketch

    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    sketch = bloom_sketch(df, "k", num_bits=8192)
    with pytest.raises(ValueError, match="different num_bits"):
        bloom_filter(df, "k", sketch, num_bits=64).count()


def test_bloom_filter_no_false_negatives(spark):
    from aqueducts_spark.operators.sketch import bloom_filter, bloom_sketch

    members = spark.createDataFrame([(i,) for i in range(0, 500, 5)], ["k"])
    probes = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    bits = bloom_sketch(members, "k", num_bits=4096, num_hashes=4)
    kept = {r.k for r in bloom_filter(probes, "k", bits, num_bits=4096, num_hashes=4).collect()}
    # every true member survives (the bloom contract); non-members may
    # leak through as false positives but never the other way round
    assert set(range(0, 500, 5)) <= kept


def test_bloom_filter_drops_nulls_and_most_nonmembers(spark):
    from aqueducts_spark.operators.sketch import bloom_filter, bloom_sketch

    members = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    probes = spark.createDataFrame(
        [(i,) for i in range(1000, 2000)] + [(None,)], ["k"]
    )
    bits = bloom_sketch(members, "k", num_bits=8192, num_hashes=4)
    out = bloom_filter(probes, "k", bits, num_bits=8192, num_hashes=4)
    rows = out.collect()
    assert all(r.k is not None for r in rows)  # a bloom can't vouch for NULL
    # 50 keys in 8192 bits, 4 hashes -> fp rate well under 1%
    assert len(rows) < 50


def test_cms_never_underestimates_and_is_exact_when_sparse(spark):
    from aqueducts_spark.operators.sketch import cms_estimate, cms_sketch

    # frequencies: value i appears i times, i in 1..20
    rows = [(v,) for v in range(1, 21) for _ in range(v)]
    df = spark.createDataFrame(rows, ["v"])
    sk = cms_sketch(df, [], "v", width=1024, depth=3)
    items = spark.createDataFrame([(v,) for v in range(1, 21)], ["v"])
    est = {
        r.v: r.freq_est
        for r in cms_estimate(sk, items, "v", width=1024, depth=3).collect()
    }
    for v in range(1, 21):
        assert est[v] >= v  # CMS point queries never underestimate
    # 20 distinct values in 1024 cells x 3 rows: collisions essentially
    # impossible, so the estimates are exact
    assert est == {v: v for v in range(1, 21)}


def test_cms_merge_equals_whole(spark):
    from aqueducts_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
        merge_cms_sketches,
    )

    a = spark.createDataFrame([(v,) for v in [1, 1, 2, 3]], ["v"])
    b = spark.createDataFrame([(v,) for v in [1, 3, 3, 4]], ["v"])
    merged = merge_cms_sketches(
        [cms_sketch(a, [], "v"), cms_sketch(b, [], "v")]
    )
    whole = cms_sketch(a.unionAll(b), [], "v")
    items = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], ["v"])
    em = {r.v: r.freq_est for r in cms_estimate(merged, items, "v").collect()}
    ew = {r.v: r.freq_est for r in cms_estimate(whole, items, "v").collect()}
    assert em == ew == {1: 3, 2: 1, 3: 3, 4: 1}  # counters are linear


def test_dd_quantile_within_relative_error(spark):
    from aqueducts_spark.operators.sketch import dd_quantile, dd_sketch

    import random

    rnd = random.Random(7)
    vals = [rnd.lognormvariate(5, 2) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    gamma = 1.02
    sk = dd_sketch(df, [], "v", gamma=gamma)
    est = {r.q: r.est for r in dd_quantile(sk, [], [0.1, 0.5, 0.9, 0.99], gamma=gamma).collect()}
    svals = sorted(vals)
    bound = (gamma - 1) / (gamma + 1)
    for q in [0.1, 0.5, 0.9, 0.99]:
        exact = svals[int(q * (len(svals) - 1))]
        rel = abs(est[q] - exact) / exact
        assert rel <= bound + 1e-9, (q, est[q], exact, rel)


def test_dd_sketch_handles_negatives_and_zero(spark):
    from aqueducts_spark.operators.sketch import dd_quantile, dd_sketch

    vals = [-100.0, -1.0, 0.0, 1.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    sk = dd_sketch(df, [], "v")
    est = {r.q: r.est for r in dd_quantile(sk, [], [0.0, 0.5, 1.0]).collect()}
    bound = 0.02 / 2.02 + 1e-9
    assert est[0.5] == 0.0  # median is the zero bucket, exact
    assert abs(est[0.0] - (-100.0)) / 100.0 <= bound
    assert abs(est[1.0] - 100.0) / 100.0 <= bound


def test_dd_merge_equals_whole(spark):
    from aqueducts_spark.operators.sketch import (
        dd_quantile,
        dd_sketch,
        merge_dd_sketches,
    )

    a = spark.createDataFrame([(float(v),) for v in range(1, 101)], ["v"])
    b = spark.createDataFrame([(float(v),) for v in range(101, 201)], ["v"])
    merged = merge_dd_sketches([dd_sketch(a, [], "v"), dd_sketch(b, [], "v")])
    whole = dd_sketch(a.unionAll(b), [], "v")
    qm = {r.q: r.est for r in dd_quantile(merged, [], [0.5, 0.9]).collect()}
    qw = {r.q: r.est for r in dd_quantile(whole, [], [0.5, 0.9]).collect()}
    assert qm == qw  # bucket counters are linear


def test_dd_sketch_single_shuffle(spark, sf_dir):
    from aqueducts_spark.operators.sketch import dd_sketch
    from aqueducts_spark.plans import inspect_plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    info = inspect_plan(dd_sketch(li, ["l_returnflag"], "l_extendedprice"))
    assert info.exchanges == 1, f"{info.exchanges} exchanges\n{info.text[:1500]}"
    assert info.python_evals == 0


def test_dd_registry_stage(spark, sf_dir):
    from aqueducts_spark.operators.registry import run_operator

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "dd_lineitem"
    )
    out = run_operator(
        spark,
        {
            "type": "dd_quantiles",
            "input": "dd_lineitem",
            "options": {
                "group_cols": ["l_returnflag"],
                "value_col": "l_extendedprice",
                "quantiles": [0.5],
            },
        },
    )
    rows = out.collect()
    assert set(out.columns) == {"l_returnflag", "q", "est"}
    assert len(rows) == 3  # one median per returnflag
    assert all(r.est > 0 for r in rows)
    spark.catalog.dropTempView("dd_lineitem")


def test_dd_sketch_excludes_nonfinite(spark):
    from aqueducts_spark.operators.sketch import dd_quantile, dd_sketch

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (float("nan"),), (float("inf"),), (float("-inf"),), (None,)],
        "v double",
    )
    sk = dd_sketch(df, [], "v")
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 3  # finite rows only
    est = {r.q: r.est for r in dd_quantile(sk, [], [0.5]).collect()}
    assert abs(est[0.5] - 2.0) / 2.0 <= 0.02 / 2.02 + 1e-9


def test_kmv_estimate_detects_build_k_mismatch(spark):
    """A saturated k=8 sketch estimated with the old k=64 default
    silently reported 'exactly 8' for a ~300-distinct group; the sketch
    now carries its build k and a contradicting argument raises."""
    import pytest as _pytest

    toy = spark.createDataFrame(
        [("g", f"v{i}") for i in range(300)], "grp string, v string"
    )
    sk = kmv_sketch(toy, ["grp"], "v", k=8)
    est = kmv_estimate(sk, ["grp"], k=None).collect()[0]
    assert est.sketch_size == 8
    assert 100 <= est.distinct_est <= 900  # estimated, never "exact 8"
    with _pytest.raises(Exception, match="contradicts"):
        kmv_estimate(sk, ["grp"], k=64).collect()
    # matching k still fine
    ok = kmv_estimate(sk, ["grp"], k=8).collect()[0]
    assert ok.distinct_est == est.distinct_est


def test_bloom_filter_quoted_column_names(spark):
    """Non-bare column names must work (and not be an injection
    surface) — the probe SQL quotes the identifier."""
    from aqueducts_spark.operators.sketch import bloom_filter, bloom_sketch

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz")], ["id", "user id"]
    )
    bits = bloom_sketch(df.where("id < 3"), "user id", num_bits=1024)
    kept = bloom_filter(df, "user id", bits, num_bits=1024)
    ids = sorted(r.id for r in kept.collect())
    assert 1 in ids and 2 in ids  # no false negatives


class TestCorpusOverlap:
    """corpus_overlap (Beyer SIGMOD'07 KMV set ops): overlap estimates
    from two bounded sketches, exact below saturation."""

    def _df(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "doc_id long")

    def test_exact_below_saturation(self, spark):
        from aqueducts_spark.operators.sketch import corpus_overlap

        a = self._df(spark, range(0, 60))
        b = self._df(spark, range(40, 100))
        r = corpus_overlap(a, b, k=256).first()
        # both sides < k distinct: every number is EXACT
        assert r.distinct_a_est == 60.0 and r.distinct_b_est == 60.0
        assert r.union_est == 100.0 and r.intersection_est == 20.0
        assert r.jaccard_est == 0.2
        assert r.containment_a_in_b == round(20 / 60, 4)

    def test_subset_containment_is_one(self, spark):
        from aqueducts_spark.operators.sketch import corpus_overlap

        a = self._df(spark, range(0, 3000, 3))  # 1000 distinct
        b = self._df(spark, range(0, 3000))     # superset, 3000 distinct
        r = corpus_overlap(a, b, k=128).first()
        # every union-sketch hash from A is also in B -> resemblance
        # containment a-in-b is exactly 1 even in the saturated regime
        assert r.containment_a_in_b == 1.0
        # sanity, not precision: the deterministic md5 draw for this
        # corpus happens to sit ~3.5 sigma high at k=128 (sigma ~ 9%)
        assert abs(r.distinct_b_est - 3000) / 3000 < 0.4
        assert abs(r.jaccard_est - 1 / 3) < 0.15

    def test_disjoint_and_empty(self, spark):
        from aqueducts_spark.operators.sketch import corpus_overlap

        a = self._df(spark, range(0, 50))
        b = self._df(spark, range(1000, 1050))
        r = corpus_overlap(a, b, k=64).first()
        assert r.intersection_est == 0.0 and r.jaccard_est == 0.0
        # REGRESSION: union (100) exceeds k (64) while both SIDES are
        # unsaturated — the exact branch must not fire (it would
        # hard-cap the union at k=64); the kth-hash estimator applies
        assert 70 < r.union_est < 160 and r.union_est != 64.0
        empty = self._df(spark, [])
        r2 = corpus_overlap(a, empty, k=64).first()
        assert r2.distinct_b_est == 0.0 and r2.containment_b_in_a is None
        assert r2.containment_a_in_b == 0.0

    def test_duplicates_do_not_inflate(self, spark):
        from aqueducts_spark.operators.sketch import corpus_overlap

        a = self._df(spark, list(range(20)) * 50)  # 20 distinct, 1000 rows
        b = self._df(spark, range(10, 30))
        r = corpus_overlap(a, b, k=256).first()
        assert r.distinct_a_est == 20.0 and r.intersection_est == 10.0

    def test_registry_stage(self, spark):
        from aqueducts_spark.operators.registry import run_operator

        self._df(spark, range(10)).createOrReplaceTempView("co_a")
        self._df(spark, range(5, 15)).createOrReplaceTempView("co_b")
        out = run_operator(
            spark,
            {"type": "corpus_overlap", "input": "co_a", "options": {"other": "co_b"}},
        )
        assert out.first().intersection_est == 5.0
        for v in ("co_a", "co_b"):
            spark.catalog.dropTempView(v)


def test_cms_merge_range_validation(spark):
    from aqueducts_spark.operators.sketch import cms_sketch, merge_cms_sketches

    a = spark.createDataFrame([(v,) for v in [1, 2, 3]], ["v"])
    small = cms_sketch(a, [], "v", width=64, depth=3)
    big = cms_sketch(a, [], "v", width=1024, depth=3)
    # declared parameters match the small build: the 1024-wide input's
    # out-of-range cells must fail loudly, not overestimate silently
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        merge_cms_sketches([small, big], width=64, depth=3).collect()
    assert "merge_cms_sketches" in str(exc.value)
    # matching parameters pass the guard unchanged
    ok = merge_cms_sketches([small, small], width=64, depth=3)
    assert ok.count() > 0
    # depth violation: a depth-5 build merged under a declared depth of 3
    deep = cms_sketch(a, [], "v", width=64, depth=5)
    with _pytest.raises(Exception) as exc:
        merge_cms_sketches([small, deep], width=64, depth=3).collect()
    assert "merge_cms_sketches" in str(exc.value)
