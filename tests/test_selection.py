"""DSIR importance-resampling selection (operators/selection.py):
log-ratio weights, determinism/partition-independence, Gumbel top-k."""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.selection import (
    dsir_bucket_counts,
    dsir_select,
    dsir_weights,
)

TARGET = [
    (100, "the encyclopedia article describes the ancient city"),
    (101, "the article cites the primary historical sources"),
    (102, "the city grew around the river crossing"),
]
RAW = [
    (1, "the article describes the ancient city sources"),  # target-like
    (2, "buy cheap pills online best price click here"),     # spam-like
    (3, "the river crossing article cites historical sources"),
    (4, "click here now free offer limited time click"),
]


def _weights(spark, **kw):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    return dsir_weights(raw, target, **kw)


def test_dsir_weights_rank_target_like_docs_higher(spark):
    w = {r.doc_id: r.logw for r in _weights(spark).collect()}
    assert set(w) == {1, 2, 3, 4}
    # both target-like docs outscore both spam-like docs
    assert min(w[1], w[3]) > max(w[2], w[4])


def test_dsir_weights_integer_micro_nats_and_feature_counts(spark):
    rows = {r.doc_id: r for r in _weights(spark).collect()}
    for r in rows.values():
        assert isinstance(r.logw_micro, int)
        assert abs(r.logw - r.logw_micro / 1e6) < 1e-12
    # unigrams + bigrams: a 7-token doc has 7 + 6 = 13 features
    assert rows[1].n_feats == 7 + 6


def test_dsir_weights_partition_independent(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    a = sorted(
        (r.doc_id, r.logw_micro)
        for r in dsir_weights(raw.repartition(7), target.repartition(3)).collect()
    )
    b = sorted(
        (r.doc_id, r.logw_micro)
        for r in dsir_weights(raw.coalesce(1), target.coalesce(1)).collect()
    )
    assert a == b


def test_dsir_weights_empty_and_null_text_docs_survive(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "the ancient city"), (2, ""), (3, None)], "doc_id long, text string"
    )
    got = {r.doc_id for r in dsir_weights(raw, target).collect()}
    assert got == {1, 2, 3}


def test_dsir_weights_separate_raw_corpus(spark):
    """Scoring df against a raw distribution fitted elsewhere: buckets
    unseen by either corpus take the smoothed-zero ratio instead of
    dropping the feature."""
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    other = spark.createDataFrame(
        [(9, "completely novel unseen vocabulary zzzqqq")],
        "doc_id long, text string",
    )
    out = dsir_weights(other, target, raw=raw).collect()
    assert len(out) == 1 and out[0].n_feats == 5 + 4


def test_dsir_weights_validation(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    with pytest.raises(ValueError, match="smoothing"):
        dsir_weights(raw, target, smoothing=0.0)
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(raw, target, buckets=0)


def test_dsir_bucket_counts_bounded_by_buckets(spark):
    df = spark.createDataFrame(RAW, "doc_id long, text string")
    corpus = dsir_bucket_counts(df, buckets=16)
    assert corpus.count() <= 16
    assert corpus.agg(F.min("bucket")).collect()[0][0] >= 0
    assert corpus.agg(F.max("bucket")).collect()[0][0] < 16


def test_dsir_select_deterministic_topk(spark):
    w = _weights(spark)
    s1 = sorted(r.doc_id for r in dsir_select(w, 2).collect())
    s2 = sorted(r.doc_id for r in dsir_select(w, 2).collect())
    assert s1 == s2 and len(s1) == 2
    # near-zero temperature -> selection is argmax over logw
    cold = sorted(r.doc_id for r in dsir_select(w, 2, temperature=1e-3).collect())
    assert cold == sorted([1, 3])
    # helper key column is dropped
    assert dsir_select(w, 2).columns == w.columns


def test_dsir_select_plans_global_topk_not_full_sort(spark):
    w = _weights(spark)
    plan = dsir_select(w, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_dsir_select_validation(spark):
    w = _weights(spark)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(w, 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_select(w, 1, temperature=0)


def test_dsir_registry_stages(spark):
    from aqueducts_spark.operators.registry import OperatorError, run_operator

    spark.createDataFrame(TARGET, "doc_id long, text string").createOrReplaceTempView(
        "dsir_target"
    )
    spark.createDataFrame(RAW, "doc_id long, text string").createOrReplaceTempView(
        "dsir_raw"
    )
    w = run_operator(
        spark,
        {
            "type": "dsir_weights",
            "input": "dsir_raw",
            "options": {"target": "dsir_target"},
        },
    )
    assert set(w.columns) == {"doc_id", "n_feats", "logw_micro", "logw"}
    w.createOrReplaceTempView("dsir_w")
    sel = run_operator(
        spark,
        {
            "type": "dsir_select",
            "input": "dsir_w",
            "options": {"k": 2, "temperature": 0.001},
        },
    )
    assert sorted(r.doc_id for r in sel.collect()) == [1, 3]
    with pytest.raises(OperatorError, match="dsir_weights requires"):
        run_operator(spark, {"type": "dsir_weights", "input": "dsir_raw"})
    with pytest.raises(OperatorError, match="dsir_select requires"):
        run_operator(spark, {"type": "dsir_select", "input": "dsir_w"})
    spark.catalog.dropTempView("dsir_target")
    spark.catalog.dropTempView("dsir_raw")
    spark.catalog.dropTempView("dsir_w")


def test_dsir_prefitted_ratios_match_inline_fit(spark):
    """dsir_log_ratios -> dsir_weights(ratios=) is bit-identical to the
    inline fit, including after a persist round-trip (the λ table is
    self-contained: the -1 sentinel row carries the smoothed-zero
    ratio)."""
    import tempfile

    from aqueducts_spark.operators.selection import dsir_log_ratios

    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    inline = sorted(
        (r.doc_id, r.logw_micro)
        for r in dsir_weights(raw, target, buckets=512).collect()
    )
    ratios = dsir_log_ratios(target, raw, buckets=512)
    loc = tempfile.mkdtemp() + "/ratios"
    ratios.write.parquet(loc)
    reloaded = spark.read.parquet(loc)
    prefit = sorted(
        (r.doc_id, r.logw_micro)
        for r in dsir_weights(raw, ratios=reloaded, buckets=512).collect()
    )
    assert inline == prefit
    # scoring a corpus DISJOINT from the fit uses the sentinel ratio
    other = spark.createDataFrame(
        [(9, "zzzq unseen vocabulary entirely")], "doc_id long, text string"
    )
    out = dsir_weights(other, ratios=reloaded, buckets=512).collect()
    assert len(out) == 1 and out[0].n_feats == 4 + 3


def test_dsir_weights_requires_exactly_one_of_target_ratios(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    with pytest.raises(ValueError, match="exactly one"):
        dsir_weights(raw)
    from aqueducts_spark.operators.selection import dsir_log_ratios

    ratios = dsir_log_ratios(target, raw, buckets=64)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_weights(raw, target, ratios=ratios)


def test_dsir_log_ratios_registry_stage(spark):
    from aqueducts_spark.operators.registry import OperatorError, run_operator

    spark.createDataFrame(TARGET, "doc_id long, text string").createOrReplaceTempView(
        "dsirr_target"
    )
    spark.createDataFrame(RAW, "doc_id long, text string").createOrReplaceTempView(
        "dsirr_raw"
    )
    ratios = run_operator(
        spark,
        {
            "type": "dsir_log_ratios",
            "input": "dsirr_raw",
            "options": {"target": "dsirr_target", "buckets": 64},
        },
    )
    assert set(ratios.columns) == {"bucket", "lam_micro"}
    assert ratios.where("bucket = -1").count() == 1
    ratios.createOrReplaceTempView("dsirr_ratios")
    w = run_operator(
        spark,
        {
            "type": "dsir_weights",
            "input": "dsirr_raw",
            "options": {"ratios": "dsirr_ratios", "buckets": 64},
        },
    )
    assert w.count() == 4
    with pytest.raises(OperatorError, match="exactly one"):
        run_operator(
            spark,
            {
                "type": "dsir_weights",
                "input": "dsirr_raw",
                "options": {
                    "target": "dsirr_target", "ratios": "dsirr_ratios",
                },
            },
        )
    with pytest.raises(OperatorError, match="dsir_log_ratios requires"):
        run_operator(spark, {"type": "dsir_log_ratios", "input": "dsirr_raw"})
    for v in ("dsirr_target", "dsirr_raw", "dsirr_ratios"):
        spark.catalog.dropTempView(v)


def test_dsir_weights_probe_plan_is_one_corpus_pass(spark):
    """r8 plan contract: the fit's joined counts are eagerly
    materialized (AQE never reuses a shared exchange across consumers
    — the lazy r7 form re-ran the count passes per statistics consumer,
    11 corpus scans in the executed plan), so the FINAL executed plan
    — the probe — carries exactly ONE tokenize/explode subtree over
    the corpus and no re-run of the fit lineage."""
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")

    def final_plan(df):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE's toString carries the initial plan after the final one;
        # only the final plan is what executed
        return plan.split("== Initial Plan ==")[0]

    w = dsir_weights(raw, target, buckets=256)
    plan = final_plan(w)
    # the probe's per-doc counts explode — the fit side reads the
    # materialized model blocks, never a gram subtree
    assert plan.count("Generate explode") == 1
    # both statistics consumers read the checkpointed joined counts
    assert plan.count("Scan ExistingRDD") >= 2


def test_dsir_weights_rejects_fit_params_with_prefitted_ratios(spark):
    from aqueducts_spark.operators.selection import dsir_log_ratios

    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    ratios = dsir_log_ratios(target, raw, buckets=64)
    for kw in (
        {"smoothing": 0.5},
        {"raw": raw},
        {"target_text_col": "text"},
    ):
        with pytest.raises(ValueError, match="fit-time"):
            dsir_weights(raw, ratios=ratios, buckets=64, **kw)


def test_dsir_select_large_k_threshold_path_exact(spark):
    """k = 25% of a 2000-row corpus through the distributed threshold
    path is row-identical to the driver top-k path, and its plan has no
    global limit (no TakeOrderedAndProject / CollectLimit of the
    selection)."""
    rows = [(i, float((i * 37) % 101) / 10.0) for i in range(2000)]
    w = spark.createDataFrame(rows, "doc_id long, logw double")
    k = 500
    exact = sorted(
        r.doc_id for r in dsir_select(w, k, max_driver_k=10**9).collect()
    )
    dist = dsir_select(w, k, max_driver_k=100)
    got = sorted(r.doc_id for r in dist.collect())
    assert got == exact and len(got) == k
    plan = dist._jdf.queryExecution().executedPlan().toString()
    # the k selected rows never funnel through a driver-side limit: the
    # only limits allowed are the boundary-slice trim (O(eps*n) rows,
    # Catalyst may plan the rank filter as a small top-k), never k
    import re

    limits = [
        int(m)
        for m in re.findall(
            r"(?:TakeOrderedAndProject|CollectLimit|GlobalLimit)\D*?(\d+)", plan
        )
    ]
    assert all(lim < k for lim in limits), limits
    assert dist.columns == w.columns


def test_dsir_select_large_k_covers_whole_corpus(spark):
    w = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(300)], "doc_id long, logw double"
    )
    out = dsir_select(w, 300, max_driver_k=10)
    assert out.count() == 300
    assert dsir_select(w, 1000, max_driver_k=10).count() == 300


def test_dsir_registry_rejects_fit_params_with_ratios(spark):
    from aqueducts_spark.operators.registry import OperatorError, run_operator
    from aqueducts_spark.operators.selection import dsir_log_ratios

    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    dsir_log_ratios(target, raw, buckets=64).createOrReplaceTempView(
        "dsirg_ratios"
    )
    raw.createOrReplaceTempView("dsirg_raw")
    import pytest as _pytest

    with _pytest.raises(OperatorError, match="fit-time"):
        run_operator(
            spark,
            {
                "type": "dsir_weights",
                "input": "dsirg_raw",
                "options": {"ratios": "dsirg_ratios", "smoothing": 2.0},
            },
        )
    # without fit params the ratios path works
    out = run_operator(
        spark,
        {
            "type": "dsir_weights",
            "input": "dsirg_raw",
            "options": {"ratios": "dsirg_ratios", "buckets": 64},
        },
    )
    assert out.count() == 4
    spark.catalog.dropTempView("dsirg_ratios")
    spark.catalog.dropTempView("dsirg_raw")


def test_dsir_select_large_k_mass_ties_at_cut(spark):
    """Keys that mass-tie across the quantile cut (duplicate ids draw
    identical Gumbel keys) must not shrink the selection: the boundary
    slice is inclusive at t_lo and the exact-rank fallback covers the
    rest."""
    # 40 distinct high rows + 400 byte-identical rows (same id, same
    # logw -> identical keys) straddling the cut
    rows = [(i, 100.0 + i) for i in range(40)] + [(999, 1.0)] * 400
    w = spark.createDataFrame(rows, "doc_id long, logw double")
    k = 200
    exact = dsir_select(w, k, max_driver_k=10**9)
    dist = dsir_select(w, k, max_driver_k=10)
    assert exact.count() == k
    assert dist.count() == k
    got = {r.doc_id for r in dist.collect()}
    assert set(range(40)) <= got and 999 in got


def test_dsir_select_large_k_null_logw_matches_topk_semantics(spark):
    """NULL logw rows sort last; the threshold path must return the
    same row multiset as the driver top-k path, not silently fewer."""
    rows = [(i, float(i)) for i in range(100)] + [
        (1000 + i, None) for i in range(50)
    ]
    w = spark.createDataFrame(rows, "doc_id long, logw double")
    # k smaller than the non-null count: NULLs can never be selected
    a = sorted(r.doc_id for r in dsir_select(w, 80, max_driver_k=10).collect())
    b = sorted(
        r.doc_id for r in dsir_select(w, 80, max_driver_k=10**9).collect()
    )
    assert a == b and len(a) == 80
    # k larger than the non-null count: NULL-key rows top up the tail
    big = dsir_select(w, 120, max_driver_k=10)
    assert big.count() == 120
    got = {r.doc_id for r in big.collect()}
    assert set(range(100)) <= got  # every real-key row selected
