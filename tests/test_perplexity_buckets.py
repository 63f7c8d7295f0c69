"""CCNet-style perplexity bucketing (Wenzek et al. 2019 §4.3)
(operators/selection.py::perplexity_buckets)."""

import math

import pytest

from aqueducts_spark.operators.selection import perplexity_buckets


def _ref_buckets(rows, head=1 / 3, middle=1 / 3, group=None):
    """Python reference: rank by (score, id) within group; bucket by
    fractional position (rank-1)/n with plain IEEE comparisons; NULL
    scores are unconditionally tail (both engine paths agree)."""
    out = {}
    groups = {}
    for rid, score, g in rows:
        groups.setdefault(g if group else None, []).append((rid, score))
    for g, members in groups.items():
        ordered = sorted(
            members,
            key=lambda t: (t[1] is None, t[1] if t[1] is not None else 0, t[0]),
        )
        n = len(ordered)
        for rank, (rid, score) in enumerate(ordered, start=1):
            pos = float(rank - 1)
            out[rid] = (
                "tail" if score is None
                else "head" if pos < head * n
                else "middle" if pos < (head + middle) * n
                else "tail",
                rank,
            )
    return out


def test_terciles_per_group_match_reference(spark):
    rows = [
        (i, float((i * 7) % 13), "en" if i % 2 == 0 else "de")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, avg_nll double, lang string")
    got = {
        r.doc_id: (r.ppl_bucket, r.ppl_bucket_rank)
        for r in perplexity_buckets(
            df, "avg_nll", group_col="lang"
        ).collect()
    }
    assert got == _ref_buckets(rows, group="lang")


def test_head_is_lowest_scores(spark):
    rows = [(i, float(i), "x") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, avg_nll double, lang string")
    res = perplexity_buckets(df, "avg_nll", group_col="lang").collect()
    by_bucket = {}
    for r in res:
        by_bucket.setdefault(r.ppl_bucket, set()).add(r.doc_id)
    assert by_bucket["head"] == {0, 1, 2}
    assert by_bucket["middle"] == {3, 4, 5}
    assert by_bucket["tail"] == {6, 7, 8}


def test_custom_fractions_and_global_window(spark):
    rows = [(i, float(i), None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, avg_nll double, lang string")
    res = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(df, "avg_nll", head=0.2, middle=0.5).collect()
    }
    # head: floor(0.2*10+0.5)=2 ranks; middle: up to floor(0.7*10+0.5)=7
    assert [res[i] for i in range(10)] == (
        ["head"] * 2 + ["middle"] * 5 + ["tail"] * 3
    )


def test_null_scores_fall_to_tail_and_ties_break_by_id(spark):
    rows = [(1, 5.0), (2, None), (3, 5.0), (4, 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, avg_nll double")
    res = {
        r.doc_id: (r.ppl_bucket, r.ppl_bucket_rank)
        for r in perplexity_buckets(df, "avg_nll").collect()
    }
    # order: 4 (1.0), 1 (5.0, id tiebreak), 3 (5.0), 2 (NULL last);
    # n=4, positions 0,1,2,3 vs cuts 4/3 and 8/3
    assert res[4] == ("head", 1)
    assert res[1] == ("head", 2)
    assert res[3] == ("middle", 3)
    assert res[2] == ("tail", 4)


def test_all_null_group_is_all_tail_in_both_methods(spark):
    # NULLs must never be promoted into head/middle by NULLS-LAST
    # ranking alone — exact and approx agree that unscoreable == tail
    rows = [(1, None, "g"), (2, None, "g"), (3, None, "g"), (4, 1.0, "h")]
    df = spark.createDataFrame(rows, "doc_id long, s double, g string")
    for method in ("exact", "approx"):
        res = {
            r.doc_id: r.ppl_bucket
            for r in perplexity_buckets(
                df, "s", group_col="g", method=method
            ).collect()
        }
        assert res[1] == res[2] == res[3] == "tail", (method, res)
        assert res[4] == "head", (method, res)


def test_single_row_group_is_head(spark):
    df = spark.createDataFrame([(1, 2.0, "g")], "doc_id long, s double, g string")
    assert (
        perplexity_buckets(df, "s", group_col="g").collect()[0].ppl_bucket
        == "head"
    )


def test_invalid_fractions_rejected(spark):
    df = spark.createDataFrame([(1, 2.0)], "doc_id long, s double")
    with pytest.raises(ValueError, match="head"):
        perplexity_buckets(df, "s", head=0.7, middle=0.5)
    with pytest.raises(ValueError, match="head"):
        perplexity_buckets(df, "s", head=-0.1)


def test_one_exchange_in_plan(spark):
    df = spark.createDataFrame(
        [(i, float(i), "g") for i in range(10)],
        "doc_id long, s double, g string",
    )
    plan = (
        perplexity_buckets(df, "s", group_col="g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash shuffle on the group key feeds both window functions
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_approx_matches_exact_on_distinct_scores(spark):
    rows = [
        (i, float((i * 7) % 101) + i / 1000.0, "en" if i % 2 == 0 else "de")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, s double, g string")
    exact = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(df, "s", group_col="g").collect()
    }
    approx = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(
            df, "s", group_col="g", method="approx"
        ).collect()
    }
    # default accuracy (10k) is exact at this size; ties absent, so the
    # threshold rule and the rank rule pick identical buckets
    assert approx == exact


def test_approx_has_no_rank_no_sort_and_broadcasts(spark):
    df = spark.createDataFrame(
        [(i, float(i), "g") for i in range(30)],
        "doc_id long, s double, g string",
    )
    out = perplexity_buckets(df, "s", group_col="g", method="approx")
    assert "ppl_bucket_rank" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_approx_global_and_null_scores(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, None)],
        "doc_id long, s double",
    )
    res = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_buckets(df, "s", method="approx").collect()
    }
    assert res[1] == "head" and res[2] == "middle" and res[3] == "tail"
    assert res[4] == "tail"  # NULL score -> tail, like the exact path


def test_bad_method_rejected(spark):
    df = spark.createDataFrame([(1, 2.0)], "doc_id long, s double")
    with pytest.raises(ValueError, match="method"):
        perplexity_buckets(df, "s", method="sampled")


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(i, float(i % 4), "en") for i in range(8)],
        "doc_id long, avg_nll double, lang string",
    ).createOrReplaceTempView("ppl_docs")
    out = run_operator(
        spark,
        {
            "type": "perplexity_buckets",
            "input": "ppl_docs",
            "options": {"score_col": "avg_nll", "group_col": "lang"},
        },
    )
    assert set(out.columns) >= {"ppl_bucket", "ppl_bucket_rank"}
    assert out.count() == 8


def test_output_clash_rejected(spark):
    from aqueducts_spark.operators.selection import perplexity_buckets

    df = spark.createDataFrame(
        [(1, 1.0, "x")], "doc_id long, s double, ppl_bucket string"
    )
    with pytest.raises(ValueError, match="already"):
        perplexity_buckets(df, "s")
