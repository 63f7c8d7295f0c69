"""Table profiler (operators/profile.py): per-column stats in one
aggregation pass."""

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, "a", 1.5),
        (2, "a", None),
        (3, None, 2.5),
        (3, "b", 2.5),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def test_profile_stats(spark, toy):
    got = {r.column: r for r in profile_table(toy).collect()}
    assert set(got) == {"id", "s", "v"}
    for r in got.values():
        assert r.n_rows == 4
    assert (got["id"].n_nulls, got["id"].n_distinct) == (0, 3)
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (1, 2)
    assert (got["id"].min_repr, got["id"].max_repr) == ("1", "3")
    assert (got["s"].min_repr, got["s"].max_repr) == ("a", "b")
    assert got["id"].dtype == "bigint" and got["v"].dtype == "double"


def test_profile_column_subset_and_unknown(spark, toy):
    assert {r.column for r in profile_table(toy, ["id"]).collect()} == {"id"}
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(toy, ["nope"])


def test_profile_approx_mode_no_expand(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact_plan = (
        profile_table(orders, ["o_orderkey", "o_custkey"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        profile_table(orders, ["o_orderkey", "o_custkey"], exact_distinct=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exact multi-column distinct needs EXPAND; the HLL mode must not
    assert "Expand" in exact_plan and "Expand" not in approx_plan


def test_profile_stage(spark, sf_dir, tmp_path):
    from aqueducts_spark import load_pipeline_str, run_pipeline

    yml = f"""
version: "v2"
sources:
  - type: file
    name: prof_orders
    format: {{type: parquet}}
    location: {sf_dir}/orders.parquet
stages:
  - - name: prof
      operator:
        type: profile_table
        input: prof_orders
        options: {{columns: [o_orderkey, o_orderstatus]}}
destination:
  type: file
  name: out
  format: {{type: parquet}}
  location: {tmp_path}/prof_out
"""
    run_pipeline(spark, load_pipeline_str(yml))
    back = {r.column: r for r in spark.read.parquet(f"{tmp_path}/prof_out").collect()}
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert back["o_orderkey"].n_distinct == n and back["o_orderkey"].n_nulls == 0
    assert back["o_orderstatus"].n_distinct <= 3
    spark.catalog.dropTempView("prof_orders")
    spark.catalog.dropTempView("prof")


def test_profile_handles_awkward_column_names(spark):
    from aqueducts_spark.operators.profile import profile_table

    df = spark.createDataFrame([(1, 2.5)], ["a-b", "x.y"])
    rows = {r["column"]: r for r in profile_table(df, ["a-b", "x.y"]).collect()}
    assert rows["a-b"]["n_nulls"] == 0
    assert rows["x.y"]["min_repr"] == "2.5"


def test_corpus_datacard_values(spark):
    from aqueducts_spark.operators.profile import corpus_datacard

    rows = [
        # src a: 4 docs — one dup pair, one NULL text, langs en/en/de
        (1, "a", "en", "the cat sat"),
        (2, "a", "en", "the cat sat"),
        (3, "a", "de", "ein hund"),
        (4, "a", None, None),
        # src b: empty-text and whitespace-only edges, single lang
        (5, "b", "fr", ""),
        (6, "b", "fr", "   "),
        (7, "b", "fr", "un deux trois"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {r.source: r.asDict() for r in corpus_datacard(df).collect()}
    a = got["a"]
    assert (a["n_docs"], a["n_null_text"], a["n_empty_text"]) == (4, 1, 0)
    assert (a["n_tokens"], a["n_chars"]) == (3 + 3 + 2 + 0, 11 + 11 + 8 + 0)
    assert (a["n_langs"], a["top_lang"]) == (2, "en")
    assert a["top_lang_share"] == 0.5
    # both copies of the dup pair count
    assert (a["n_dup_docs"], a["dup_frac"]) == (2, 0.5)
    b = got["b"]
    assert (b["n_docs"], b["n_null_text"], b["n_empty_text"]) == (3, 0, 2)
    assert (b["n_tokens"], b["n_langs"], b["top_lang"]) == (3, 1, "fr")
    assert b["n_dup_docs"] == 0 and b["dup_frac"] == 0.0
    # quantiles: src b token counts are [0, 0, 3]
    assert b["p50_tokens"] == 0.0 and abs(b["p90_tokens"] - 2.4) < 1e-9


def test_corpus_datacard_no_lang_col_and_all_null_langs(spark):
    from aqueducts_spark.operators.profile import corpus_datacard

    df = spark.createDataFrame(
        [(1, "a", None, "x y")], "doc_id long, source string, lang string, text string"
    )
    # lang_col=None: no language columns at all
    cols = corpus_datacard(df, lang_col=None).columns
    assert "top_lang" not in cols and "n_langs" not in cols
    # all-NULL langs: zero n_langs, NULL top_lang
    r = corpus_datacard(df).collect()[0]
    assert r.n_langs == 0 and r.top_lang is None and r.top_lang_share is None


def test_corpus_datacard_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, "s", "en", "hello world")],
        "doc_id long, source string, lang string, text string",
    ).createOrReplaceTempView("dc_docs")
    out = run_operator(
        spark, {"type": "corpus_datacard", "input": "dc_docs", "options": {}}
    ).collect()[0]
    assert out.n_docs == 1 and out.n_tokens == 2 and out.top_lang == "en"
    spark.catalog.dropTempView("dc_docs")


def test_profile_empty_table_reports_zero_nulls(spark):
    from aqueducts_spark.operators.profile import profile_table

    df = spark.createDataFrame([], "a long, b string").where("1=0")
    rows = {r.column: r for r in profile_table(df).collect()}
    assert all(r.n_rows == 0 for r in rows.values())
    assert all(r.n_nulls == 0 for r in rows.values())  # was NULL


def test_datacard_null_group_gets_real_stats(spark):
    from aqueducts_spark.operators.profile import corpus_datacard

    rows = [
        (1, None, "same text", "en"),
        (2, None, "same text", "en"),
        (3, None, "other", "fr"),
        (4, "web", "x", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string, lang string")
    card = {r[0]: r for r in corpus_datacard(df, group_col="source", lang_col="lang").collect()}
    nullrow = card[None]
    # the NULL group's dup/lang stats must be REAL, not silently 0/NULL
    assert nullrow.n_dup_docs == 2
    assert nullrow.n_langs == 2 and nullrow.top_lang == "en"


# ---------------------------------------------------------------------------
# corpus_diff
# ---------------------------------------------------------------------------


def _vdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_corpus_diff_statuses(spark):
    from aqueducts_spark.operators.profile import corpus_diff

    old = _vdf(spark, [(1, "a", "en"), (2, "b", "en"), (3, "c", "de")])
    new = _vdf(spark, [(1, "a", "en"), (2, "B", "en"), (4, "d", "fr")])
    got = {
        r["doc_id"]: r["diff_status"]
        for r in corpus_diff(old, new, id_col="doc_id").collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_summary_counts(spark):
    from aqueducts_spark.operators.profile import corpus_diff

    old = _vdf(spark, [(i, f"t{i}", "en") for i in range(10)])
    new = _vdf(
        spark,
        [(i, "X" if i < 3 else f"t{i}", "en") for i in range(8)]
        + [(100, "new", "en")],
    )
    got = {
        r["diff_status"]: r["n_docs"]
        for r in corpus_diff(old, new, summary=True).collect()
    }
    assert got == {"added": 1, "removed": 2, "changed": 3, "unchanged": 5}


def test_corpus_diff_null_is_distinct_from_empty_and_framing_safe(spark):
    from aqueducts_spark.operators.profile import corpus_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, "ab", "c")], "doc_id long, a string, b string"
    )
    # NULL -> "" must read as changed; ("ab","c") vs ("a","bc") must
    # NOT collide (length-prefixed framing)
    new = spark.createDataFrame(
        [(1, "", "x"), (2, "a", "bc")], "doc_id long, a string, b string"
    )
    got = {
        r["doc_id"]: r["diff_status"] for r in corpus_diff(old, new).collect()
    }
    assert got == {1: "changed", 2: "changed"}


def test_corpus_diff_duplicate_id_raises(spark):
    from aqueducts_spark.operators.profile import corpus_diff

    old = _vdf(spark, [(1, "a", "en"), (1, "b", "en")])
    new = _vdf(spark, [(1, "a", "en")])
    with pytest.raises(Exception, match="duplicated id"):
        corpus_diff(old, new).collect()


def test_corpus_diff_null_id_raises(spark):
    from aqueducts_spark.operators.profile import corpus_diff

    old = _vdf(spark, [(None, "a", "en")])
    new = _vdf(spark, [(1, "a", "en")])
    with pytest.raises(Exception, match="NULL id"):
        corpus_diff(old, new).collect()


def test_corpus_diff_validation(spark):
    from aqueducts_spark.operators.profile import corpus_diff

    old = _vdf(spark, [(1, "a", "en")])
    new = spark.createDataFrame([(1, 2)], "doc_id long, other long")
    with pytest.raises(ValueError, match="share no non-id columns"):
        corpus_diff(old, new)
    with pytest.raises(ValueError, match="missing on the new side"):
        corpus_diff(old, new, content_cols=["text"])


def test_corpus_diff_yaml_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    _vdf(spark, [(1, "a", "en"), (2, "b", "en")]).createOrReplaceTempView(
        "cd_old"
    )
    _vdf(spark, [(1, "a", "en"), (3, "c", "de")]).createOrReplaceTempView(
        "cd_new"
    )
    out = run_operator(
        spark,
        {
            "type": "corpus_diff",
            "input": "cd_new",
            "options": {"old_table": "cd_old", "summary": True},
        },
    )
    got = {r["diff_status"]: r["n_docs"] for r in out.collect()}
    assert got == {"added": 1, "removed": 1, "unchanged": 1}


def test_corpus_diff_empty_content_cols_rejected(spark):
    from aqueducts_spark.operators.profile import corpus_diff

    old = _vdf(spark, [(1, "a", "en")])
    with pytest.raises(ValueError, match="content_cols is empty"):
        corpus_diff(old, old, content_cols=[])
