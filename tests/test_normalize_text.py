"""Dedup-grade text normalization (operators/text.py::normalize_text)."""

import pytest

from aqueducts_spark.operators.text import FOLD_FROM, FOLD_TO, normalize_text


def test_fold_tables_align():
    assert len(FOLD_FROM) == len(FOLD_TO)
    assert len(set(FOLD_FROM)) == len(FOLD_FROM)  # no duplicate sources
    # case-preserving: each source folds to an ASCII base letter of
    # ITS OWN case (à→a, À→A) so lower=False keys stay consistent
    for src, dst in zip(FOLD_FROM, FOLD_TO):
        assert dst.isascii() and dst.isalpha(), (src, dst)
        assert dst.isupper() == src.isupper(), (src, dst)


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return normalize_text(df, **kw).collect()[0].norm_text


def test_full_pipeline(spark):
    got = _run(
        spark,
        "  Héllo,   WÖRLD!  Çafé  naïve  żółć  ",
        strip_punct=True,
    )
    assert got == "hello world cafe naive zolc"  # l <- ł folded


def test_lower_and_fold_only(spark):
    got = _run(spark, "Über Straße", collapse_whitespace=False)
    # 1:1 folds only: ß is documented out of scope
    assert got == "uber straße"


def test_steps_toggle_off(spark):
    raw = "A  Bé"
    assert (
        _run(spark, raw, lower=False, fold_diacritics=False,
             collapse_whitespace=False)
        == raw
    )


def test_punct_stripping_is_ascii_ranges_only(spark):
    got = _run(spark, "a-b_c.d!e?f«g»", strip_punct=True)
    # ASCII punctuation removed; non-ASCII guillemets kept (documented)
    assert got == "abcdef«g»"


def test_null_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert normalize_text(df).collect()[0].norm_text is None


def test_whitespace_collapse_includes_tabs_newlines(spark):
    assert _run(spark, "a\t\tb\n\nc") == "a b c"


def test_composes_with_exact_dedup(spark):
    from aqueducts_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "Héllo World"), (2, "hello  world"), (3, "different")],
        "doc_id long, text string",
    )
    normed = normalize_text(df)
    kept = exact_dedup(normed, "doc_id", ["norm_text"])
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_plan_is_shuffle_free_and_python_free(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        normalize_text(df, strip_punct=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, "Ça Va")], "doc_id long, text string"
    ).createOrReplaceTempView("norm_docs")
    out = run_operator(
        spark,
        {
            "type": "normalize_text",
            "input": "norm_docs",
            "options": {"strip_punct": "true"},
        },
    )
    assert out.collect()[0].norm_text == "ca va"


def test_case_preserving_fold_when_lower_false(spark):
    # uppercase accents fold to uppercase base letters, so lower=False
    # still normalizes both case-variants to one diacritic state
    df = spark.createDataFrame(
        [(1, "Éclair éclair ÀÇÕ")], "doc_id long, text string"
    )
    out = normalize_text(df, lower=False).collect()[0].norm_text
    assert out == "Eclair eclair ACO"


def test_fold_table_covers_both_cases():
    assert "À" in FOLD_FROM and "à" in FOLD_FROM
    assert FOLD_TO[FOLD_FROM.index("À")] == "A"
    assert FOLD_TO[FOLD_FROM.index("à")] == "a"
