"""FineWeb custom quality filters (Penedo et al. 2024 §3.6)
(operators/text.py::fineweb_rules)."""

import pytest

from aqueducts_spark.operators.text import fineweb_rules

GOOD = "\n".join(
    [
        "This is a perfectly reasonable line of clean body prose text.",
        "It is followed by several more lines of the same shape here.",
        'Each line ends with a terminal punctuation mark, like this one!',
        "Does the fraction of punctuated lines clear the floor? It does.",
    ]
)


def _ref(text, min_punct=0.12, max_short=0.67, short_chars=30,
         max_dup=0.01, max_nl=0.3):
    text = text or ""
    lines = [l for l in text.split("\n") if l.strip() != ""]
    n = max(len(lines), 1)
    punct = sum(1 for l in lines if l.strip()[-1:] in ".!?'\"") / n
    short = sum(1 for l in lines if len(l) < short_chars) / n
    chars = sum(len(l) for l in lines)
    seen: dict[str, int] = {}
    dup = 0
    for l in lines:
        if l in seen:
            dup += len(l)
        seen[l] = 1
    dupf = dup / max(chars, 1)
    words = [w for w in text.strip().lower().split() if w]
    nl = text.count("\n") / max(len(words), 1)
    ok = (
        punct >= min_punct and short <= max_short
        and dupf <= max_dup and nl <= max_nl
    )
    return dict(
        n_lines=len(lines), line_chars=chars, dup_line_chars=dup,
        line_punct_frac=punct, short_line_frac=short,
        dup_line_char_frac=dupf, newline_word_ratio=nl, passes=ok,
    )


def test_fineweb_clean_page_passes(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    row = fineweb_rules(df).collect()[0]
    ref = _ref(GOOD)
    assert row.n_lines == ref["n_lines"]
    assert row.line_chars == ref["line_chars"]
    assert row.dup_line_chars == 0
    assert row.line_punct_frac == pytest.approx(1.0)
    assert row.passes_fineweb


@pytest.mark.parametrize(
    "text,failed_rule",
    [
        # no line ends with punctuation
        ("a long unpunctuated line of words here\n" * 4, "line_punct_ok"),
        # most lines are short stubs
        ("This good long line carries plenty of characters, really.\n"
         + "stub.\n" * 8, "short_line_ok"),
        # one long line duplicated many times
        ("A duplicated navigation boilerplate line, quite long indeed.\n"
         * 5, "dup_line_char_ok"),
        # a menu: one word per line -> newline/word ratio ~1
        ("home.\nabout.\nnews.\ncontact.\nlogin.\n", "newline_ratio_ok"),
    ],
)
def test_fineweb_each_rule_fires(spark, text, failed_rule):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = fineweb_rules(df).collect()[0]
    assert not getattr(row, failed_rule), (failed_rule, row)
    assert not row.passes_fineweb
    ref = _ref(text)
    assert row.passes_fineweb == ref["passes"]
    assert row.dup_line_chars == ref["dup_line_chars"]


def test_fineweb_fractions_match_reference(spark):
    texts = [
        GOOD,
        "dup line here.\ndup line here.\nother text line entirely now.\n",
        "",
        None,
        "single line without any punctuation or duplication at all",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in fineweb_rules(df).collect()}
    for i, t in enumerate(texts):
        ref = _ref(t)
        r = rows[i]
        for k in ("line_punct_frac", "short_line_frac",
                  "dup_line_char_frac", "newline_word_ratio"):
            assert getattr(r, k) == pytest.approx(ref[k]), (i, k)
        assert r.passes_fineweb == ref["passes"], (i, t)


def test_fineweb_null_and_empty_fail_punct_floor_only(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    for r in fineweb_rules(df).collect():
        assert r.n_lines == 0 and not r.line_punct_ok
        assert r.short_line_ok and r.dup_line_char_ok and r.newline_ratio_ok
        assert not r.passes_fineweb


def test_fineweb_thresholds_configurable(spark):
    text = "no punctuation on this long line of prose at all"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert not fineweb_rules(df).collect()[0].passes_fineweb
    assert fineweb_rules(df, min_line_punct_frac=0.0).collect()[0].passes_fineweb


def test_fineweb_plan_is_shuffle_free_and_python_free(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = (
        fineweb_rules(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fineweb_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, GOOD), (2, "home.\nabout.\nnews.\ncontact.\nlogin.\n")],
        "doc_id long, text string",
    ).createOrReplaceTempView("fw_docs")
    out = run_operator(
        spark,
        {"type": "fineweb_rules", "input": "fw_docs",
         "options": {"max_newline_word_ratio": 0.3}},
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].passes_fineweb and not rows[2].passes_fineweb
    spark.catalog.dropTempView("fw_docs")


def test_crlf_text_measures_like_lf_text(spark):
    # CRLF corpora must not smuggle \r into line lengths or defeat the
    # end-anchored punctuation test (Java $ matches before a trailing
    # \r, RE2 $ does not — the operator uses \r?\n split + \z anchor)
    lf = "Good sentence.\nNext sentence.\n"
    crlf = lf.replace("\n", "\r\n")
    df = spark.createDataFrame(
        [(1, lf), (2, crlf)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in fineweb_rules(df).collect()}
    for field in ("n_lines", "line_chars", "dup_line_chars",
                  "line_punct_frac", "short_line_frac"):
        assert rows[1][field] == rows[2][field], field
    assert rows[1].line_punct_frac == 1.0
