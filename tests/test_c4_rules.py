"""C4 cleaning heuristics (Raffel et al. 2020 §2.2)
(operators/text.py::c4_rules)."""

import pytest

from aqueducts_spark.operators.text import c4_rules

PAGE = (
    "The quick brown fox jumps over the lazy dog today.\n"
    "It then runs back home with all of the other animals!\n"
    'Every one of them watches the sun set behind the "hills."\n'
)  # three clean sentences, one per line


def test_c4_clean_page_passes(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, text string")
    row = c4_rules(df).collect()[0]
    assert row.n_lines == 3 and row.n_lines_kept == 3
    assert row.n_sentences == 3
    assert row.clean_text == PAGE.rstrip("\n")
    assert all(
        getattr(row, r)
        for r in (
            "sentences_ok", "no_lorem_ipsum", "no_curly_brace",
            "no_bad_words", "passes_c4",
        )
    ), row


@pytest.mark.parametrize(
    "line,kept",
    [
        ("This line has enough words and ends with a period.", True),
        ("This line has enough words but no terminal punctuation", False),
        ("Too short a line.", False),  # < 5 words
        ("Enable javascript to view this page properly please.", False),
        ('He said "stop right there and wait."', True),  # closing quote
        ("Is this a well-formed question line?", True),
        ("What an exclamation of a line this is!", True),
    ],
)
def test_c4_line_filter(spark, line, kept):
    df = spark.createDataFrame([(1, line)], "doc_id long, text string")
    row = c4_rules(df, min_sentences=0).collect()[0]
    assert row.n_lines_kept == (1 if kept else 0), (line, row)
    assert row.clean_text == (line if kept else "")


@pytest.mark.parametrize(
    "text,failed_rule",
    [
        (PAGE + "Only two of these lines survive the filter\n", "sentences_ok"),
        (PAGE + "Some Lorem Ipsum filler got pasted here.\n", "no_lorem_ipsum"),
        (PAGE + "function f() { return 1; }\n", "no_curly_brace"),
    ],
)
def test_c4_page_rules_fire(spark, text, failed_rule):
    # sentences_ok case: raise the bar above what the page provides
    min_sentences = 4 if failed_rule == "sentences_ok" else 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = c4_rules(df, min_sentences=min_sentences).collect()[0]
    assert not getattr(row, failed_rule), (failed_rule, row)
    assert not row.passes_c4


def test_c4_bad_words_on_original_text_case_folded(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, PAGE + "GAMBLING is mentioned here only.\n")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in c4_rules(df, bad_words=["gambling"]).collect()
    }
    assert rows[1].no_bad_words and rows[1].passes_c4
    # the offending line is dropped by the terminal-punct filter? no —
    # it ends in '.', but the rule reads the ORIGINAL page either way
    assert not rows[2].no_bad_words and not rows[2].passes_c4
    # no list -> vacuously true
    again = {r.doc_id: r for r in c4_rules(df).collect()}
    assert again[2].no_bad_words


def test_c4_null_and_empty_text_survive_as_failures(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in c4_rules(df).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r.n_lines == 0 and r.clean_text == "" and not r.passes_c4
    # with the sentence bar at zero an empty page passes everything
    relaxed = c4_rules(df, min_sentences=0).collect()
    assert all(r.passes_c4 for r in relaxed)


def test_c4_terminal_punct_optional(spark):
    line = "this line has many words but never any punctuation at all"
    df = spark.createDataFrame([(1, line)], "doc_id long, text string")
    row = c4_rules(
        df, min_sentences=0, require_line_terminal_punct=False
    ).collect()[0]
    assert row.n_lines_kept == 1 and row.clean_text == line


def test_c4_plan_is_shuffle_free_and_python_free(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, text string")
    plan = (
        c4_rules(df, bad_words=["x"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_c4_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, PAGE), (2, "short one.")], "doc_id long, text string"
    ).createOrReplaceTempView("c4_docs")
    out = run_operator(
        spark,
        {
            "type": "c4_rules",
            "input": "c4_docs",
            "options": {
                "min_line_words": 5,
                "min_sentences": 3,
                "bad_words": ["spam"],
                "require_line_terminal_punct": "true",
            },
        },
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].passes_c4 and not rows[2].passes_c4
    spark.catalog.dropTempView("c4_docs")


def test_crlf_lines_keep_like_lf_lines(spark):
    # the terminal-punct keep test must not be defeated by a trailing
    # \r (CRLF crawl text): \r?\n split + \z anchor keep both variants
    lf = "This line has six good words.\nshort\n"
    crlf = lf.replace("\n", "\r\n")
    df = spark.createDataFrame([(1, lf), (2, crlf)], "doc_id long, text string")
    rows = {r.doc_id: r for r in c4_rules(df, min_line_words=5).collect()}
    assert rows[1].n_lines_kept == rows[2].n_lines_kept == 1
    assert rows[1].clean_text == rows[2].clean_text
