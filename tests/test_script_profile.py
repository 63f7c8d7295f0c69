"""Unicode script profiling (operators/text.py::script_profile)."""

import pytest

from aqueducts_spark.operators.text import SCRIPT_RANGES, script_profile


def _ref_counts(text):
    text = text or ""
    counts = {}
    for name, ranges in SCRIPT_RANGES:
        counts[name] = sum(
            1
            for ch in text
            if any(lo <= ord(ch) <= hi for lo, hi in ranges)
        )
    return counts


SAMPLES = [
    (0, "Hello world, plain ASCII text."),
    (1, "Привет мир — кириллица and a bit of latin"),
    (2, "这是一段中文文本。"),
    (3, "こんにちは世界"),            # kana + cjk mixed
    (4, "مرحبا بالعالم"),
    (5, "שלום עולם"),
    (6, "नमस्ते दुनिया"),
    (7, "สวัสดีชาวโลก"),
    (8, "안녕하세요 세계"),
    (9, "Ελληνικά κείμενο"),
    (10, "12345 !!! ???"),            # no script at all
    (11, ""),
    (12, None),
]


def test_counts_match_python_reference(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    rows = {r.doc_id: r for r in script_profile(df).collect()}
    for doc_id, text in SAMPLES:
        ref = _ref_counts(text)
        r = rows[doc_id]
        for name, _ in SCRIPT_RANGES:
            assert getattr(r, f"{name}_chars") == ref[name], (doc_id, name)
        assert r.n_chars == len(text or "")
        assert r.script_chars == sum(ref.values())


def test_dominant_script(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    rows = {r.doc_id: r.dominant_script for r in script_profile(df).collect()}
    assert rows[0] == "latin"
    assert rows[1] == "cyrillic"
    assert rows[2] == "cjk"
    assert rows[4] == "arabic"
    assert rows[5] == "hebrew"
    assert rows[6] == "devanagari"
    assert rows[7] == "thai"
    assert rows[8] == "hangul"
    assert rows[9] == "greek"
    for i in (10, 11, 12):
        assert rows[i] == "none"


def test_dominant_frac(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    rows = {r.doc_id: r for r in script_profile(df).collect()}
    ref = _ref_counts(SAMPLES[1][1])
    assert rows[1].dominant_frac == pytest.approx(
        max(ref.values()) / len(SAMPLES[1][1])
    )
    assert rows[11].dominant_frac == 0.0
    assert rows[12].dominant_frac == 0.0


def test_tie_breaks_by_precedence_order(spark):
    # one latin letter + one cyrillic letter: tie -> latin (listed first)
    df = spark.createDataFrame([(1, "aб")], "doc_id long, text string")
    assert script_profile(df).collect()[0].dominant_script == "latin"


def test_plan_is_shuffle_free_and_python_free(spark):
    df = spark.createDataFrame(SAMPLES[:3], "doc_id long, text string")
    plan = (
        script_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(SAMPLES[:5], "doc_id long, text string").createOrReplaceTempView(
        "script_docs"
    )
    out = run_operator(
        spark, {"type": "script_profile", "input": "script_docs"}
    )
    assert out.count() == 5
    assert "dominant_script" in out.columns


def test_math_signs_are_not_latin_script(spark):
    # U+00D7 (×) and U+00F7 (÷) are math symbols inside the Latin-1
    # block — counting them as Latin would dilute the no-script noise
    # signal on table/formula-heavy pages
    df = spark.createDataFrame(
        [(1, "2×3÷4 ×÷×÷"), (2, "ab×cd")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in script_profile(df).collect()}
    assert rows[1].latin_chars == 0
    assert rows[1].dominant_script == "none"
    assert rows[2].latin_chars == 4
