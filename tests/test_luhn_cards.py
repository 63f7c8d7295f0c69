"""Luhn-validated payment-card redaction (operators/text.py::luhn_cards)."""

import random
import re

import pytest

from aqueducts_spark.operators.text import CARD_CANDIDATE_RE, luhn_cards

PY_RE = re.compile(r"\b\d(?:[ -]?\d){12,18}\b")


def _luhn_ok(s: str) -> bool:
    d = [int(c) for c in s if c.isdigit()]
    if not 13 <= len(d) <= 19:
        return False
    tot = 0
    for i, v in enumerate(reversed(d)):
        if i % 2 == 1:
            v *= 2
            if v > 9:
                v -= 9
        tot += v
    return tot % 10 == 0


def _reference(text: str, tag: str = "[CARD]"):
    t = text or ""
    cands = PY_RE.findall(t)
    valid = [c for c in cands if _luhn_ok(c)]
    red = t
    for c in valid:
        red = red.replace(c, tag)
    return red, len(valid), len(cands)


def test_known_vectors(spark):
    cases = [
        (1, "pay 4111111111111111 now"),          # valid visa 16
        (2, "pay 4111111111111112 now"),          # broken check digit
        (3, "card 4111 1111 1111 1111 spaced"),   # separators
        (4, "short 4222222222222 visa13"),        # valid 13-digit
        (5, "amex 340000000000009 here"),         # valid 15-digit
        (6, "run 12345678901234567890 20digits"), # too long: no candidate
        (7, "embedded x4111111111111111y"),       # \b: no candidate
        (8, None),                                # NULL text
        (9, "twice 5500005555555559 and 5500005555555559"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    out = {r.doc_id: r for r in luhn_cards(df).collect()}
    for i, t in cases:
        red, n_valid, n_cand = _reference(t or "")
        r = out[i]
        assert (r.redacted, r.n_cards, r.n_candidates) == (red, n_valid, n_cand), i
    assert out[1].redacted == "pay [CARD] now"
    assert out[2].n_candidates == 1 and out[2].n_cards == 0
    assert out[9].redacted == "twice [CARD] and [CARD]"


def test_property_matches_python_reference(spark):
    rng = random.Random(42)
    rows = []
    for i in range(120):
        parts = []
        for _ in range(rng.randint(1, 4)):
            kind = rng.random()
            if kind < 0.45:
                n = rng.randint(11, 21)
                digits = [rng.randint(0, 9) for _ in range(n)]
                if rng.random() < 0.5 and n >= 2:
                    # force Luhn-valid via a computed check digit
                    payload = digits[:-1]
                    tot = 0
                    for j, v in enumerate(reversed(payload)):
                        if j % 2 == 0:
                            v *= 2
                            if v > 9:
                                v -= 9
                        tot += v
                    digits[-1] = (10 - tot % 10) % 10
                s = "".join(map(str, digits))
                if rng.random() < 0.4:
                    sep = rng.choice([" ", "-"])
                    s = sep.join(s[k : k + 4] for k in range(0, len(s), 4))
                parts.append(s)
            else:
                parts.append(rng.choice(["lorem", "x9", "a-b", "42", "tel"]))
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in luhn_cards(df).collect()}
    for i, t in rows:
        red, n_valid, n_cand = _reference(t)
        r = got[i]
        assert (r.redacted, r.n_cards, r.n_candidates) == (red, n_valid, n_cand), (i, t)


def test_options_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "s", "pay 4111111111111111")], "doc_id long, lang string, text string"
    )
    out = luhn_cards(df, tag="<pan>", keep_cols=["lang"]).collect()[0]
    assert out.lang == "s" and out.redacted == "pay <pan>"
    with pytest.raises(ValueError, match="tag"):
        luhn_cards(df, tag="")
    with pytest.raises(ValueError, match="already exist"):
        luhn_cards(df.withColumnRenamed("lang", "n_cards"))
    # no keep_cols exemption: keeping an input column under an output
    # name would emit duplicate column names
    with pytest.raises(ValueError, match="already exist"):
        luhn_cards(df.withColumnRenamed("lang", "n_cards"), keep_cols=["n_cards"])
    # backslashes in the tag survive the SQL-literal round trip
    out = luhn_cards(df, tag=r"\PAN\8").collect()[0]
    assert out.redacted == r"pay \PAN\8"


def test_non_bare_text_column_name(spark):
    # ADVICE r5: the text column used to be spliced raw into f-string
    # SQL, so a name with spaces/dashes broke parsing; it is now staged
    # through F.col into a fresh bare identifier first
    df = spark.createDataFrame(
        [(1, "pay 4111111111111111 now")],
        ["doc_id", "the text-body col"],
    )
    out = luhn_cards(df, text_col="the text-body col").collect()[0]
    assert out.redacted == "pay [CARD] now"
    assert out.n_cards == 1 and out.n_candidates == 1


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "t 4111111111111111")], "doc_id long, text string")
    plan = luhn_cards(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, "pay 4111111111111111 now")], "doc_id long, text string"
    ).createOrReplaceTempView("luhn_docs")
    out = run_operator(
        spark,
        {"type": "luhn_cards", "input": "luhn_docs", "options": {"tag": "[PAN]"}},
    ).collect()[0]
    assert out.redacted == "pay [PAN] now" and out.n_cards == 1
    spark.catalog.dropTempView("luhn_docs")
