"""Property-based checks of gopher_rules, bm25_scores, and rrf_fuse
against plain-Python reference implementations on arbitrary inputs."""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WS = re.compile(r"\s+", re.ASCII)

# words from a small alphabet so hypothesis finds collisions/stopwords;
# occasional symbols and whitespace variety
words = st.lists(
    st.sampled_from(
        ["the", "of", "and", "cat", "x", "data9", "##", "...", "a-b", "zz"]
    ),
    min_size=0,
    max_size=40,
)
texts = words.map(lambda ws: " ".join(ws))


def _toks(text: str) -> list[str]:
    return [t for t in _WS.split(text.lower().strip(" ")) if t]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(texts, min_size=1, max_size=8))
def test_gopher_rules_match_python_reference(spark, data):
    from aqueducts_spark.operators.text import GOPHER_STOPWORDS, gopher_rules

    rows = [(i, t) for i, t in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df, min_words=2).collect()}
    for i, text in rows:
        toks = _toks(text)
        n = len(toks)
        safe = max(n, 1)
        mean_len = sum(len(t) for t in toks) / safe
        hashes = text.count("#")
        dots = (len(text) - len(text.replace("...", ""))) / 3
        lines = [l for l in text.split("\n") if l.strip()]
        nl = max(len(lines), 1)
        bullet = sum(bool(re.match(r"^\s*[•\-\*]", l)) for l in lines) / nl
        ell = sum(bool(re.search(r"(\.\.\.|…)\s*$", l)) for l in lines) / nl
        alpha = sum(bool(re.search(r"[a-z]", t)) for t in toks) / safe
        stops = len(set(toks) & set(GOPHER_STOPWORDS))
        r = got[i]
        assert r.n_words == n
        assert r.word_count_ok == (2 <= n <= 100_000)
        assert r.mean_word_len_ok == (3.0 <= mean_len <= 10.0)
        assert r.symbol_ratio_ok == (
            hashes / safe <= 0.1 and dots / safe <= 0.1
        )
        assert r.bullet_ok == (bullet <= 0.9)
        assert r.ellipsis_ok == (ell <= 0.3)
        assert r.alpha_word_ok == (alpha >= 0.8)
        assert r.stopword_ok == (stops >= 2)
        assert r.passes_gopher == all(
            [r.word_count_ok, r.mean_word_len_ok, r.symbol_ratio_ok,
             r.bullet_ok, r.ellipsis_ok, r.alpha_word_ok, r.stopword_ok]
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(texts, min_size=1, max_size=8),
    terms=st.lists(
        st.sampled_from(["the", "cat", "data9", "zz", "missing"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_bm25_matches_python_reference(spark, data, terms):
    from aqueducts_spark.operators.text import bm25_scores

    rows = [(i, t) for i, t in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_matched, r.bm25)
        for r in bm25_scores(df, terms).collect()
    }
    toks = {i: _toks(t) for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / max(n, 1)
    exp: dict = {}
    for term in sorted(set(t.lower() for t in terms)):
        df_t = sum(1 for v in toks.values() if term in v)
        if df_t == 0:
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                denom = tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl)
                e = exp.setdefault(i, [0, 0.0])
                e[0] += 1
                e[1] += idf * tf * 2.2 / denom
    assert set(got) == set(exp)
    for i, (nm, s) in got.items():
        assert nm == exp[i][0]
        assert abs(s - exp[i][1]) < 1e-9


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lists=st.lists(
        st.lists(
            st.integers(0, 20), min_size=1, max_size=10, unique=True
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(0, 100),
)
def test_rrf_fuse_matches_python_reference(spark, lists, k):
    from aqueducts_spark.operators.similarity import _RRF_SCALE, rrf_fuse

    frames = [
        spark.createDataFrame(
            [(vid, rank + 1) for rank, vid in enumerate(ids)],
            "vec_id long, rank long",
        )
        for ids in lists
    ]
    got = {r.vec_id: r for r in rrf_fuse(frames, k=k).collect()}
    exp: dict = {}
    for ids in lists:
        for rank, vid in enumerate(ids, start=1):
            e = exp.setdefault(vid, [0, 0])
            e[0] += 1
            e[1] += int(_RRF_SCALE // (k + rank))
    assert {i: (r.n_lists, r.rrf_micro) for i, r in got.items()} == {
        i: tuple(v) for i, v in exp.items()
    }
    # fused_rank is a permutation of 1..n ordered by (score desc, id)
    order = sorted(exp, key=lambda i: (-exp[i][1], i))
    assert [
        i for i, _ in sorted(got.items(), key=lambda kv: kv[1].fused_rank)
    ] == order


# multi-line pages from a small pool so hypothesis finds duplicate
# lines, short stubs, tab edges, and the special markers
_LINES = st.sampled_from(
    [
        "This is a long clean line of body prose for the filter.",
        "This is a long clean line of body prose for the filter.",  # dup bait
        "short stub",
        "no terminal punctuation on this long line of words here",
        "Enable javascript to see this page now.",
        "Lorem ipsum dolor sit amet something.",
        "function f() { return 1; }",
        "Ends with a question mark?",
        'Ends with a quote."',
        "...",
        "   ",  # blank after trim
        "x.\t",  # tab tail: Spark trim is space-only
        "the quick brown dog runs home.",
    ]
)
pages = st.lists(_LINES, min_size=0, max_size=10).map("\n".join)


def _space_strip(s: str) -> str:
    """Spark's trim(): spaces only, NOT general whitespace."""
    return s.strip(" ")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(pages, min_size=1, max_size=6))
def test_c4_rules_match_python_reference(spark, data):
    from aqueducts_spark.operators.text import c4_rules

    bad = ["quick", "amet"]
    rows = [(i, t) for i, t in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in c4_rules(
            df, min_line_words=5, min_sentences=1, bad_words=bad
        ).collect()
    }
    for i, text in rows:
        lines = [l for l in text.split("\n") if _space_strip(l)]
        kept = [
            l
            for l in lines
            if len(_toks(l)) >= 5
            and "javascript" not in l.lower()
            and re.search(r"[.!?][\"'”’]?$", _space_strip(l))
        ]
        clean = "\n".join(kept)
        n_sent = len(re.findall(r"[.!?]", clean))
        toks = set(_toks(text))
        r = got[i]
        assert r.n_lines == len(lines)
        assert r.n_lines_kept == len(kept)
        assert r.clean_text == clean
        assert r.n_sentences == n_sent
        assert r.sentences_ok == (n_sent >= 1)
        assert r.no_lorem_ipsum == ("lorem ipsum" not in text.lower())
        assert r.no_curly_brace == ("{" not in text)
        assert r.no_bad_words == (not (toks & set(bad)))
        assert r.passes_c4 == (
            r.sentences_ok and r.no_lorem_ipsum
            and r.no_curly_brace and r.no_bad_words
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.lists(pages, min_size=1, max_size=6))
def test_fineweb_rules_match_python_reference(spark, data):
    from aqueducts_spark.operators.text import fineweb_rules

    rows = [(i, t) for i, t in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in fineweb_rules(df).collect()}
    for i, text in rows:
        lines = [l for l in text.split("\n") if _space_strip(l)]
        nl = max(len(lines), 1)
        punct = sum(
            1 for l in lines if _space_strip(l)[-1:] in ".!?'\""
        ) / nl
        short = sum(1 for l in lines if len(l) < 30) / nl
        chars = sum(len(l) for l in lines)
        seen: set = set()
        dup = 0
        for l in lines:
            if l in seen:
                dup += len(l)
            seen.add(l)
        dupf = dup / max(chars, 1)
        ratio = text.count("\n") / max(len(_toks(text)), 1)
        r = got[i]
        assert r.n_lines == len(lines)
        assert r.line_chars == chars
        assert r.dup_line_chars == dup
        assert abs(r.line_punct_frac - punct) < 1e-12
        assert abs(r.short_line_frac - short) < 1e-12
        assert abs(r.dup_line_char_frac - dupf) < 1e-12
        assert abs(r.newline_word_ratio - ratio) < 1e-12
        assert r.passes_fineweb == (
            punct >= 0.12 and short <= 0.67
            and dupf <= 0.01 and ratio <= 0.3
        )
