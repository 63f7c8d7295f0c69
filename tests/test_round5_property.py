"""Property-based checks of the round-5 operator batch — normalize_text,
script_profile, perplexity_buckets, random_projection, quantized_topk —
against plain-Python references on arbitrary inputs."""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# text with diacritics, mixed scripts, punctuation, and whitespace runs
fancy_texts = st.lists(
    st.sampled_from(
        ["Héllo", "WÖRLD", "żółć", "naïve", "Ça", "x", "a-b", "1,2",
         "кот", "世界", "  ", "\t", "\n", "!!!", "«q»", "ŁÓDŹ"]
    ),
    min_size=0,
    max_size=12,
).map(lambda ws: " ".join(ws))


@settings(**_SETTINGS)
@given(data=st.lists(fancy_texts, min_size=1, max_size=6))
def test_normalize_text_matches_python_reference(spark, data):
    from aqueducts_spark.operators.text import (
        FOLD_FROM,
        FOLD_TO,
        normalize_text,
    )

    fold = str.maketrans(FOLD_FROM, FOLD_TO)
    punct = re.compile(r"[!-/:-@\[-`{-~]")
    ws = re.compile(r"\s+", re.ASCII)

    def ref(t):
        t = t.lower().translate(fold)
        t = punct.sub("", t)
        return ws.sub(" ", t).strip(" \t\n\r\x0b\x0c")

    rows = [(i, t) for i, t in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.norm_text
        for r in normalize_text(df, strip_punct=True).collect()
    }
    for i, t in rows:
        assert got[i] == ref(t), (t, got[i], ref(t))


@settings(**_SETTINGS)
@given(data=st.lists(fancy_texts, min_size=1, max_size=6))
def test_script_profile_matches_python_reference(spark, data):
    from aqueducts_spark.operators.text import SCRIPT_RANGES, script_profile

    rows = [(i, t) for i, t in enumerate(data)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in script_profile(df).collect()}
    for i, t in rows:
        counts = {
            name: sum(
                1 for ch in t if any(lo <= ord(ch) <= hi for lo, hi in rng)
            )
            for name, rng in SCRIPT_RANGES
        }
        r = got[i]
        for name, _ in SCRIPT_RANGES:
            assert getattr(r, f"{name}_chars") == counts[name], (t, name)
        mx = max(counts.values())
        if mx == 0:
            assert r.dominant_script == "none"
        else:
            expect = next(
                n for n, _ in SCRIPT_RANGES if counts[n] == mx
            )
            assert r.dominant_script == expect, (t, r.dominant_script)


@settings(**_SETTINGS)
@given(
    scores=st.lists(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-100, max_value=100, allow_nan=False
            ),
        ),
        min_size=1,
        max_size=25,
    ),
    head=st.sampled_from([0.0, 0.2, 1.0 / 3.0, 0.5]),
    middle=st.sampled_from([0.0, 0.3, 1.0 / 3.0, 0.5]),
)
def test_perplexity_buckets_match_python_reference(spark, scores, head, middle):
    if head + middle > 1:
        middle = 1.0 - head
    from aqueducts_spark.operators.selection import perplexity_buckets

    rows = [(i, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    got = {
        r.doc_id: (r.ppl_bucket, r.ppl_bucket_rank)
        for r in perplexity_buckets(
            df, "s", head=head, middle=middle
        ).collect()
    }
    ordered = sorted(
        rows, key=lambda t: (t[1] is None, t[1] if t[1] is not None else 0, t[0])
    )
    n = len(ordered)
    for rank, (rid, score) in enumerate(ordered, start=1):
        pos = float(rank - 1)
        expect = (
            "tail" if score is None  # NULL scores are always tail
            else "head" if pos < head * n
            else "middle" if pos < (head + middle) * n
            else "tail"
        )
        assert got[rid] == (expect, rank), (scores, head, middle, rid)


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-8, max_value=8, allow_nan=False),
            min_size=6,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    k=st.sampled_from([2, 3]),
)
def test_random_projection_matches_python_reference(spark, vecs, k):
    from aqueducts_spark.operators.embedding import (
        projection_matrix,
        random_projection,
    )

    m = projection_matrix(k, 6, "p")
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.proj
        for r in random_projection(df, k, 6, seed="p").collect()
    }
    for i, v in rows:
        for j in range(k):
            acc = 0.0
            for x, s in zip(v, m[j]):
                acc += x * s  # same left-fold order as the operator
            expect = acc * (1.0 / math.sqrt(k))
            assert got[i][j] == expect, (i, j, v)


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_quantized_topk_scores_match_python_reference(spark, vecs):
    from aqueducts_spark.operators.similarity import quantized_topk

    def quant(v):
        # mirror the operator exactly: the guard is on the SCALE, not
        # the max — a subnormal max (5e-324) underflows mx/127 to 0.0
        # and must quantize to zeros, not divide by zero
        s = max(abs(x) for x in v) / 127.0
        if s == 0:
            return [0] * len(v)
        return [
            max(-127, min(127, math.floor(x / s + 0.5))) for x in v
        ]

    corpus = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, vecs[0])], "query_id long, embedding array<double>"
    )
    got = {
        r.neighbor_id: r.cosine
        for r in quantized_topk(df, queries, k=len(vecs)).collect()
    }
    qa = quant(vecs[0])
    na = sum(x * x for x in qa)
    for i, v in corpus:
        qb = quant(v)
        nb = sum(x * x for x in qb)
        if na == 0 or nb == 0:
            expect = 0.0
        else:
            expect = sum(x * y for x, y in zip(qa, qb)) / math.sqrt(na * nb)
        # 4dp output; half-up vs half-even boundary handled by tolerance
        # (bit-exactness vs DuckDB is the gate oracle's job)
        assert abs(got[i] - expect) <= 5.1e-5, (i, v, got[i], expect)
