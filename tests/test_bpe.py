"""BPE tokenizer-training primitives (operators/text.py::bpe_pair_counts,
train_bpe)."""

import random
from collections import Counter

import pytest

from aqueducts_spark.operators.text import bpe_pair_counts, train_bpe


def _ref_pairs(texts, merges=(), end_marker="</w>", min_count=1):
    """Pure-Python reference: word counts -> greedy whole-symbol merge
    application -> weighted adjacent-pair counts."""
    wc = Counter()
    for t in texts:
        for w in (t or "").lower().strip().split():
            w = w.replace("\x1f", "")
            if w:
                wc[w] += 1
    pc = Counter()
    for w, n in wc.items():
        if n < min_count:
            continue
        syms = list(w) + ([end_marker] if end_marker is not None else [])
        for a, b in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += n
    return dict(pc)


def _collect(df):
    return {(r.sym_left, r.sym_right): r.pair_count for r in df.collect()}


PAPER = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)


def test_paper_corpus_merge_sequence(spark):
    # Sennrich et al. 2016's walk-through corpus: the learned merges
    # must start (e,s) -> (es,t) -> (est,</w>) -> (l,o) -> (lo,w)
    df = spark.createDataFrame([(1, PAPER)], "doc_id long, text string")
    merges = train_bpe(df, n_merges=5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")
    ]


def test_pair_counts_match_reference_through_merge_chain(spark):
    df = spark.createDataFrame([(1, PAPER)], "doc_id long, text string")
    merges = train_bpe(df, n_merges=4)
    for k in range(len(merges) + 1):
        got = _collect(bpe_pair_counts(df, merges=merges[:k]))
        assert got == _ref_pairs([PAPER], merges[:k]), f"after {k} merges"


def test_merge_respects_symbol_boundaries(spark):
    # after (a,b) creates the symbol 'ab', rule (b,c) must NOT fire
    # inside it — a flat string replace would
    df = spark.createDataFrame([(1, "abc abc")], "doc_id long, text string")
    got = _collect(bpe_pair_counts(df, merges=[("a", "b"), ("b", "c")]))
    assert got == {("ab", "c"): 2, ("c", "</w>"): 2}
    assert ("b", "c") not in got


def test_repeated_symbol_greedy_left_to_right(spark):
    # 'aaaa' with merge (a,a): greedy gives [aa, aa] — counts must
    # match the Python loop exactly (the two-pass-replace trap)
    df = spark.createDataFrame(
        [(1, "aaaa aaaaa aaa")], "doc_id long, text string"
    )
    for merges in ([("a", "a")], [("a", "a"), ("aa", "aa")]):
        got = _collect(bpe_pair_counts(df, merges=merges))
        assert got == _ref_pairs(["aaaa aaaaa aaa"], merges), merges


def test_property_matches_python_reference(spark):
    rng = random.Random(7)
    alphabet = "abcde"
    texts = []
    for _ in range(40):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(1, 12))
        ]
        texts.append(" ".join(words))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=8)
    # independent reference argmax walk over the same corpus
    ref_merges = []
    for _ in range(8):
        counts = _ref_pairs(texts, ref_merges)
        if not counts:
            break
        ref_merges.append(
            min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        )
    assert merges == ref_merges
    got = _collect(bpe_pair_counts(df, merges=merges))
    assert got == _ref_pairs(texts, merges)
    # a couple of prefixes too
    for k in (0, 3):
        assert _collect(bpe_pair_counts(df, merges=merges[:k])) == _ref_pairs(
            texts, merges[:k]
        )


def test_train_matches_pair_counts_argmax(spark):
    df = spark.createDataFrame([(1, PAPER)], "doc_id long, text string")
    merges = train_bpe(df, n_merges=3)
    sofar = []
    for expect in merges:
        counts = _collect(bpe_pair_counts(df, merges=sofar))
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert best == expect
        sofar.append(expect)


def test_no_end_marker_and_min_count(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab z cd")], "doc_id long, text string"
    )
    got = _collect(bpe_pair_counts(df, end_marker=None))
    assert got == {("a", "b"): 3, ("c", "d"): 1}
    # single-char word 'z' contributes no pairs and no error
    got2 = _collect(bpe_pair_counts(df, end_marker=None, min_count=2))
    assert got2 == {("a", "b"): 3}


def test_null_text_and_sep_stripping(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a\x1fb a\x1fb")], "doc_id long, text string"
    )
    got = _collect(bpe_pair_counts(df))
    # \x1f stripped -> word 'ab'
    assert got == {("a", "b"): 2, ("b", "</w>"): 2}


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="merge"):
        bpe_pair_counts(df, merges=[("a",)])
    with pytest.raises(ValueError, match="merge"):
        bpe_pair_counts(df, merges=[("", "b")])
    with pytest.raises(ValueError, match="merge"):
        bpe_pair_counts(df, merges=[("a\x1f", "b")])
    with pytest.raises(ValueError, match="end_marker"):
        bpe_pair_counts(df, end_marker="")
    with pytest.raises(ValueError, match="min_count"):
        bpe_pair_counts(df, min_count=0)
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(df, n_merges=-1)
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(
            spark.createDataFrame(
                [(1, "a b c d e")], "doc_id long, text string"
            ),
            max_words=2,
        )


def test_train_stops_when_exhausted(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    # 'ab</w>' has 2 pairs -> 2 merges exhaust it; asking for 10 stops
    merges = train_bpe(df, n_merges=10)
    assert len(merges) <= 3
    final = _collect(bpe_pair_counts(df, merges=merges))
    assert final == {}


def test_plan_is_one_corpus_shuffle_no_python(spark):
    df = spark.createDataFrame([(1, PAPER)], "doc_id long, text string")
    plan = (
        bpe_pair_counts(df, merges=[("e", "s")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two aggregates (word count, pair count) — no more exchanges than
    # that, and nothing cartesian
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "CartesianProduct" not in plan


def test_registry_stage(spark):
    from aqueducts_spark.operators.registry import run_operator

    spark.createDataFrame(
        [(1, "low low lower")], "doc_id long, text string"
    ).createOrReplaceTempView("bpe_docs")
    out = run_operator(
        spark,
        {
            "type": "bpe_pairs",
            "input": "bpe_docs",
            "options": {"merges": [["l", "o"]], "min_count": 1},
        },
    )
    got = {(r.sym_left, r.sym_right): r.pair_count for r in out.collect()}
    assert got[("lo", "w")] == 3
    spark.catalog.dropTempView("bpe_docs")
