"""Gopher rules (Rae et al. 2021 §A.1.1) and BM25 retrieval scores
(operators/text.py::gopher_rules / ::bm25_scores)."""

import math

import pytest
from pyspark.sql import functions as F

from aqueducts_spark.operators.text import bm25_scores, gopher_rules

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back home "
    "with all of the other animals that have been waiting in the field "
    "while every one of them watches the sun set slowly behind the hills "
    "before they finally walk together toward the quiet village nearby"
)  # 50 words, clean prose


def test_gopher_rules_clean_prose_passes(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    row = gopher_rules(df).collect()[0]
    assert row.n_words == 50
    assert all(
        getattr(row, r)
        for r in (
            "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
            "bullet_ok", "ellipsis_ok", "alpha_word_ok", "stopword_ok",
            "passes_gopher",
        )
    ), row


@pytest.mark.parametrize(
    "text,failed_rule",
    [
        ("too short", "word_count_ok"),
        # 50 one-char words -> mean word length 1 < 3
        (" ".join(["a"] * 50), "mean_word_len_ok"),
        # heavy # noise on clean prose
        (GOOD + " " + "#" * 30, "symbol_ratio_ok"),
        # every line a bullet
        ("\n".join(f"- {GOOD}" for _ in range(4)), "bullet_ok"),
        # every line ends with an ellipsis (ASCII and unicode)
        (GOOD + "...\n" + GOOD + "…\n" + GOOD + "... ", "ellipsis_ok"),
        # numeric tokens only
        (" ".join(str(i) for i in range(60)), "alpha_word_ok"),
        # long but stop-word free
        (" ".join(f"w{i}" for i in range(60)), "stopword_ok"),
    ],
)
def test_gopher_rules_each_rule_fires(spark, text, failed_rule):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = gopher_rules(df).collect()[0]
    assert not getattr(row, failed_rule), (failed_rule, row)
    assert not row.passes_gopher


def test_gopher_rules_null_and_empty_text_survive_as_failures(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r.n_words == 0 and not r.passes_gopher


def test_gopher_rules_thresholds_configurable(spark):
    df = spark.createDataFrame([(1, "the tiny doc")], "doc_id long, text string")
    row = gopher_rules(df, min_words=3, min_stop_hits=1).collect()[0]
    assert row.word_count_ok and row.stopword_ok


def test_gopher_rules_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    """Plain-Python BM25 for the exactness check."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / max(n, 1)
    out = {}
    for term in sorted(set(t.lower() for t in terms)):
        df_t = sum(1 for v in toks.values() if term in v)
        if df_t == 0:
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
                got = out.setdefault(i, [0, 0.0])
                got[0] += 1
                got[1] += s
    return out


def test_bm25_matches_reference_formula(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog chased the cat"),
        (3, "birds fly high above"),
        (4, "cat cat cat everywhere"),
    ]
    terms = ["cat", "the"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_matched, r.bm25)
        for r in bm25_scores(df, terms).collect()
    }
    ref = _bm25_reference(docs, terms)
    assert set(got) == set(ref)
    for i, (nm, score) in got.items():
        assert nm == ref[i][0]
        assert abs(score - ref[i][1]) < 1e-12, (i, score, ref[i][1])


def test_bm25_no_hit_docs_absent_and_ranking_sane(spark):
    docs = [
        (1, "spark query engine"),
        (2, "spark spark spark spark spark"),
        (3, "completely unrelated text"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, ["spark"]).collect()}
    assert set(got) == {1, 2}
    # term saturation: 5 occurrences score higher than 1, but not 5x
    assert got[2] > got[1]
    assert got[2] < 5 * got[1]


def test_bm25_query_terms_case_folded_and_validated(spark):
    df = spark.createDataFrame([(1, "Spark SQL")], "doc_id long, text string")
    assert bm25_scores(df, ["SPARK"]).count() == 1
    with pytest.raises(ValueError, match="query_terms"):
        bm25_scores(df, [])
    with pytest.raises(ValueError, match="k1"):
        bm25_scores(df, ["x"], k1=-1)


def test_bm25_one_tokenize_pass_write_path(spark):
    """Scale shape: ONE corpus tokenize pass ON THE WRITE PATH.  The r8
    shape relied on AQE exchange reuse, which fires only under
    collect()-style actions — executing the same plan through a write
    (what sinks and the bench do) re-scanned the corpus three times.
    The slim (id, dl, hits) projection is materialized instead, so the
    final write-path plan contains ZERO source scans (the one scan ran
    eagerly in the materialization) and no lazy cache leaks past the
    query."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bm25_scores(docs, ["the", "data"])
    out.write.mode("overwrite").format("noop").save()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert plan.count("Scan parquet") == 0, plan[:1500]
    assert "InMemoryRelation" not in plan


def test_gopher_and_bm25_registry_stages(spark):
    from aqueducts_spark.operators.registry import OperatorError, run_operator

    spark.createDataFrame(
        [(1, GOOD), (2, "tiny")], "doc_id long, text string"
    ).createOrReplaceTempView("tq_docs")
    g = run_operator(
        spark,
        {"type": "gopher_rules", "input": "tq_docs",
         "options": {"min_words": 10}},
    )
    assert {r.doc_id: r.passes_gopher for r in g.collect()} == {1: True, 2: False}
    b = run_operator(
        spark,
        {"type": "bm25", "input": "tq_docs",
         "options": {"query_terms": ["fox", "dog"]}},
    )
    assert b.count() == 1
    with pytest.raises(OperatorError, match="query_terms"):
        run_operator(spark, {"type": "bm25", "input": "tq_docs"})
    spark.catalog.dropTempView("tq_docs")


def test_rrf_fuse_matches_hand_computation(spark):
    from aqueducts_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "vec_id long, rank long"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "vec_id long, rank long"
    )
    got = {r.vec_id: r for r in rrf_fuse([a, b], k=60).collect()}
    S = 1_000_000_000_000
    exp = {
        10: S // 61 + S // 62,
        20: S // 62 + S // 61,
        30: S // 63,
        40: S // 63,
    }
    assert {i: r.rrf_micro for i, r in got.items()} == exp
    assert got[10].n_lists == 2 and got[30].n_lists == 1
    # 10 and 20 tie exactly; tie breaks to the lower id
    ranks = {i: r.fused_rank for i, r in got.items()}
    assert ranks == {10: 1, 20: 2, 30: 3, 40: 4}
    for r in got.values():
        assert abs(r.rrf - r.rrf_micro / S) < 1e-15


def test_rrf_fuse_per_query_and_validation(spark):
    import pytest as _pytest

    from aqueducts_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [("q1", 10, 1), ("q2", 10, 1)], "qid string, vec_id long, rank long"
    )
    b = spark.createDataFrame(
        [("q1", 10, 3)], "qid string, vec_id long, rank long"
    )
    got = {
        (r.qid, r.vec_id): (r.n_lists, r.fused_rank)
        for r in rrf_fuse([a, b], query_col="qid").collect()
    }
    assert got[("q1", 10)] == (2, 1)
    assert got[("q2", 10)] == (1, 1)  # ranked per query, not globally
    with _pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="missing columns"):
        rrf_fuse([a.drop("rank")])


def test_rrf_fuse_rejects_out_of_contract_ranks(spark):
    # ADVICE r5: a 0-based ranking (the classic off-by-one) previously
    # inflated every contribution silently, and with k=0 a rank of 0
    # divided by zero; the inline raise_error guard fails loudly
    import pytest as _pytest

    from aqueducts_spark.operators.similarity import rrf_fuse

    zero_based = spark.createDataFrame(
        [(10, 0), (20, 1)], "vec_id long, rank long"
    )
    with _pytest.raises(Exception, match="1-based rank"):
        rrf_fuse([zero_based]).collect()
    null_rank = spark.createDataFrame(
        [(10, None), (20, 1)], "vec_id long, rank long"
    )
    with _pytest.raises(Exception, match="1-based rank"):
        rrf_fuse([null_rank]).collect()
    # k=0 stays legal: with ranks >= 1 enforced, 1/rank fusion is fine
    ok = spark.createDataFrame([(10, 1), (20, 2)], "vec_id long, rank long")
    got = {r.vec_id: r.rrf_micro for r in rrf_fuse([ok], k=0).collect()}
    S = 1_000_000_000_000
    assert got == {10: S // 1, 20: S // 2}


def test_rrf_fuse_registry_stage(spark):
    from aqueducts_spark.operators.registry import OperatorError, run_operator

    spark.createDataFrame(
        [(1, 1), (2, 2)], "vec_id long, rank long"
    ).createOrReplaceTempView("rrf_a")
    spark.createDataFrame(
        [(2, 1), (3, 2)], "vec_id long, rank long"
    ).createOrReplaceTempView("rrf_b")
    out = run_operator(
        spark,
        {"type": "rrf_fuse", "input": "rrf_a", "options": {"others": "rrf_b"}},
    )
    rows = {r.vec_id: r.n_lists for r in out.collect()}
    assert rows == {1: 1, 2: 2, 3: 1}
    import pytest as _pytest

    with _pytest.raises(OperatorError, match="others"):
        run_operator(spark, {"type": "rrf_fuse", "input": "rrf_a"})
    spark.catalog.dropTempView("rrf_a")
    spark.catalog.dropTempView("rrf_b")


def test_gopher_symbol_rule_is_per_symbol_not_summed(spark):
    """Rae et al. 2021 applies the 0.1 symbol-to-word threshold to '#'
    and '...' SEPARATELY: a doc with both at 0.06 passes; either one
    alone at 0.12 fails."""
    base = GOOD  # 50 words, no symbols
    both_low = base + " " + "#" * 3 + " " + "..." * 3      # 0.06 + ~0.06
    hash_high = base + " " + "#" * 7                        # ~0.13 hash
    dots_high = base + " " + "..." * 7                      # ~0.13 ellipsis
    df = spark.createDataFrame(
        [(1, both_low), (2, hash_high), (3, dots_high)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.symbol_ratio_ok for r in gopher_rules(df).collect()}
    assert rows == {1: True, 2: False, 3: False}, rows


def test_doc_term_tf_matches_groupby_form(spark):
    """r10: _doc_term_tf (per-row sorted run-length encoding, zero
    shuffle) must emit exactly the multiset the old
    explode->groupBy(id, term).count() emitted — including empty and
    NULL token arrays (no row) and heavy in-doc repetition."""
    from aqueducts_spark.operators.text import _doc_term_tf

    rows = [
        (1, ["b", "a", "b", "c", "b", "a"]),
        (2, ["x"]),
        (3, []),
        (4, None),
        (5, ["z", "z", "z", "z"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = sorted(
        (r.doc_id, r.term, r.tf)
        for r in _doc_term_tf(
            df, "doc_id", F.col("toks"), term_name="term"
        ).collect()
    )
    ref = sorted(
        (r.doc_id, r.term, r.tf)
        for r in df.select(
            "doc_id", F.explode("toks").alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    assert got == ref
    assert (1, "b", 3) in got and (5, "z", 4) in got
    assert not any(d in (3, 4) for d, _, _ in got)
    # tf column type stays BIGINT (the old count(*) type)
    schema = dict(
        _doc_term_tf(df, "doc_id", F.col("toks"), term_name="term").dtypes
    )
    assert schema["tf"] == "bigint"


def test_doc_term_tf_null_elements_get_own_run(spark):
    """r11 (ADVICE r10 #2): NULL array ELEMENTS must form their own
    (NULL, tf) run exactly like the old explode->groupBy grouped NULL
    terms — a plain != boundary evaluated NULL at a non-null->NULL
    boundary and silently absorbed the NULL run into the prior term."""
    from aqueducts_spark.operators.text import _doc_term_tf

    rows = [
        (1, ["b", "a", None, "a", None]),
        (2, [None, None]),
        (3, ["x", None]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = sorted(
        ((r.doc_id, r.term, r.tf)
         for r in _doc_term_tf(df, "doc_id", F.col("toks"), term_name="term").collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or "", t[2]),
    )
    ref = sorted(
        ((r.doc_id, r.term, r.tf)
         for r in df.select("doc_id", F.explode("toks").alias("term"))
         .groupBy("doc_id", "term")
         .agg(F.count("*").alias("tf"))
         .collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or "", t[2]),
    )
    assert got == ref
    assert (1, None, 2) in got and (2, None, 2) in got and (3, None, 1) in got


def test_tfidf_top_terms_duplicate_and_null_ids(spark):
    """r11 (ADVICE r10 #1): duplicate and NULL doc ids must pool to
    DOCUMENT granularity before df/tf are derived — df can never
    exceed n_docs (which turned tf-idf negative and ranked stopwords
    first), and a term appears at most once per id in the output."""
    from aqueducts_spark.operators.text import tfidf_top_terms

    rows = [
        ("a", "cat dog"),
        ("a", "cat fish"),
        (None, "cat bird"),
        (None, "cat cow"),
        ("b", "cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = tfidf_top_terms(df, id_col="doc_id", text_col="text", top_n=10).collect()
    # 3 documents at document granularity: 'a', NULL, 'b'
    cat = [r for r in out if r.term == "cat"]
    assert cat and all(r.df == 3 for r in cat), cat
    # pooled tf: id 'a' saw 'cat' twice across its rows -> ONE row, tf=2
    a_cat = [r for r in out if r.doc_id == "a" and r.term == "cat"]
    assert len(a_cat) == 1 and a_cat[0].tf == 2
    # corpus-wide term at df == n_docs scores ln(1) = 0, never negative
    assert all(r.tfidf >= 0 for r in cat)
    # every (id, term) appears exactly once
    keys = [(r.doc_id, r.term) for r in out]
    assert len(keys) == len(set(keys))
