"""Parallelism-invariance: operator results must not depend on how the
input happens to be partitioned.

On a 1000-executor cluster the physical split of the input is an
accident of file layout and AQE; any operator whose OUTPUT changes
under repartitioning is broken at scale even if it passes a
single-layout oracle check. Each case below runs an order-sensitive
operator on the natural read AND on adversarial repartitionings
(13-way round-robin, 3-way by an unrelated key) and requires identical
results.
"""

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def _variants(df):
    return [df, df.repartition(13), df.repartition(3, "doc_id" if "doc_id" in df.columns else df.columns[0])]


def test_kmv_invariant(spark, events):
    from aqueducts_spark.operators.sketch import kmv_distinct

    outs = [
        _rows(kmv_distinct(v, ["event_type"], "user_id", k=8))
        for v in [events, events.repartition(13), events.repartition(3, "event_type")]
    ]
    assert outs[0] == outs[1] == outs[2]


def test_tfidf_invariant(spark, docs):
    from aqueducts_spark.operators.text import tfidf_top_terms

    outs = [_rows(tfidf_top_terms(v, top_n=2)) for v in _variants(docs)]
    assert outs[0] == outs[1] == outs[2]


def test_pack_shards_invariant(spark, docs):
    from aqueducts_spark.operators.mixing import pack_shards

    outs = [
        _rows(pack_shards(v, "n_chars", "doc_id", budget=20000, parts=4))
        for v in _variants(docs)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_weighted_mix_invariant(spark, docs):
    from aqueducts_spark.operators.mixing import weighted_mix

    outs = [
        _rows(weighted_mix(v, "lang", "doc_id", {"en": 1.7, "de": 0.4}))
        for v in _variants(docs)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_minhash_pairs_invariant(spark, docs):
    from aqueducts_spark.operators.dedup import minhash_candidate_pairs

    outs = [
        _rows(minhash_candidate_pairs(v)) for v in _variants(docs)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_asof_join_invariant(spark, events):
    from aqueducts_spark.operators.temporal import asof_join

    left = events.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    right = events.where("event_type = 'click'").select(
        "user_id", F.col("ts").alias("r_ts"), "value"
    )
    base = _rows(
        asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="r_ts",
                  value_cols=["value"])
    )
    shuffled = _rows(
        asof_join(
            left.repartition(13),
            right.repartition(7),
            on=["user_id"],
            left_ts="ts",
            right_ts="r_ts",
            value_cols=["value"],
        )
    )
    assert base == shuffled


def test_repetition_invariant(spark, docs):
    from aqueducts_spark.operators.text import repetition_features

    outs = [_rows(repetition_features(v)) for v in _variants(docs)]
    assert outs[0] == outs[1] == outs[2]


def test_chunking_invariant(spark, docs):
    from aqueducts_spark.operators.text import chunk_documents

    outs = [
        _rows(chunk_documents(v, chunk_tokens=16, overlap=4)) for v in _variants(docs)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_line_dedup_invariant(spark, docs):
    from aqueducts_spark.operators.dedup import drop_common_lines

    lined = docs.select(
        "doc_id", F.regexp_replace("text", r"(\w+ \w+ \w+ \w+)\s", "$1\n").alias("text")
    )
    outs = [_rows(drop_common_lines(v, max_docs=3)) for v in _variants(lined)]
    assert outs[0] == outs[1] == outs[2]


def test_fixed_n_sample_invariant(spark, docs):
    from aqueducts_spark.operators.sampling import stratified_fixed_n

    outs = [_rows(stratified_fixed_n(v, "doc_id", "lang", 15)) for v in _variants(docs)]
    assert outs[0] == outs[1] == outs[2]


def test_ngram_overlap_invariant(spark, docs):
    from aqueducts_spark.operators.decontam import ngram_overlap

    bench = docs.where("source = 'src0'")
    corpus = docs.where("source <> 'src0'")
    outs = [
        _rows(ngram_overlap(c, b, n=3))
        for c, b in [
            (corpus, bench),
            (corpus.repartition(13), bench.repartition(5)),
            (corpus.repartition(3, "doc_id"), bench),
        ]
    ]
    assert outs[0] == outs[1] == outs[2]
