"""Benchmark decontamination: remove training documents that share
n-grams with an evaluation/benchmark set.

The standard pretraining hygiene step (13-gram overlap in GPT-3/PaLM
style pipelines): any training document containing an n-gram that also
appears in a benchmark document is flagged (and usually dropped).

Scale design (100 TB corpus, MB-GB benchmark):

* The benchmark n-gram set is built once — explode + distinct — and is
  tiny relative to the corpus (eval sets are thousands of documents),
  so the overlap join is a **broadcast** hash join: the corpus side
  never shuffles for the join itself.
* Corpus shingling is pure codegen (``sequence``/``transform``/
  ``slice`` — no UDF) and the explode is pipelined straight into the
  broadcast join; nothing wider than ``(doc_id, shingle)`` ever
  materializes, and only matching rows survive to the single
  ``groupBy(doc_id)`` shuffle, whose volume is the *contamination*
  volume (near-zero for a clean corpus), not the corpus volume.
* ``decontaminate`` anti-joins the flagged ids back against the
  corpus — again broadcast, since the flagged set is small.

Reference has no decontamination operator (this is a beyond-reference
training-data operator per the build plan, SURVEY.md §7.2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, word_shingles

__all__ = ["benchmark_ngrams", "ngram_overlap", "decontaminate"]


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """Distinct word n-grams of the benchmark set (column ``shingle``).

    One small aggregation over the benchmark; the result is the
    broadcast side of every overlap join.
    """
    return (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
        )
        # word_ngrams emits '' for empty/whitespace docs; one blank
        # benchmark row must not flag every blank corpus doc
        .where(F.col("shingle") != "")
        .distinct()
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Per-document count of distinct n-grams shared with ``benchmark``.

    Returns ``(id_col, n_overlap)`` for documents with at least one
    overlapping n-gram (sparse: clean documents are absent). Shingles
    are distinct per document, so ``n_overlap`` counts distinct shared
    n-grams.
    """
    bench = benchmark_ngrams(benchmark, text_col, n)
    corp = ensure_parallelism(corpus).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    ).where(F.col("shingle") != "")
    return (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    threshold: int = 1,
) -> DataFrame:
    """Corpus minus documents with ``>= threshold`` overlapping n-grams.

    The flagged-id set is small (contamination is rare), so the anti
    join broadcasts it; the corpus passes through with zero shuffles.
    """
    flagged = (
        ngram_overlap(corpus, benchmark, text_col, id_col, n)
        .where(F.col("n_overlap") >= threshold)
        .select(id_col)
    )
    # null-safe anti-join: a plain equi-anti-join never matches NULL
    # keys, so a contaminated NULL-id document silently survived into
    # training data.  ngram_overlap groups all NULL ids as one document,
    # and this removal follows that same granularity.
    cond = corpus[id_col].eqNullSafe(flagged[id_col])
    return corpus.join(F.broadcast(flagged), cond, "left_anti")
