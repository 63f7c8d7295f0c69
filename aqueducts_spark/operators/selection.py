"""DSIR-style importance-resampling data selection.

Implements the hashed n-gram variant of Data Selection via Importance
Resampling (Xie et al., NeurIPS 2023, arXiv:2302.03169): fit two
bag-of-hashed-ngrams multinomials — one on a small *target* corpus
(the distribution you want, e.g. Wikipedia + books), one on the *raw*
corpus being filtered — and score every raw document by its
log-likelihood ratio ``log p_target(x) - log p_raw(x)``.  Selection
then takes a Gumbel top-k under those log-weights, which samples
without replacement proportionally to the importance weights.

Beyond the reference's operator set (no counterpart in the reference
repo): part of the training-data surface this engine adds (SURVEY §6).

Scale shape (the 100 TB contract):

* features are hashed unigrams+bigrams in ``buckets`` buckets (paper
  default 10k) — the model is a ``buckets``-row table, never a vocab;
* fitting = one map-side-combined aggregation per corpus, output
  bounded by ``buckets`` rows; the λ (log-ratio) table broadcasts;
* scoring = explode grams → per-doc bucket counts (ONE corpus shuffle,
  map-side combined, at most ``buckets`` rows per doc) → broadcast
  join with λ → per-doc sum;
* per-bucket λ is rounded to integer **micro-nats** before the per-doc
  sum (the :func:`~.text.unigram_logprob` discipline), so scores are
  integer-exact, independent of partitioning, and bit-reproducible in
  an external SQL engine;
* :func:`dsir_select`'s Gumbel keys are derived from an md5 hash of
  the id — deterministic across runs/engines, no RNG state — and the
  global top-k plans as ``TakeOrderedAndProject`` (no full sort).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, normalized_tokens, word_ngrams

__all__ = [
    "dsir_bucket_counts",
    "dsir_log_ratios",
    "dsir_weights",
    "dsir_select",
]

# ratio-table sentinel: the smoothed-zero log-ratio for buckets seen in
# neither fitted corpus rides as bucket -1 (real buckets are >= 0), so
# a PERSISTED ratio table stays self-contained
DEFAULT_BUCKET = -1

_MICRO = 1e6
_HASH_SPACE = float(1 << 60)


def _gram_buckets(text: Column, buckets: int) -> Column:
    """Array of hashed feature buckets for ``text``: unigrams +
    bigrams, md5 top-60-bits mod ``buckets`` (the engine-portable
    bucket formula of :func:`~.sampling.hash_bucket`)."""
    grams = F.concat(
        normalized_tokens(F.coalesce(text, F.lit(""))),
        word_ngrams(F.coalesce(text, F.lit("")), 2),
    )
    return F.transform(
        grams,
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
            % F.lit(buckets)
        ),
    )


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: Optional[str] = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Hashed-ngram bucket counts: per document when ``id_col`` is
    given (``id, bucket, c``), else for the whole corpus
    (``bucket, c`` — at most ``buckets`` rows, the fitted model)."""
    exploded = ensure_parallelism(df).select(
        *([F.col(id_col)] if id_col else []),
        F.explode(_gram_buckets(F.col(text_col), buckets)).alias("bucket"),
    )
    keys = ([id_col] if id_col else []) + ["bucket"]
    return exploded.groupBy(*keys).agg(F.count("*").alias("c"))


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    target_text_col: Optional[str] = None,
) -> DataFrame:
    """The fitted DSIR model as a self-contained λ table:
    ``(bucket, lam_micro)`` with at most ``buckets + 1`` rows — the
    per-bucket micro-nat log-ratio ``ln p_target[b] − ln p_raw[b]``
    under Laplace smoothing, plus one :data:`DEFAULT_BUCKET` (-1) row
    carrying the smoothed-zero ratio for buckets seen in neither
    corpus.  Persist it once and score many corpora / a stream against
    it (:func:`dsir_weights` with ``ratios=``, or
    :func:`~aqueducts_spark.streaming.ops.dsir_score_stream`)."""
    if buckets < 1:
        raise ValueError("dsir_log_ratios: buckets must be >= 1")
    if smoothing <= 0:
        raise ValueError(
            "dsir_log_ratios: smoothing must be > 0 (an unsmoothed "
            "bucket absent from one corpus has an infinite log-ratio)"
        )
    tcol = target_text_col or text_col
    t_counts = dsir_bucket_counts(target, tcol, None, buckets).withColumnRenamed(
        "c", "tc"
    )
    r_counts = dsir_bucket_counts(raw, text_col, None, buckets).withColumnRenamed(
        "c", "rc"
    )
    totals = (
        t_counts.agg(F.sum("tc").alias("t_total"))
        .crossJoin(r_counts.agg(F.sum("rc").alias("r_total")))
        .select(
            F.coalesce("t_total", F.lit(0)).alias("t_total"),
            F.coalesce("r_total", F.lit(0)).alias("r_total"),
        )
    )
    a = F.lit(float(smoothing))
    denom_t = F.col("t_total").cast("double") + a * F.lit(float(buckets))
    denom_r = F.col("r_total").cast("double") + a * F.lit(float(buckets))

    def lam(tc: Column, rc: Column) -> Column:
        """micro-nat log-ratio of one bucket under Laplace smoothing"""
        lp_t = F.log((tc.cast("double") + a) / denom_t)
        lp_r = F.log((rc.cast("double") + a) / denom_r)
        return F.floor((lp_t - lp_r) * F.lit(_MICRO) + F.lit(0.5)).cast("bigint")

    fitted = (
        t_counts.join(r_counts, "bucket", "full_outer")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            lam(
                F.coalesce("tc", F.lit(0)), F.coalesce("rc", F.lit(0))
            ).alias("lam_micro"),
        )
    )
    default_row = totals.select(
        F.lit(DEFAULT_BUCKET).cast("bigint").alias("bucket"),
        lam(F.lit(0), F.lit(0)).alias("lam_micro"),
    )
    return fitted.unionByName(default_row)


def dsir_weights(
    df: DataFrame,
    target: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    raw: Optional[DataFrame] = None,
    target_text_col: Optional[str] = None,
    ratios: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document DSIR importance log-weight over ``df``.

    ``target`` is the corpus whose distribution you want more of;
    ``raw`` is the corpus the multinomial denominator is fitted on
    (default: ``df`` itself, the paper's setting).  Laplace smoothing
    ``smoothing`` keeps unseen buckets finite.  Alternatively pass a
    pre-fitted ``ratios`` table (:func:`dsir_log_ratios`, possibly
    persisted) instead of ``target``/``raw`` — ``buckets`` must then
    match the fit.

    Output: ``id_col, n_feats, logw_micro, logw`` where ``logw =
    Σ_b c_doc[b]·(ln p_target[b] − ln p_raw[b])``, summed in integer
    micro-nats (``logw_micro``) for partition-independent, cross-engine
    exact aggregation; ``logw = logw_micro / 1e6``.
    """
    if buckets < 1:
        raise ValueError("dsir_weights: buckets must be >= 1")
    if (target is None) == (ratios is None):
        raise ValueError(
            "dsir_weights: pass exactly one of target (fit inline) or "
            "ratios (pre-fitted table from dsir_log_ratios)"
        )
    if ratios is None:
        ratios = dsir_log_ratios(
            target,
            raw if raw is not None else df,
            text_col=text_col,
            buckets=buckets,
            smoothing=smoothing,
            target_text_col=target_text_col,
        )
    ratio = ratios.where(F.col("bucket") != DEFAULT_BUCKET)
    # left join on a constant key, NOT a crossJoin: a user-built ratios
    # table without the -1 sentinel row would turn a crossJoin-with-
    # empty into a silently EMPTY result; here it degrades to a neutral
    # (0) ratio for unknown buckets instead
    default = ratios.where(F.col("bucket") == DEFAULT_BUCKET).select(
        F.lit(1).alias("__k"), F.col("lam_micro").alias("__lam0")
    )
    doc = dsir_bucket_counts(df, text_col, id_col, buckets)
    scored = (
        doc.join(F.broadcast(ratio), "bucket", "left")
        .withColumn("__k", F.lit(1))
        .join(F.broadcast(default), "__k", "left")
        .select(
            F.col(id_col),
            F.col("c"),
            # a doc bucket absent from BOTH fitted corpora (df ⊄ raw)
            # gets the smoothed-zero ratio
            F.coalesce(
                F.col("lam_micro"), F.col("__lam0"), F.lit(0)
            ).alias("lam_micro"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("lam_micro")).cast("bigint").alias(
                "logw_micro"
            ),
        )
        .withColumn(
            "logw", F.col("logw_micro").cast("double") / F.lit(_MICRO)
        )
    )
    return scored


def dsir_select(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    temperature: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-k resampling: keep ``k`` rows sampled without
    replacement with probability ∝ ``exp(logw / temperature)`` — the
    paper's resampling step, derandomized.

    The Gumbel key is ``logw/τ − ln(−ln u)`` with ``u`` derived from
    an md5 hash of the id (uniform in (0,1), deterministic across
    runs and engines — replayable selection, no RNG state).  NULL ids
    fall back to a content hash over the row's hashable columns, so
    distinct NULL-id rows still draw distinct keys (byte-identical
    rows tie, which is harmless — they are interchangeable).  The plan
    is a global top-k (``TakeOrderedAndProject``), not a full sort;
    ``k`` rows land on the driver side of the limit, so keep ``k``
    bounded (selection subsets are, by definition).
    """
    if k < 1:
        raise ValueError("dsir_select: k must be >= 1")
    if temperature <= 0:
        raise ValueError("dsir_select: temperature must be > 0")
    from .dedup import hashable_columns

    hash_cols = hashable_columns(weights)
    content = (
        F.xxhash64(*[F.col(c) for c in hash_cols]) if hash_cols else F.lit(0)
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt),
                    F.lit(":"),
                    F.coalesce(
                        F.col(id_col).cast("string"),
                        F.concat(F.lit("\x00"), content.cast("string")),
                    ),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_HASH_SPACE)  # (0,1), never 0 or 1
    gumbel = -F.log(-F.log(u))
    key = F.col(logw_col).cast("double") / F.lit(float(temperature)) + gumbel
    sel_col = "__dsir_key"
    while sel_col in weights.columns:
        sel_col = "_" + sel_col
    return (
        weights.withColumn(sel_col, key)
        .orderBy(F.col(sel_col).desc(), F.col(id_col).asc_nulls_last())
        .limit(k)
        .drop(sel_col)
    )
