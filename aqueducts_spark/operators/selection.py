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
* the fit's joined, bounded counts table is eagerly materialized (r8:
  AQE never reuses a shared exchange across consumers, so the lazy
  form re-ran the count passes per statistics consumer — 11 corpus
  scans in the executed plan); the fit job's target and corpus passes
  are independent subtrees that overlap, and the probe pays one more;
* :func:`dsir_select`'s Gumbel keys are derived from an md5 hash of
  the id — deterministic across runs/engines, no RNG state.  Small
  ``k`` plans as ``TakeOrderedAndProject`` (no full sort); large
  ``k`` (the paper's regime — a sizeable fraction of the corpus)
  takes the distributed threshold path: approx-quantile cutoff,
  executor-side filter, exact window trim over only the narrow
  boundary slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, normalized_tokens, word_ngrams_col

__all__ = [
    "dsir_bucket_counts",
    "dsir_log_ratios",
    "dsir_weights",
    "dsir_select",
    "perplexity_buckets",
    "nb_fit",
    "nb_classify",
    "merge_nb_models",
]

# ratio-table sentinel: the smoothed-zero log-ratio for buckets seen in
# neither fitted corpus rides as bucket -1 (real buckets are >= 0), so
# a PERSISTED ratio table stays self-contained
DEFAULT_BUCKET = -1

# nb_fit metadata sentinel: the model's build `buckets` rides as one
# (label NULL, bucket -2) row — classifying with a mismatched bucket
# count silently misaligns every hash cell, so the model carries it
# (the kmv/hll "sketch carries its k/m" discipline)
_NB_META_BUCKET = -2

# nb_classify: above this class count the vectorized scoring path's
# plan width (K per-class sum aggregates + a K-element score array)
# risks catalyst/codegen limits — the row-fan shape takes over
_NB_VEC_MAX_CLASSES = 128

_MICRO = 1e6
_HASH_SPACE = float(1 << 60)


def _gram_buckets(toks: "Column | str", buckets: int) -> Column:
    """Array of hashed feature buckets for a STAGED token-array column
    (the ``word_ngrams_col`` contract — the gram tree references the
    tokens ~6 times, so an inlined regex split would re-tokenize per
    reference): unigrams + bigrams, md5 top-60-bits mod ``buckets``
    (the engine-portable bucket formula of
    :func:`~.sampling.hash_bucket`).  Pass the staged NAME (str) for
    the one-parse gram construction (r11)."""
    tok_col = F.col(toks) if isinstance(toks, str) else toks
    grams = F.concat(tok_col, word_ngrams_col(toks, 2))
    return F.transform(
        grams,
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
            % F.lit(buckets)
        ),
    )


def _gram_bucket_rows(
    df: DataFrame,
    text_col: str,
    id_col: Optional[str],
    buckets: int,
) -> DataFrame:
    """One row per hashed-gram OCCURRENCE (``[id,] bucket``) — the
    shared un-aggregated feature pipeline under :func:`dsir_bucket_counts`
    and :func:`nb_classify`'s scoring pass.  ONE implementation on
    purpose: the DSIR and naive-Bayes feature spaces (tokenization,
    the ``''`` empty-document sentinel gram, the md5 bucket hash) must
    never diverge, or a model fitted by one scores garbage in the
    other."""
    return (
        ensure_parallelism(df)
        .select(
            *([F.col(id_col)] if id_col else []),
            normalized_tokens(
                F.coalesce(F.col(text_col), F.lit(""))
            ).alias("__toks"),
        )
        .select(
            *([F.col(id_col)] if id_col else []),
            F.explode(_gram_buckets("__toks", buckets)).alias("bucket"),
        )
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
    # grouped-by-KEY counts on purpose: id_col is a grouping key, not
    # necessarily row-unique (nb_fit passes the class label), so counts
    # must merge ACROSS rows sharing the key — the per-row RLE shape
    # lives in _row_bucket_counts for callers whose downstream is
    # linear in c (dsir_weights).
    exploded = _gram_bucket_rows(df, text_col, id_col, buckets)
    keys = ([id_col] if id_col else []) + ["bucket"]
    return exploded.groupBy(*keys).agg(F.count("*").alias("c"))


def _row_bucket_counts(
    df: DataFrame, text_col: str, id_col: str, buckets: int
) -> DataFrame:
    """Per-ROW ``(id, bucket, c)`` with NO corpus shuffle (r10): sorted
    run-length encoding of each row's hashed-gram bucket array (see
    text._doc_term_tf) — the c values are per input row, not merged
    across rows sharing an id.  Exact replacement for
    :func:`dsir_bucket_counts` wherever every downstream consumer is
    LINEAR in ``c`` and re-aggregates by id or bucket (Σ over split
    rows == Σ over merged rows in exact integers); NOT a replacement
    when the grouped relation itself is the output (nb_fit's model)."""
    from .text import _doc_term_tf

    staged = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            normalized_tokens(
                F.coalesce(F.col(text_col), F.lit(""))
            ).alias("__toks"),
        )
        # tokens staged first (word_ngrams_col contract: the gram tree
        # references them ~6 times)
        .select(
            F.col(id_col),
            _gram_buckets("__toks", buckets).alias("__bks"),
        )
    )
    return _doc_term_tf(
        staged, id_col, F.col("__bks"), term_name="bucket"
    ).withColumnRenamed("tf", "c")


def _log_ratios_from_counts(
    t_counts: DataFrame,
    r_counts: DataFrame,
    buckets: int,
    smoothing: float,
) -> DataFrame:
    """λ table from pre-aggregated corpus bucket counts ``(bucket,
    tc)`` / ``(bucket, rc)``.

    The corpus totals are derived from the *joined, bounded* counts
    table (≤ ``buckets`` rows) rather than from separate whole-corpus
    aggregations: every gram occurrence lands in exactly one bucket, so
    ``Σ tc`` / ``Σ rc`` over the join equal the corpus gram totals.
    The joined table is eagerly MATERIALIZED (r8): under AQE a shared
    exchange is never reused across consumers, so the totals / λ /
    default-row subtrees would each have re-run the count passes.
    Everything after the one materialization job touches only bounded,
    model-sized blocks."""
    joined = t_counts.join(r_counts, "bucket", "full_outer").select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.coalesce("tc", F.lit(0)).cast("bigint").alias("tc"),
        F.coalesce("rc", F.lit(0)).cast("bigint").alias("rc"),
    )
    # eagerly materialize the joined counts (<= 2*buckets rows, the
    # bounded fitted model): it feeds the totals row, the per-bucket λ
    # projection AND the default row, and AQE never reuses a shared
    # exchange across consumers — unmaterialized, each consumer re-ran
    # the target pass + the corpus re-aggregation (the r8 measurement
    # saw 11 corpus scans in dsir_weights' executed plan).  The two
    # count subtrees underneath are independent, so the one
    # materialization job still overlaps the target and corpus passes.
    from .materialize import materialize

    joined = materialize(joined)
    totals = joined.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).alias("t_total"),
        F.coalesce(F.sum("rc"), F.lit(0)).alias("r_total"),
    )
    a = F.lit(float(smoothing))
    denom_t = F.col("t_total").cast("double") + a * F.lit(float(buckets))
    denom_r = F.col("r_total").cast("double") + a * F.lit(float(buckets))

    def lam(tc: Column, rc: Column) -> Column:
        """micro-nat log-ratio of one bucket under Laplace smoothing"""
        lp_t = F.log((tc.cast("double") + a) / denom_t)
        lp_r = F.log((rc.cast("double") + a) / denom_r)
        return F.floor((lp_t - lp_r) * F.lit(_MICRO) + F.lit(0.5)).cast("bigint")

    fitted = joined.crossJoin(F.broadcast(totals)).select(
        "bucket", lam(F.col("tc"), F.col("rc")).alias("lam_micro")
    )
    default_row = totals.select(
        F.lit(DEFAULT_BUCKET).cast("bigint").alias("bucket"),
        lam(F.lit(0), F.lit(0)).alias("lam_micro"),
    )
    return fitted.unionByName(default_row)


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
    return _log_ratios_from_counts(t_counts, r_counts, buckets, smoothing)


def dsir_weights(
    df: DataFrame,
    target: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    smoothing: Optional[float] = None,
    raw: Optional[DataFrame] = None,
    target_text_col: Optional[str] = None,
    ratios: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document DSIR importance log-weight over ``df``.

    ``target`` is the corpus whose distribution you want more of;
    ``raw`` is the corpus the multinomial denominator is fitted on
    (default: ``df`` itself, the paper's setting).  Laplace smoothing
    ``smoothing`` (default 1.0) keeps unseen buckets finite.
    Alternatively pass a pre-fitted ``ratios`` table
    (:func:`dsir_log_ratios`, possibly persisted) instead of
    ``target``/``raw`` — ``buckets`` must then match the fit, and the
    fit-only knobs (``smoothing``, ``raw``, ``target_text_col``) are
    rejected rather than silently ignored.

    Output: ``id_col, n_feats, logw_micro, logw`` where ``logw =
    Σ_b c_doc[b]·(ln p_target[b] − ln p_raw[b])``, summed in integer
    micro-nats (``logw_micro``) for partition-independent, cross-engine
    exact aggregation; ``logw = logw_micro / 1e6``.

    Scale shape: the fit runs as ONE eager materialization job whose
    target and corpus count passes are independent subtrees (they
    overlap; the joined, bounded counts table is what materializes —
    see ``_log_ratios_from_counts``), and the probe side then pays its
    own single ``(doc, bucket)`` pass plus broadcast joins against the
    materialized model.  In the default ``raw=df`` setting the fit's
    corpus counts re-aggregate the per-document counts; an explicitly
    distinct ``raw`` corpus pays its own tokenize pass, because it has
    to.  (The r7 form relied on exchange reuse that AQE does not
    perform across consumers — its executed plan carried ELEVEN corpus
    scans; the r8 shape carries two plus the target's.  Plan-asserted
    in tests/test_selection.py.)

    ID CONTRACT: weights group by ``id_col``, so rows sharing an id —
    including ALL NULL-id rows, which pool into one group — emit one
    combined weight row; :func:`dsir_select` then keeps or drops that
    pool as a single document.  Assign unique non-NULL ids upstream.
    When scoring against a persisted ``ratios`` table, ``buckets``
    MUST equal the fit-time value — a mismatch silently misaligns
    every hash cell (the table carries no bucket metadata; carrying it
    like nb_fit's -2 row is noted future work).
    """
    if buckets < 1:
        raise ValueError("dsir_weights: buckets must be >= 1")
    if (target is None) == (ratios is None):
        raise ValueError(
            "dsir_weights: pass exactly one of target (fit inline) or "
            "ratios (pre-fitted table from dsir_log_ratios)"
        )
    if ratios is not None and (
        smoothing is not None or raw is not None or target_text_col is not None
    ):
        raise ValueError(
            "dsir_weights: smoothing/raw/target_text_col are fit-time "
            "parameters — they are baked into a pre-fitted ratios table "
            "and have no effect here; refit with dsir_log_ratios instead"
        )
    # per-row RLE counts (no corpus shuffle): both consumers — the
    # r_counts re-aggregation and the scored groupBy(id) — are linear
    # in c, so split-per-row rows sum to the identical integers the
    # grouped relation summed to
    doc = _row_bucket_counts(df, text_col, id_col, buckets)
    if ratios is None:
        eff_smoothing = 1.0 if smoothing is None else smoothing
        if eff_smoothing <= 0:
            raise ValueError("dsir_weights: smoothing must be > 0")
        tcol = target_text_col or text_col
        t_counts = dsir_bucket_counts(
            target, tcol, None, buckets
        ).withColumnRenamed("c", "tc")
        if raw is None:
            # the paper's setting: the denominator corpus IS df, so the
            # corpus-level counts are the per-doc counts re-aggregated —
            # one tokenize/explode/shuffle over the corpus, shared with
            # the probe side below via exchange reuse
            r_counts = doc.groupBy("bucket").agg(F.sum("c").alias("rc"))
        else:
            r_counts = dsir_bucket_counts(
                raw, text_col, None, buckets
            ).withColumnRenamed("c", "rc")
        # the fitted λ table is derived from the MATERIALIZED joined
        # counts inside _log_ratios_from_counts, so its two consumers
        # below (in-vocab rows + the DEFAULT_BUCKET fallback) re-read
        # bounded blocks, never the fit lineage.  A user-passed
        # pre-fitted ratios table (typically a tiny parquet) takes the
        # other branch and is left untouched — re-reading it twice is
        # cheaper than materializing it.
        ratios = _log_ratios_from_counts(
            t_counts, r_counts, buckets, eff_smoothing
        )
    ratio = ratios.where(F.col("bucket") != DEFAULT_BUCKET)
    # left join on a constant key, NOT a crossJoin: a user-built ratios
    # table without the -1 sentinel row would turn a crossJoin-with-
    # empty into a silently EMPTY result; here it degrades to a neutral
    # (0) ratio for unknown buckets instead
    default = ratios.where(F.col("bucket") == DEFAULT_BUCKET).select(
        F.lit(1).alias("__k"), F.col("lam_micro").alias("__lam0")
    )
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


def _gumbel_key(
    weights: DataFrame,
    id_col: str,
    logw_col: str,
    temperature: float,
    salt: str,
) -> Column:
    """The derandomized Gumbel top-k sort key ``logw/τ − ln(−ln u)``
    with ``u`` derived from an md5 hash of the id (uniform in (0,1),
    deterministic across runs and engines — replayable selection, no
    RNG state).  NULL ids fall back to a content hash over the row's
    hashable columns, so distinct NULL-id rows still draw distinct
    keys (byte-identical rows tie, which is harmless — they are
    interchangeable)."""
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
    return F.col(logw_col).cast("double") / F.lit(float(temperature)) + gumbel


def dsir_select(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    temperature: float = 1.0,
    salt: str = "dsir",
    max_driver_k: int = 100_000,
    quantile_error: float = 1e-4,
) -> DataFrame:
    """Gumbel top-k resampling: keep ``k`` rows sampled without
    replacement with probability ∝ ``exp(logw / temperature)`` — the
    paper's resampling step, derandomized (see :func:`_gumbel_key`).

    Two physical strategies, same exact result:

    * ``k <= max_driver_k`` — global top-k, which plans as
      ``TakeOrderedAndProject`` (no full sort); the k rows funnel
      through the driver, fine for bounded k.
    * ``k > max_driver_k`` — the distributed threshold path for
      corpus-scale selection (the paper resamples tens of millions of
      documents, which would OOM a driver-side limit): approx-quantile
      the Gumbel key at ``1 − k/n`` with a conservative error margin,
      split rows into a sure-keep slice (``key`` above the high
      threshold, kept with NO sort, limit, or driver transfer) and a
      narrow boundary slice (between the thresholds, ~``2·ε·n`` rows),
      then exact-rank ONLY the boundary slice with one window to top
      up the remaining ``k − |sure|`` rows.  The selection itself
      never leaves the executors.

    The threshold path runs three bounded driver actions (count,
    approxQuantile, count) over ``weights``; pass a persisted
    ``weights`` frame if recomputing its lineage is expensive.
    Degenerate inputs (NULL keys from NULL ``logw_col``, or mass-tied
    keys straddling the cut) fall back to one exact global rank window
    — a full sort, still executor-side, never a driver limit.
    """
    if k < 1:
        raise ValueError("dsir_select: k must be >= 1")
    if temperature <= 0:
        raise ValueError("dsir_select: temperature must be > 0")
    if not 0 < quantile_error < 0.5:
        raise ValueError("dsir_select: quantile_error must be in (0, 0.5)")
    key = _gumbel_key(weights, id_col, logw_col, temperature, salt)
    sel_col = "__dsir_key"
    while sel_col in weights.columns:
        sel_col = "_" + sel_col
    keyed = weights.withColumn(sel_col, key)
    if k <= max_driver_k:
        return (
            keyed.orderBy(F.col(sel_col).desc(), F.col(id_col).asc_nulls_last())
            .limit(k)
            .drop(sel_col)
        )

    from pyspark.sql.window import Window

    rn_col = "__dsir_rn"
    while rn_col in weights.columns:
        rn_col = "_" + rn_col
    rn = F.row_number().over(
        Window.orderBy(F.col(sel_col).desc(), F.col(id_col).asc_nulls_last())
    )

    def exact_global_rank() -> DataFrame:
        return (
            keyed.withColumn(rn_col, rn)
            .where(F.col(rn_col) <= k)
            .drop(rn_col, sel_col)
        )

    # NULL keys (a NULL logw) sort last in the top-k path; the quantile
    # thresholds below only see non-null keys, so run the threshold
    # logic over the non-null count and fall back to the exact rank
    # when NULL-key rows could be part of the selection
    n = keyed.where(F.col(sel_col).isNotNull()).count()
    if k >= n:
        # every non-null-key row is selected; NULL-key rows may top up
        # the tail — the exact window (NULLS LAST) handles both
        total = keyed.count()
        return weights if k >= total else exact_global_rank()
    frac = 1.0 - k / n
    eps = quantile_error
    # relativeError=eps bounds each returned value within ±eps·n ranks
    # of its requested quantile, so querying at frac±2·eps guarantees
    # count(key > t_hi) <= k and every row with key < t_lo is outside
    # the top k; the boundary slice between the thresholds holds
    # O(eps·n) rows (~6·eps·n), plus any key run tied exactly at t_lo
    # (the inclusive lower bound keeps mass ties from silently
    # shrinking the selection)
    t_lo, t_hi = keyed.approxQuantile(
        sel_col, [max(frac - 2 * eps, 0.0), min(frac + 2 * eps, 1.0)], eps
    )
    sure = keyed.where(F.col(sel_col) > t_hi)
    boundary = keyed.where(
        (F.col(sel_col) >= t_lo) & (F.col(sel_col) <= t_hi)
    )
    need = k - sure.count()
    if need <= 0:
        # eps·n rank slack exceeded on a pathological key distribution
        # (mass ties at the cut); fall back to the exact global rank —
        # one full sort, still executor-side
        return exact_global_rank()
    # exact-rank only the boundary rows (single-partition window over
    # the slice, executor-side)
    topped = (
        boundary.withColumn(rn_col, rn)
        .where(F.col(rn_col) <= need)
        .drop(rn_col)
    )
    return sure.unionByName(topped).drop(sel_col)


def perplexity_buckets(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    group_col: Optional[str] = None,
    head: float = 1.0 / 3.0,
    middle: float = 1.0 / 3.0,
    bucket_col: str = "ppl_bucket",
    method: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2019,
    arXiv:1911.00359 §4.3): split each ``group_col`` partition (per
    language, in the paper) into ``head`` / ``middle`` / ``tail``
    buckets by ascending ``score_col`` — lower perplexity means closer
    to the target LM, so the head is the highest-quality slice.  Feed
    it :func:`~.text.unigram_logprob` / :func:`~.text.bigram_logprob`
    ``avg_nll`` scores (this engine's LM stand-ins) or any
    smaller-is-better score.

    Bucket rule, exact and engine-portable: rows are ranked 1..n within
    their group by ``(score_col ASC, id_col ASC)`` — the id tiebreak
    makes ranks, and therefore buckets, a pure function of the data —
    and a row's bucket follows its fractional position ``(rank−1)/n``:
    ``head`` when ``rank−1 < head·n``, ``middle`` when ``rank−1 <
    (head+middle)·n``, else ``tail`` (so a 1-row group is ``head``, and
    a group of 3 under terciles splits 1/1/1).  The comparison is plain
    IEEE-double arithmetic — identical in any engine, so the DuckDB
    oracle reproduces every boundary bit-for-bit.  NULL scores are
    ALWAYS ``tail`` in both methods — an unscoreable document is never
    high-quality, even in a group that is mostly NULL (they still rank
    last, so ``{bucket_col}_rank`` stays a permutation).  Output adds
    ``bucket_col`` plus ``{bucket_col}_rank`` (the 1-based within-group
    rank) so downstream filters can re-derive the cut.

    Scale shape — two physical strategies:

    * ``method="exact"`` (default): ONE hash shuffle on ``group_col``
      and a per-group sort — correct at any size but sort-bound on a
      100 TB monolingual corpus (one language = one giant sort).
    * ``method="approx"``: the 100 TB path, mirroring how CCNet itself
      fits fixed thresholds once and streams the corpus past them —
      per-group ``percentile_approx`` sketches (one map-side-combined
      aggregation, ~``accuracy`` centroids per group, NO sort), the
      tiny threshold table broadcast back, and one codegen comparison
      per row (``score <= t`` with ties-into-head semantics).  Rank
      cannot be produced without the sort, so ``{bucket_col}_rank`` is
      omitted; bucket sizes are within the sketch's rank error
      (~n/accuracy per group).  The exact variant doubles as its
      correctness oracle (tests assert agreement on distinct scores).
      One asymmetry: rows with a NULL ``group_col`` form their own
      group in the exact path but match no threshold row in the
      approx path's join and land in the tail — pre-bucket NULL
      groups (``coalesce(lang, 'und')``) if they matter.

    With ``group_col=None`` the exact window is a single-partition
    sort, sensible only for bounded inputs — ``method="approx"``
    handles the unbounded global case too (one scalar threshold row).
    """
    if not 0 <= head <= 1 or not 0 <= middle <= 1 or head + middle > 1:
        raise ValueError(
            "perplexity_buckets: head and middle must be fractions in "
            f"[0, 1] with head + middle <= 1, got {head}, {middle}"
        )
    out_clashes = [
        c for c in (bucket_col, f"{bucket_col}_rank") if c in df.columns
    ]
    if out_clashes:
        # withColumn would silently replace a previous bucketing's
        # output (the module's internal helper names are freshened for
        # exactly this reason — outputs deserve the same discipline)
        raise ValueError(
            f"perplexity_buckets: output column(s) {out_clashes} already "
            "exist on the input — pass a different bucket_col"
        )
    if method not in ("exact", "approx"):
        raise ValueError(
            f"perplexity_buckets: method must be 'exact' or 'approx', "
            f"got {method!r}"
        )
    if method == "approx":
        cut_lo = "__ppl_t_lo"
        cut_hi = "__ppl_t_hi"
        while cut_lo in df.columns or cut_hi in df.columns:
            cut_lo, cut_hi = "_" + cut_lo, "_" + cut_hi
        score = F.col(score_col)
        cuts = (
            df.groupBy(*([group_col] if group_col else []))
            .agg(
                F.percentile_approx(
                    score, [float(head), float(head + middle)], accuracy
                ).alias("__ppl_cuts")
            )
            .select(
                *([group_col] if group_col else []),
                F.element_at("__ppl_cuts", 1).alias(cut_lo),
                F.element_at("__ppl_cuts", 2).alias(cut_hi),
            )
        )
        if group_col:
            joined = df.join(F.broadcast(cuts), group_col, "left")
        else:
            joined = df.crossJoin(F.broadcast(cuts))
        # NULL scores fail both <= comparisons -> tail (matches the
        # exact path's explicit NULL->tail rule); a 0-fraction head makes its
        # threshold the group minimum, which still admits ties — the
        # documented ties-into-head trade of threshold bucketing
        return (
            joined.withColumn(
                bucket_col,
                F.when(
                    (F.lit(float(head)) > 0) & (score <= F.col(cut_lo)),
                    F.lit("head"),
                )
                .when(
                    (F.lit(float(middle)) > 0) & (score <= F.col(cut_hi)),
                    F.lit("middle"),
                )
                .otherwise(F.lit("tail")),
            )
            .drop(cut_lo, cut_hi)
        )
    from pyspark.sql.window import Window

    part = Window.partitionBy(*([group_col] if group_col else []))
    w = part.orderBy(
        F.col(score_col).asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    rank_col = f"{bucket_col}_rank"
    n_col = "__ppl_n"
    while n_col in df.columns:
        n_col = "_" + n_col
    n = F.col(n_col).cast("double")
    pos = (F.col(rank_col) - F.lit(1)).cast("double")
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .withColumn(n_col, F.count(F.lit(1)).over(part))
        .withColumn(
            bucket_col,
            # NULL scores are tail UNCONDITIONALLY: NULLS-LAST ranking
            # alone would promote them into head/middle once NULLs
            # outnumber the tail's capacity (e.g. an all-NULL group),
            # and the approx path — which buckets NULL by failed <=
            # comparisons — would then disagree
            F.when(F.col(score_col).isNull(), F.lit("tail"))
            .when(pos < n * F.lit(float(head)), F.lit("head"))
            .when(pos < n * F.lit(float(head + middle)), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop(n_col)
    )


def nb_fit(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """Multinomial naive-Bayes class model over hashed n-gram features
    — train the quality/domain/language classifier ON the cluster from
    a labeled seed set (the GPT-3 WebText-classifier / CCNet-style
    step that :func:`dsir_weights` covers only for the two-class
    target-vs-raw case).  The "training" is ONE aggregation: per-class
    feature counts need no iteration, which is exactly why naive Bayes
    is the scalable seed-classifier choice.

    Output is a single SELF-CONTAINED persistable relation: ``(label,
    bucket, c)`` per-class hashed-gram counts (same unigram+bigram
    ``buckets`` feature space as DSIR — shared via
    :func:`dsir_bucket_counts`), one PRIOR row per class carrying its
    DOCUMENT count at ``bucket = DEFAULT_BUCKET``, and one METADATA
    row (``label NULL, bucket = -2``) carrying the build ``buckets``
    — the kmv/hll "sketch carries its k/m" discipline: classifying
    with a mismatched bucket count would silently misalign every
    hash cell, so :func:`nb_classify` reads (and validates) it.

    NULL labels are rejected loudly (an unlabeled seed row is a data
    bug, and a NULL class would silently become its own category).
    """
    if buckets < 1:
        raise ValueError(f"nb_fit: buckets must be >= 1, got {buckets}")
    guarded = labeled.filter(
        F.when(
            F.col(label_col).isNull(),
            F.raise_error(
                F.lit(
                    "nb_fit: NULL label in the seed set — drop or "
                    "re-label unlabeled rows first"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    # the SAME per-key hashed-gram counting path DSIR uses (one shared
    # implementation — the feature spaces must never diverge), with the
    # label playing the grouping-key role; projected through safe names
    # so a label/text column named "bucket"/"c" cannot collide
    proj = guarded.select(
        F.col(label_col).alias("__nb_l"), F.col(text_col).alias("__nb_t")
    )
    feats = dsir_bucket_counts(
        proj, text_col="__nb_t", id_col="__nb_l", buckets=buckets
    ).select(F.col("__nb_l").alias("label"), "bucket", "c")
    priors = guarded.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("c")
    ).select("label", F.lit(DEFAULT_BUCKET).cast("bigint").alias("bucket"), "c")
    label_type = dict(feats.dtypes)["label"]
    meta = guarded.sparkSession.range(1).select(
        F.lit(None).cast(label_type).alias("label"),
        F.lit(_NB_META_BUCKET).cast("bigint").alias("bucket"),
        F.lit(int(buckets)).cast("bigint").alias("c"),
    )
    return (
        feats.select(
            "label", F.col("bucket").cast("bigint").alias("bucket"), "c"
        )
        .unionByName(priors)
        .unionByName(meta)
    )


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 1.0,
    buckets: Optional[int] = None,
    all_scores: bool = False,
    max_grid: int = 10_000_000,
    cache_model: bool = True,
) -> DataFrame:
    """Score/classify documents with an :func:`nb_fit` model:
    ``log P(class | doc) ∝ log prior + Σ_grams log P(gram | class)``
    with Laplace ``smoothing`` — the corpus-scale inference pass of
    the seed-trained classifier.

    ``buckets`` defaults to None — read from the model's own metadata
    row (models built here carry it; the kmv/hll discipline): a
    mismatched bucket count would silently misalign every hash cell
    and classify with confident garbage, so an EXPLICIT ``buckets``
    that contradicts the model raises.  Reading it costs one tiny
    driver action over the model (together with the class count for
    the ``max_grid`` guard) — when the model comes straight from an
    unpersisted :func:`nb_fit` over a large seed set, that action
    executes the fit lineage once before the scoring job does again;
    persist or write the model first for production use.

    Exactness discipline (the :func:`~.text.unigram_logprob` recipe):
    each per-(class, bucket) log-likelihood quantizes to integer
    micro-nats BEFORE the per-document sum, so scores are bit-stable
    under any partitioning and an external SQL engine reproduces the
    argmax decisions exactly.  Ties break toward the lexicographically
    smallest label, deterministically.

    Plan shape (r9, vectorized): the λ grid is the COMPLETE ``labels ×
    buckets`` relation (every bucket is in [0, buckets) by
    construction, so unseen (class, bucket) cells get the smoothed
    default with no driver round-trip) — bounded at ``K·buckets`` rows
    (guarded by ``max_grid``), then PIVOTED to ≤ ``buckets`` rows of
    K-element λ VECTORS (class order = sorted labels) and broadcast.
    The corpus pays ONE explode -> broadcast vector join -> ONE
    groupBy(id) with K integer sums (map-side partial aggregation:
    K counters per doc per partition); the class fan-out rides in
    columns, never in rows, and the argmax is a projection over the
    class-sorted score array — no (id, label) intermediate, no window.
    Empty/NULL-text documents carry the '' sentinel gram (the DSIR
    feature convention), so every row is scored — priors decide.

    Output: ``(id, label, score_micro)`` — the argmax class per
    document, or every class's score with ``all_scores=True`` (for
    calibration/thresholding).
    """
    if smoothing <= 0:
        raise ValueError(
            f"nb_classify: smoothing must be > 0, got {smoothing}"
        )
    for c in ("label", "bucket", "c"):
        if c not in model.columns:
            raise ValueError(
                f"nb_classify: model is missing column {c!r} — expected "
                "the (label, bucket, c) relation nb_fit produces"
            )
    # cache the model relation BEFORE the metadata action below: when
    # the model comes straight from an unpersisted nb_fit over a large
    # seed set, the action would otherwise execute the full fit lineage
    # once for the metadata and AGAIN for the scoring job.  The model
    # is bounded (<= max_grid cells + priors + one metadata row), so
    # the cache is small.  LIFECYCLE: the returned scoring frame reads
    # the cache lazily, so it cannot be auto-released here — call
    # ``model.unpersist()`` after materializing scores, or pass
    # ``cache_model=False`` in long-lived loops that manage persistence
    # themselves (a disk-persisted model never needs this cache).
    if cache_model:
        model = model.cache()
    prior_rows = model.where(F.col("bucket") == DEFAULT_BUCKET)
    # ONE small driver action reads the model metadata: the build
    # bucket count (bucket -2 sentinel), the class count AND the
    # sorted class list (needed to lay out the per-bucket λ vectors —
    # the list is grid-bounded by the max_grid guard below)
    info = model.where(F.col("bucket") < 0).agg(
        F.count_distinct(
            F.when(F.col("bucket") == DEFAULT_BUCKET, F.col("label"))
        ).alias("__k"),
        F.min(
            F.when(F.col("bucket") == _NB_META_BUCKET, F.col("c"))
        ).alias("__b_min"),
        F.max(
            F.when(F.col("bucket") == _NB_META_BUCKET, F.col("c"))
        ).alias("__b_max"),
        F.array_sort(
            F.collect_set(
                F.when(F.col("bucket") == DEFAULT_BUCKET, F.col("label"))
            )
        ).alias("__labels"),
    ).first()
    labels = list(info["__labels"] or [])
    n_labels = int(info["__k"] or 0)
    if n_labels == 0:
        raise ValueError(
            "nb_classify: model has no prior rows (bucket = -1) — was it "
            "built by nb_fit?"
        )
    if info["__b_min"] is not None and info["__b_min"] != info["__b_max"]:
        raise ValueError(
            "nb_classify: model carries conflicting bucket-count metadata "
            f"({info['__b_min']} vs {info['__b_max']}) — models with "
            "different bucket counts were mixed"
        )
    model_buckets = None if info["__b_max"] is None else int(info["__b_max"])
    if buckets is None:
        if model_buckets is None:
            raise ValueError(
                "nb_classify: model has no bucket-count metadata row; "
                "pass buckets explicitly"
            )
        buckets = model_buckets
    elif model_buckets is not None and buckets != model_buckets:
        raise ValueError(
            f"nb_classify: the buckets argument ({buckets}) contradicts "
            f"the model's build bucket count ({model_buckets}) — hash "
            "cells would silently misalign"
        )
    if buckets < 1:
        raise ValueError(f"nb_classify: buckets must be >= 1, got {buckets}")
    if n_labels * buckets > max_grid:
        raise ValueError(
            f"nb_classify: {n_labels} classes x {buckets} buckets exceeds "
            f"max_grid={max_grid} — shrink buckets or raise the cap"
        )
    # a metadata-less (externally built) model whose counts use MORE
    # buckets than the explicit argument would otherwise silently drop
    # every out-of-range cell from the grid join AND its totals —
    # caught lazily here.  The opposite direction (fit with FEWER
    # buckets than claimed) is UNDETECTABLE from the counts alone:
    # every value is in range, the cells are just misaligned — which is
    # exactly why nb_fit embeds the metadata row and self-contained
    # models validate both directions eagerly above
    tok = model.where(F.col("bucket") >= 0).filter(
        F.when(
            F.col("bucket") >= F.lit(int(buckets)),
            F.raise_error(
                F.lit(
                    "nb_classify: model carries bucket values >= the "
                    f"bucket count ({buckets}) — it was fit with more "
                    "buckets; pass the fit-time value"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    tot = tok.groupBy("label").agg(F.sum("c").alias("__tot"))
    alpha = float(smoothing)
    # complete lambda grid: one row per (class, bucket), smoothed
    # default where the class never saw the bucket
    grid = (
        prior_rows.select("label")
        .select(
            "label",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(buckets) - 1))
            ).alias("bucket"),
        )
        .withColumn("bucket", F.col("bucket").cast("bigint"))
        .join(tok, ["label", "bucket"], "left")
        # LEFT join + coalesce(0): a label with a prior row but no
        # bucket>=0 feature rows (hand-built or mis-merged models)
        # scores on smoothing alone instead of silently vanishing
        # from the grid (an inner join here dropped such labels)
        .join(tot, "label", "left")
        .select(
            "label",
            "bucket",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (
                        F.coalesce(F.col("__tot"), F.lit(0)).cast("double")
                        + F.lit(alpha * buckets)
                    )
                )
                * F.lit(_MICRO)
                + F.lit(0.5)
            ).cast("bigint").alias("__lam"),
        )
    )
    total_docs = prior_rows.agg(F.sum("c").alias("__nd"))
    priors = prior_rows.crossJoin(F.broadcast(total_docs)).select(
        "label",
        F.floor(
            F.log(F.col("c").cast("double") / F.col("__nd").cast("double"))
            * F.lit(_MICRO)
            + F.lit(0.5)
        ).cast("bigint").alias("__prior"),
    )
    guarded = df.filter(
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    "nb_classify: NULL id — scored rows are addressed by "
                    "id; assign ids first"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    # ---- vectorized single-shuffle scoring (r9) -----------------------
    # The r8 shape fanned every (doc, bucket) row out to K class ROWS
    # (broadcast grid join), re-shuffled by (id, label), then paid a
    # THIRD shuffle + sort for the argmax window.  Pivoting the λ grid
    # into per-bucket VECTORS (one array<bigint> of the K class λs,
    # class-order = sorted labels) turns all of that into: explode the
    # grams (same hashed-gram expression DSIR uses — the feature spaces
    # cannot diverge), broadcast-join the ≤`buckets`-row vector grid,
    # and ONE groupBy(id) with K integer sums — map-side partial
    # aggregation collapses each partition to K counters per doc, the
    # class fan-out rides in columns instead of rows, and the argmax is
    # a projection (first maximum of the class-sorted score array =
    # the lexicographically-smallest tied label, as before).  Integer
    # λ micro-nats make Σ_occurrence λ == Σ_bucket c·λ exactly, so
    # scores and argmax decisions are bit-identical to the r8 shape.
    # the SAME hashed-gram pipeline DSIR uses (one shared
    # implementation so the feature spaces cannot diverge), reduced
    # per row by RLE (r10): every downstream sum is linear in c with
    # integer λ micro-nats, so Σ_occurrence λ == Σ_row c·λ exactly —
    # and the broadcast join + groupBy(id) now process per-doc
    # distinct buckets instead of every gram occurrence
    occ = _row_bucket_counts(guarded, text_col, id_col, buckets)
    k = len(labels)
    if k > _NB_VEC_MAX_CLASSES:
        # beyond this, K per-class sum expressions + a K-element array
        # projection blow catalyst/codegen plan width — take the
        # row-fan shape instead: per-doc bucket counts x broadcast λ
        # grid -> groupBy(id, label), argmax via a min(struct) agg
        # (NOT a window: no per-id sort, map-side partial agg).  Same
        # integer arithmetic, bit-identical scores and tie-breaks.
        tf = occ.withColumnRenamed("c", "__c")
        scores = (
            tf.join(F.broadcast(grid), "bucket")
            .groupBy(id_col, "label")
            .agg(F.sum(F.col("__c") * F.col("__lam")).alias("__s"))
            .join(F.broadcast(priors), "label")
            .select(
                F.col(id_col),
                "label",
                (F.col("__s") + F.col("__prior")).cast("bigint").alias(
                    "score_micro"
                ),
            )
        )
        if all_scores:
            return scores
        best = scores.groupBy(id_col).agg(
            F.min(
                F.struct(
                    (-F.col("score_micro")).alias("__neg"),
                    F.col("label").alias("__l"),
                    F.col("score_micro").alias("__s"),
                )
            ).alias("__b")
        )
        return best.select(
            F.col(id_col),
            F.col("__b.__l").alias("label"),
            F.col("__b.__s").alias("score_micro"),
        )
    grid_vec = grid.groupBy("bucket").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("label", "__lam"))),
            lambda s: s["__lam"],
        ).alias("__lams")
    )
    prior_vec = priors.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("label", "__prior"))),
            lambda s: s["__prior"],
        ).alias("__priors")
    )
    per_doc = (
        occ.join(F.broadcast(grid_vec), "bucket")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(F.col("c") * F.col("__lams")[i]).alias(f"__s{i}")
                for i in range(k)
            ]
        )
    )
    scored_vec = per_doc.crossJoin(F.broadcast(prior_vec)).select(
        F.col(id_col),
        F.array(
            *[
                (F.col(f"__s{i}") + F.col("__priors")[i]).cast("bigint")
                for i in range(k)
            ]
        ).alias("__scores"),
    )
    lab_arr = F.array(*[F.lit(l) for l in labels])
    if all_scores:
        return scored_vec.select(
            F.col(id_col),
            F.posexplode("__scores").alias("__i", "score_micro"),
        ).select(
            F.col(id_col),
            F.element_at(lab_arr, F.col("__i") + 1).alias("label"),
            F.col("score_micro"),
        )
    pos = F.array_position(F.col("__scores"), F.array_max("__scores"))
    return scored_vec.select(
        F.col(id_col),
        F.element_at(lab_arr, pos.cast("int")).alias("label"),
        F.element_at(F.col("__scores"), pos.cast("int")).alias(
            "score_micro"
        ),
    )


def merge_nb_models(models: Sequence[DataFrame]) -> DataFrame:
    """Merge :func:`nb_fit` models — per-class counts and priors ADD
    (``nb_fit(A ⊎ B) == merge(nb_fit(A), nb_fit(B))`` exactly, the
    KMV/HLL merge-law discipline), so per-shard / per-day fits roll up
    without re-reading raw text.  Metadata rows pass through
    deduplicated: models built with different bucket counts produce
    conflicting metadata that :func:`nb_classify` rejects loudly (a
    summed metadata row would silently claim a wrong bucket count).
    """
    if not models:
        raise ValueError("merge_nb_models: models must be non-empty")
    for m in models:
        for c in ("label", "bucket", "c"):
            if c not in m.columns:
                raise ValueError(
                    f"merge_nb_models: model is missing column {c!r} — "
                    "expected the (label, bucket, c) relation nb_fit "
                    "produces"
                )
    u = models[0].select("label", "bucket", "c")
    for m in models[1:]:
        u = u.unionByName(m.select("label", "bucket", "c"))
    counts = (
        u.where(F.col("bucket") >= DEFAULT_BUCKET)
        .groupBy("label", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    meta = u.where(F.col("bucket") == _NB_META_BUCKET).distinct()
    return counts.unionByName(meta)
