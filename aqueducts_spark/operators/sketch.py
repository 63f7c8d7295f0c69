"""Deterministic mergeable sketches: KMV (cardinality), count-min
(frequency), and Bloom filters (membership pre-filtering).

KMV, the headline sketch:

Spark's native ``approx_count_distinct`` (HyperLogLog++) is the right
default at scale, but its estimates are engine-specific — they cannot
be verified against an independent SQL oracle, and two engines never
agree bit-for-bit.  KMV (Bar-Yossef et al. 2002, "Counting distinct
elements in a data stream") gives the same O(k) space / mergeable
properties with a fully DETERMINISTIC construction when the hash is a
fixed function (md5 here): the sketch is literally "the k smallest
hash values", so any engine that hashes the same way produces the
identical sketch and the identical estimate.  That makes it the
verifiable twin of HLL — the DuckDB gate oracle reproduces it exactly.

Estimator: with h_(k) the k-th smallest hash normalized to [0, 1),
``D ≈ (k-1) / h_(k)``; groups with fewer than k distinct values are
exact by construction (the sketch holds every distinct hash).

Scale design (100 TB):

* ONE full-volume shuffle: hashes aggregate by ``(group, h mod B)``
  with a map-side-combined ``collect_set``; each of the B bucket cells
  keeps only its k smallest hashes (``slice(array_sort(...), 1, k)``),
  all JVM-side.  Any of a group's k smallest hashes is by definition
  among its own bucket's k smallest, so the union of bucket top-k's
  contains the group top-k exactly — the final window ranks at most
  k·B candidate rows per group, never the raw distinct set.  This
  avoids the naive plan's single-task sort of ALL distinct hashes per
  group (a windowed top-k over a 1B-distinct group is one task);
* sketches MERGE: the KMV of a union is the k smallest of the unioned
  sketches, so per-partition / per-day sketches roll up without
  touching raw data (``merge_kmv_sketches``) — the same re-aggregation
  contract as ``time_rollup``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct",
    "kmv_sketch",
    "merge_kmv_sketches",
    "kmv_estimate",
    "corpus_overlap",
    "hll_sketch",
    "hll_estimate",
    "merge_hll_sketches",
    "hll_distinct",
    "cms_sketch",
    "cms_estimate",
    "merge_cms_sketches",
    "bloom_sketch",
    "bloom_filter",
    "dd_sketch",
    "dd_quantile",
    "merge_dd_sketches",
]

# 60-bit hash space: conv() of 15 hex chars stays well inside int64 and
# the identical arithmetic exists in DuckDB (('0x' || substr)::BIGINT)
_HASH_SPACE = float(1 << 60)

# Hash-function choice, everywhere a sketch hashes:
#   * "md5" (default) — cross-engine deterministic; the DuckDB oracle
#     reproduces every sketch cell exactly.  This is the verification
#     contract and the default for all gates.
#   * "xxhash64" — Spark's native codegen hash (one JVM intrinsic call
#     vs string-cast + digest + hex + conv for md5).  Same uniformity,
#     NOT reproducible outside Spark.  This is the 100 TB fast path:
#     per-row hashing is the dominant map-side cost of sketch
#     construction, so production pipelines that don't need an external
#     oracle should pass hash_fn="xxhash64" (see SCALE.md for measured
#     speedups).
_HASH_FNS = ("md5", "xxhash64")


def _check_hash_fn(hash_fn: str) -> None:
    if hash_fn not in _HASH_FNS:
        raise ValueError(f"hash_fn must be one of {_HASH_FNS}, got {hash_fn!r}")


def _h60(col, hash_fn: str = "md5"):
    if hash_fn == "xxhash64":
        s = col.cast("string")
        # xxhash64(NULL) returns the seed hash, not NULL — guard so NULL
        # values drop out exactly like the md5 path
        return F.when(
            s.isNotNull(), F.pmod(F.xxhash64(s), F.lit(1 << 60))
        ).cast("long")
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    buckets: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """The sketch itself: per group, the k smallest distinct 60-bit
    hashes of ``value_col`` with their rank (``grp..., h, rank``).
    Kept as rows (not an array) so sketches from different sources
    union/merge with plain relational ops.

    ``buckets`` (B) bounds reduce-side state: each ``(group, h mod B)``
    cell holds ~distinct/B hashes during the one full-volume
    aggregation and emits at most k.  The result is independent of B.
    """
    if k < 2:
        raise ValueError("kmv_sketch: k must be >= 2")
    if buckets < 1:
        raise ValueError("kmv_sketch: buckets must be >= 1")
    _check_hash_fn(hash_fn)
    grp = list(group_cols)
    hashes = df.select(*grp, _h60(F.col(value_col), hash_fn).alias("h")).where(
        F.col("h").isNotNull()
    )
    # one shuffle: collect_set partially aggregates map-side (dedup
    # before the exchange); each bucket cell trims to its k smallest
    candidates = (
        hashes.groupBy(*grp, F.pmod(F.col("h"), F.lit(buckets)).alias("_b"))
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("_hs"))
        .select(*grp, F.explode("_hs").alias("h"))
    )
    # tiny window: <= k * buckets candidate rows per group
    w = Window.partitionBy(*grp).orderBy(F.col("h").asc())
    return (
        candidates.select(*grp, "h", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        # the sketch carries its build k: estimation MUST know it, and
        # an independently-defaulted parameter silently took the
        # "exact" branch for any saturated sketch built with smaller k
        .withColumn("k", F.lit(int(k)))
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: Sequence[str], k: Optional[int] = None
) -> DataFrame:
    """Distinct-count estimate from a sketch: exact when the group has
    fewer than k distinct values, ``(k-1)/h_(k)`` otherwise.

    ``k`` defaults to None — read from the sketch's own ``k`` column
    (sketches built here carry it).  An EXPLICIT ``k`` argument that
    contradicts the sketch raises at execution instead of silently
    mis-branching (a saturated k=8 sketch estimated as k=64 used to
    report "exactly 8" for a 100-distinct group); with the old k=64
    default, that guard also fired spuriously on any sketch built with
    a non-default k.  For external sketches without the column, an
    explicit ``k`` is required and trusted as given.
    """
    grp = list(group_cols)
    aggs = [F.count("h").alias("sketch_size"), F.max("h").alias("kth_h")]
    if "k" in sketch.columns:
        aggs.append(F.min("k").alias("_k_min"))
        aggs.append(F.max("k").alias("_k_max"))
    agg = sketch.groupBy(*grp).agg(*aggs)
    if "k" in sketch.columns:
        guard = F.assert_true(
            (F.col("_k_min") == F.col("_k_max"))
            & (F.lit(True) if k is None else (F.col("_k_max") == F.lit(int(k)))),
            F.lit(
                "kmv_estimate: the k argument contradicts the sketch's "
                "build k (or sketches with different k were mixed)"
            ),
        )
        k_col = F.col("_k_max").cast("double")
        agg = agg.where(guard.isNull())
    else:
        if k is None:
            raise ValueError(
                "kmv_estimate: sketch has no 'k' column; pass k explicitly"
            )
        k_col = F.lit(float(k))
    exact = F.col("sketch_size").cast("double")
    est = (k_col - F.lit(1.0)) / (
        F.col("kth_h").cast("double") / F.lit(_HASH_SPACE)
    )
    return agg.select(
        *grp,
        F.col("sketch_size"),
        F.when(F.col("sketch_size") < k_col, exact)
        .otherwise(est)
        .alias("distinct_est"),
    )


def merge_kmv_sketches(
    sketches: Sequence[DataFrame], group_cols: Sequence[str], k: int = 64
) -> DataFrame:
    """Merge sketches (e.g. one per day/partition): the KMV of a union
    is the k smallest distinct hashes across the unioned sketches."""
    grp = list(group_cols)
    merged = sketches[0].select(*grp, "h")
    for s in sketches[1:]:
        merged = merged.unionByName(s.select(*grp, "h"))
    merged = merged.distinct()
    w = Window.partitionBy(*grp).orderBy(F.col("h").asc())
    return (
        merged.select(*grp, "h", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
        .withColumn("k", F.lit(int(k)))
    )


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str = "doc_id",
    value_col_b: Optional[str] = None,
    k: int = 256,
    buckets: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """Cross-corpus set-overlap estimate from two bounded KMV sketches
    (Beyer et al. SIGMOD'07 §4, "On synopses for distinct-value
    estimation under multiset operations") — the dataset-curation
    question "how much of corpus B is already in A?" answered WITHOUT
    a corpus×corpus join: each side reduces to its k smallest distinct
    hashes (one map-side-combined pass per corpus), and every estimate
    below is arithmetic over those ≤ 2k rows.

    The intersection estimator is Beyer's resemblance form, not
    inclusion–exclusion: over the k smallest hashes of the UNION,
    ``jaccard = |hashes present in both sketches| / |union sketch|``
    (never negative, exact whenever the UNION has < k distinct values)
    and ``intersection = jaccard × union_est``.  Containments
    are estimated INSIDE the same union window — ``a_in_b = |window
    hashes in both| / |window hashes in A|`` — because the window's
    A-hashes are a uniform sample of A's distinct values; dividing the
    intersection ESTIMATE by A's separately-derived estimate instead
    would mix two draws with independent errors and can exceed 1 (a
    true subset read 1.32 that way), while this ratio is exactly 1 for
    a subset by construction.

    Output (ONE row, floats rounded to 4dp):
    ``distinct_a_est, distinct_b_est, union_est, intersection_est,
    jaccard_est, containment_a_in_b, containment_b_in_a`` — the
    containment columns read "this fraction of A's distinct values is
    also in B" and vice versa; empty-input estimates are 0 and the
    ratios NULL.

    Deterministic md5 hashing keeps every number engine-exact (the
    DuckDB oracle replays sketch construction and arithmetic);
    relative error of the saturated estimates is ~1/sqrt(k).
    """
    vb = value_col_b if value_col_b is not None else value_col
    ka = kmv_sketch(df_a, [], value_col, k, buckets, hash_fn).select(
        "h", F.lit(True).alias("_in_a")
    )
    kb = kmv_sketch(df_b, [], vb, k, buckets, hash_fn).select(
        "h", F.lit(True).alias("_in_b")
    )
    merged = ka.join(kb, "h", "full").select(
        "h",
        F.coalesce("_in_a", F.lit(False)).alias("_in_a"),
        F.coalesce("_in_b", F.lit(False)).alias("_in_b"),
    )
    # <= 2k rows: the single-partition window is trivially bounded
    w = Window.orderBy(F.col("h").asc())
    u = merged.withColumn("_r", F.row_number().over(w))
    kd = F.lit(float(k))
    in_u = F.col("_r") <= F.lit(int(k))
    stats = u.agg(
        F.sum(F.col("_in_a").cast("long")).alias("_na"),
        F.sum(F.col("_in_b").cast("long")).alias("_nb"),
        F.max(F.when(F.col("_in_a"), F.col("h"))).alias("_ha"),
        F.max(F.when(F.col("_in_b"), F.col("h"))).alias("_hb"),
        F.sum(F.when(in_u, 1).otherwise(0)).alias("_nu"),
        F.max(F.when(in_u, F.col("h"))).alias("_hu"),
        F.sum(
            F.when(in_u & F.col("_in_a") & F.col("_in_b"), 1).otherwise(0)
        ).alias("_nboth"),
        F.sum(F.when(in_u & F.col("_in_a"), 1).otherwise(0)).alias("_nau"),
        F.sum(F.when(in_u & F.col("_in_b"), 1).otherwise(0)).alias("_nbu"),
    )

    def _est(n, kth):
        # exact below saturation, (k-1)/normalized-kth-hash at it —
        # kmv_estimate's exact arithmetic, inlined on the merged stats
        return F.when(F.col(n) < kd, F.col(n).cast("double")).otherwise(
            (kd - F.lit(1.0))
            / (F.col(kth).cast("double") / F.lit(_HASH_SPACE))
        )

    est_a = F.coalesce(_est("_na", "_ha"), F.lit(0.0))
    est_b = F.coalesce(_est("_nb", "_hb"), F.lit(0.0))
    # the union is exact iff the UNION window itself is unsaturated
    # (_nu < k) — which implies both inputs were too, so the merged
    # relation is complete.  "Both sides unsaturated" alone is NOT
    # enough: two 50-distinct corpora under k=64 merge to 100 hashes,
    # and taking the truncated window count as exact would hard-cap
    # every such union (and the intersection scaled from it) at k.
    est_u = F.coalesce(
        F.when(
            F.col("_nu") < kd,
            F.col("_nu").cast("double"),
        ).otherwise(
            (kd - F.lit(1.0))
            / (F.col("_hu").cast("double") / F.lit(_HASH_SPACE))
        ),
        F.lit(0.0),
    )
    jac = F.when(
        F.col("_nu") > 0,
        F.col("_nboth").cast("double") / F.col("_nu").cast("double"),
    )
    inter = F.coalesce(jac, F.lit(0.0)) * est_u
    return stats.select(
        F.round(est_a, 4).alias("distinct_a_est"),
        F.round(est_b, 4).alias("distinct_b_est"),
        F.round(est_u, 4).alias("union_est"),
        F.round(inter, 4).alias("intersection_est"),
        F.round(F.coalesce(jac, F.lit(0.0)), 4).alias("jaccard_est"),
        F.round(
            F.when(
                F.col("_nau") > 0,
                F.col("_nboth").cast("double") / F.col("_nau").cast("double"),
            ),
            4,
        ).alias("containment_a_in_b"),
        F.round(
            F.when(
                F.col("_nbu") > 0,
                F.col("_nboth").cast("double") / F.col("_nbu").cast("double"),
            ),
            4,
        ).alias("containment_b_in_a"),
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    buckets: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """End-to-end: sketch + estimate in one call."""
    return kmv_estimate(
        kmv_sketch(df, group_cols, value_col, k, buckets, hash_fn), group_cols, k
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, "HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm"), in the module's
# cross-engine-deterministic style.
#
# Spark's native approx_count_distinct IS HyperLogLog++ and remains the
# production default — but its register layout is engine-internal, so
# its estimates cannot be verified by an independent SQL oracle.  This
# construction makes every piece portable arithmetic:
#
# * register index  = first 4 md5 hex chars (16 bits) mod m;
# * rank source w   = next 15 hex chars (a 60-bit integer);
# * rho(w)          = leading zeros of the 60-bit w, plus 1
#                     = 61 - length(bin(w))   (w = 0 -> 61),
#   where bin() is the no-leading-zeros binary string both engines
#   produce (Spark ``conv(w, 10, 2)``, DuckDB ``bin(w)``);
# * register value  = max rho — a plain map-side-combined MAX.
#
# The estimator's register sum Σ 2^-M_j is the classic float-drift
# trap: summed as doubles it is partition-order dependent.  Scaled by
# 2^61 every term 2^(61-rho) is an EXACT int64, summed as
# DECIMAL(38,0) the total is exact and order-independent, and the
# final ``alpha_m * m^2 * 2^61 / total`` is ONE IEEE division of a
# Python-precomputed numerator literal — bit-identical on any engine.
# Small-range (linear counting) correction per the paper: when
# E <= 2.5m and empty registers exist, E = m * ln(m / V).
#
# Scale design (100 TB): ONE full-volume shuffle keyed by
# (group, register) with a map-side-combined MAX — reduce state is m
# rows per group (the whole point of HLL), and sketches merge by
# register-wise MAX (``merge_hll_sketches``), the same re-aggregation
# contract as KMV/CMS/DDSketch: per-day or per-shard sketches roll up
# without touching raw data.  Standard error ~= 1.04 / sqrt(m).
# ---------------------------------------------------------------------------

# the rho source is 60 bits, so exponents 61 - rho lie in 0..60 and
# 2^(61-rho) always fits int64; 2^61 (an empty register's term) is the
# one constant that rides as a literal
_HLL_EMPTY_TERM = 1 << 61


def _hll_alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (§4)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_hll_m(m: int) -> None:
    if m < 16 or m > 65536 or (m & (m - 1)) != 0:
        raise ValueError(
            f"hll: m must be a power of two in 16..65536, got {m}"
        )


def _hll_reg_rho(df: DataFrame, value_col: str, m: int, hash_fn: str):
    """Project ``reg``/``__rho`` for every non-NULL value row — the
    construction shared by batch :func:`hll_sketch` and the streaming
    twin (``streaming/ops.py::distinct_sketch_stream``); all other
    input columns pass through.

    The sketch relation's column names are its CONTRACT (``reg``/
    ``mx``/``m`` are what merge/estimate key on), so unlike operators
    with free output names there is no ``_fresh_name`` escape — an
    input frame already carrying one of the overwritten names is
    rejected loudly instead of silently clobbered (a ``group_by=
    ['reg']`` on a frame whose ``reg`` is a region code would
    otherwise group by hash registers)."""
    clash = {"reg", "__w", "__rho", "__dg"} & set(df.columns)
    if clash:
        raise ValueError(
            f"hll: input columns {sorted(clash)} collide with the "
            "sketch's reserved register columns; rename them first"
        )
    v = F.col(value_col)
    if hash_fn == "xxhash64":
        s = v.cast("string")
        hashed = (
            df.where(v.isNotNull())
            .withColumns(
                {
                    "reg": F.pmod(F.xxhash64(s), F.lit(m)).cast("int"),
                    "__w": F.pmod(
                        F.xxhash64(s, F.lit("#2")), F.lit(1 << 60)
                    ),
                }
            )
            # hex() emits no leading zeros, so the stripped-hex rho
            # below sees exactly the significant digits
            .withColumn("__rho", _rho_from_hex("hex(__w)"))
            .drop("__w")
        )
        return hashed
    return (
        df.where(v.isNotNull())
        .withColumn("__dg", F.md5(v.cast("string")))
        .withColumns(
            {
                "reg": F.pmod(
                    F.conv(F.substring(F.col("__dg"), 1, 4), 16, 10).cast(
                        "long"
                    ),
                    F.lit(m),
                ).cast("int"),
                # rho straight from the hex digits — the w integer
                # itself is never materialized (only its bit length
                # matters, and conv(hex -> long -> binary string) was
                # the gate's single most expensive expression)
                "__rho": _rho_from_hex("substring(__dg, 5, 15)"),
            }
        )
        .drop("__dg")
    )


def _rho_from_hex(h) -> "F.Column":
    """rho — leading zeros of the 60-bit value + 1, i.e. ``61 -
    bit_length`` — computed from the value's HEX digits directly:
    ``bit_length = 4 * len(stripped) - clz4(first_digit)`` where
    ``stripped`` drops leading zero digits and ``clz4`` is the leading-
    zero count within the first nibble.  Value-identical to the
    documented ``61 - length(bin(w))`` definition (the DuckDB oracle's
    form) for every w in [0, 2^60): an all-zero/empty digit string is
    w = 0 -> rho 61.  Base conversion through a 60-char binary string
    (``conv(w, 10, 2)``) measured ~0.9 s of the sf0.1 hll gate by
    itself; this is a char strip + length.  Case-insensitive: nibbles
    a-f (>= 8) have clz4 = 0 either way.

    ``h`` is a SQL expression STRING (the two-arg ltrim function
    signature is deprecated in Spark 4; the ``TRIM(LEADING .. FROM ..)``
    form is expression-syntax only)."""
    s = F.expr(f"TRIM(LEADING '0' FROM {h})")
    first = F.substring(s, 1, 1)
    clz4 = (
        F.when(first == "1", F.lit(3))
        .when(first.isin("2", "3"), F.lit(2))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        F.when(s == "", F.lit(61))
        .otherwise(F.lit(61) - F.length(s) * F.lit(4) + clz4)
        .cast("int")
    )


def hll_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    m: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """The sketch: per group, one row per NON-EMPTY register
    ``(group..., reg, mx, m)`` where ``mx`` is the register's max rho.
    Row form (not an array blob) so sketches merge with plain
    relational ops and a SQL oracle rebuilds the identical relation;
    registers that saw no value are implicit (the estimator counts
    them as ``m - n_registers``).

    Like KMV's ``k`` column, the sketch carries its build ``m``:
    estimation MUST know it, and a mismatched ``m`` silently corrupts
    both the register sum and the linear-counting branch.
    """
    _check_hll_m(m)
    _check_hash_fn(hash_fn)
    grp = list(group_cols)
    bad = {"mx", "m"} & set(grp)
    if bad:
        raise ValueError(
            f"hll_sketch: group columns {sorted(bad)} collide with the "
            "sketch's reserved output columns; rename them first"
        )
    # no parallelism-rescue repartition here: with the stripped-hex rho
    # (below) the per-row register projection is cheap enough that a
    # few-partition local read beats paying a repartition round-trip —
    # measured 1.4 s vs 2.0 s at sf0.1 on 3 input partitions
    hashed = _hll_reg_rho(df, value_col, m, hash_fn)
    return (
        hashed.select(*grp, "reg", "__rho")
        .groupBy(*grp, "reg")
        .agg(F.max("__rho").alias("mx"))
        .withColumn("m", F.lit(int(m)))
    )


def merge_hll_sketches(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Register-wise MAX: HLL(A ⊎ B) == merge(HLL(A), HLL(B)) exactly
    (registers are maxima), so per-shard sketches roll up losslessly.

    All inputs must share the same build ``m`` — validated at merge
    time IN the merge's own aggregation (one pass, fully lazy, no
    second scan of the input lineage): the groupBy carries per-register
    ``min(m)``/``max(m)``/null-count, so any register populated by
    inputs with DIFFERENT m raises here — including the case the
    downstream estimator cannot see, where every register collides and
    a per-register ``min(m)`` would erase the mixed-m evidence
    entirely.  Registers populated by only ONE input pass this check
    with their single m, but a mixed merge then emits rows with
    different m values and :func:`hll_estimate`'s min/max m-guard
    trips — between the two guards no silent mixed-m path remains."""
    grp = list(group_cols)
    merged = sketches[0].select(*grp, "reg", "mx", "m")
    for s in sketches[1:]:
        merged = merged.unionByName(s.select(*grp, "reg", "mx", "m"))
    grouped = merged.groupBy(*grp, "reg").agg(
        F.max("mx").alias("mx"),
        F.min("m").alias("__mmin"),
        F.max("m").alias("__mmax"),
        F.sum(F.col("m").isNull().cast("int")).alias("__mnulls"),
    )
    guard = F.assert_true(
        (F.col("__mnulls") == 0) & (F.col("__mmin") == F.col("__mmax")),
        F.lit(
            "merge_hll_sketches: inputs were built with different (or "
            "NULL) m — a mixed-m merge collapses to one m per register "
            "and the estimate is silently wrong; rebuild with one m"
        ),
    )
    return grouped.where(guard.isNull()).select(
        *grp, "reg", "mx", F.col("__mmin").alias("m")
    )


def hll_estimate(
    sketch: DataFrame, group_cols: Sequence[str], m: Optional[int] = None
) -> DataFrame:
    """Cardinality estimate from a :func:`hll_sketch` relation:
    ``(group..., n_registers, distinct_est)``.

    ``m`` defaults to None — read from the sketch's own ``m`` column
    (sketches built here carry it); an EXPLICIT ``m`` that contradicts
    the sketch raises at execution instead of silently mis-estimating
    (kmv_estimate's k-guard discipline).  The raw estimate is
    ``alpha_m * m^2 / Σ_j 2^-M_j`` with the paper's linear-counting
    correction for the small range; the register sum runs in exact
    DECIMAL arithmetic (see the section comment), the result is
    rounded to 4 places.
    """
    grp = list(group_cols)
    # 2^(61 - mx) is an exact int64 for mx in 1..61; summed as decimal
    # the total is exact and partition-order independent
    term = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), 61 - mx) AS DECIMAL(38,0))"
    )
    aggs = [
        F.count("reg").cast("bigint").alias("n_registers"),
        F.count_distinct(F.col("reg")).cast("bigint").alias("_n_distinct"),
        F.sum(term).alias("_s"),
    ]
    if "m" in sketch.columns:
        aggs.append(F.min("m").alias("_m_min"))
        aggs.append(F.max("m").alias("_m_max"))
        # min/max SKIP NULLs, so a NULL-m row alongside valid ones
        # would pass the consistency check silently — count them
        aggs.append(
            F.sum(F.col("m").isNull().cast("int")).alias("_m_nulls")
        )
    agg = sketch.groupBy(*grp).agg(*aggs)
    if "m" in sketch.columns:
        guard = F.assert_true(
            (F.col("_m_nulls") == 0)
            & (F.col("_m_min") == F.col("_m_max"))
            & (
                F.lit(True)
                if m is None
                else (F.col("_m_max") == F.lit(int(m)))
            ),
            F.lit(
                "hll_estimate: the m argument contradicts the sketch's "
                "build m (or sketches with different m were mixed)"
            ),
        )
        agg = agg.where(guard.isNull())
        if m is None:
            # m must be a plan-time constant (alpha/numerator literals
            # depend on it), so a carried m still needs one tiny read
            vals = [r["m"] for r in sketch.select("m").distinct().collect()]
            if any(v is None for v in vals):
                # sorted() below would TypeError on None, masking the
                # real problem; and a NULL build-m can never be trusted
                raise ValueError(
                    "hll_estimate: sketch carries NULL m values — rebuild "
                    "the sketch or pass m explicitly"
                )
            if not vals:
                # an empty sketch (no rows, or all-NULL values) is a
                # valid input — estimate it as empty, matching the
                # explicit-m path, instead of a misleading "mixed m"
                return agg.where(F.lit(False)).select(
                    *grp,
                    "n_registers",
                    F.lit(None).cast("double").alias("distinct_est"),
                )
            if len(vals) != 1:
                raise ValueError(
                    f"hll_estimate: sketch carries mixed m values {sorted(vals)}"
                )
            m = int(vals[0])
        _check_hll_m(m)
    else:
        if m is None:
            raise ValueError(
                "hll_estimate: sketch has no 'm' column; pass m explicitly"
            )
        _check_hll_m(m)
    # every cross-engine-sensitive constant precomputed in Python and
    # inlined as ONE literal: numerator alpha*m^2*2^61, the 2.5m
    # small-range threshold, and an empty register's decimal term
    numer = _hll_alpha(m) * float(m) * float(m) * float(_HLL_EMPTY_TERM)
    thr = 2.5 * m
    # a valid sketch has at most one row per register: duplicate
    # registers (e.g. multi-window rows estimated without
    # merge_hll_sketches first) double-count in _s and undersize the
    # empty-register count — a silently wrong estimate.  count vs
    # count_distinct detects EVERY duplicate, including groups whose
    # total row count still fits under m (the <= m check alone missed
    # those).  Fail loudly (kmv_estimate's guard discipline).
    reg_guard = F.assert_true(
        (F.col("n_registers") == F.col("_n_distinct"))
        # belt-and-braces for hand-built relations whose reg values
        # fall outside 0..m-1: more distinct regs than m would still
        # turn the empty-register count negative
        & (F.col("n_registers") <= F.lit(int(m))),
        F.lit(
            "hll_estimate: duplicate register rows per group (multiple "
            "windows/shards estimated together?), or more registers "
            "than m; merge_hll_sketches them first"
        ),
    )
    v_cnt = (F.lit(int(m)) - F.col("n_registers")).cast("bigint")
    total = F.col("_s") + v_cnt.cast("decimal(38,0)") * F.lit(
        _HLL_EMPTY_TERM
    ).cast("decimal(38,0)")
    raw = F.lit(numer) / total.cast("double")
    est = F.when(
        (raw <= F.lit(thr)) & (v_cnt > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_cnt.cast("double")),
    ).otherwise(raw)
    return agg.where(reg_guard.isNull()).select(
        *grp, "n_registers", F.round(est, 4).alias("distinct_est")
    )


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    m: int = 64,
    hash_fn: str = "md5",
) -> DataFrame:
    """End-to-end: sketch + estimate in one call."""
    return hll_estimate(
        hll_sketch(df, group_cols, value_col, m, hash_fn), group_cols, m
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
# stream summary: the count-min sketch and its applications").
#
# Like KMV above, the construction is DETERMINISTIC (double hashing
# derived from one md5 instead of random pairwise hashes) so an
# independent SQL engine reproduces the sketch cell-for-cell and the
# estimates exactly.
#
# Scale design (100 TB): the sketch is depth × width counters — the
# explode multiplies rows by `depth` BEFORE the exchange, but hash
# partial aggregation collapses every partition to at most
# depth × width cells map-side, so the shuffle volume is
# O(partitions × depth × width), independent of data volume.  Sketches
# merge by cell-wise sum (`merge_cms_sketches`), the same
# re-aggregation contract as KMV/time_rollup: per-day or per-shard
# sketches roll up without touching raw data.
# ---------------------------------------------------------------------------


def _with_h60_pair(df: DataFrame, col, hash_fn: str = "md5") -> DataFrame:
    """Append ``__h1``/``__h2``: TWO independent 60-bit hashes from ONE
    md5 — the digest's first and second 15-hex-char halves.
    Row/position families are then derived as ``(h1 + i*h2) mod m`` —
    Kirsch & Mitzenmacher ("Less hashing, same performance", ESA 2006)
    prove this double-hashing scheme preserves the sketch guarantees,
    at one hash computation per value instead of depth/num_hashes. At
    100 TB the per-row md5 is the dominant map-side cost of sketch
    construction, so this is a depth-fold CPU cut.

    The digest is MATERIALIZED as its own projection on purpose:
    inlining ``md5`` into both halves re-computes it per reference
    (codegen subexpression elimination does not reach into the
    array-of-struct constructors the callers build — measured 2×
    slower), while CollapseProject keeps a multi-referenced non-cheap
    expression in its own project, so this shape hashes exactly once
    per row.

    Same arithmetic in DuckDB:
    ``('0x' || substr(md5(v), 1, 15))::BIGINT`` and
    ``('0x' || substr(md5(v), 16, 15))::BIGINT``.
    """
    if hash_fn == "xxhash64":
        # two cheap native hashes (a second xxhash64 with a salt column
        # beats splitting anything) — still one-ish intrinsic per value
        s = col.cast("string")
        return df.withColumn(
            "__h1", F.pmod(F.xxhash64(s), F.lit(1 << 60))
        ).withColumn("__h2", F.pmod(F.xxhash64(s, F.lit("#2")), F.lit(1 << 60)))
    staged = df.withColumn("__dg", F.md5(col.cast("string")))
    return (
        staged.withColumn(
            "__h1", F.conv(F.substring(F.col("__dg"), 1, 15), 16, 10).cast("long")
        )
        .withColumn(
            "__h2", F.conv(F.substring(F.col("__dg"), 16, 15), 16, 10).cast("long")
        )
        .drop("__dg")
    )


def cms_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: int = 1024,
    depth: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """Count-min sketch as rows ``(group..., d, c, cnt)``: row ``d``
    uses cell ``(h1 + d*h2) mod width`` (double hashing from ONE md5,
    see :func:`_h60_pair`) and ``cnt`` is the number of input rows
    landing in that cell.

    Row form (not a 2-D array) so sketches from different sources merge
    with plain relational ops and the DuckDB oracle can rebuild the
    identical relation.
    """
    if width < 2:
        raise ValueError("cms_sketch: width must be >= 2")
    if not 1 <= depth <= 6:
        # h1 + depth*h2 must stay inside int64: (1+6)*2^60 < 2^63
        raise ValueError("cms_sketch: depth must be in 1..6")
    _check_hash_fn(hash_fn)
    grp = list(group_cols)
    v = F.col(value_col)
    hashed = _with_h60_pair(df.where(v.isNotNull()), v, hash_fn)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    F.col("__h1") + F.lit(d) * F.col("__h2"), F.lit(width)
                ).alias("c"),
            )
            for d in range(1, depth + 1)
        ]
    )
    return (
        hashed.select(*grp, F.explode(cells).alias("p"))
        .groupBy(*grp, F.col("p.d").alias("d"), F.col("p.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 3,
    group_cols: Sequence[str] = (),
    hash_fn: str = "md5",
) -> DataFrame:
    """Frequency estimate for each candidate in ``items``: the minimum
    over the sketch's ``depth`` rows of the counter at ``h_d(item) mod
    width`` — the classic CMS point query (never underestimates; over-
    estimates only on hash collisions).

    ``items`` must carry ``group_cols`` too when the sketch is grouped.
    The join probes at most ``depth`` cells per item, so the candidate
    side stays tiny relative to the data the sketch summarized.
    """
    _check_hash_fn(hash_fn)
    grp = list(group_cols)
    it = F.col(item_col)
    hashed = _with_h60_pair(items.where(it.isNotNull()), it, hash_fn)
    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    F.col("__h1") + F.lit(d) * F.col("__h2"), F.lit(width)
                ).alias("c"),
            )
            for d in range(1, depth + 1)
        ]
    )
    exploded = (
        hashed.select(item_col, *grp, F.explode(probes).alias("p"))
        .select(item_col, *grp, F.col("p.d").alias("d"), F.col("p.c").alias("c"))
    )
    joined = exploded.join(sketch, on=grp + ["d", "c"], how="left")
    return (
        joined.groupBy(item_col, *grp)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("freq_est"))
    )


def merge_cms_sketches(
    sketches: Sequence[DataFrame],
    group_cols: Sequence[str] = (),
    width: Optional[int] = None,
    depth: Optional[int] = None,
) -> DataFrame:
    """Cell-wise sum: CMS(A ⊎ B) == merge(CMS(A), CMS(B)) exactly
    (counters are linear), so per-shard sketches roll up losslessly.

    Unlike HLL's ``m``, a CMS relation does not carry its build
    ``width``/``depth`` (cells are just ``(d, c, cnt)``), so a
    mixed-parameter merge is only PARTIALLY detectable.  Pass
    ``width``/``depth`` to assert every merged cell is in range —
    catches an input built with a LARGER width/depth; a smaller-built
    input stays in range and is undetectable from the cells alone
    (the merge_hll_sketches m-guard discipline, applied as far as the
    representation allows).  Estimation with mismatched parameters
    overestimates silently — keep one (width, depth) per fleet."""
    grp = list(group_cols)
    merged = sketches[0].select(*grp, "d", "c", "cnt")
    for s in sketches[1:]:
        merged = merged.unionByName(s.select(*grp, "d", "c", "cnt"))
    out = merged.groupBy(*grp, "d", "c").agg(F.sum("cnt").alias("cnt"))
    checks = []
    if width is not None:
        checks.append(
            (F.col("c") >= 0) & (F.col("c") < F.lit(int(width)))
        )
    if depth is not None:
        checks.append(
            (F.col("d") >= 1) & (F.col("d") <= F.lit(int(depth)))
        )
    if checks:
        cond = checks[0]
        for extra in checks[1:]:
            cond = cond & extra
        guard = F.assert_true(
            cond,
            F.lit(
                "merge_cms_sketches: merged cells fall outside the "
                f"declared width={width}/depth={depth} — an input was "
                "built with different parameters; rebuild with one "
                "(width, depth)"
            ),
        )
        out = out.where(guard.isNull())
    return out


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970).  Deterministic double-hashed bit
# positions (Kirsch-Mitzenmacher, one md5 per value), so the filter
# and every membership verdict — including false positives — is
# reproducible in the DuckDB oracle.
#
# Scale design: the build side is one distinct-aggregation over the
# (small) key set, bounded by ``num_bits`` rows; the probe side tests
# membership with pure codegen bit arithmetic against a broadcast
# bitmap literal — ZERO shuffle on the (huge) probe side.  This is the
# declarative twin of AQE's runtime bloom pruning: pre-filter a 100 TB
# fact scan down to near-matches before an expensive join or UDF stage.
# ---------------------------------------------------------------------------


def bloom_sketch(
    df: DataFrame,
    value_col: str,
    num_bits: int = 8192,
    num_hashes: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """The set bits: distinct ``pos`` rows, ``pos = h_i(v) mod
    num_bits`` for i in 1..num_hashes.  At most ``num_bits`` rows, and
    mergeable across sources by plain ``UNION``/``DISTINCT``.

    The consuming :func:`bloom_filter` MUST be called with the same
    ``num_bits``/``num_hashes`` — the sketch is just positions, so a
    mismatch is only partially detectable there (larger-than-filter
    positions raise; a sketch built with smaller num_bits would
    silently produce false negatives)."""
    if num_bits < 8:
        raise ValueError("bloom_sketch: num_bits must be >= 8")
    if not 1 <= num_hashes <= 6:
        # h1 + num_hashes*h2 must stay inside int64: (1+6)*2^60 < 2^63
        raise ValueError("bloom_sketch: num_hashes must be in 1..6")
    _check_hash_fn(hash_fn)
    v = F.col(value_col)
    hashed = _with_h60_pair(df.where(v.isNotNull()), v, hash_fn)
    positions = F.array(
        *[
            F.pmod(F.col("__h1") + F.lit(i) * F.col("__h2"), F.lit(num_bits))
            for i in range(1, num_hashes + 1)
        ]
    )
    return hashed.select(F.explode(positions).alias("pos")).distinct()


def bloom_filter(
    df: DataFrame,
    value_col: str,
    bits: DataFrame,
    num_bits: int = 8192,
    num_hashes: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Keep rows of ``df`` whose ``value_col`` MAY be in the set the
    ``bits`` sketch was built from (no false negatives; false-positive
    rate ~ (1 - e^{-kn/m})^k).

    The bitmap is collected to the driver (bounded: ``num_bits`` bits ≤
    a few MB); no join, no shuffle, NULLs dropped (a bloom can't vouch
    for NULL).  For very large filters (num_bits ≫ 2^22) prefer a
    broadcast semi-join on the key itself.

    Probe evaluation (r11, guide §4.2): the md5 path tests positions
    in ONE Arrow-batched pandas_udf — the bitmap rides the task
    closure as a numpy word array, only the CAST-to-string key column
    crosses the boundary, and hashlib's md5 hexdigest / int(hex, 16)
    are definitionally the engine-portable values the SQL expressions
    computed, so the kept row set is bit-identical.  The previous
    expression form was measured at ~4x a plain scan even with the
    digest lambda-bound once: nested higher-order functions execute
    interpreted, and the unrolled codegen alternative re-evaluates
    md5+conv per position test (FilterExec performs no common-
    subexpression elimination).  The ``xxhash64`` path keeps the
    expression form — that hash is Spark-internal and cannot be
    reproduced Python-side.
    """
    if num_bits > (1 << 24):
        raise ValueError(
            "bloom_filter: num_bits > 2^24 — use a broadcast semi-join instead"
        )
    if not 1 <= num_hashes <= 6:
        raise ValueError("bloom_filter: num_hashes must be in 1..6")
    _check_hash_fn(hash_fn)
    words = [0] * ((num_bits + 63) // 64)
    for row in bits.select("pos").collect():
        pos = int(row["pos"])
        if not (0 <= pos < num_bits):
            raise ValueError(
                f"bloom_filter: sketch position {pos} is outside num_bits="
                f"{num_bits} — the sketch was built with different num_bits; "
                "filter parameters must match the sketch's exactly (a smaller "
                "mismatch is undetectable and silently yields false negatives)"
            )
        words[pos >> 6] |= 1 << (pos & 63)
    qcol_c = F.col(value_col)
    if hash_fn == "md5":
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        words_np = np.asarray(words, dtype=np.uint64)
        nh, nb = int(num_hashes), int(num_bits)

        @pandas_udf("boolean")
        def _probe(keys: pd.Series) -> pd.Series:
            import hashlib

            out = np.empty(len(keys), dtype=bool)
            for j, s in enumerate(keys):
                if s is None:
                    # the plan evaluates the UDF below the NULL filter
                    # (ArrowEvalPython extraction); the isNotNull
                    # conjunct still drops these rows
                    out[j] = False
                    continue
                d = hashlib.md5(s.encode("utf-8")).hexdigest()
                h1 = int(d[:15], 16)
                h2 = int(d[15:30], 16)
                ok = True
                for i in range(1, nh + 1):
                    p = (h1 + i * h2) % nb
                    if not (int(words_np[p >> 6]) >> (p & 63)) & 1:
                        ok = False
                        break
                out[j] = ok
            return pd.Series(out)

        # the isNotNull guard both drops NULLs (contract) and keeps the
        # UDF's input total; the CAST mirrors the expression form so
        # every type probes on the same string rendering
        return df.where(
            qcol_c.isNotNull() & _probe(qcol_c.cast("string"))
        )

    # int64 literals (Python ints are unbounded; wrap to signed 64-bit)
    words = [(w & ((1 << 63) - 1)) - (w & (1 << 63)) for w in words]
    words_sql = "array(" + ", ".join(f"{w}L" for w in words) + ")"

    # One digest per probe row, enforced with a lambda binding: filter
    # predicates get alias-inlined by predicate pushdown and FilterExec
    # codegen performs no common-subexpression elimination, so a plain
    # column/expression form re-hashes per position test (measured 16
    # md5 evaluations per row). ``transform(array(<hashes>), g -> ...)``
    # evaluates the hash(es) exactly once and binds them as the lambda
    # variable; the body is integer shift/AND (plus two conv()s on the
    # md5 path).
    # backtick-quote the identifier: raw interpolation crashed on any
    # non-bare column name and was an expression-injection surface
    qcol = "`" + value_col.replace("`", "``") + "`"
    if hash_fn == "xxhash64":
        probe = (
            f"array(named_struct("
            f"'a', pmod(xxhash64(CAST({qcol} AS STRING)), {1 << 60}), "
            f"'b', pmod(xxhash64(CAST({qcol} AS STRING), '#2'), {1 << 60})))"
        )
        h1_sql = "g.a"
        h2_sql = "g.b"
    else:
        probe = f"array(md5(CAST({qcol} AS STRING)))"
        h1_sql = "CAST(conv(substr(g, 1, 15), 16, 10) AS BIGINT)"
        h2_sql = "CAST(conv(substr(g, 16, 15), 16, 10) AS BIGINT)"

    # positions bound via a sequence-transform and the bitmap literal
    # referenced exactly ONCE: repeating a ~262k-word array literal per
    # hash test (and each position twice for DIV/%) made the SQL text
    # num_hashes*2 times larger than the bitmap — a driver-side
    # parse/analysis stall at large num_bits
    positions = (
        f"transform(sequence(1, {num_hashes}), "
        f"i -> pmod({h1_sql} + i * {h2_sql}, {num_bits}))"
    )
    test = (
        f"p -> ((shiftright(element_at({words_sql}, "
        f"CAST(p DIV 64 AS INT) + 1), CAST(p % 64 AS INT)) & 1) = 1)"
    )
    cond = f"exists(transform({probe}, g -> forall({positions}, {test})), x -> x)"
    return df.where(F.col(value_col).isNotNull() & F.expr(cond))


# ---------------------------------------------------------------------------
# DDSketch-style quantile sketch (Masson, Lee & Rong, "DDSketch: a fast
# and fully-mergeable quantile sketch with relative-error guarantees",
# VLDB 2019).  Values map to logarithmic buckets ``ceil(ln(v)/ln(γ))``;
# the per-bucket representative ``2γ^b/(γ+1)`` is within a relative
# error of (γ-1)/(γ+1) of every value in the bucket, so any quantile
# estimate carries the same guarantee.
#
# Why this sketch (vs percentile_approx): Spark's native
# ``percentile_approx`` (KLL/GK-style) is the right default, but its
# estimates are engine-internal.  DDSketch's construction is pure
# arithmetic on the value, so it is DETERMINISTIC and cross-engine
# reproducible — the DuckDB oracle rebuilds the identical bucket
# relation and the identical estimates (the KMV-vs-HLL argument, for
# quantiles).  ln(γ) and 2/(γ+1) are precomputed in PYTHON and inlined
# as double literals on both engines so neither engine's libm computes
# the shared constants.
#
# Scale design (100 TB): construction is ONE count shuffle keyed by
# (group, sign, bucket) — map-side combined, reduce state bounded by
# the bucket count (≈ ln(max/min)/ln γ per sign, e.g. ~2.3k buckets for
# 12 decades at γ=1.02) — and sketches merge by summing bucket counts
# (counters are linear), so per-shard/per-day sketches roll up without
# re-reading data.  Quantile extraction windows over bucket rows (tiny),
# never values.
# ---------------------------------------------------------------------------


def _dd_bucket(v, ln_gamma: float):
    """(sign, bucket) for one value; 0 maps to (0, 0)."""
    b_pos = F.ceil(F.log(F.abs(v)) / F.lit(ln_gamma)).cast("long")
    sgn = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    return sgn.cast("int"), F.when(v == 0, F.lit(0).cast("long")).otherwise(b_pos)


def dd_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    gamma: float = 1.02,
) -> DataFrame:
    """Quantile sketch as rows ``(group..., sgn, bucket, cnt)``.

    Row form (not an array blob) so sketches merge with plain
    relational ops and a SQL oracle can rebuild the identical relation.

    NULL/NaN/±Inf values are excluded: a non-finite value has no log
    bucket (``ceil(ln(inf))`` overflows the bucket integer into NULL,
    which would silently become its own bucket).
    """
    import math

    if not gamma > 1.0:
        raise ValueError(f"dd_sketch: gamma must be > 1, got {gamma}")
    ln_gamma = math.log(gamma)
    grp = list(group_cols)
    v = F.col(value_col).cast("double")
    sgn, bucket = _dd_bucket(v, ln_gamma)
    inf = F.lit(float("inf"))
    return (
        df.where(v.isNotNull() & ~F.isnan(v) & (F.abs(v) != inf))
        .select(*grp, sgn.alias("sgn"), bucket.alias("bucket"))
        .groupBy(*grp, "sgn", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_dd_sketches(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Bucket-wise sum: DD(A ⊎ B) == merge(DD(A), DD(B)) exactly.

    A DDSketch relation does not carry its build ``gamma`` (buckets
    are just ``(sgn, bucket, cnt)``) and ANY bucket index is valid
    under any gamma, so a mixed-gamma merge is UNDETECTABLE from the
    rows — unlike HLL (m carried, asserted at merge) and CMS (range
    check available).  Keep one gamma per fleet; :func:`dd_quantile`
    interprets buckets under the single gamma it is given."""
    grp = list(group_cols)
    merged = sketches[0].select(*grp, "sgn", "bucket", "cnt")
    for s in sketches[1:]:
        merged = merged.unionByName(s.select(*grp, "sgn", "bucket", "cnt"))
    return merged.groupBy(*grp, "sgn", "bucket").agg(F.sum("cnt").alias("cnt"))


def dd_quantile(
    sketch: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    gamma: float = 1.02,
) -> DataFrame:
    """Per-group quantile estimates from a :func:`dd_sketch` relation.

    Rank semantics are type-1 (lower-rank) over ROWS: quantile q picks
    the value at rank ``floor(q*(n-1)) + 1`` in value order.  Each
    returned estimate is the rank's bucket representative
    ``sgn * 2γ^b/(γ+1)`` (0 for the zero bucket), rounded to 6 places —
    within relative error (γ-1)/(γ+1) of the exact quantile.

    Plan shape: the sketch relation is computed ONCE and cross-joined
    with a broadcast literal quantile table (a per-quantile union would
    re-aggregate the sketch subtree per quantile — N full input scans);
    one window over (group, q) picks each rank's bucket.  Everything
    past the sketch touches bucket rows only — the raw value volume
    never reaches this stage.
    """
    if not gamma > 1.0:
        raise ValueError(f"dd_quantile: gamma must be > 1, got {gamma}")
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"dd_quantile: quantile {q} outside [0, 1]")
    coef = 2.0 / (gamma + 1.0)
    grp = list(group_cols)
    # representative value orders buckets by the actual value order
    # (negatives: larger bucket -> more negative)
    rep = F.when(F.col("sgn") == 0, F.lit(0.0)).otherwise(
        F.col("sgn") * F.lit(coef) * F.pow(F.lit(gamma), F.col("bucket"))
    )
    w_order = Window.partitionBy(*grp).orderBy(F.col("rep").asc())
    cum = (
        sketch.withColumn("rep", rep)
        .withColumn("cum", F.sum("cnt").over(w_order))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy(*grp)))
    )
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    # rank in 1..n, type-1: floor(q*(n-1)) + 1
    rank = F.floor(F.col("q") * (F.col("n") - 1)) + 1
    w_pick = Window.partitionBy(*grp, "q").orderBy(F.col("rep").asc())
    return (
        cum.crossJoin(F.broadcast(qdf))
        .where(F.col("cum") >= rank)
        .withColumn("__rn", F.row_number().over(w_pick))
        .where(F.col("__rn") == 1)
        .select(*grp, "q", F.round(F.col("rep"), 6).alias("est"))
    )
