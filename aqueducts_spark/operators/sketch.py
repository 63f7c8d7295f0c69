"""Deterministic cardinality sketch: K-minimum-values (KMV).

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

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_distinct", "kmv_sketch", "merge_kmv_sketches", "kmv_estimate"]

# 60-bit hash space: conv() of 15 hex chars stays well inside int64 and
# the identical arithmetic exists in DuckDB (('0x' || substr)::BIGINT)
_HASH_SPACE = float(1 << 60)


def _h60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    buckets: int = 64,
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
    grp = list(group_cols)
    hashes = df.select(*grp, _h60(F.col(value_col)).alias("h")).where(
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
    )


def kmv_estimate(sketch: DataFrame, group_cols: Sequence[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate from a sketch: exact when the group has
    fewer than k distinct values, ``(k-1)/h_(k)`` otherwise."""
    grp = list(group_cols)
    agg = sketch.groupBy(*grp).agg(
        F.count("h").alias("sketch_size"),
        F.max("h").alias("kth_h"),
    )
    exact = F.col("sketch_size").cast("double")
    est = F.lit(float(k - 1)) / (F.col("kth_h").cast("double") / F.lit(_HASH_SPACE))
    return agg.select(
        *grp,
        F.col("sketch_size"),
        F.when(F.col("sketch_size") < k, exact).otherwise(est).alias("distinct_est"),
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
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    buckets: int = 64,
) -> DataFrame:
    """End-to-end: sketch + estimate in one call."""
    return kmv_estimate(
        kmv_sketch(df, group_cols, value_col, k, buckets), group_cols, k
    )
