"""Skew-mitigation utilities for joins at scale.

AQE's skew-join handling (on by default in our session config) splits
oversized shuffle partitions at runtime — that is the first line of
defense. This module adds *salted joins* for the case AQE cannot fix:
a shuffle-hash/sort-merge join where one side has a handful of hot keys
(the classic power-law key distribution in clickstream/user data).

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R salt buckets, so one hot key's rows land in R
partitions instead of one. Correctness: every (big-row, small-row) key
match still meets exactly once because the big side picks ONE salt and
the small side carries ALL salts.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "key_skew_profile"]


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Top-N heaviest keys with their share of rows — run this (sampled)
    to decide whether salting is needed and to pick ``salt_buckets``.

    The total is a scalar aggregate over the key counts broadcast back
    as a 1-row cross join — NOT an unpartitioned window, which would
    funnel every distinct key's count row into a single window task and
    OOM/stall exactly in the high-cardinality case this profiler is for.
    Both branches share the same groupBy shuffle, so AQE's
    ReusedExchange keeps this at ONE scan of ``df``."""
    reserved = {"rows", "share", "__total"}
    if key in reserved:
        # groupBy(key).agg(alias 'rows') with key='rows' is AMBIGUOUS;
        # key='share' would be silently overwritten by withColumn
        raise ValueError(
            f"key_skew_profile: key {key!r} collides with the profile's "
            "output/internal columns — rename it first"
        )
    from .materialize import materialize

    # counts is key-cardinality-sized and consumed twice (the total row
    # + the share projection) — materialize so the write path does not
    # re-scan df per consumer (AQE reuses no exchange there)
    counts = materialize(df.groupBy(key).agg(F.count("*").alias("rows")))
    total = counts.agg(F.sum("rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("rows") / F.col("__total"), 4))
        .drop("__total")
        .orderBy(F.desc("rows"), F.asc(key))
        .limit(top)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
    seed_col: Optional[str] = None,
    hot_share: Optional[float] = None,
    max_hot_keys: int = 1000,
) -> DataFrame:
    """Join with the big side's keys salted across ``salt_buckets``.

    The big side gets a deterministic pseudo-random salt derived from a
    row's CONTENT (``seed_col``, or by default a hash over every big-
    side column — deterministic under task retry, which a positional id
    is not), the small side is exploded to all
    salts (size × R — only acceptable because it is the SMALL side).
    Join key becomes (key, salt): hot keys now spread across R shuffle
    partitions.

    ``hot_share`` switches to HOT-KEY-ONLY salting — the production
    shape when the small side is not tiny: the big side is profiled
    once (the :func:`key_skew_profile` aggregate, map-side combined),
    keys holding more than ``hot_share`` of the rows (bounded by
    ``max_hot_keys``, loud error past it) are collected to the driver,
    and ONLY those keys salt — every other key joins with the single
    salt 0, so small-side replication is ``R x hot_rows`` instead of
    ``R x |small|``.  Salting never changes the RESULT, only the
    shuffle layout: output is row-identical to the plain join either
    way.  Cost: one extra aggregate action over the big side — the
    same pass a manual key_skew_profile would spend deciding.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    if salt_buckets < 1:
        # 0 buckets would make the big side's salt NULL and the small
        # side's explode empty — a silently EMPTY join result
        raise ValueError(f"salted_join: salt_buckets must be >= 1, got {salt_buckets}")
    hot_keys: Optional[list] = None
    if hot_share is not None:
        if not 0 < hot_share < 1:
            raise ValueError(
                f"salted_join: hot_share must be in (0, 1), got {hot_share}"
            )
        counts = big.groupBy(on).agg(F.count(F.lit(1)).alias("__n"))
        total = counts.agg(F.sum("__n").alias("__t"))
        hot_rows = (
            counts.crossJoin(F.broadcast(total))
            .where(F.col("__n") >= F.col("__t") * F.lit(float(hot_share)))
            .where(F.col(on).isNotNull())
            .limit(max_hot_keys + 1)
            .select(on)
            .collect()
        )
        if len(hot_rows) > max_hot_keys:
            raise ValueError(
                f"salted_join: more than {max_hot_keys} keys exceed "
                f"hot_share={hot_share} — that is not a hot-key skew "
                "profile, it is uniform volume; raise hot_share or salt "
                "everything (hot_share=None)"
            )
        hot_keys = [r[0] for r in hot_rows]
        if not hot_keys:
            # nothing hot: degenerate to the plain join (salt 0 on both
            # sides adds a constant join column for zero benefit)
            return big.join(small, on=on, how=how)
    # the salt must be DETERMINISTIC under task retry: it is a shuffle/
    # join key, and a monotonically_increasing_id-derived salt could
    # re-assign rows to different buckets on recomputation (rows lost or
    # duplicated mid-join, the classic nondeterministic-shuffle-key
    # hazard).  Default: content hash over ALL big-side columns — pure
    # function of the row, so retries reproduce the same bucket.
    if seed_col:
        salt_src = F.xxhash64(F.col(seed_col))
    else:
        from pyspark.sql import types as _T

        def _hashable(dt) -> bool:
            # xxhash64 rejects MapType anywhere in the type tree
            if isinstance(dt, _T.MapType):
                return False
            if isinstance(dt, _T.ArrayType):
                return _hashable(dt.elementType)
            if isinstance(dt, _T.StructType):
                return all(_hashable(f.dataType) for f in dt.fields)
            return True

        hashable = [
            f.name for f in big.schema.fields if _hashable(f.dataType)
        ]
        if not hashable:
            raise ValueError(
                "salted_join: every big-side column is map-typed "
                "(unhashable) — pass seed_col"
            )
        # map columns are excluded (xxhash64 raises on MapType); the
        # remaining columns still make the salt a pure function of the
        # row, which is all determinism-under-retry needs
        salt_src = F.xxhash64(*[F.col(c) for c in hashable])
    salt = "__salt"
    while salt in big.columns or salt in small.columns:
        salt = "_" + salt  # never clobber a user column of the same name
    full_range = F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    if hot_keys is None:
        big_salt = F.pmod(salt_src, F.lit(salt_buckets)).cast("int")
        small_salts = full_range
    else:
        is_hot = F.col(on).isin(hot_keys)
        big_salt = F.when(
            is_hot, F.pmod(salt_src, F.lit(salt_buckets)).cast("int")
        ).otherwise(F.lit(0))
        small_salts = F.when(is_hot, full_range).otherwise(
            F.array(F.lit(0))
        )
    big_salted = big.withColumn(salt, big_salt)
    small_salted = small.withColumn(salt, F.explode(small_salts))
    out = big_salted.join(small_salted, on=[on, salt], how=how)
    return out.drop(salt)
