"""Temporal join operators: as-of join and time-range join.

Neither exists as a built-in Spark join type, and the naive encodings
(inequality joins) degenerate to BroadcastNestedLoopJoin — O(n*m) row
comparisons that do not survive a 100 TB event stream. Both operators
here re-express the semantics as equi-join / window plans that shuffle
once on the join key and stay inside whole-stage codegen (no UDFs).

Scale design (100 TB):

* ``asof_join`` uses the union + last-value-window encoding: tag both
  streams, union them, and run ``last(value, ignoreNulls)`` over a
  window partitioned by the join key and ordered by time.  That is ONE
  shuffle (by key) and ONE sort (by time within key) regardless of how
  many left rows match how many right rows — the classic log-structured
  formulation used by kdb+/QuestDB-style engines, expressed with Spark
  window aggregates so Catalyst/Tungsten execute it natively.
* ``range_join`` buckets both sides by a time grain equal to the window
  span, explodes each probe row to the (at most two) buckets its window
  overlaps, and equi-joins on ``(keys..., bucket)`` before re-applying
  the exact range predicate.  Catalyst turns that into a plain shuffled
  hash/sort-merge join; the interval refinement is a post-join filter.
  At 100 TB the bucket key is appended to the shuffle key, so skew only
  arises if a single (key, bucket) pair is hot — i.e. a genuine data
  hotspot, mitigated by AQE skew-join splitting.

Reference parity: the reference delegates SQL to DataFusion, which (like
DuckDB) can express as-of semantics only through window subqueries or
(DuckDB) a native ASOF JOIN; the oracle for the gate query uses DuckDB's
``ASOF LEFT JOIN`` (semantics: greatest right ts <= left ts per key).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join", "time_rollup"]

def _ts_col(df: DataFrame, name: str) -> Column:
    """Timestamp column normalized for arithmetic: TIMESTAMP_NTZ has no
    cast to DOUBLE / ``unix_micros`` in Spark, so reinterpret the wall
    clock AS UTC — arithmetically, not via ``cast('timestamp')``, which
    interprets in the SESSION timezone: under e.g. Europe/Berlin a cast
    maps the spring-forward hour ambiguously (two NTZ values 62 wall
    minutes apart can land 2 instant-minutes apart), corrupting as-of
    tolerances and range bounds.  unix_date + wall-clock parts is exact,
    DST-free, and identical under every session timezone."""
    if dict(df.dtypes).get(name) == "timestamp_ntz":
        c = F.col(name)
        ep_micros = (
            F.unix_date(c.cast("date")).cast("long") * F.lit(86_400_000_000)
            + F.hour(c).cast("long") * F.lit(3_600_000_000)
            + F.minute(c).cast("long") * F.lit(60_000_000)
            + F.expr(
                f"CAST(extract(SECOND FROM `{name}`) * 1000000 AS BIGINT)"
            )
        )
        return F.timestamp_micros(ep_micros)
    return F.col(name)


def _ntz_epoch_double(colname: str) -> Column:
    """Epoch seconds of a TIMESTAMP_NTZ column with the wall clock read
    as UTC — same DST-free arithmetic as :func:`_ts_col`, usable on a
    joined frame where only the (possibly renamed) column name is
    known."""
    c = F.col(colname)
    return (
        F.unix_date(c.cast("date")).cast("double") * F.lit(86400.0)
        + F.hour(c).cast("double") * F.lit(3600.0)
        + F.minute(c).cast("double") * F.lit(60.0)
        + F.expr(f"CAST(extract(SECOND FROM `{colname}`) AS DOUBLE)")
    )


_GRAIN_FORMATS = {
    "hour": "yyyy-MM-dd HH:00:00",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
    "year": "yyyy",
}
_GRAIN_ORDER = ["hour", "day", "month", "year"]

# rendered-string prefix length per grain ("2026-03-29 02:00:00" -> 13
# chars of wall clock + the zeroed suffix for hour; plain prefixes
# otherwise) — matches _GRAIN_FORMATS exactly
_GRAIN_PREFIX = {"hour": 13, "day": 10, "month": 7, "year": 4}


def _wall_bucket(ts_str: Column, grain: str) -> Column:
    """Truncate a wall-clock string ('yyyy-MM-dd HH:mm:ss...') to a
    grain's rendered bucket.  Works identically on a raw NTZ cast and on
    an already-truncated coarser re-aggregation input (every grain's
    render is a prefix of every finer grain's render)."""
    prefix = F.substring(ts_str, 1, _GRAIN_PREFIX[grain])
    if grain == "hour":
        return F.concat(prefix, F.lit(":00:00"))
    return prefix


def time_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    granularities: Sequence[str] = ("hour", "day", "month"),
    group_cols: Sequence[str] = (),
    value_decimal: str = "decimal(38,9)",
) -> DataFrame:
    """Hypertable-style continuous aggregate: sum/count/min/max of
    ``value_col`` bucketed at several time granularities at once, with
    a ``grain`` label column and the bucket rendered as a string
    (``bucket``) so every granularity shares one schema.

    Scale design: hierarchical re-aggregation.  Raw rows are aggregated
    ONCE at the finest requested grain (the only full-volume shuffle);
    each coarser grain re-aggregates the previous grain's partials
    (sum-of-sums, min-of-mins, …), so the day rollup of 100 TB of
    events shuffles hour-rows, not events.  This is how TimescaleDB
    continuous aggregates / Druid rollup segments compose, expressed as
    plain Spark aggregates.  avg is derived (sum/count) at output so it
    composes across levels.
    """
    grains = [g for g in _GRAIN_ORDER if g in set(granularities)]
    if not grains:
        raise ValueError(
            f"time_rollup: no valid granularities in {list(granularities)!r} "
            f"(valid: {_GRAIN_ORDER})"
        )
    gcols = list(group_cols)
    reserved = {"grain", "bucket", "n", "sum_value", "min_value",
                "max_value", "avg_value", "__bucket", "__bucket_ts",
                "__sum", "__min", "__max"}
    bad = sorted(reserved & set(gcols))
    if bad:
        # a group column named like an output/internal column either
        # dies with AMBIGUOUS_REFERENCE mid-cascade or silently emits
        # duplicate output columns (shuffle_corpus/corpus_offsets raise
        # for this clash class too)
        raise ValueError(
            f"time_rollup: group column(s) {bad} collide with the "
            "rollup's output/internal columns — rename them first"
        )
    # exact cross-engine sums need a decimal; the default (38,9) keeps
    # micro-scale values (latencies) and large magnitudes exact.  Pass
    # a narrower type only when an external oracle must reproduce the
    # exact same rounding (the gate uses decimal(12,2)).
    v = F.col(value_col).cast(value_decimal)
    finest = grains[0]
    is_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    if is_ntz:
        # TIMESTAMP_NTZ: date_trunc/date_format implicitly cast through
        # the SESSION timezone (DST holes/overlaps corrupt buckets under
        # non-UTC sessions).  An NTZ wall clock renders tz-free as a
        # string, and every grain is a prefix of it — so bucket keys ARE
        # the rendered strings, truncation is substring, and coarser
        # grains re-truncate the finer key.  Zero timezone involvement.
        first_key = _wall_bucket(F.col(ts_col).cast("string"), finest)
        level = df.groupBy(first_key.alias("__bucket"), *gcols).agg(
            F.count(value_col).alias("n"),
            F.sum(v).alias("__sum"),
            F.min(v).alias("__min"),
            F.max(v).alias("__max"),
        )
    else:
        level = (
            df.groupBy(
                F.date_trunc(finest, F.col(ts_col)).alias("__bucket_ts"), *gcols
            ).agg(
                F.count(value_col).alias("n"),
                F.sum(v).alias("__sum"),
                F.min(v).alias("__min"),
                F.max(v).alias("__max"),
            )
        )
    # each level is consumed TWICE (its rendered output slice + the
    # next-coarser re-aggregation), and write-path AQE reuses no
    # exchange — unmaterialized, every grain re-ran the whole lineage
    # back through the corpus scan (the executed r8 plan carried one
    # corpus aggregation PER GRAIN).  Levels are bucket-cardinality-
    # sized (time buckets x groups), so materializing each is what
    # makes this the hierarchical re-aggregation the design claims.
    from ..operators.materialize import materialize

    level = materialize(level)
    out = None
    for grain in grains:
        if grain != finest:
            regroup = (
                _wall_bucket(F.col("__bucket"), grain).alias("__bucket")
                if is_ntz
                else F.date_trunc(grain, F.col("__bucket_ts")).alias("__bucket_ts")
            )
            level = materialize(
                level.groupBy(regroup, *gcols).agg(
                    F.sum("n").alias("n"),
                    F.sum("__sum").alias("__sum"),
                    F.min("__min").alias("__min"),
                    F.max("__max").alias("__max"),
                )
            )
        bucket_render = (
            F.col("__bucket")
            if is_ntz
            else F.date_format(F.col("__bucket_ts"), _GRAIN_FORMATS[grain])
        )
        rendered = level.select(
            F.lit(grain).alias("grain"),
            bucket_render.alias("bucket"),
            *gcols,
            F.col("n"),
            F.col("__sum").cast("double").alias("sum_value"),
            # n = count(value_col) is 0 when every value in the bucket
            # is NULL; a bare division would abort under ANSI mode
            F.when(
                F.col("n") > 0, F.col("__sum").cast("double") / F.col("n")
            ).alias("avg_value"),
            F.col("__min").cast("double").alias("min_value"),
            F.col("__max").cast("double").alias("max_value"),
        )
        out = rendered if out is None else out.unionByName(rendered)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_seconds: Optional[float] = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` and equal ``on`` keys (backward as-of).

    ``direction`` follows pandas ``merge_asof``: ``"backward"``
    (default) matches the latest right row at or before the left
    timestamp; ``"forward"`` the earliest right row at or after it;
    ``"nearest"`` whichever of the two is closer in absolute time
    (ties prefer the backward match, as pandas does).

    Matched ``value_cols`` (and the matched right timestamp, as
    ``matched_ts``) are appended to the left schema; unmatched left rows
    keep nulls (left-outer semantics).  When several right rows share
    the exact same (key, ts), the propagated value is the
    last-in-window one — pre-aggregate the right side to one row per
    (key, ts) if exact tie determinism matters.

    ``tolerance_seconds`` additionally nulls out matches older than the
    given horizon (pandas ``merge_asof(tolerance=...)`` semantics);
    DuckDB ASOF has no tolerance, so gate oracles leave it unset.

    Plan shape: Union -> Exchange(on) -> Sort(on, ts, is_left) ->
    Window(last/first ignorenulls) -> Filter(is_left).  One shuffle
    total; ``nearest`` evaluates both window frames over the SAME sort
    order (window ordering only differs in frame, not keys), so it is
    still one shuffle and one sort.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    on = list(on)
    lcols = left.columns
    out_names = ["matched_ts"] + [f"matched_{c}" for c in value_cols]
    clashes = [c for c in out_names if c in lcols]
    if clashes:
        # two chained asof_joins are a natural enrichment shape; a
        # silent duplicate column dies later with AMBIGUOUS_REFERENCE
        # (range_join raises for this clash class too)
        raise ValueError(
            f"asof_join: output column(s) {clashes} already exist on "
            "the left input — rename them first"
        )
    # LEFT rows with a NULL join key can never match (NULL = NULL never
    # joins) yet all hash to ONE window partition — at crawl scale the
    # entire no-key slice (easily 1-10%) would sort on a single task.
    # r10: they stay INSIDE the one scan (the r9 where/where-not split
    # executed the left input twice on the write path, where AQE never
    # shares a subtree) and are spread by a SALT partition key instead:
    # right rows with NULL keys are filtered below, so the salted
    # NULL-key window partitions contain no right rows and the fill
    # yields the required always-NULL matches naturally.  The salt is
    # constant 0 for keyed rows — their grouping is unchanged — and
    # spark_partition_id() for NULL-key rows (value never reaches the
    # output, so scan-order nondeterminism is harmless).
    salt = []
    if on:
        null_key = F.lit(False)
        for k in on:
            null_key = null_key | F.col(k).isNull()
        salt = ["__salt"]
    rfields = {f.name: f for f in right.schema.fields}
    # The matched right row travels as ONE struct (NULL for left rows,
    # non-NULL — possibly with NULL fields — for right rows), and the
    # window fill picks that struct atomically.  Per-column
    # last(ignorenulls) fills were WRONG: a genuine NULL in a right
    # value column was skipped, pairing the matched timestamp with a
    # value from an OLDER right row (even outside tolerance) — a
    # (ts, value) combination that exists in no right row.
    norm_ts_dt = (
        T.TimestampType()
        if isinstance(rfields[right_ts].dataType, T.TimestampNTZType)
        else rfields[right_ts].dataType
    )
    pack_type = T.StructType(
        [
            T.StructField("__pts", norm_ts_dt),
            T.StructField("__porig", rfields[right_ts].dataType),
            *[T.StructField(c, rfields[c].dataType) for c in value_cols],
        ]
    )
    tagged_left = left.select(
        *[F.col(c) for c in on],
        *(
            [
                F.when(null_key, F.spark_partition_id())
                .otherwise(F.lit(0))
                .alias("__salt")
            ]
            if salt
            else []
        ),
        _ts_col(left, left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(pack_type).alias("__r_pack"),
        F.struct(*[F.col(c) for c in lcols]).alias("__row"),
    )
    # right rows with a NULL timestamp or NULL join key can never match
    # (DuckDB ASOF / pandas merge_asof semantics: a NULL ts has no
    # position on the time axis, and NULL = NULL never joins) — kept in,
    # a NULL ts sorts first and its values would leak into every
    # backward frame
    right_clean = right.where(F.col(right_ts).isNotNull())
    for k in on:
        right_clean = right_clean.where(F.col(k).isNotNull())
    tagged_right = right_clean.select(
        *[F.col(c) for c in on],
        *([F.lit(0).alias("__salt")] if salt else []),
        _ts_col(right_clean, right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(
            # __pts normalized for comparison; __porig is the ORIGINAL
            # right timestamp for output (rendering the normalized one
            # for an NTZ input would shift the wall clock by the
            # session-timezone offset)
            _ts_col(right_clean, right_ts).alias("__pts"),
            F.col(right_ts).alias("__porig"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__r_pack"),
        # cast against the actual StructType (a DDL string built from
        # raw names breaks on columns containing spaces/colons/commas)
        F.lit(None).cast(T.StructType(left.schema.fields)).alias("__row"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Tie order makes the equal-timestamp bound inclusive in BOTH
    # directions: the backward window sorts right rows (is_left=0)
    # before left rows so a same-instant right row is inside the
    # preceding frame; the forward window sorts left rows first so the
    # same-instant right row is inside the following frame.  Both
    # windows share the partition keys, so Catalyst plans ONE exchange
    # (the second ordering only adds a Sort).
    w_back = (
        Window.partitionBy(*on, *salt)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on, *salt)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    fills = []
    if direction in ("backward", "nearest"):
        fills.append(
            F.last(F.col("__r_pack"), ignorenulls=True)
            .over(w_back)
            .alias("__b_pack")
        )
    if direction in ("forward", "nearest"):
        fills.append(
            F.first(F.col("__r_pack"), ignorenulls=True)
            .over(w_fwd)
            .alias("__f_pack")
        )
    filled = unioned.select("*", *fills)
    out = filled.where(F.col("__is_left") == 1)

    ts_d = F.col("__ts").cast("double")
    # a left row with a NULL timestamp has no position on the time axis
    # and must never match (the forward frame would otherwise hand it
    # the first right row, since NULLs sort first)
    left_has_ts = F.col("__ts").isNotNull()

    def within_tol(m_ts):
        if tolerance_seconds is None:
            return F.lit(True)
        return (
            F.abs(m_ts.cast("double") - ts_d) <= F.lit(float(tolerance_seconds))
        ) & m_ts.isNotNull()

    def left_fields():
        # getField keeps names with dots/spaces literal (F.col("__row.a.b")
        # would resolve a doubly-nested field)
        return [F.col("__row").getField(c).alias(c) for c in left.columns]

    def b(field):
        return F.col("__b_pack").getField(field)

    def fwd(field):
        return F.col("__f_pack").getField(field)

    if direction == "backward":
        pick_ts, pick_orig = b("__pts"), b("__porig")
        pick = {c: b(c) for c in value_cols}
    elif direction == "forward":
        pick_ts, pick_orig = fwd("__pts"), fwd("__porig")
        pick = {c: fwd(c) for c in value_cols}
    else:  # nearest: closer of the two; ties prefer backward (pandas)
        b_ok = within_tol(b("__pts"))
        f_ok = within_tol(fwd("__pts"))
        b_dist = F.abs(ts_d - b("__pts").cast("double"))
        f_dist = F.abs(fwd("__pts").cast("double") - ts_d)
        use_back = (
            left_has_ts & b("__pts").isNotNull() & b_ok
            & (
                fwd("__pts").isNull() | ~f_ok | (b_dist <= f_dist)
            )
        )
        use_fwd = left_has_ts & fwd("__pts").isNotNull() & f_ok & ~use_back
        matched = [
            F.when(use_back, b(c))
            .when(use_fwd, fwd(c))
            .alias(f"matched_{c}")
            for c in value_cols
        ]
        matched_ts = (
            F.when(use_back, b("__porig"))
            .when(use_fwd, fwd("__porig"))
            .alias("matched_ts")
        )
        return out.select(*left_fields(), matched_ts, *matched)

    ok = left_has_ts & pick_ts.isNotNull() & within_tol(pick_ts)
    matched = [
        F.when(ok, pick[c]).alias(f"matched_{c}") for c in value_cols
    ]
    matched_ts = F.when(ok, pick_orig).alias("matched_ts")
    return out.select(*left_fields(), matched_ts, *matched)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner-join right rows whose ``right_ts`` falls in
    ``[left_ts + lower_seconds, left_ts + upper_seconds]`` (plus equal
    ``on`` keys).  Columns from both sides are kept; right-side name
    clashes get an ``r_`` prefix.

    Encoded as an equi-join on (keys..., time bucket) with the exact
    interval predicate re-applied after the join, so Catalyst picks a
    shuffled hash / sort-merge join instead of the
    BroadcastNestedLoopJoin a bare inequality condition produces.
    Bucket width == window span, so each left row expands to at most
    two bucket probes (a fixed 2x fan-out, not data-dependent).
    """
    if upper_seconds < lower_seconds:
        raise ValueError(
            "range_join: upper_seconds must be >= lower_seconds"
        )
    on = list(on)
    # bucket WIDTH only affects probe fan-out, never correctness (the
    # exact interval predicate re-applies after the join) — a point
    # interval (upper == lower) uses a 1s bucket instead of dividing
    # by a zero span
    span = float(upper_seconds - lower_seconds) or 1.0
    lo, hi = float(lower_seconds), float(upper_seconds)

    def bucket(ts_col: Column, offset: float) -> Column:
        return F.floor((ts_col.cast("double") + F.lit(offset)) / F.lit(span))

    rename = {
        c: f"r_{c}" if c in left.columns else c for c in right.columns
    }
    renamed = list(rename.values())
    clashes = sorted(
        {n for n in renamed if renamed.count(n) > 1}
        | ({"__bucket"} & (set(renamed) | set(left.columns)))
    )
    if clashes:
        # mirror the streaming twin's explicit error: without it the
        # duplicate r_-prefixed name surfaces as an opaque ambiguous-
        # reference AnalysisException deep in the final select
        raise ValueError(
            f"range_join: column name collision(s) after r_ prefixing: "
            f"{clashes} — rename the clashing columns first"
        )
    r = right.select(
        *[F.col(c).alias(rename[c]) for c in right.columns],
        bucket(_ts_col(right, right_ts), 0.0).alias("__bucket"),
    )
    l = left.select(
        "*",
        F.explode(
            F.array_distinct(
                F.array(
                    bucket(_ts_col(left, left_ts), lo),
                    bucket(_ts_col(left, left_ts), hi),
                )
            )
        ).alias("__bucket"),
    )
    cond = l["__bucket"] == r["__bucket"]
    for k in on:
        cond = cond & (l[k] == r[rename[k]])
    _r_ntz = dict(right.dtypes)[right_ts] == "timestamp_ntz"
    _l_ntz = dict(left.dtypes)[left_ts] == "timestamp_ntz"
    rts = (
        _ntz_epoch_double(rename[right_ts])
        if _r_ntz
        else F.col(rename[right_ts]).cast("double")
    )
    lts = (
        _ntz_epoch_double(left_ts) if _l_ntz else F.col(left_ts).cast("double")
    )
    joined = (
        l.join(r, cond, "inner")
        .where((rts >= lts + F.lit(lo)) & (rts <= lts + F.lit(hi)))
        .select(
            *[l[c] for c in left.columns],
            *[r[rename[c]] for c in right.columns],
        )
    )
    return joined
